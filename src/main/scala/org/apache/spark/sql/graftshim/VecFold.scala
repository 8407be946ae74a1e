/** Lives under org.apache.spark.sql for the same reason as FloatVecDot:
  * the expression/Column bridge APIs (ExpressionUtils, AbstractDataType,
  * TypeCollection) are private[sql].
  */
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType,
  DoubleType, FloatType, TypeCollection}

/** Shared scaffolding for codegen'd binary vector folds over float OR
  * double arrays (each side independently), accumulating in double.
  *
  * Why these exist (guide §4 / FloatVecDot's rationale, generalized):
  * the composable formulations — `aggregate(zip_with(a, b, f), 0d, +)`
  * and `aggregate(transform(a, f), 0d, +)` — are CodegenFallback: every
  * row pays interpreted lambda dispatch plus a zip_with/transform array
  * allocation. The IVF/PQ hot paths evaluate one such fold per
  * (vector × centroid) pair — n·|cells| pairs per Lloyd round for the
  * coarse quantizer and n·M·K pairs per round for the PQ codebooks —
  * so the interpreted overhead multiplies into the dominant cost of the
  * whole v_* family. These expressions are tight fused loops over the
  * two ArrayData (no allocation), inlined into whole-stage codegen.
  *
  * Bit-compatibility contract (same as FloatVecDot): the result is the
  * LEFT FOLD in index order of the per-element term, with float
  * elements widened to double exactly as `x.cast("double")` does —
  * identical to the zip_with/aggregate formulation and to DuckDB's
  * ordered list fold, so hash-oracle results are unchanged. Nulls:
  * null array → null, null ELEMENT → null (zip_with's per-element
  * lambda would propagate the null through the + fold the same way).
  * Unequal lengths: min length (embeddings are fixed-width; defensive
  * rather than erroring — FloatVecDot's documented choice).
  */
abstract class VecFold extends BinaryExpression with ExpectsInputTypes {

  private val fOrD: AbstractDataType =
    TypeCollection(ArrayType(DoubleType), ArrayType(FloatType))

  override def inputTypes: Seq[AbstractDataType] = Seq(fOrD, fOrD)

  override def dataType: DataType = DoubleType

  // see FloatVecDot: a null ELEMENT yields null even when neither input
  // column is nullable, so nullability must OR in containsNull
  override def nullable: Boolean = left.nullable || right.nullable ||
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    })

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Per-element term in double precision — interpreted path. */
  protected def term(x: Double, y: Double): Double

  /** Per-element term — generated Java, in terms of two double-typed
    * variable names. */
  protected def termCode(x: String, y: String): String

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left)
    val rf = isFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += term(xv, yv)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val getX = if (isFloat(left)) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $b.getFloat($i)"
        else s"$b.getDouble($i)"
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) {
            ${ev.isNull} = true;
            break;
          }
          double $xv = $getX;
          double $yv = $getY;
          $s += ${termCode(xv, yv)};
        }
        ${ev.value} = $s;
      """
    })
}

/** Σ x_i · y_i over float/double arrays (double left fold) — the
  * codegen replacement for `aggregate(zip_with(a, b, (x, y) =>
  * x.cast("double") * y), 0d, +)` and, with a = b, for the norm² fold
  * `aggregate(transform(a, x => x.cast("double") * x.cast("double")),
  * 0d, +)`. */
case class VecDotD(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "vec_dotd"
  override protected def term(x: Double, y: Double): Double = x * y
  override protected def termCode(x: String, y: String): String =
    s"$x * $y"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDotD = copy(left = newLeft,
    right = newRight)
}

/** Σ (x_i − y_i)² over float/double arrays (double left fold) — the
  * codegen replacement for PQ's squared-L2
  * `aggregate(zip_with(sv, cv, (x, y) => (x.cast("double") - y) *
  * (x.cast("double") - y)), 0d, +)`. */
case class VecL2SqD(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "vec_l2sqd"
  override protected def term(x: Double, y: Double): Double =
    (x - y) * (x - y)
  override protected def termCode(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecL2SqD = copy(left = newLeft,
    right = newRight)
}

object VecFold {
  /** Column-API entry points. */
  def vdot(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDotD(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def vl2sq(a: Column, b: Column): Column =
    ExpressionUtils.column(VecL2SqD(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
