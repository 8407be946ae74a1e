/** Lives under org.apache.spark.sql because the expression/Column bridge
  * APIs it needs (ExpressionUtils, AbstractDataType) are private[sql] —
  * the established extension-point pattern for Spark-native libraries.
  * Everything else in graft stays in the graft package; only this shim
  * touches internals.
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
  DoubleType, FloatType}

/** Codegen'd dot product of two float vectors, in double precision.
  *
  * The composable formulation — `aggregate(zip_with(a, b, (x,y) => x*y),
  * 0d, +)` — is semantically right but every higher-order function is
  * CodegenFallback: each row pays interpreted lambda dispatch plus a
  * zip_with array allocation. On a 12.5M-pair similarity self-join that
  * was 34s; this expression is a tight fused loop over the two ArrayData
  * (no allocation), inlined into whole-stage codegen.
  *
  * Bit-compatibility contract: the sum is the LEFT FOLD of
  * (double)a[i] * (double)b[i] in index order — identical to both the
  * zip_with/aggregate formulation and DuckDB's ordered list fold, so
  * hash-oracle results are unchanged. Nulls: null array → null, and a
  * null ELEMENT → null too (ArrayType(FloatType) defaults to
  * containsNull=true, so this is reachable by schema; zip_with's x*y
  * would propagate the null through the fold the same way). Unequal
  * lengths: the min length is used (embeddings are fixed-width;
  * defensive rather than erroring).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  // A null ELEMENT yields null even when neither input column is
  // nullable, so nullability must also OR in each side's
  // ArrayType.containsNull — the default (children nullable only) would
  // let codegen skip declaring ev.isNull while doGenCode writes to it
  // (janino compile failure → interpreted fallback), and would declare
  // non-nullable a result that can in fact be null.
  override def nullable: Boolean = left.nullable || right.nullable ||
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    })

  override def prettyName: String = "fvec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
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
      // the isNullAt bit-check costs one predictable branch per element;
      // on all-non-null data (the embeddings hot path) it never mispredicts
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) {
            ${ev.isNull} = true;
            break;
          }
          $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FloatVecDot = copy(left = newLeft,
    right = newRight)
}

object FloatVecDot {
  /** Column-API entry point. */
  def fdot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatVecDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
