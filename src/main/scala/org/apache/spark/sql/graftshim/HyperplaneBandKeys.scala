/** In the graftshim package for the same reason as FloatVecDot: the
  * Column bridge and AbstractDataType are private[sql].
  */
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes,
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType,
  FloatType, LongType}

/** All hyperplane-LSH band keys of a float vector, fused into one
  * expression: band b's key packs the sign bits of v·plane_{b·r+i}
  * (i < r = rowsPerBand) into the low r bits plus (b+1) << 32 — exactly
  * the packed-long equi-join key the composable formulation built from
  * nPlanes separate `when(fdot(v, lit(w)) >= 0, …)` columns.
  *
  * Why fused: at production near-dup thresholds the banding needs
  * nPlanes ≈ 200 (16 bands × 12 rows), and 200 fdot expressions each
  * carrying a 64-float literal array made Catalyst/Janino the bottleneck
  * — d_embed_lsh spent ~8 s/pass at sf0.1 almost entirely in plan
  * compile of two such projections (the arithmetic itself is ~50 M fused
  * multiply-adds, milliseconds). One expression evaluating a tight
  * dims × nPlanes loop removes the plan-size cliff while keeping the
  * enclosing projection inside WholeStageCodegen (call-shaped codegen,
  * same rationale as ShingleMinHashes).
  *
  * Weights come from [[graft.functions.Hashing.planeWeights]] — the same
  * derived family as the composable path and the DuckDB mirror, computed
  * once per (plan-)instance, never shipped as a model artifact.
  *
  * Determinism: the dot is a left-fold of float·float products in
  * double, identical to FloatVecDot's contract INCLUDING nulls: a null
  * ELEMENT in the folded range makes the dot NULL, and NULL >= 0 is not
  * true, so the band bit is 0 — exactly what the composable
  * `when(fdot(v, w) >= 0, bit).otherwise(0)` formulation produced (the
  * embedding schema admits null elements; none occur in data; the
  * equivalence is pinned by GraftFunctionsSpec's fused-vs-composable
  * property test). Vectors shorter than `dims` fold over their own
  * length.
  */
case class HyperplaneBandKeys(child: Expression, nPlanes: Int,
    rowsPerBand: Int, dims: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(nPlanes % rowsPerBand == 0,
    s"nPlanes ($nPlanes) must be a multiple of rowsPerBand ($rowsPerBand)")
  require(rowsPerBand >= 1 && rowsPerBand <= 32,
    s"rowsPerBand must be in [1,32], got $rowsPerBand")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "hyperplane_band_keys"

  private val nBands = nPlanes / rowsPerBand

  @transient private lazy val w: Array[Array[Float]] =
    graft.functions.Hashing.planeWeights(nPlanes, dims)

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Public so generated code can call it (doGenCode). */
  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val keys = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var key = (b + 1).toLong << 32
      var i = 0
      while (i < rowsPerBand) {
        val wp = w(b * rowsPerBand + i)
        var dot = 0.0
        var sawNull = false
        val m = math.min(n, wp.length)
        var j = 0
        while (j < m) {
          if (v.isNullAt(j)) sawNull = true
          else dot += v.getFloat(j).toDouble * wp(j)
          j += 1
        }
        // null element => dot is NULL (FloatVecDot contract) => the
        // composable when(dot >= 0, bit).otherwise(0) yields bit 0
        if (!sawNull && dot >= 0) key |= (1L << i)
        i += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneBandKeys", this,
      classOf[HyperplaneBandKeys].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : HyperplaneBandKeys = copy(child = newChild)
}

object HyperplaneBandKeys {
  def bandKeys(v: Column, nPlanes: Int, rowsPerBand: Int,
      dims: Int): Column =
    ExpressionUtils.column(HyperplaneBandKeys(
      ExpressionUtils.expression(v), nPlanes, rowsPerBand, dims))
}
