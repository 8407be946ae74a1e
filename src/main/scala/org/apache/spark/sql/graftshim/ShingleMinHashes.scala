/** In the graftshim package for the same reason as FloatVecDot: the
  * Column bridge and AbstractDataType are private[sql].
  */
package org.apache.spark.sql.graftshim

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes,
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType,
  LongType, StringType}

/** Complete MinHash signature of a word array, fused into one expression.
  *
  * Input: the word array of a document. Output: array<long> of
  * `numHashes` minhash values, where hash i of shingle s is the affine
  * rehash `(A_i·h0(s) + B_i) mod p`, `h0 = portableHash60(s) mod p`,
  * p = 2^31-1, A_i = (i+1)·1299709, B_i = i·15485863 — bit-identical to
  * the composable pipeline (transform ∘ sequence ∘ slice ∘ concat_ws ∘
  * md5 ∘ conv ∘ array_min) and to the DuckDB oracle, but in a single JVM
  * pass with a reused MessageDigest and zero intermediate Column arrays.
  * Shingle enumeration matches the canonical convention: i ∈
  * [1, max(len-k+1, 1)], short docs yield one truncated shingle.
  *
  * Duplicate shingles need no explicit dedup here: min over a multiset
  * equals min over its set, so repeated h0 values can't change any
  * signature component.
  *
  * Codegen: the generated code is one virtual call into `compute` on the
  * referenced instance — the irreducible cost is md5 itself, so there is
  * nothing to gain from inlining the loop, but the call-shaped codegen
  * (vs the earlier CodegenFallback) keeps the enclosing operator inside
  * WholeStageCodegen instead of demoting the whole projection to the
  * interpreted path.
  */
case class ShingleMinHashes(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1, s"shingle size must be >= 1, got $k")
  require(numHashes >= 1 && numHashes <= 64,
    s"numHashes must be in [1,64], got $numHashes")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_minhashes"

  private val P31 = 2147483647L
  private val affA: Array[Long] =
    Array.tabulate(numHashes)(i => (i + 1) * 1299709L)
  private val affB: Array[Long] =
    Array.tabulate(numHashes)(i => i * 15485863L)

  // one digest per thread, not per row — the expression instance is
  // shared across a partition's rows (and, under WSCG, across tasks via
  // the references array), so a plain field would race
  @transient private lazy val localMd: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Public so generated code can call it (doGenCode). */
  def compute(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val md = localMd.get()
    val nShingles = math.max(n - k + 1, 1)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nShingles) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + k, n)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(words.getUTF8String(j).toString)
        j += 1
      }
      md.reset()
      val digest = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      // first 15 hex digits = first 8 bytes big-endian, low nibble dropped
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
      val h0 = (h >>> 4) % P31
      var t = 0
      while (t < numHashes) {
        val v = (affA(t) * h0 + affB(t)) % P31
        if (v < mins(t)) mins(t) = v
        t += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleMinhashes", this,
      classOf[ShingleMinHashes].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ShingleMinHashes = copy(child = newChild)
}

object ShingleMinHashes {
  def shingleMinhashes(words: Column, k: Int, numHashes: Int): Column =
    ExpressionUtils.column(ShingleMinHashes(
      ExpressionUtils.expression(words), k, numHashes))
}
