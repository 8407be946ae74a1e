/** In the graftshim package for the same reason as FloatVecDot: the
  * Column bridge and AbstractDataType are private[sql].
  */
package org.apache.spark.sql.graftshim

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Arrays
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes,
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType,
  LongType, StringType}

/** ShingleMinHashes with a stop-shingle filter fused into the scan.
  *
  * Semantics are EXACTLY the idfBands pipeline (explode → broadcast
  * stop-set anti-join → per-doc 12-MIN re-aggregate, plus the
  * all-shingles-stopped fallback that keeps the full set), collapsed
  * into one expression evaluation per document: minhash over the
  * shingles whose h0 is NOT in `stop`; if every shingle is stopped, the
  * unfiltered signature (the fallback pass) is returned instead. Both
  * accumulator arrays fill in the same single loop, so the fallback
  * costs nothing extra.
  *
  * `stop` is the driver-collected frequent-shingle set. Its size is
  * analytically bounded: Σdf = corpus shingle occurrences, so
  * |{h : df(h) > maxDf}| ≤ Σdf/maxDf — with maxDf = |docs|/20 that is
  * ≤ 20 × the average shingles-per-doc, INDEPENDENT of corpus size
  * (~10³ longs here). It rides the expression's references array to
  * executors exactly like a broadcast hash-join build side; lookup is
  * binary search over the sorted copy. If an operating point ever
  * produced a set too big for plan shipping, the BloomFilters shim is
  * the drop-in lossy replacement (false positives only drop extra
  * shingles — signatures stay valid MinHashes, recall is what moves).
  */
// `stop` is a Seq (not Array): case-class equality on an Array field is
// reference-based, which would defeat expression canonicalization /
// common-subexpression recognition (e.g. the two sides of the
// d_minhash_idf band self-join deserializing to unequal copies).
case class FilteredShingleMinHashes(child: Expression, k: Int,
    numHashes: Int, stop: Seq[Long])
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1, s"shingle size must be >= 1, got $k")
  require(numHashes >= 1 && numHashes <= 64,
    s"numHashes must be in [1,64], got $numHashes")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "filtered_shingle_minhashes"

  private val P31 = 2147483647L
  private val affA: Array[Long] =
    Array.tabulate(numHashes)(i => (i + 1) * 1299709L)
  private val affB: Array[Long] =
    Array.tabulate(numHashes)(i => i * 15485863L)
  private val stopSorted: Array[Long] = {
    val a = stop.toArray; Arrays.sort(a); a
  }

  @transient private lazy val localMd: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Public so generated code can call it (doGenCode). */
  def compute(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val md = localMd.get()
    val nShingles = math.max(n - k + 1, 1)
    val minsKept = Array.fill(numHashes)(Long.MaxValue)
    val minsAll = Array.fill(numHashes)(Long.MaxValue)
    var anyKept = false
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
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
      val h0 = (h >>> 4) % P31
      val kept = Arrays.binarySearch(stopSorted, h0) < 0
      if (kept) anyKept = true
      var t = 0
      while (t < numHashes) {
        val v = (affA(t) * h0 + affB(t)) % P31
        if (v < minsAll(t)) minsAll(t) = v
        if (kept && v < minsKept(t)) minsKept(t) = v
        t += 1
      }
      i += 1
    }
    new GenericArrayData(if (anyKept) minsKept else minsAll)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("filteredShingleMinhashes", this,
      classOf[FilteredShingleMinHashes].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : FilteredShingleMinHashes = copy(child = newChild)
}

object FilteredShingleMinHashes {
  def filteredShingleMinhashes(words: Column, k: Int, numHashes: Int,
      stop: Array[Long]): Column =
    ExpressionUtils.column(FilteredShingleMinHashes(
      ExpressionUtils.expression(words), k, numHashes,
      stop.toIndexedSeq))
}
