/** graftshim: Column bridge / AbstractDataType are private[sql]. */
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

/** SORTED array of portable 60-bit hashes of a document's DISTINCT
  * k-shingles, fused into one expression — the verify-side primitive of
  * d_ngram_jaccard (Jaccard over these lists = Jaccard over the shingle
  * sets; see Dedup). Bit-identical to the composable
  * `array_sort(transform(array_distinct(shingle-enum), portableHash))`
  * pipeline it replaces, which materialized a string array per row and
  * re-walked it with three interpreted-boundary HOFs. Deduplication is on
  * the SHINGLE STRING, before hashing — the DuckDB oracle hashes
  * `list_distinct` of the strings, so deduping hashes instead would
  * diverge in the (astronomically unlikely, but contract-relevant)
  * collision case.
  *
  * Shingle enumeration matches the canonical convention everywhere else:
  * i ∈ [1, max(len-k+1, 1)]; short docs yield one truncated shingle.
  * Codegen is a single compute call, same pattern as ShingleMinHashes.
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hashes"

  @transient private lazy val localMd: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Public so generated code can call it (doGenCode). */
  def compute(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val md = localMd.get()
    val nShingles = math.max(n - k + 1, 1)
    val seen = new java.util.HashSet[String](nShingles * 2)
    val out = new Array[Long](nShingles)
    var m = 0
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
      val shingle = sb.toString
      if (seen.add(shingle)) {
        md.reset()
        val digest = md.digest(shingle.getBytes(StandardCharsets.UTF_8))
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
        out(m) = h >>> 4 // first 15 hex digits = portableHash60
        m += 1
      }
      i += 1
    }
    val trimmed = java.util.Arrays.copyOf(out, m)
    java.util.Arrays.sort(trimmed)
    new GenericArrayData(trimmed)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes", this,
      classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ShingleHashes = copy(child = newChild)
}

object ShingleHashes {
  def shingleHashes(words: Column, k: Int): Column =
    ExpressionUtils.column(ShingleHashes(
      ExpressionUtils.expression(words), k))
}
