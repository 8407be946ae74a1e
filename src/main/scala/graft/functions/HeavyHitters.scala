package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries frequent-items sketch as a mergeable UDAF — the
  * bounded-memory answer to "top keys by count" when the key domain is
  * too large to exact-count (the exact two-phase groupBy shuffles one
  * row per DISTINCT key; at 100 TB a URL/token/id domain makes that
  * shuffle itself data-sized). The summary holds at most k entries per
  * aggregation buffer regardless of input size, and the final merge
  * moves k (key, count) pairs per partition — constant, not
  * domain-sized.
  *
  * Guarantee (Misra-Gries 1982; merge form Agarwal et al., "Mergeable
  * Summaries", PODS 2012): for every key x with true count c(x),
  * the estimate satisfies c(x) − n/(k+1) ≤ ĉ(x) ≤ c(x), and any key
  * with c(x) > n/(k+1) is guaranteed PRESENT in the summary. Both
  * properties hold for ANY partitioning / merge order, which is what
  * makes them hash-checkable verdicts (the summary CONTENTS are
  * merge-order-dependent; the guarantee is not — so the registered
  * query emits the booleans, never the raw estimates).
  */
object HeavyHitters {

  type Summary = Map[String, Long]

  /** The MG merge rule, usable outside the Aggregator too (streaming
    * maintenance merges a batch sketch into stored state — both sides
    * are ≤ k entries, so the merge is O(k) scalars wherever it runs):
    * sum counters; if more than k survive, subtract the (k+1)-th
    * largest count from every entry and drop non-positives — at most k
    * remain and the total decrement stays within the n/(k+1) budget
    * (Agarwal et al., PODS 2012), for ANY merge tree.
    */
  def mergeSummaries(a: Summary, b: Summary, k: Int): Summary = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val combined = b.foldLeft(a) { case (m, (key, c)) =>
        m.updated(key, m.getOrElse(key, 0L) + c)
      }
      if (combined.size <= k) combined
      else {
        val pivot = combined.valuesIterator.toArray
          .sortBy(-_).apply(k)
        combined.flatMap { case (key, c) =>
          if (c > pivot) Some(key -> (c - pivot)) else None
        }
      }
    }
  }

  /** Mergeable Misra-Gries aggregator keeping at most k entries. */
  def misraGries(k: Int): Aggregator[String, Summary, Summary] = {
    require(k >= 1, s"misraGries needs k >= 1, got $k")
    new Aggregator[String, Summary, Summary] {
      def zero: Summary = Map.empty

      def reduce(b: Summary, x: String): Summary = {
        if (x == null) b
        else b.get(x) match {
          case Some(c) => b.updated(x, c + 1L)
          case None if b.size < k => b.updated(x, 1L)
          case None =>
            // classic MG decrement: every counter pays 1, zeros drop;
            // O(k) but amortized O(1) per insert (each decrement
            // retires k+1 prior increments)
            b.flatMap { case (key, c) =>
              if (c > 1L) Some(key -> (c - 1L)) else None
            }
        }
      }

      def merge(a: Summary, b: Summary): Summary = mergeSummaries(a, b, k)

      def finish(r: Summary): Summary = r

      def bufferEncoder: Encoder[Summary] =
        ExpressionEncoder[Summary]()
      def outputEncoder: Encoder[Summary] =
        ExpressionEncoder[Summary]()
    }
  }

  /** Column form: `df.agg(mgSketchCol(col("key"), 50).as("mg"))`. */
  def mgSketchCol(c: Column, k: Int): Column = udaf(misraGries(k)).apply(c)

  // ---------------------------------------------------------------- CM

  /** Count-min sketch (Cormode-Muthukrishnan 2005) as a mergeable UDAF
    * — the complement of Misra-Gries: MG answers "which keys are big",
    * CM answers "how big is THIS key" for ANY key, still in O(d·w)
    * memory per buffer with an elementwise-add merge (the simplest
    * mergeable summary there is). Guarantees with depth d, width w:
    * est(x) ≥ c(x) ALWAYS (counters only ever add — deterministic
    * theorem), and est(x) ≤ c(x) + (e/w)·n with probability ≥ 1−e^−d
    * over the hash draw; our hashes are FIXED (MurmurHash3 seeded by
    * row), so for given data the upper bound is a deterministic
    * empirical fact — the a3_approx precedent: the registered verdict
    * hash-checks both.
    */
  def cmDepth: Int = 4

  private def cmIndex(x: String, row: Int, width: Int): Int = {
    val h = scala.util.hashing.MurmurHash3.stringHash(x, row)
    ((h % width) + width) % width
  }

  /** Mergeable count-min aggregator: buffer = d×w counters, flattened. */
  def countMin(width: Int): Aggregator[String, Array[Long], Array[Long]] = {
    require(width >= 1)
    new Aggregator[String, Array[Long], Array[Long]] {
      def zero: Array[Long] = new Array[Long](cmDepth * width)
      def reduce(b: Array[Long], x: String): Array[Long] = {
        if (x != null) {
          var r = 0
          while (r < cmDepth) {
            b(r * width + cmIndex(x, r, width)) += 1L
            r += 1
          }
        }
        b
      }
      def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      def finish(r: Array[Long]): Array[Long] = r
      def bufferEncoder: Encoder[Array[Long]] =
        ExpressionEncoder[Array[Long]]()
      def outputEncoder: Encoder[Array[Long]] =
        ExpressionEncoder[Array[Long]]()
    }
  }

  /** Point estimate from a collected sketch: min over the d rows. */
  def cmEstimate(sketch: Array[Long], width: Int, x: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < cmDepth) {
      val v = sketch(r * width + cmIndex(x, r, width))
      if (v < best) best = v
      r += 1
    }
    best
  }

  /** Column form: `df.agg(cmSketchCol(col("key"), 2048).as("cm"))`. */
  def cmSketchCol(c: Column, width: Int): Column =
    udaf(countMin(width)).apply(c)
}
