package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable quantile-sketch state: KLL/MRL compactor levels (level h
  * holds items of weight 2^h, each level capped at k items) plus a
  * SELF-ACCOUNTED deterministic rank-error bound.
  *
  * `err` is the running sum of 2^h over every compaction ever applied
  * at any level h, across any merge tree: one compaction halves 2t
  * sorted weight-w items into t weight-2w items by keeping alternating
  * positions, which shifts the count-≤ function at ANY threshold by at
  * most w (kept count is ⌈r/2⌉ or ⌊r/2⌋ of the true r). So
  * |estRank(v) − trueRank(v)| ≤ err is a deterministic THEOREM of the
  * data structure — no probability, no distribution assumption — which
  * is what makes it a hash-checkable verdict column (the MG/CM
  * precedent: contents are merge-order-dependent, the guarantee is
  * not). With capacity k the bound works out to ≈ 2·log2(n/k)/k · n;
  * unlike randomized KLL the alternation is deterministic (parity of
  * the compaction counter), so a rerun over the same partition order
  * reproduces the state bit-for-bit.
  *
  * Fields are encoder-friendly (Seq, not Array) so the state round-trips
  * parquet and the case-class equality is structural.
  */
case class QSketch(k: Int, n: Long, err: Long, flips: Long,
    levels: Seq[Seq[Double]])

object QuantileSketch {

  def empty(k: Int): QSketch = {
    require(k >= 8, s"quantile sketch needs k >= 8, got $k")
    QSketch(k, 0L, 0L, 0L, Seq(List.empty[Double]))
  }

  /** Level-0 inserts prepend, so keep it a List (O(1)); after an
    * encoder round-trip the level arrives as an ArraySeq — convert
    * once, then stay a List.
    */
  private def asList(xs: Seq[Double]): List[Double] = xs match {
    case l: List[Double] => l
    case other => other.toList
  }

  def insert(s: QSketch, v: Double): QSketch = {
    val l0 = v :: asList(s.levels.head)
    val grown = s.copy(n = s.n + 1,
      levels = l0 +: s.levels.tail)
    // List.length is O(len), and it dominated the per-row cost at
    // k=1024: checking every 32nd insert cuts that 32× and merely lets
    // level 0 overshoot to k+31 — capacity slack is harmless to the
    // error accounting (compactions still log their exact 2^h)
    if ((grown.n & 31L) == 0L && l0.length >= s.k) compactAll(grown)
    else grown
  }

  /** Compact every over-capacity level, cascading upward. Each
    * compaction: sort the level; if odd-sized, the largest item stays
    * behind at full fidelity; the remaining 2t items collapse to t
    * items of doubled weight by keeping alternating sorted positions
    * (offset = parity of the compaction counter, so systematic bias
    * cancels across compactions); `err` grows by this level's weight —
    * the per-compaction worst-case rank shift.
    */
  private def compactAll(s: QSketch): QSketch = {
    var levels = s.levels.map(asList).toVector
    var err = s.err
    var flips = s.flips
    var h = 0
    while (h < levels.length) {
      if (levels(h).length >= s.k && levels(h).length >= 2) {
        val sorted = levels(h).sorted.toArray
        val even = sorted.length - (sorted.length % 2)
        val offset = (flips % 2).toInt
        val kept = List.newBuilder[Double]
        var i = offset
        while (i < even) { kept += sorted(i); i += 2 }
        val leftover =
          if (even < sorted.length) List(sorted(sorted.length - 1))
          else List.empty[Double]
        if (h + 1 >= levels.length) levels = levels :+ List.empty[Double]
        levels = levels
          .updated(h, leftover)
          .updated(h + 1, kept.result() reverse_::: levels(h + 1))
        err += (1L << h)
        flips += 1
      }
      h += 1
    }
    s.copy(err = err, flips = flips, levels = levels)
  }

  def merge(a: QSketch, b: QSketch): QSketch = {
    require(a.k == b.k, s"cannot merge sketches with k=${a.k} vs ${b.k}")
    val depth = math.max(a.levels.length, b.levels.length)
    val levels = Vector.tabulate(depth) { h =>
      val la = if (h < a.levels.length) asList(a.levels(h)) else Nil
      val lb = if (h < b.levels.length) asList(b.levels(h)) else Nil
      la reverse_::: lb
    }
    compactAll(QSketch(a.k, a.n + b.n, a.err + b.err,
      a.flips + b.flips, levels))
  }

  /** Estimated count of items ≤ v: Σ_h 2^h · |{x ∈ level_h : x ≤ v}|.
    * |rankLE(v) − true #≤(v)| ≤ err for every v (the compaction
    * theorem above, summed over all compactions).
    */
  def rankLE(s: QSketch, v: Double): Long = {
    var total = 0L
    var h = 0
    while (h < s.levels.length) {
      val w = 1L << h
      s.levels(h).foreach(x => if (x <= v) total += w)
      h += 1
    }
    total
  }

  /** Weight of the heaviest stored item: consecutive stored items'
    * estimated ranks differ by at most this, so the best stored item's
    * estimated rank is within maxWeight of ANY target rank in [0, n].
    */
  def maxWeight(s: QSketch): Long = {
    var top = 0
    var h = 0
    while (h < s.levels.length) {
      if (s.levels(h).nonEmpty) top = h
      h += 1
    }
    1L << top
  }

  /** The stored item whose estimated rank is closest to p·n — always an
    * ORIGINAL data value (compaction only ever drops items), so its
    * exact rank interval is well-defined against the source table.
    */
  def quantile(s: QSketch, p: Double): Double = {
    require(s.n > 0, "quantile of an empty sketch")
    val items = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var h = 0
    while (h < s.levels.length) {
      val w = 1L << h
      s.levels(h).foreach(x => items += ((x, w)))
      h += 1
    }
    val sorted = items.sortBy(_._1)
    val target = p * s.n
    var cum = 0L
    var best = sorted.head._1
    var bestDist = Double.MaxValue
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      // cum at the LAST occurrence of a tied value is that value's
      // estRank; intermediate tied positions only underestimate it,
      // and the closest-overall scan still lands within maxWeight
      val d = math.abs(cum - target)
      if (d < bestDist) { bestDist = d; best = sorted(i)._1 }
      i += 1
    }
    best
  }

  /** The verdict bound B for [[quantile]]'s result: its TRUE rank
    * interval satisfies  trueRankLT + 1 ≤ target + B  and
    * trueRankLE ≥ target − B,  because |est − true| ≤ err (compaction
    * theorem) and |estRank(chosen) − target| ≤ maxWeight (the chosen
    * item is the closest of stored ranks that tile [0, n] in
    * ≤-maxWeight steps); +1 absorbs the lt/le edge. Deterministic —
    * the registered query emits the comparison as a boolean column.
    */
  def rankErrorBound(s: QSketch): Long = s.err + maxWeight(s) + 1L

  /** Mergeable quantile-sketch aggregator. Inputs must be non-null
    * (filter nulls upstream — a null primitive would arrive as 0.0 and
    * silently skew the distribution).
    */
  def qsketch(k: Int): Aggregator[Double, QSketch, QSketch] =
    new Aggregator[Double, QSketch, QSketch] {
      def zero: QSketch = empty(k)
      def reduce(b: QSketch, x: Double): QSketch = insert(b, x)
      def merge(a: QSketch, b: QSketch): QSketch =
        QuantileSketch.merge(a, b)
      def finish(r: QSketch): QSketch = r
      def bufferEncoder: Encoder[QSketch] = ExpressionEncoder[QSketch]()
      def outputEncoder: Encoder[QSketch] = ExpressionEncoder[QSketch]()
    }

  /** Column form: `df.agg(qsketchCol(col("v"), 1024).as("qs"))`. */
  def qsketchCol(c: Column, k: Int): Column = udaf(qsketch(k)).apply(c)
}
