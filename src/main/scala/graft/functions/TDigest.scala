package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One t-digest centroid: mean/weight plus the EXACT min/max of the
  * values it absorbed. The min/max bookkeeping is what makes the digest
  * verdict-checkable: a centroid's members all lie in [lo, hi], so the
  * true rank of any query value v brackets between the full weight of
  * centroids with hi ≤ v and that plus the weight of centroids
  * straddling v — a deterministic statement independent of how means
  * drifted under merging. */
case class TCent(m: Double, w: Long, lo: Double, hi: Double)

/** Mergeable t-digest (Dunning & Ertl, "Computing Extremely Accurate
  * Quantiles Using t-Digests", arXiv:1902.04023) with the k1 scale
  * function: a compression pass sorts centroids by mean and greedily
  * merges neighbours while the merged cluster's k-size
  * k(q_r) − k(q_l) ≤ 1, where k(q) = δ/(2π)·asin(2q−1) — clusters stay
  * O(n/δ) wide mid-distribution and O(1) wide at the tails, which is
  * the t-digest's point: relative (tail) accuracy, vs KLL's uniform
  * rank accuracy ([[QuantileSketch]]; ROADMAP r13 #1 asks for the
  * head-to-head, which TDigestSpec measures as rank-error-per-byte).
  *
  * Determinism: the compress pass runs over centroids sorted by
  * (m, w, lo, hi) — a canonical order — so insert/merge sequences
  * reproduce bit-for-bit over the same partition order. Contents ARE
  * merge-tree-dependent (like MG/CM/KLL); only the bracket guarantee
  * below is hash-checkable.
  *
  * Accuracy: unlike KLL's self-accounted `err` (a worst-case theorem),
  * t-digest accuracy is EMPIRICAL by design. What the min/max
  * bookkeeping gives deterministically is the rank BRACKET: for any v,
  *   Σ_{c: hi_c ≤ v} w_c ≤ trueRankLE(v) ≤ Σ_{c: lo_c ≤ v} w_c.
  * The registered verdict checks the quantile estimate's exact rank
  * against target ± (straddle weight + max cluster weight + 1) — tight
  * while clusters stay locally ordered (the healthy regime; measured
  * with large margin in TDigestSpec), and a digest regression that
  * scrambles ordering inflates the straddle or breaks the check.
  */
case class TDig(delta: Int, n: Long, cents: Seq[TCent])

object TDigest {

  /** Insert buffer cap as a multiple of δ: compression amortizes to
    * O(log) per insert while the buffer stays small enough that the
    * greedy pass (O(b log b)) is cheap. */
  private val BufMult = 8

  def empty(delta: Int): TDig = {
    require(delta >= 20, s"t-digest needs delta >= 20, got $delta")
    TDig(delta, 0L, Vector.empty)
  }

  def insert(d: TDig, v: Double): TDig = {
    val grown = d.copy(n = d.n + 1,
      cents = d.cents :+ TCent(v, 1L, v, v))
    if (grown.cents.length >= BufMult * d.delta) compress(grown)
    else grown
  }

  def merge(a: TDig, b: TDig): TDig = {
    require(a.delta == b.delta,
      s"cannot merge digests with delta=${a.delta} vs ${b.delta}")
    compress(TDig(a.delta, a.n + b.n, a.cents ++ b.cents))
  }

  /** The k1 scale function. q is clamped to [0,1] against float drift
    * in the cumulative-weight quotient. */
  private def kOf(delta: Int, q: Double): Double = {
    val qc = math.min(1.0, math.max(0.0, q))
    delta / (2.0 * math.Pi) * math.asin(2.0 * qc - 1.0)
  }

  /** One merging pass over the canonically-sorted centroid list: join
    * neighbours while the merged cluster spans ≤ 1 unit of k-space.
    * Weighted means stay inside [lo, hi] (convexity); min/max merge
    * exactly. */
  def compress(d: TDig): TDig = {
    if (d.cents.length <= 1) return d
    val sorted = d.cents.sortBy(c => (c.m, c.w, c.lo, c.hi))
    val out = Vector.newBuilder[TCent]
    var cur = sorted.head
    var cumBefore = 0L
    val n = d.n.toDouble
    var i = 1
    while (i < sorted.length) {
      val c = sorted(i)
      val qL = cumBefore / n
      val qR = (cumBefore + cur.w + c.w) / n
      if (kOf(d.delta, qR) - kOf(d.delta, qL) <= 1.0) {
        val w = cur.w + c.w
        cur = TCent(
          (cur.m * cur.w + c.m * c.w) / w, w,
          math.min(cur.lo, c.lo), math.max(cur.hi, c.hi))
      } else {
        out += cur
        cumBefore += cur.w
        cur = c
      }
      i += 1
    }
    out += cur
    d.copy(cents = out.result())
  }

  /** Quantile estimate: piecewise-linear interpolation between centroid
    * means at their mid-rank positions (the classic t-digest read),
    * clamped to the digest's global [lo, hi]. */
  def quantile(d: TDig, p: Double): Double = {
    require(d.n > 0, "quantile of an empty digest")
    val cs = d.cents.sortBy(c => (c.m, c.w)).toArray
    val target = p * d.n
    var cum = 0L
    var prevMid = 0.0
    var prevMean = cs.head.lo
    var i = 0
    while (i < cs.length) {
      val mid = cum + cs(i).w / 2.0
      if (target <= mid) {
        val span = mid - prevMid
        return if (span <= 0) cs(i).m
        else prevMean + (cs(i).m - prevMean) * (target - prevMid) / span
      }
      prevMid = mid; prevMean = cs(i).m
      cum += cs(i).w
      i += 1
    }
    cs.last.hi
  }

  /** Total weight of centroids whose [lo, hi] straddles v — the
    * deterministic width of v's true-rank bracket. */
  def straddleWeight(d: TDig, v: Double): Long =
    d.cents.iterator.filter(c => c.lo <= v && v <= c.hi).map(_.w).sum

  def maxWeight(d: TDig): Long =
    if (d.cents.isEmpty) 0L else d.cents.iterator.map(_.w).max

  /** The verdict bound for [[quantile]]'s estimate: straddle bracket
    * width at the estimate, plus one max-cluster interpolation step,
    * plus the lt/le edge. */
  def rankErrorBound(d: TDig, est: Double): Long =
    straddleWeight(d, est) + maxWeight(d) + 1L

  /** Serialized size in bytes under the state parquet's layout — the
    * denominator of TDigestSpec's rank-error-per-byte comparison:
    * 4 doubles/longs per centroid. */
  def sizeBytes(d: TDig): Long = 32L * d.cents.length

  /** Midpoint rank estimator from the deterministic bracket:
    * below-weight + straddle/2. The bracket THEOREM says the true
    * rankLE sits within straddle/2 of this value. */
  def estRankLE(d: TDig, v: Double): Double =
    d.cents.iterator.filter(_.hi <= v).map(_.w).sum +
      straddleWeight(d, v) / 2.0

  /** Quantile under DELETIONS from a paired insert/delete digest
    * (ROADMAP r14 #4, landed r13): deletions cannot flow through
    * centroids (means are lossy), but a SECOND digest of the deleted
    * multiset subtracts at read time — net rankLE(v) = rankLE_ins(v)
    * − rankLE_del(v), and since each side brackets within its own
    * straddle, the net true rank sits within (straddleᵢ+straddle_d)/2
    * of the midpoint estimate (a theorem, from the two per-side
    * bracket theorems). The estimate scans the insert digest's
    * centroid means (deleted values are a subset of inserted ones, so
    * the means grid still tiles the net distribution) for the one
    * whose estimated net rank is closest to p·n_net, ties to the
    * smaller value. Returned bound = (straddleᵢ+straddle_d)/2 + one
    * max-cluster interpolation step per digest + 1 — deterministic
    * from state; the grid-step term is the same locally-ordered
    * heuristic as [[rankErrorBound]], measured in TDigestSpec.
    * CONTRACT (disclosed, the minmaxMaintain posture): the delete
    * stream must be a multiset subset of the insert stream; the
    * require refuses a net-empty or net-negative key. */
  def netQuantile(ins: TDig, del: TDig, p: Double): (Double, Long) = {
    val nNet = ins.n - del.n
    require(nNet > 0,
      s"netQuantile: deletions (${del.n}) must leave a non-empty net " +
        s"of inserts (${ins.n}) — delete stream exceeded its contract")
    val target = p * nNet
    val cands = ins.cents.map(_.m).distinct.sorted
    var best = cands.head
    var bestDist = Double.MaxValue
    for (v <- cands) {
      val r = estRankLE(ins, v) - estRankLE(del, v)
      val dd = math.abs(r - target)
      if (dd < bestDist) { bestDist = dd; best = v }
    }
    val bound = (straddleWeight(ins, best) + straddleWeight(del, best)
      + 1L) / 2L + maxWeight(ins) + maxWeight(del) + 1L
    (best, bound)
  }

  def tdigest(delta: Int): Aggregator[Double, TDig, TDig] =
    new Aggregator[Double, TDig, TDig] {
      def zero: TDig = empty(delta)
      def reduce(b: TDig, x: Double): TDig = insert(b, x)
      def merge(a: TDig, b: TDig): TDig = TDigest.merge(a, b)
      def finish(r: TDig): TDig = compress(r)
      def bufferEncoder: Encoder[TDig] = ExpressionEncoder[TDig]()
      def outputEncoder: Encoder[TDig] = ExpressionEncoder[TDig]()
    }

  /** Column form: `df.agg(tdigestCol(col("v"), 200).as("td"))`. */
  def tdigestCol(c: Column, delta: Int): Column = udaf(tdigest(delta)).apply(c)
}
