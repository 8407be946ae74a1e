package graft

import graft.functions.{QuantileSketch => QS, TDig, TDigest => TD}
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** t-digest properties (ROADMAP r13 #1): determinism under canonical
  * order, exact min/max bookkeeping, the rank-bracket theorem, the
  * δ-bounded centroid count, the maintained sink's merge/retry
  * contract, and the head-to-head against KLL on rank-error-per-byte
  * over a heavy-tailed distribution (the regime the t-digest's k1
  * scale function exists for).
  */
class TDigestSpec extends SparkTestBase {

  /** Deterministic heavy-tailed sample: exp(6u) − 1 over a hash-derived
    * uniform — spans ~4 orders of magnitude, the shape where uniform
    * rank accuracy (KLL) and relative tail accuracy (t-digest)
    * genuinely differ. */
  private def heavyTailed(n: Int): IndexedSeq[Double] =
    (1 to n).map { i =>
      val h = (i * 2654435761L) & 0xffffffffL
      val u = h.toDouble / 4294967296.0
      math.exp(6.0 * u) - 1.0
    }

  test("insert/compress is deterministic and keeps exact min/max") {
    val xs = heavyTailed(5000)
    def build() = xs.foldLeft(TD.empty(100))(TD.insert)
    val a = TD.compress(build())
    val b = TD.compress(build())
    assert(a == b, "same insertion order must reproduce bit-for-bit")
    assert(a.n == xs.length)
    assert(a.cents.map(_.lo).min == xs.min &&
      a.cents.map(_.hi).max == xs.max,
      "min/max bookkeeping must be exact")
    // every centroid's mean stays inside its own [lo, hi] (convexity)
    assert(a.cents.forall(c => c.lo <= c.m && c.m <= c.hi))
    // δ-bounded size: the k1 scale function admits at most ~2δ
    // clusters after a compress pass
    assert(a.cents.length <= 2 * a.delta,
      s"${a.cents.length} centroids exceeds the 2δ bound")
  }

  test("rank bracket is a theorem: L(v) <= trueRankLE(v) <= L(v)+B(v)") {
    val xs = heavyTailed(4000)
    val d = TD.compress(xs.foldLeft(TD.empty(100))(TD.insert))
    for (v <- Seq(0.5, 3.0, 20.0, 80.0, 250.0, xs.max)) {
      val lo = d.cents.filter(_.hi <= v).map(_.w).sum
      val hi = lo + TD.straddleWeight(d, v)
      val truth = xs.count(_ <= v)
      assert(lo <= truth && truth <= hi,
        s"bracket [$lo, $hi] misses true rank $truth at v=$v")
    }
  }

  test("verdict bound survives arbitrary merge splits") {
    val xs = heavyTailed(6000)
    // three different batchings of the same stream — contents differ,
    // the bracket verdict must hold for every one (the mergeability
    // claim the maintained row rests on)
    val splits = Seq(Seq(6000), Seq(3000, 3000), Seq(1000, 2500, 2500))
    for (split <- splits) {
      val parts = split.scanLeft(0)(_ + _).sliding(2).map {
        case Seq(a, b) => xs.slice(a, b)
      }.toSeq
      val d = parts.map(p =>
          TD.compress(p.foldLeft(TD.empty(200))(TD.insert)))
        .reduce(TD.merge)
      assert(d.n == xs.length)
      for (p <- Seq(0.5, 0.9, 0.99)) {
        val est = TD.quantile(d, p)
        val b = TD.rankErrorBound(d, est)
        val target = p * xs.length
        assert(xs.count(_ < est) + 1 <= target + b,
          s"split $split p=$p: rank bracket broken low")
        assert(xs.count(_ <= est) >= target - b,
          s"split $split p=$p: rank bracket broken high")
      }
    }
  }

  test("tdigestBatch: cross-batch merge keeps the verdict bound " +
      "against the whole prefix; retry is a marker-guarded no-op") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("td_maint")
    val statePath = tmp.resolve("td").toString
    val all = heavyTailed(6000).map(("g", _))
    val (h1, h2) = all.splitAt(3000)
    Streams.tdigestBatch(h1.toDF("k", "v"), "k", "v", statePath, 200, 0L)
    Streams.tdigestBatch(h2.toDF("k", "v"), "k", "v", statePath, 200, 1L)
    def state(): (String, TDig) =
      Streams.readGenMaintained(spark, statePath)
        .select("key", "td").as[(String, TDig)].head()
    val (key, merged) = state()
    assert(key == "g" && merged.n == all.length)
    val xs = all.map(_._2)
    for (p <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = TD.quantile(merged, p)
      val b = TD.rankErrorBound(merged, est)
      assert(xs.count(_ < est) + 1 <= p * xs.length + b)
      assert(xs.count(_ <= est) >= p * xs.length - b)
    }
    Streams.tdigestBatch(h2.toDF("k", "v"), "k", "v", statePath, 200, 1L)
    assert(state()._2 == merged,
      "retried batch re-merged into the t-digest state")
    assert(Streams.lastAppliedBatchGen(statePath).contains(1L))
  }

  test("generation-pointer publish: O(1) pointer flip, grace gen " +
      "retained, older GC'd, crash windows recover") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("td_gen")
    val statePath = tmp.resolve("td").toString
    def gens(): Set[Long] =
      Option(new java.io.File(statePath).listFiles())
        .getOrElse(Array.empty)
        .filter(_.getName.startsWith("gen="))
        .map(_.getName.stripPrefix("gen=").takeWhile(_.isDigit).toLong)
        .toSet
    def batch(vs: Seq[Double], id: Long): Unit =
      Streams.tdigestBatch(vs.map(("g", _)).toDF("k", "v"),
        "k", "v", statePath, 200, id)
    batch(Seq(1.0, 2.0), 0L)
    assert(Streams.currentGen(statePath).contains(0L) &&
      gens() == Set(0L))
    batch(Seq(3.0), 1L)
    // previous generation survives as the reader grace window
    assert(Streams.currentGen(statePath).contains(1L) &&
      gens() == Set(0L, 1L))
    batch(Seq(4.0), 2L)
    // gen 0 is now older than the grace window — GC'd
    assert(Streams.currentGen(statePath).contains(2L) &&
      gens() == Set(1L, 2L))
    def n(): Long = Streams.readGenMaintained(spark, statePath)
      .select("key", "td").as[(String, graft.functions.TDig)]
      .head()._2.n
    assert(n() == 4L)
    // crash window A: a gen dir written but the pointer never flipped
    // — the stale orphan must be invisible to readers; the retry
    // publishes its own uniquely-named gen dir (never touching the
    // orphan) and the orphan ages out of GC with its number
    val orphan = new java.io.File(s"$statePath/gen=3")
    orphan.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(orphan, "junk.txt").toPath, "stale".getBytes)
    assert(n() == 4L, "reader followed an uncommitted generation")
    batch(Seq(5.0), 3L)
    assert(Streams.currentGen(statePath).contains(3L) && n() == 5L,
      "retry must commit a fresh generation past the orphan")
    // crash window B: pointer flipped but old-gen GC never ran — the
    // next publish must clean up without touching the live state
    val stale = new java.io.File(s"$statePath/gen=0")
    stale.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(stale, "junk.txt").toPath, "stale".getBytes)
    batch(Seq(6.0), 4L)
    assert(gens() == Set(3L, 4L) && n() == 6L)
    // retry of a committed batch: marker read through the pointer
    batch(Seq(99.0), 4L)
    assert(n() == 6L && Streams.currentGen(statePath).contains(4L),
      "redelivered batch must be a pointer-guarded no-op")
  }

  test("netQuantile: paired-digest subtraction holds its bound under " +
      "heavy deletions; contract violations refuse") {
    val xs = heavyTailed(8000)
    // delete 30% — a deterministic but value-skewed subset (every 10th
    // and any value > 100), so the net median genuinely moves
    val dels = xs.zipWithIndex.collect {
      case (v, i) if i % 10 == 0 || v > 100.0 => v
    }
    val net = {
      val d = scala.collection.mutable.Map.empty[Double, Int]
      dels.foreach(v => d(v) = d.getOrElse(v, 0) + 1)
      xs.filter { v =>
        val c = d.getOrElse(v, 0)
        if (c > 0) { d(v) = c - 1; false } else true
      }
    }
    val ti = TD.compress(xs.foldLeft(TD.empty(200))(TD.insert))
    val td = TD.compress(dels.foldLeft(TD.empty(200))(TD.insert))
    assert(net.nonEmpty && dels.nonEmpty)
    for (p <- Seq(0.25, 0.5, 0.9)) {
      val (est, b) = TD.netQuantile(ti, td, p)
      val target = p * net.length
      assert(net.count(_ < est) + 1 <= target + b,
        s"p=$p: net bracket broken low (bound $b)")
      assert(net.count(_ <= est) >= target - b,
        s"p=$p: net bracket broken high (bound $b)")
      // the bound must stay a useful fraction of n, not a vacuous one
      assert(b < net.length / 2, s"p=$p: bound $b is vacuous")
    }
    // net-empty key: the disclosed contract must refuse loudly
    val ex = intercept[IllegalArgumentException] {
      TD.netQuantile(td, td, 0.5)
    }
    assert(ex.getMessage.contains("contract"))
  }

  test("tdigestSignedBatch: cross-batch paired merge; retry no-op") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("tds_maint")
    val statePath = tmp.resolve("tds").toString
    val xs = heavyTailed(4000)
    val (h1, h2) = xs.splitAt(2000)
    // batch 2 deletes every 5th batch-1 value
    val dels = h1.zipWithIndex.collect { case (v, i) if i % 5 == 0 => v }
    val b1 = h1.map(("g", _, 1)).toDF("k", "v", "sign")
    val b2 = (h2.map(("g", _, 1)) ++ dels.map(("g", _, -1)))
      .toDF("k", "v", "sign")
    Streams.tdigestSignedBatch(b1, "k", "v", statePath, 200, 0L)
    Streams.tdigestSignedBatch(b2, "k", "v", statePath, 200, 1L)
    def state() = Streams.readGenMaintained(spark, statePath)
      .select("key", "ti", "td").as[(String, TDig, TDig)].head()
    val (_, ti, td) = state()
    assert(ti.n == 4000L && td.n == dels.length.toLong)
    val netSet = {
      val d = scala.collection.mutable.Map.empty[Double, Int]
      dels.foreach(v => d(v) = d.getOrElse(v, 0) + 1)
      xs.filter { v =>
        val c = d.getOrElse(v, 0)
        if (c > 0) { d(v) = c - 1; false } else true
      }
    }
    val (est, b) = TD.netQuantile(ti, td, 0.5)
    assert(netSet.count(_ < est) + 1 <= 0.5 * netSet.length + b)
    assert(netSet.count(_ <= est) >= 0.5 * netSet.length - b)
    Streams.tdigestSignedBatch(b2, "k", "v", statePath, 200, 1L)
    assert(state() == (("g", ti, td)),
      "retried batch re-merged into the signed digest state")
  }

  test("head-to-head vs KLL: rank-error-per-byte on a heavy tail") {
    // The ROADMAP r13 #1 measurement, run over the same two-batch
    // split both maintained sinks would see. Hard assertions stay on
    // structure (sizes, own-bound compliance — already proven above);
    // the accuracy table is measured and disclosed via info(), because
    // which summary wins depends on the quantile: KLL's guarantee is
    // uniform in rank, the t-digest concentrates capacity in the
    // tails.
    val xs = heavyTailed(20000)
    val (h1, h2) = xs.splitAt(10000)
    val td = TD.merge(
      TD.compress(h1.foldLeft(TD.empty(200))(TD.insert)),
      TD.compress(h2.foldLeft(TD.empty(200))(TD.insert)))
    val kll = QS.merge(
      h1.foldLeft(QS.empty(1024))(QS.insert),
      h2.foldLeft(QS.empty(1024))(QS.insert))
    val tdBytes = TD.sizeBytes(td)
    val kllBytes = 8L * kll.levels.map(_.length).sum
    val sorted = xs.sorted
    def rankErr(est: Double, p: Double): Double =
      math.abs(sorted.count(_ <= est) - p * xs.length)
    val rows = for (p <- Seq(0.5, 0.9, 0.99, 0.999)) yield {
      val te = rankErr(TD.quantile(td, p), p)
      val ke = rankErr(QS.quantile(kll, p), p)
      info(f"p=$p%5s  tdigest err=$te%6.1f (${te / tdBytes}%.4f/B)" +
        f"  kll err=$ke%6.1f (${ke / kllBytes}%.4f/B)")
      (p, te, ke)
    }
    info(s"bytes: tdigest=$tdBytes kll=$kllBytes")
    // the t-digest must deliver its design point: at the extreme tail
    // its ABSOLUTE rank error stays small (clusters are O(1) wide
    // there), and its state is materially smaller than KLL's
    assert(tdBytes < kllBytes,
      s"t-digest state ($tdBytes B) should undercut KLL ($kllBytes B)")
    val p999err = rows.last._2
    assert(p999err <= 40.0,
      s"p=0.999 rank error $p999err exceeds the tail-accuracy regime " +
        "(~0.2% of n) the scale function promises")
  }
}
