package graft

import graft.functions.{QSketch, QuantileSketch => QS}

import org.scalatest.funsuite.AnyFunSuite

/** The quantile sketch's guarantees are deterministic theorems (the
  * self-accounted `err` bound, the maxWeight selection resolution) —
  * so they are asserted EXACTLY here, not statistically: every check
  * compares against brute-force ranks over the raw data.
  */
class QuantileSketchSpec extends AnyFunSuite {

  private def trueLE(xs: Seq[Double], v: Double): Long =
    xs.count(_ <= v).toLong
  private def trueLT(xs: Seq[Double], v: Double): Long =
    xs.count(_ < v).toLong

  private def build(k: Int, xs: Seq[Double]): QSketch =
    xs.foldLeft(QS.empty(k))(QS.insert)

  private def checkErrBound(s: QSketch, xs: Seq[Double]): Unit = {
    assert(s.n == xs.length)
    // check at every decile plus the extremes — est rank within err
    val probes = (xs.min - 1.0) +: (xs.max + 1.0) +:
      (0 to 10).map(i => xs.sorted.apply(
        math.min(xs.length - 1, i * (xs.length - 1) / 10)))
    for (v <- probes) {
      val est = QS.rankLE(s, v)
      val truth = trueLE(xs, v)
      assert(math.abs(est - truth) <= s.err,
        s"rankLE($v)=$est vs true=$truth exceeds err=${s.err}")
    }
  }

  test("small input (n < k) stays exact: err 0, every rank exact") {
    val xs = Seq(5.0, 1.0, 3.0, 2.0, 4.0)
    val s = build(64, xs)
    assert(s.err == 0L)
    for (v <- xs) assert(QS.rankLE(s, v) == trueLE(xs, v))
    // target rank 2.5 sits between the rank-2 and rank-3 items — both
    // are exact medians of an even-distance tie
    assert(Set(2.0, 3.0).contains(QS.quantile(s, 0.5)))
  }

  test("err bounds the rank error after many compactions " +
      "(shuffled, sorted, and reversed insert orders)") {
    val base = (1 to 20000).map(_.toDouble)
    val rnd = new scala.util.Random(42)
    for (xs <- Seq(rnd.shuffle(base), base, base.reverse)) {
      val s = build(128, xs)
      assert(s.err > 0, "20k inserts at k=128 must have compacted")
      // the bound must also be NONTRIVIAL — well under n
      assert(s.err < s.n / 4,
        s"err=${s.err} is a useless bound for n=${s.n}")
      checkErrBound(s, xs)
    }
  }

  test("merge: any split reproduces the guarantee; n and err add") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(9000)(rnd.nextDouble() * 1000)
    val (a, rest) = xs.splitAt(2000)
    val (b, c) = rest.splitAt(3000)
    val parts = Seq(a, b, c).map(build(128, _))
    val left = QS.merge(QS.merge(parts(0), parts(1)), parts(2))
    val right = QS.merge(parts(0), QS.merge(parts(1), parts(2)))
    for (m <- Seq(left, right)) {
      assert(m.n == xs.length)
      checkErrBound(m, xs)
    }
  }

  test("quantile verdict theorem: true rank interval of the estimate " +
      "intersects target ± rankErrorBound, any p") {
    val rnd = new scala.util.Random(99)
    // heavy ties on purpose — the lt/le edge the +1 in the bound covers
    val xs = Seq.fill(15000)((rnd.nextInt(50) + 1).toDouble)
    val s = build(128, xs)
    for (p <- Seq(0.1, 0.25, 0.5, 0.9, 0.99)) {
      val ap = s.levels.flatten // estimate must be an ORIGINAL value
      assert(ap.contains(QS.quantile(s, p)))
      val est = QS.quantile(s, p)
      val b = QS.rankErrorBound(s)
      val target = p * s.n
      assert(trueLT(xs, est) + 1 <= target + b,
        s"p=$p: lt-rank ${trueLT(xs, est)} too high for target $target")
      assert(trueLE(xs, est) >= target - b,
        s"p=$p: le-rank ${trueLE(xs, est)} too low for target $target")
    }
  }

  test("determinism: same insert order gives bit-identical state") {
    val xs = new scala.util.Random(3).shuffle((1 to 5000).map(_.toDouble))
    assert(build(64, xs) == build(64, xs))
  }
}
