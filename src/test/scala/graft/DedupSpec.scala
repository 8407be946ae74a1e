package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Connected-components convergence: the r1 bounded 4-round propagation
  * silently split components of diameter > 4; the fixpoint version must
  * label ANY component by its min node id, path graphs included.
  */
class DedupSpec extends SparkTestBase {

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    Dedup.connectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("path graph of diameter 9 converges to one component") {
    // 10-2=8 edges chained: 1-2-3-...-10 (diameter 9 > any fixed bound)
    val path = (1L until 10L).map(i => (i, i + 1))
    val labels = cc(path)
    assert(labels.size == 10)
    assert(labels.values.toSet == Set(1L), s"split labels: $labels")
  }

  test("mixed graph: chain + clique + pair, each labeled by its min id") {
    val chain = (20L until 27L).map(i => (i, i + 1)) // 20..27, diam 7
    val clique = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val pair = Seq((100L, 101L))
    val labels = cc(chain ++ clique ++ pair)
    assert((20L to 27L).forall(labels(_) == 20L))
    assert((1L to 3L).forall(labels(_) == 1L))
    assert(labels(100L) == 100L && labels(101L) == 100L)
  }

  test("random graph matches driver-side union-find") {
    // deterministic pseudo-random edges over 60 nodes
    val edges = (0 until 80).map { i =>
      val a = (i * 7919L) % 60
      val b = (i * 104729L + 13) % 60
      (math.min(a, b) + 1, math.max(a, b) + 1)
    }.filter { case (a, b) => a != b }.distinct
    // reference union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(n => n -> find(n)).toMap
    assert(cc(edges) == want)
  }
}
