package graft

import org.apache.spark.sql.functions._

/** Semantics of the j_bloom prefilter (the explicit runtime-filter
  * lever): the sketch may pass extra rows (bounded false positives the
  * exact join removes) but must NEVER drop a truly-joining row — a
  * false negative would silently lose result rows at any scale.
  */
class BloomJoinSpec extends SparkTestBase {

  test("bloom prefilter: no false negatives, bounded passthrough") {
    val d = "/root/testdata/sf0.01"
    val dim = etl.Tables.load(spark, d, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 250000)
      .select(col("o_orderkey"))
    val bf = dim.stat.bloomFilter("o_orderkey", 2000, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val fact = etl.Tables.load(spark, d, "lineitem")
    val pre = fact.filter(org.apache.spark.sql.graftshim.BloomFilters
      .mightContain(bos.toByteArray, col("l_orderkey")))
    val exact = fact.join(dim,
      fact("l_orderkey") === dim("o_orderkey"), "left_semi")
    // no false negatives: every truly-joining row survives the prefilter
    assert(exact.exceptAll(pre).count() == 0,
      "bloom prefilter dropped truly-joining rows")
    val nPre = pre.count()
    val nExact = exact.count()
    val nFact = fact.count()
    // superset of the exact semi-join, and selective enough to matter
    assert(nPre >= nExact)
    assert(nPre < nFact / 4,
      s"prefilter not selective: passed $nPre of $nFact fact rows")
  }
}
