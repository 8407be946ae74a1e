package graft

import org.apache.spark.sql.functions._

/** Sorted-layout row-group pruning, proven from the written parquet
  * footers themselves: after `Load.writeSorted` on a column, the
  * per-row-group [min, max] statistics are near-disjoint, so a narrow
  * range predicate overlaps only a few groups — the footer-level
  * analogue of partition pruning, and the property the scan's
  * row-group skipping actually consumes. An unsorted write of the SAME
  * rows leaves every group spanning nearly the full value range, so
  * nothing can prune.
  */
class LayoutSpec extends SparkTestBase {

  import scala.jdk.CollectionConverters._

  /** (min, max) of `column` for every row group under `dir`, read from
    * the parquet footers — zero Spark jobs, exactly what the reader's
    * filter-pushdown consults.
    */
  private def rowGroupRanges(dir: String,
      column: String): Seq[(Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val it = p.getFileSystem(conf).listFiles(p, true)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.endsWith(".parquet")) {
        val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(st.getPath, conf))
        try {
          rdr.getFooter.getBlocks.forEach { b =>
            val c = b.getColumns.asScala
              .find(_.getPath.toDotString == column).get
            val s = c.getStatistics
            out += ((s.genericGetMin.asInstanceOf[Number].longValue(),
              s.genericGetMax.asInstanceOf[Number].longValue()))
          }
        } finally rdr.close()
      }
    }
    out.toSeq
  }

  test("writeSorted yields near-disjoint row-group ranges that prune") {
    val ev = etl.Tables.load(spark, "/root/testdata/sf0.01", "events")
    val base = java.nio.file.Files.createTempDirectory("graft-layout")
      .toString
    val sorted = base + "/sorted"
    val unsorted = base + "/unsorted"
    etl.Load.writeSorted(ev, sorted, "event_id", partitions = 8)
    ev.repartition(8).write.mode("overwrite").parquet(unsorted)

    val sortedRg = rowGroupRanges(sorted, "event_id")
    val unsortedRg = rowGroupRanges(unsorted, "event_id")
    assert(sortedRg.size >= 8 && unsortedRg.size >= 8)

    // a narrow id range in the middle of the domain (~1% of rows)
    val ids = ev.agg(min("event_id"), max("event_id")).head()
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val qLo = lo + (hi - lo) / 2
    val qHi = qLo + (hi - lo) / 100
    def overlapping(rgs: Seq[(Long, Long)]): Int =
      rgs.count { case (mn, mx) => mx >= qLo && mn <= qHi }

    // sorted: global range partitioning makes group ranges near-disjoint
    // → the 1% query touches a small fraction of groups. unsorted:
    // round-robin spreads the domain over every group → zero pruning.
    assert(overlapping(unsortedRg) == unsortedRg.size,
      "unsorted layout should have no prunable row groups for this query")
    assert(overlapping(sortedRg) * 4 <= sortedRg.size,
      s"sorted layout should prune most groups: " +
        s"${overlapping(sortedRg)} of ${sortedRg.size} overlap")

    // and the layout is lossless
    assert(spark.read.parquet(sorted).count() == ev.count())
    assert(spark.read.parquet(sorted).exceptAll(ev).count() == 0)

    // EXECUTED proof, not just footer math: run the same range query
    // against both layouts and read the FileSourceScan's numOutputRows
    // metric — rows the scan actually produced AFTER row-group skipping
    // (the pushed predicate prunes groups whose [min,max] miss the
    // range). Sorted: only the overlapping groups' rows come out.
    // Unsorted: every group overlaps, so the scan emits ~all rows and
    // the post-scan Filter does all the work.
    def scannedRows(path: String): Long = {
      val df = spark.read.parquet(path)
        .filter(col("event_id") >= qLo && col("event_id") <= qHi)
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scan = plan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scan.nonEmpty, "expected a FileSourceScan leaf")
      scan.get.metrics("numOutputRows").value
    }
    val sortedScan = scannedRows(sorted)
    val unsortedScan = scannedRows(unsorted)
    assert(sortedScan * 2 <= unsortedScan,
      s"sorted layout should scan far fewer rows: $sortedScan vs " +
        s"$unsortedScan")
  }

  test("zInterleave matches a reference Morton encoding") {
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
      }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 7L))
    val s = spark
    import s.implicits._
    val got = cases.toDF("a", "b")
      .select(etl.Load.zInterleave(col("a"), col("b"), 16).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == cases.map { case (a, b) => ref(a, b, 16) })
  }

  test("writeZOrdered prunes BOTH dimensions from one copy") {
    val ev = etl.Tables.load(spark, "/root/testdata/sf0.01", "events")
      .select("event_id", "user_id", "event_type", "ts")
    val base = java.nio.file.Files.createTempDirectory("graft-zorder")
      .toString
    val z = base + "/z"
    val un = base + "/un"
    etl.Load.writeZOrdered(ev, z, "user_id", "ts", partitions = 16)
    // baseline also writes micros (stats-bearing) timestamps, so the
    // contrast below is purely about row ORDER, not stats presence
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val prevTs = spark.conf.getOption(tsKey)
    spark.conf.set(tsKey, "TIMESTAMP_MICROS")
    try ev.repartition(16).write.mode("overwrite").parquet(un)
    finally prevTs match {
      case Some(v) => spark.conf.set(tsKey, v)
      case None => spark.conf.unset(tsKey)
    }

    // single-dimension probes: a narrow slice of EACH column must prune
    // on the z layout (no layout sorted on one column can do both).
    // Probe windows DERIVE from the data's min/max (a ~7% and ~10%
    // interior slice) — hardcoded ids/dates break when the driver
    // regenerates testdata with a different seed or calendar
    def range(c: String): (Long, Long) = {
      val r = ev.agg(min(unix_micros(col("ts"))),
        max(unix_micros(col("ts"))), min(col(c)), max(col(c))).head()
      if (c == "ts") (r.getLong(0), r.getLong(1))
      else (r.getLong(2), r.getLong(3))
    }
    def slice(c: String, fromPct: Long, toPct: Long): (String, Long, Long) = {
      val (mn, mx) = range(c)
      (c, mn + (mx - mn) * fromPct / 100, mn + (mx - mn) * toPct / 100)
    }
    val probes = Seq(slice("user_id", 6, 13), slice("ts", 40, 50))
    for ((c, lo, hi) <- probes) {
      val zRg = rowGroupRanges(z, c)
      val unRg = rowGroupRanges(un, c)
      def overlapping(rgs: Seq[(Long, Long)]): Int =
        rgs.count { case (mn, mx) => mx >= lo && mn <= hi }
      assert(overlapping(unRg) == unRg.size,
        s"unsorted layout should have no prunable groups for $c")
      assert(overlapping(zRg) * 2 <= zRg.size,
        s"z layout should prune most groups for $c: " +
          s"${overlapping(zRg)} of ${zRg.size} overlap")
    }

    // and the layout is lossless
    assert(spark.read.parquet(z).count() == ev.count())
    assert(spark.read.parquet(z).exceptAll(ev).count() == 0)
  }
}
