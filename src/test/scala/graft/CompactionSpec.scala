package graft

import org.apache.spark.sql.functions._

/** Small-file compaction + AQE skew handling — the two operational
  * levers PLANS.md claims; proven here rather than asserted.
  */
class CompactionSpec extends SparkTestBase {

  test("compact rewrites a many-tiny-files table into few sized files") {
    val ev = etl.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val in = java.nio.file.Files.createTempDirectory("graft-tiny")
      .toString
    // simulate streaming accretion: 64 tiny files
    ev.repartition(64).write.mode("overwrite").parquet(in)
    val tinyCount = new java.io.File(in).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(tinyCount == 64)
    val out = in + "_compacted"
    etl.Load.compact(spark, in, out, targetMB = 128)
    val bigCount = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(bigCount < tinyCount / 8,
      s"compaction left $bigCount files from $tinyCount")
    // lossless
    val back = spark.read.parquet(out)
    assert(back.count() == ev.count())
    assert(back.exceptAll(ev).count() == 0)
  }

  test("compact sizes a hive-partitioned layout recursively (not flat)") {
    // Locks the r4 rewrite: sizing walks the Hadoop FS RECURSIVELY, so a
    // hive-partitioned input (all .parquet files live under
    // event_type=... subdirectories — the top level has none) still
    // counts its bytes. The pre-fix java.io.File sizing saw zero files
    // at the top level -> bytes=0 -> everything into ONE file; with
    // enough input bytes and targetMB=1, a multi-file output proves the
    // subdirectory bytes were actually seen.
    val ev = etl.Tables.load(spark, "/root/testdata/sf0.01", "events")
    val big = (1 to 32).map(_ => ev).reduce(_ union _)
    val in = java.nio.file.Files.createTempDirectory("graft-part").toString
    big.repartition(8).write.mode("overwrite")
      .partitionBy("event_type").parquet(in)
    val top = new java.io.File(in).listFiles()
    assert(top.exists(f => f.isDirectory &&
      f.getName.startsWith("event_type=")), "expected hive layout")
    assert(!top.exists(_.getName.endsWith(".parquet")),
      "hive layout must hold parquet only under partition dirs")
    def parquetFiles(dir: java.io.File): Int = {
      val fs = Option(dir.listFiles()).getOrElse(Array.empty)
      fs.count(_.getName.endsWith(".parquet")) +
        fs.filter(_.isDirectory).map(parquetFiles).sum
    }
    val tinyCount = parquetFiles(new java.io.File(in))
    assert(tinyCount >= 8 * 5, s"expected tiny files per partition dir," +
      s" got $tinyCount")
    val out = in + "_compacted"
    etl.Load.compact(spark, in, out, targetMB = 1)
    val bigCount = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(bigCount >= 2,
      "recursive sizing must see partition-subdir bytes (flat sizing " +
        s"collapses to 1 file); got $bigCount")
    assert(bigCount < tinyCount / 4,
      s"compaction left $bigCount files from $tinyCount")
    // lossless, INCLUDING the partition column the read re-attaches
    val back = spark.read.parquet(out)
    assert(back.count() == big.count())
    assert(back.select(big.columns.map(col): _*).exceptAll(big)
      .count() == 0)
  }

  test("streaming ingest -> compacted sorted layout (foreachBatch maintenance)") {
    // Closes the loop between the streaming surface and the layout
    // levers: per-trigger foreachBatch writes accrete tiny files (the
    // real shape of streaming ingest), then ONE maintenance pass rewrites
    // them via Load.writeSorted into the query-optimized layout — few
    // files, globally range-partitioned and sorted on ts, so time-range
    // scans prune. This is the nightly job every 100 TB streaming table
    // runs; here each stage is asserted.
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-compact")
    val src = tmp.resolve("src"); java.nio.file.Files.createDirectory(src)
    for (n <- 1 to 2)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        src.resolve(s"events_$n.parquet"))
    val ingest = tmp.resolve("ingest").toString
    val tsDiv = etl.Tables.eventsTsDivisor(spark, dir)
    val stream = spark.readStream.schema(etl.Tables.eventsRaw)
      .option("maxFilesPerTrigger", 1).parquet(src.toString)
      .withColumn("ts", expr(s"timestamp_micros(ts DIV $tsDiv)"))
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.repartition(8).write.mode("append").parquet(ingest); ()
      }
      .option("checkpointLocation", tmp.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val tinyCount = new java.io.File(ingest).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(tinyCount == 16, s"expected 2 triggers x 8 files, got $tinyCount")

    // maintenance pass: tiny unsorted ingest files -> few sorted files
    val sorted = tmp.resolve("sorted").toString
    etl.Load.writeSorted(spark.read.parquet(ingest), sorted, "ts",
      partitions = 8)
    val sortedCount = new java.io.File(sorted).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(sortedCount == 8, s"got $sortedCount files")

    // lossless across the whole pipeline (2 copies of events)
    val back = spark.read.parquet(sorted)
    val ev = etl.Tables.load(spark, dir, "events")
    assert(back.count() == 2 * ev.count())
    assert(back.exceptAll(ev.union(ev)).count() == 0)

    // and the layout actually prunes: a ~1% time window's executed scan
    // emits a small fraction of rows (row-group skip on the pushed ts
    // range — requires the TIMESTAMP_MICROS stats writeSorted forces)
    // ~1% interior window derived from the data's own time range — a
    // hardcoded date breaks when the driver regenerates the calendar
    val mm = ev.agg(min(unix_micros(col("ts"))),
      max(unix_micros(col("ts")))).head()
    val lo = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) * 45 / 100
    val hi = lo + (mm.getLong(1) - mm.getLong(0)) / 90
    val ranged = back
      .filter(col("ts") >= expr(s"timestamp_micros(${lo}L)") &&
        col("ts") < expr(s"timestamp_micros(${hi}L)"))
    ranged.collect()
    val scan = ranged.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
    assert(scan.nonEmpty)
    // the ~1% window may straddle a range-partition boundary (boundaries
    // come from sampling), so allow up to 2 of the 8 files' worth
    val scanned = scan.get.metrics("numOutputRows").value
    assert(scanned * 3 <= 2 * ev.count(),
      s"sorted maintenance layout should prune: scanned $scanned")
  }

  test("AQE splits a skewed join at runtime (OptimizeSkewedJoin)") {
    import spark.implicits._
    // one key holds ~95% of the left side — the classic hot-key join
    val left = spark.range(0, 200000)
      .select(when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id"))
        .as("k"), col("id").as("v"))
    val right = spark.range(0, 100).select(col("id").as("k"),
      (col("id") * 2).as("w"))
    val prev = (
      spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      spark.conf.get(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"))
    // lower the thresholds so the tiny test dataset qualifies as skewed,
    // and disable broadcast so a shuffle join actually happens
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "64KB")
    try {
      val joined = left.join(right, "k")
      // 190000 rows with k=7 (matching right's single key-7 row) plus the
      // 5 ids divisible by 20 that fall inside right's 0..99 key range.
      // collect() (not count()) so THIS QueryExecution runs and its
      // AdaptiveSparkPlan finalizes — count() plans a separate query.
      assert(joined.collect().length == 190005)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(300))
      assert(plan.toLowerCase.contains("skew"),
        s"AQE did not mark the skewed join:\n${plan.take(1200)}")
    } finally {
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor", prev._1)
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        prev._2)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev._3)
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        prev._4)
    }
  }
}
