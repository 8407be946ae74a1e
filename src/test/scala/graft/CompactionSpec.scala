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
