package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main for the m_decode_real drift question (r9 verdict item
  * 5): splits the query's wall time into its two executor-side cost
  * centers — PNG SYNTHESIS (ImageIO.write of the deterministic
  * solid-color payloads) vs PNG DECODE + feature fold (ImageIO.read) —
  * by timing (A) the synthesis-only prefix of the exact pipeline and
  * (B) the full registered query, interleaved A,B,A,B,... for 2×6
  * passes so JIT/plugin-registry warm-up and any monotonic drift are
  * visible per-pass rather than folded into a best-of-3 min. Per-pass
  * steal deltas come from the same /proc/stat counter Bench uses, so a
  * contended pass indicts itself. Run:
  *   sbt "Test/runMain graft.tools.DecodeAttrib"
  * Findings land in PLANS.md ("m_decode_real attribution", round 10).
  */
object DecodeAttrib {
  private def stealJiffies(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().next().trim.split("\\s+").drop(1)
        .map(_.toLong).apply(7)
      finally src.close()
    } catch { case _: Throwable => -1L }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.ops.Multimodal

    // synthesis-only prefix: the EXACT per-row payload build of
    // m_decode_real (same ids, dims, colors, ImageIO.write), shuffled
    // through the same repartition, but never decoded — the fold reads
    // payload length, not pixels.
    def synthOnly(): Long = {
      val rows = graft.etl.Tables.load(spark, sfDir, "documents")
        .select(col("doc_id")).as[Long]
        .map { id =>
          val r = ((id * 37) % 256).toInt
          val g = ((id * 59) % 256).toInt
          val b = ((id * 83) % 256).toInt
          val w = (32 + (id % 4) * 16).toInt
          val h = (24 + (id % 3) * 12).toInt
          Multimodal.MediaRow(id, "image",
            Multimodal.synthPng(0, w, h, Seq((r << 16) | (g << 8) | b)),
            w, h, 0, 0L)
        }
        .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
      rows.mapPartitions(it => it.map(_.content.length.toLong)).count()
    }
    def full(): Long =
      graft.ops.Multimodal.queries("m_decode_real")(spark, sfDir).count()

    def time(label: String, f: () => Long): Unit = {
      val st0 = stealJiffies()
      val t0 = System.nanoTime()
      val n = f()
      val dt = (System.nanoTime() - t0) / 1e9
      val st1 = stealJiffies()
      val steal = if (st0 >= 0 && st1 >= 0) (st1 - st0) / 100.0 else -1.0
      println(f"[attrib] $label%-12s $dt%6.2f s (steal $steal%5.2f, rows $n)")
    }

    // untimed warmup of the unrelated parquet/codegen machinery only —
    // deliberately does NOT touch ImageIO, so its first-use cost shows
    // up IN the measured passes (that registry scan is one suspect)
    graft.etl.Tables.load(spark, sfDir, "documents").count()
    // mode: "both" (interleaved, default), "full", "synth" — single-mode
    // runs separate JVM-age effects from cross-query interference
    val mode = args.headOption.getOrElse("both")
    val passes = args.lift(1).map(_.toInt).getOrElse(6)
    for (i <- 1 to passes) {
      if (mode != "full") time(s"synth#$i", () => synthOnly())
      if (mode != "synth") time(s"full#$i", () => full())
    }
    spark.stop()
  }
}
