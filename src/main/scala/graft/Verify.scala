package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // per-query formatted-plan snapshots: plan regressions (lost
    // pushdown, a broadcast silently becoming a shuffle) then show up as
    // a text DIFF of the plans dir between rounds instead of needing a
    // fresh hand audit. Disable with SPARK_GRAFT_PLANS=0. NOT inside
    // outDir: the correctness driver enumerates outDir subdirs as query
    // outputs, so plan text there produced a spurious failing row.
    val dumpPlans = !sys.env.get("SPARK_GRAFT_PLANS").contains("0")
    val plansDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR",
      s"${outDir.stripSuffix("/")}.plans")
    if (dumpPlans) new java.io.File(plansDir).mkdirs()
    // local-iteration subset: comma-separated names; unset = full run
    // (the driver never sets it, so the round artifact is always full)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(ns =>
      SparkEntry.queries.filter { case (n, _) => ns(n) })
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        if (dumpPlans)
          // gen-layout scan paths carry a publisher-unique nonce
          // (gen=N-<hex>); strip it so the plans dir stays a stable
          // round-over-round text diff
          try Files.writeString(Paths.get(s"$plansDir/$name.txt"),
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
              .replaceAll("(gen=\\d+)-[0-9a-f]+", "$1"))
          catch { case e: Throwable =>
            System.err.println(s"[verify] plan dump $name: ${e.getMessage}")
          }
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // queries persist intermediates (LSH candidates, CC labels); the
      // run loop owns the cache lifetime so 76 queries don't accumulate
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
