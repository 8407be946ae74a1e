package graft

import org.apache.spark.sql.functions._

/** Degenerate-fixture coverage for `e_anomaly`'s zero-variance guard
  * (ops/Events.scala): a type whose daily counts are ALL EQUAL has
  * sample std = 0 and an unguarded z-score would be 0/0 = NaN — whose
  * ordering through the `abs(z) >= 2` gate differs between Spark and
  * DuckDB. The guard drops such types (they have no anomalous days by
  * definition) via the exact integer identity nd·Σc² = (Σc)², so no
  * NaN ever reaches the gate. This spec pins that on a constructed
  * constant series, which the sf testdata never exhibits.
  */
class AnomalySpec extends SparkTestBase {

  test("e_anomaly drops zero-variance types instead of emitting NaN; " +
      "a genuine spike still flags") {
    import spark.implicits._
    // ts written as plain INT64 → the footer probe infers LongType and
    // applies the NANOS divisor (Tables.eventsTsDivisor), so the
    // fixture writes epoch NANOSECONDS
    val ns = 86400L * 1000000000L // one day in epoch nanos
    def day(d: Int): Long = (19000L + d) * ns
    // "flat": exactly 3 events per day for 6 days (std = 0);
    // "spiky": 5 events/day baseline for 7 days, then one 40-event day
    val rows = Seq.newBuilder[(Long, Long, Long, String, Double, String)]
    var id = 0L
    for (d <- 0 until 6; k <- 0 until 3) {
      id += 1; rows += ((id, day(d) + k * 1000L, k.toLong, "flat", 1.0, "{}"))
    }
    for (d <- 0 until 7; k <- 0 until 5) {
      id += 1; rows += ((id, day(d) + k * 1000L, k.toLong, "spiky", 1.0, "{}"))
    }
    for (k <- 0 until 40) {
      id += 1; rows += ((id, day(7) + k * 1000L, k.toLong, "spiky", 1.0, "{}"))
    }
    val dir = java.nio.file.Files
      .createTempDirectory("anomaly_fixture").toString
    rows.result()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = ops.Events.queries("e_anomaly")(spark, dir).collect()
    assert(out.forall(r => !r.getDouble(r.fieldIndex("z")).isNaN),
      "zero-variance guard leaked a NaN z-score")
    assert(!out.exists(_.getString(0) == "flat"),
      "a constant daily series must produce no anomaly rows")
    val spike = out.filter(r => r.getString(0) == "spiky")
    assert(spike.nonEmpty, "the 8x spike day must flag |z| >= 2")
    assert(spike.forall(r =>
      math.abs(r.getDouble(r.fieldIndex("z"))) >= 2.0))
  }
}
