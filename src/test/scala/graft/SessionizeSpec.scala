package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Session-window boundary semantics: a Spark session window's end is
  * lastEvent + gap, and an event landing EXACTLY at that end MERGES into
  * the session (the boundary is inclusive for merging). The DuckDB
  * oracle's gaps-and-islands predicate must therefore open a new session
  * only on diff > gap (not >=) to agree — this spec pins the Spark side
  * of that contract on synthetic exact-boundary rows, because the
  * nanosecond-timestamped events table can never land on the boundary.
  */
class SessionizeSpec extends SparkTestBase {

  test("session boundary: exact-gap merges, gap+1s opens a new session") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new Timestamp(t0.getTime + min * 60000L)
    // u1: 0, 10, 40 — the 40' event is exactly 30' after 10' → MERGES
    // u2: 0, 30m01s — one second past the gap → new session
    // u3: 0, 29m59s — inside the gap → same session
    val df = Seq(
      ("u1", at(0)), ("u1", at(10)), ("u1", at(40)),
      ("u2", at(0)), ("u2", new Timestamp(t0.getTime + 30 * 60000L + 1000L)),
      ("u3", at(0)), ("u3", new Timestamp(t0.getTime + 29 * 60000L + 59000L))
    ).toDF("user_id", "ts")
    val sess = df
      .groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count("*").as("n"))
      .select(col("user_id"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(sess("u1") == List(3L),
      s"exact-gap event must merge, got ${sess("u1")}")
    assert(sess("u2") == List(1L, 1L),
      s"gap+1s event must open a new session, got ${sess("u2")}")
    assert(sess("u3") == List(2L),
      s"inside-gap event must merge, got ${sess("u3")}")
  }
}
