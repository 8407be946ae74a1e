package graft

import org.apache.spark.sql.functions._

/** The e_rollmed / e_rollmed_cal semantics split, proven on a series
  * with day GAPS (which the sf testdata never exhibits — every type
  * logs every day there, so the two registered rows agree on it):
  * the ROW-based default's trailing-7-observation frame reaches back
  * past a gap, while the calendar-true variant densifies the gap with
  * zero-count days and answers "median daily volume over the last 7
  * CALENDAR days". On a decreasing series with a 3-day gap the two
  * medians genuinely diverge, and the calendar variant emits rows for
  * the gap days themselves.
  */
class RollmedSpec extends SparkTestBase {

  /** Writes the shared gap fixture (counts 9,8,7,6,5,4 on d0..d5, a
    * 3-day gap, then 3 and 2 on d9/d10) and returns its dir. */
  private def gapFixture(): String = {
    import spark.implicits._
    val ns = 86400L * 1000000000L // one day in epoch nanos
    def day(d: Int): Long = (19000L + d) * ns
    // counts per day: d0..d5 = 9,8,7,6,5,4; d6..d8 MISSING; d9=3, d10=2
    val counts = Map(0 -> 9, 1 -> 8, 2 -> 7, 3 -> 6, 4 -> 5, 5 -> 4,
      9 -> 3, 10 -> 2)
    val rows = Seq.newBuilder[(Long, Long, Long, String, Double, String)]
    var id = 0L
    for ((d, c) <- counts.toSeq.sorted; k <- 0 until c) {
      id += 1
      rows += ((id, day(d) + k * 1000L, k.toLong, "gappy", 1.0, "{}"))
    }
    val dir = java.nio.file.Files
      .createTempDirectory("rollmed_fixture").toString
    rows.result()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("row-based and calendar-true rolling medians diverge across a " +
      "day gap exactly as documented") {
    val dir = gapFixture()

    def meds(q: String): Map[Int, (Long, Long)] =
      ops.Events.queries(q)(spark, dir).collect().map { r =>
        val d = (r.getTimestamp(1).getTime / 86400000L - 19000L).toInt
        d -> ((r.getLong(2), r.getLong(3))) // (c, med7)
      }.toMap

    val row = meds("e_rollmed")
    val cal = meds("e_rollmed_cal")

    // row-based: 7th observation arrives on d9 (6 observed days + d9),
    // its frame spans 10 calendar days across the gap
    assert(row.keySet == Set(9, 10), s"row-based emitted ${row.keySet}")
    assert(row(9) == ((3L, 6L)) && row(10) == ((2L, 5L)),
      s"row-based medians moved: $row")
    // calendar-true: frames complete on d6; gap days d6..d8 appear
    // with c=0, and the zero-filled frames pull the medians DOWN on
    // d9/d10 (3 and 2 vs the row-based 6 and 5) — the divergence
    assert(cal.keySet == Set(6, 7, 8, 9, 10),
      s"calendar variant emitted ${cal.keySet}")
    assert(cal(6) == ((0L, 6L)) && cal(7) == ((0L, 5L)) &&
      cal(8) == ((0L, 4L)), s"gap-day rows wrong: $cal")
    assert(cal(9) == ((3L, 3L)) && cal(10) == ((2L, 2L)),
      s"calendar medians wrong: $cal")
    assert(cal(9)._2 != row(9)._2 && cal(10)._2 != row(10)._2,
      "the two variants failed to diverge on the gap fixture")
  }

  test("row-based and calendar-true forecast backtests diverge across " +
      "the same gap: the week-ago anchor lands 10 vs 7 days back") {
    val dir = gapFixture()

    def eval(q: String): (Long, Long, Double) = {
      val rs = ops.Events.queries(q)(spark, dir).collect()
      assert(rs.length == 1, s"$q emitted ${rs.length} type rows")
      (rs(0).getLong(1), rs(0).getLong(2), rs(0).getDouble(3))
    }

    // row-based: 8 observed days, so lag(c,7) only reaches d10, whose
    // "7th prior observation" is d0 (TEN calendar days back): one
    // evaluated day, |9-2|=7 error over actual 2
    assert(eval("e_forecast_eval") == ((1L, 7L, 3.5)),
      "row-based backtest moved")
    // calendar-true: dense d0..d10, lag-7 anchors exactly 7 calendar
    // days back, and the gap days THEMSELVES are evaluated (d7, d8
    // forecast 9 and 8 against actual 0): four evaluated days,
    // 9+8+4+4=25 error over actual 0+0+3+2=5
    assert(eval("e_forecast_eval_cal") == ((4L, 25L, 5.0)),
      "calendar-true backtest moved")
  }
}
