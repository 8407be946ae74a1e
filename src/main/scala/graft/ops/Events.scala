package graft.ops

import org.apache.spark.sql.functions._

/** Event-time analytics (SURVEY §2.9) in their batch-equivalent,
  * oracle-checkable formulations. The same window/session expressions run
  * unchanged under Structured Streaming (`readStream` + `withWatermark`) —
  * the streaming module reuses these; here they're driven from the static
  * `events` table so DuckDB can replay them.
  *
  * The reference's only incremental notion is poll-until-JobComplete
  * (client.rs:229-233); real SF pipelines layer a SystemModstamp high-water
  * mark on top — `e_incremental` is that exact pattern.
  */
object Events {

  val queries: Map[String, Q] = Map(

    // Tumbling 1-hour windows per event type (groupBy window(...)).
    "e_tumble" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count("*").as("n"), dsum(col("value")).as("sum_value"))
        .select(col("w.start").as("ws"), col("event_type"), col("n"),
          col("sum_value"))
        .orderBy("ws", "event_type")
    }),

    // Sliding windows: 1 hour long, every 30 minutes — each event lands in
    // exactly two windows.
    "e_slide" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count("*").as("n"))
        .select(col("w.start").as("ws"), col("n"))
        .orderBy("ws")
    }),

    // Gap-filled hourly series: the date-spine pattern — generate every
    // hour in the data's range (sequence + explode: a GENERATOR, no
    // table scan), cross the handful of event types, left-join the real
    // hourly counts, fill absences with 0. Dashboards and training-curve
    // downstream consumers need dense series; the spine stays tiny at any
    // data scale (hours-in-range × |types|), so the crossJoin is a
    // broadcast of a few thousand rows even at 100 TB.
    "e_gapfill" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      val hourly = ev.groupBy("h", "event_type")
        .agg(count("*").as("n"))
      val spine = ev.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 hour"))).as("h"))
      val types = ev.select("event_type").distinct()
      spine.crossJoin(broadcast(types))
        .join(hourly, Seq("h", "event_type"), "left")
        .select(col("h"), col("event_type"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("h", "event_type")
    }),

    // Session windows: 30-minute inactivity gap per user. Spark's
    // session_window end = last event + gap; the oracle reproduces that via
    // gaps-and-islands (lag + cumulative flag sum).
    "e_session" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"),
          col("user_id"))
        .agg(count("*").as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start")
    }),

    // Incremental extract: SystemModstamp high-water-mark filter, applied
    // on the raw nanos column so it pushes into the parquet scan
    // (PushedFilters: GreaterThan) — at 100 TB this is the difference
    // between reading a day and reading a decade. Note `>` on raw nanos is
    // a strict superset of `>` on truncated micros only when the watermark
    // is on a whole-µs boundary (ours is), keeping oracle parity.
    "e_incremental" -> ((s, d) => {
      graft.etl.Tables.eventsSince(s, d,
          java.time.Instant.parse("2024-01-10T00:00:00Z"))
        .groupBy("event_type")
        .agg(count("*").as("n"), min(col("ts")).as("first_ts"),
          max(col("ts")).as("last_ts"))
        .orderBy("event_type")
    }))

  val oracles: Map[String, String] = Map(
    "e_gapfill" ->
      """WITH ev AS (
           SELECT date_trunc('hour', ts) AS h, event_type FROM events),
         hourly AS (
           SELECT h, event_type, COUNT(*) AS n FROM ev GROUP BY 1, 2),
         spine AS (
           SELECT unnest(generate_series(
             (SELECT min(h) FROM ev), (SELECT max(h) FROM ev),
             INTERVAL 1 HOUR)) AS h),
         types AS (SELECT DISTINCT event_type FROM ev)
         SELECT s.h, t.event_type, COALESCE(hh.n, 0) AS n
         FROM spine s CROSS JOIN types t
         LEFT JOIN hourly hh ON hh.h = s.h AND hh.event_type = t.event_type
         ORDER BY s.h, t.event_type""",
    "e_tumble" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY ws, event_type""",
    "e_slide" ->
      """WITH b AS (
           SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000)
             AS s1 FROM events)
         SELECT ws, COUNT(*) AS n FROM (
           SELECT s1 AS ws FROM b
           UNION ALL
           SELECT s1 - INTERVAL 30 MINUTE AS ws FROM b)
         GROUP BY ws ORDER BY ws""",
    // > not >=: a Spark session window's end is lastEvent + gap
    // INCLUSIVE of a next event landing exactly there — session_window
    // MERGES an event exactly gap after its predecessor (verified
    // empirically; SessionizeSpec pins it on a synthetic exact-boundary
    // row). Never observable on the nanosecond-timestamped events table
    // (a zero-measure boundary), but the contract must match anyway.
    "e_session" ->
      """WITH flagged AS (
           SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) > INTERVAL 30 MINUTE
               OR lag(ts) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_s
           FROM events),
         sess AS (
           SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM flagged)
         SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM sess GROUP BY user_id, sid
         ORDER BY user_id, session_start""",
    "e_incremental" ->
      """SELECT event_type, COUNT(*) AS n, MIN(ts) AS first_ts,
           MAX(ts) AS last_ts
         FROM events WHERE ts > TIMESTAMP '2024-01-10 00:00:00'
         GROUP BY event_type ORDER BY event_type""")
}
