package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Range and as-of joins (SURVEY §2.3 J7 [EXT]) plus the scalar-function
  * families of §2.7 exercised end-to-end (date/time, math, string, map).
  *
  * As-of is composed, not custom: a `last(..., ignoreNulls)` over an
  * ordered per-key window — one shuffle on the key, no point-lookup loop,
  * which is exactly how it scales (SURVEY J7: "as-of via window +
  * last(...)"). The range join is banded: an equi-join on
  * (key, 5-minute time bucket) with the exact range as residual, so the
  * merge ranges stay bounded even for a hot key (details inline at
  * j7_range).
  */
object Temporal {

  val queries: Map[String, Q] = Map(

    // J7a: as-of alignment — each purchase event annotated with the ts of
    // the same user's most recent PRECEDING error (or null if none).
    "j7_asof" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(asc("ts"), asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .withColumn("last_error_ts",
          last(when(col("event_type") === "error", col("ts")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("last_error_ts"),
          // micros, not seconds: engines disagree on double-epoch rounding
          (unix_micros(col("ts")) - unix_micros(col("last_error_ts")))
            .as("usecs_since_error"))
        .orderBy("event_id")
    }),

    // J7b: banded range join — per error event, count same-user events in
    // the following 5 minutes. The r7 plan was an equi-join on user_id
    // alone with the range as a residual SMJ condition: per-user candidate
    // pairs are O(n_u²) BEFORE the filter, so one bot-like hot user makes
    // a single task quadratic at 100 TB (the skew class j_salted solves).
    // Banded fix: bucket ts into 5-minute keys. Because the bucket width
    // EQUALS the range width, an error at ts ∈ bucket b can only have
    // follow-ups (t, t+5min] in buckets {b, b+1} — so explode the
    // (smaller, filtered) error side into its 2 covering buckets and join
    // on (user_id, bucket) with the exact range as residual. Each (err,
    // follow-up) pair matches on exactly ONE bucket key (the follow-up's
    // own bucket), so no post-join dedup is needed and the result — and
    // the DuckDB oracle — is unchanged. Same proof pattern as
    // j_fuzzy_blocked's length blocking.
    "j7_range" -> ((s, d) => {
      val e = t(s, d, "events")
      val bkt = (c: org.apache.spark.sql.Column) =>
        floor(unix_micros(c) / lit(300000000L))
      val err = e.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id").as("u"),
          col("ts").as("err_ts"))
        .withColumn("b",
          explode(array(bkt(col("err_ts")), bkt(col("err_ts")) + 1)))
      val any = e.select(col("user_id").as("u2"), col("ts").as("ts2"),
        col("event_id").as("eid2"), bkt(col("ts")).as("b2"))
      err.join(any,
          col("u") === col("u2") && col("b") === col("b2") &&
          col("ts2") > col("err_ts") &&
          col("ts2") <= col("err_ts") + expr("INTERVAL 5 MINUTES"))
        .groupBy(col("err_id"))
        .agg(count("*").as("n_followups"), min(col("eid2")).as("first_eid"))
        .orderBy("err_id")
    }),

    // J7c: interval-overlap join — general intervals on BOTH sides (the
    // shape j7_range can't express: its probe side is points). A = the
    // per-user session intervals (e_session's construction), B =
    // high-activity hours (e_burst's trailing-24h stats at a milder
    // 1.5× threshold — integer-exact as 2·n·cnt24 > 3·sum24 — so both
    // bench SFs produce overlaps; the 2× burst bar is empty at sf0.1).
    // Scale shape: band time into 1-hour buckets and equi-join on the
    // bucket with the exact overlap as residual. The session side
    // explodes into its covering buckets (sequence over the interval);
    // burst intervals are exactly one bucket wide, so any true overlap
    // shares a bucket — candidate-complete by construction — and each
    // (session, burst) pair meets in at most one bucket, so no dedup is
    // needed. For open-ended interval tables at 100 TB the same plan
    // holds with the band width picked near the MEDIAN interval length,
    // and pathological long intervals split across bucket rows (cost
    // linear in interval length / width, never quadratic in rows).
    "j7_interval" -> ((s, d) => {
      val hourUs = 3600000000L
      val sess = t(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"),
          col("user_id"))
        .agg(count("*").as("n_events"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("s_end"))
      val hourly = t(s, d, "events")
        .select(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .groupBy("h", "event_type").agg(count("*").as("n"))
      val wTrail = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(-24, -1)
      val burst = hourly
        .withColumn("sum24", sum("n").over(wTrail))
        .withColumn("cnt24", count("n").over(wTrail))
        .filter(col("cnt24") >= 12 &&
          col("n") * col("cnt24") * 2 > col("sum24") * 3)
        .select(col("event_type"), col("h").as("burst_hour"))
      val sessB = sess.withColumn("bk",
        explode(sequence(floor(unix_micros(col("session_start")) /
            lit(hourUs)),
          floor((unix_micros(col("s_end")) - 1) / lit(hourUs)))))
      val burstB = burst.withColumn("bk",
        floor(unix_micros(col("burst_hour")) / lit(hourUs)))
      sessB.join(burstB, Seq("bk"))
        .filter(col("session_start") <
            col("burst_hour") + expr("INTERVAL 1 HOUR") &&
          col("burst_hour") < col("s_end"))
        .select(col("user_id"), col("session_start"), col("event_type"),
          col("burst_hour"))
        .orderBy("user_id", "session_start", "event_type", "burst_hour")
    }),

    // §2.7 date/time + math family, end-to-end against the oracle.
    "f_scalar" -> ((s, d) => {
      t(s, d, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("quarter", col("o_orderdate")).cast("date").as("q"),
          datediff(lit("2002-01-01").cast("date"),
            col("o_orderdate").cast("date")).as("days_to_2002"),
          roundf(sqrt(abs(col("o_totalprice"))), 4).as("sqrt_price"),
          (col("o_orderkey") % 7).as("mod7"),
          floor(col("o_totalprice") / 1000.0).cast("long").as("k_bucket"),
          concat(upper(substring(col("o_orderpriority"), 1, 1)),
            lit("#"), col("o_orderstatus")).as("tag"))
        .orderBy("o_orderkey")
    }),

    // §2.7 map family: JSON props → typed map, keys/values/element_at.
    "f_map" -> ((s, d) => {
      t(s, d, "events")
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("map<string,int>"))
            .as("pm"))
        .select(col("event_id"),
          map_keys(col("pm")).as("ks"),
          element_at(col("pm"), "k").as("k_val"))
        .select(col("event_id"),
          array_join(col("ks"), ",").as("key_list"), col("k_val"))
        .orderBy("event_id")
    }))

  val oracles: Map[String, String] = Map(
    "j7_asof" ->
      """SELECT event_id, user_id, ts, last_error_ts,
           epoch_us(ts) - epoch_us(last_error_ts) AS usecs_since_error
         FROM (SELECT event_id, user_id, ts, event_type,
                 last_value(CASE WHEN event_type = 'error' THEN ts END
                   IGNORE NULLS) OVER (PARTITION BY user_id
                   ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_error_ts
               FROM events)
         WHERE event_type = 'purchase' ORDER BY event_id""",
    "j7_range" ->
      """SELECT a.event_id AS err_id, COUNT(*) AS n_followups,
           MIN(b.event_id) AS first_eid
         FROM events a JOIN events b
           ON a.user_id = b.user_id
           AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
         WHERE a.event_type = 'error'
         GROUP BY a.event_id ORDER BY err_id""",
    "j7_interval" ->
      """WITH flagged AS (
           SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) > INTERVAL 30 MINUTE
               OR lag(ts) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_s
           FROM events),
         sess0 AS (
           SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM flagged),
         sess AS (
           SELECT user_id, MIN(ts) AS session_start,
             MAX(ts) + INTERVAL 30 MINUTE AS s_end
           FROM sess0 GROUP BY user_id, sid),
         hourly AS (
           SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         trailed AS (
           SELECT event_type, h, n,
             SUM(n) OVER (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS sum24,
             COUNT(n) OVER (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS cnt24
           FROM hourly),
         burst AS (
           SELECT event_type, h AS burst_hour FROM trailed
           WHERE cnt24 >= 12 AND n * cnt24 * 2 > sum24 * 3)
         SELECT s.user_id, s.session_start, b.event_type, b.burst_hour
         FROM sess s JOIN burst b
           ON s.session_start < b.burst_hour + INTERVAL 1 HOUR
           AND b.burst_hour < s.s_end
         ORDER BY s.user_id, s.session_start, b.event_type, b.burst_hour""",
    "f_scalar" ->
      """SELECT o_orderkey,
           year(o_orderdate)::INT AS y, month(o_orderdate)::INT AS m,
           dayofmonth(o_orderdate)::INT AS dom,
           date_trunc('quarter', o_orderdate)::DATE AS q,
           datediff('day', o_orderdate::DATE, DATE '2002-01-01')::INT
             AS days_to_2002,
           floor(sqrt(abs(o_totalprice)) * 10000.0 + 0.5) / 10000.0
             AS sqrt_price,
           o_orderkey % 7 AS mod7,
           floor(o_totalprice / 1000.0)::BIGINT AS k_bucket,
           upper(substr(o_orderpriority, 1, 1)) || '#' || o_orderstatus
             AS tag
         FROM orders ORDER BY o_orderkey""",
    "f_map" ->
      """SELECT event_id,
           array_to_string(json_keys(props), ',') AS key_list,
           json_extract_string(props, '$.k')::INT AS k_val
         FROM events ORDER BY event_id""")
}
