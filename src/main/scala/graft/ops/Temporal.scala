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
