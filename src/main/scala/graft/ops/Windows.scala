package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY §2.5 W1-W4). Absent from the reference (SOQL
  * has none) — [EXT] analytics the engine adds over the same FK data model.
  *
  * Every window spec orders by a unique key suffix so frames are total
  * orders: at 100 TB a window with ties is nondeterministic across runs,
  * which breaks both the oracle hash and real-world idempotent re-runs.
  * Frame aggregates over doubles go through decimal casts — DuckDB
  * evaluates sliding frames with a segment tree (different association
  * order than Spark's incremental buffer), so raw double sums diverge.
  */
object Windows {

  val queries: Map[String, Q] = Map(

    // W1: ranking trio over a per-customer order history.
    "w1_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .filter(col("rn") <= 5)
        .orderBy("o_custkey", "rn")
    }),

    // W2: lag/lead/first/last analytics along each user's event timeline.
    "w2_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(asc("ts"), asc("event_id"))
      t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          lag(col("event_type"), 1).over(w).as("prev_type"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          first(col("event_type")).over(w).as("first_type"))
        .orderBy("user_id", "event_id")
    }),

    // W3: frame aggregates — running sum (unbounded→current) and a 3-row
    // moving average, decimal-cast for cross-engine reproducibility.
    "w3_running" -> ((s, d) => {
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(asc("ts"), asc("event_id"))
      val running = ord.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val moving = ord.rowsBetween(-2, Window.currentRow)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          sum(col("value").cast("decimal(18,2)")).over(running)
            .cast("double").as("run_sum"),
          (sum(col("value").cast("decimal(18,2)")).over(moving)
            .cast("double") /
            count(col("value")).over(moving)).as("mov_avg"))
        .orderBy("user_id", "event_id")
    }),

    // W4: top-k per group — the keep-newest-k dedup shape (classic SF ETL
    // compaction, same mechanics as Load.latestByKey but k>1).
    "w4_topk_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"),
          col("o_totalprice").cast("decimal(18,2)").cast("double")
            .as("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_orderstatus", "rn")
    }),

    // W5: ntile quantile bucketing — equal-frequency binning for score
    // calibration / cohort splits. Total order (acctbal, custkey) makes
    // tile assignment deterministic in both engines.
    //
    // Scale shape: NOT `ntile(4) OVER (ORDER BY ...)` — an unpartitioned
    // window coalesces the whole table through ONE task (the one
    // avoidable scale-killer r4's audit flagged). And NOT the previous
    // repartitionByRange + spark_partition_id construction either: that
    // made the bucket id a property of WHICH exchange materialization a
    // branch read (range boundaries are re-sampled per materialization),
    // so correctness hinged on ReusedExchange firing — plan-shape-
    // dependent, exactly what the r5 ADVICE flagged. Here the bucket id
    // is a PURE FUNCTION of the row's values:
    //   1. 31 cut VALUES from one approx_percentile pass, COLLECTED TO
    //      THE DRIVER as a 31-double scalar fetch (one tiny job — the
    //      same move AQE makes with runtime stats; this is not a
    //      driver-side data loop) and re-embedded as a LITERAL array.
    //      The r6 form kept the cuts as a shared plan subtree feeding
    //      two branches, so cut consistency still silently depended on
    //      the BroadcastExchange being evaluated once — distributed
    //      approx_percentile merges partial sketches in shuffle-fetch
    //      arrival order, so two evaluations could disagree. A literal
    //      is evaluated zero times in the plan: no shared-subtree
    //      evaluation-count assumption remains (r6 ADVICE medium).
    //      Accuracy shapes bucket BALANCE, never the result;
    //   2. bucket b = #{cuts ≤ acctbal} via a codegen'd
    //      size(filter(literal, ...)) — monotone in acctbal, and equal
    //      acctbals share a bucket, so buckets are contiguous runs of
    //      the (acctbal, custkey) total order no matter how ties fall
    //      against a cut;
    //   3. per-bucket counts → ≤32-row cumulative offsets (the only
    //      unpartitioned window runs over THOSE rows — bounded by the
    //      cut count, not the data);
    //   4. global rank = broadcast offset + row_number per bucket;
    //      quartile = CASE against the ntile cumulative bucket bounds
    //      k·⌊N/4⌋ + min(k, N mod 4) from a broadcast scalar count.
    // Every data-sized stage is parallel AND every branch recomputes the
    // same bucket id from values — no cross-branch exchange identity
    // required. Result is bit-identical to exact ntile — the oracle
    // keeps the window formulation as the cross-check.
    "w5_ntile" -> ((s, d) => {
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_acctbal"))
      val fracs = (1 until 32).map(i => i / 32.0)
      val cutVals: Seq[Double] = c.agg(expr(
        s"approx_percentile(c_acctbal, array(${fracs.mkString(",")}), 1000)")
        .as("cuts")).head.getSeq[Double](0)
      val bucketed = c
        .withColumn("b", size(filter(
          typedLit(cutVals), x => x <= col("c_acctbal"))))
      val counts = bucketed.groupBy("b").agg(count(lit(1)).as("pc"))
      val offs = counts
        .withColumn("off", coalesce(sum("pc").over(
          Window.orderBy(asc("b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("b", "off")
      val total = counts.agg(sum("pc").as("ntot"))
      val wIn = Window.partitionBy("b")
        .orderBy(asc("c_acctbal"), asc("c_custkey"))
      val cum = (k: Int) => lit(k.toLong) *
        floor(col("ntot") / lit(4)).cast("long") +
        least(lit(k.toLong), pmod(col("ntot"), lit(4)))
      bucketed
        .join(broadcast(offs), "b")
        .withColumn("rk", col("off") + row_number().over(wIn))
        .crossJoin(broadcast(total))
        .withColumn("quartile",
          when(col("rk") <= cum(1), 1)
            .when(col("rk") <= cum(2), 2)
            .when(col("rk") <= cum(3), 3)
            .otherwise(4))
        .groupBy("quartile")
        .agg(count("*").as("n"),
          min(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("min_bal"),
          max(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("max_bal"))
        .orderBy("quartile")
    }))

  val oracles: Map[String, String] = Map(
    "w1_rank" ->
      """SELECT o_custkey, o_orderkey, rn, rnk, drnk FROM (
           SELECT o_custkey, o_orderkey,
             row_number() OVER w AS rn,
             rank() OVER w AS rnk,
             dense_rank() OVER w AS drnk
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey ASC))
         WHERE rn <= 5 ORDER BY o_custkey, rn""",
    "w2_lag" ->
      """SELECT user_id, event_id,
           lag(event_type, 1) OVER w AS prev_type,
           lead(event_type, 1) OVER w AS next_type,
           first_value(event_type) OVER w AS first_type
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
         ORDER BY user_id, event_id""",
    "w3_running" ->
      """SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
             OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS run_sum,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
             OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / COUNT(value)
             OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_avg
         FROM events ORDER BY user_id, event_id""",
    "w4_topk_group" ->
      """SELECT o_orderstatus, o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
             AS o_totalprice, rn
         FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderstatus
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders)
         WHERE rn <= 3 ORDER BY o_orderstatus, rn""",
    "w5_ntile" ->
      """SELECT quartile, COUNT(*) AS n,
           CAST(MIN(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS min_bal,
           CAST(MAX(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS max_bal
         FROM (SELECT c_custkey, c_acctbal,
             ntile(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC)
               AS quartile
           FROM customer)
         GROUP BY quartile ORDER BY quartile""")
}
