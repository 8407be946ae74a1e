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

  import org.apache.spark.sql.DataFrame

  /** Exact equal-frequency bucketing (`ntile(n)` over a global total
    * order) as an explicit TWO-JOB design — the shape a 1000-executor
    * cluster needs, where `ntile(n) OVER (ORDER BY ...)` would funnel
    * every row through one task:
    *
    *   job 1 (sketch): one `approx_percentile` pass collects `sketchCuts`
    *     cut VALUES to the driver — a bounded scalar fetch, the same move
    *     AQE makes with runtime stats, not a driver-side data loop. The
    *     cuts are re-embedded as a LITERAL array so no plan branch shares
    *     (and possibly re-evaluates) the sketch subtree: distributed
    *     approx_percentile merges partial sketches in shuffle-fetch
    *     arrival order, so two evaluations could disagree.
    *   job 2 (rank): bucket id = #{cuts ≤ value} via a codegen'd
    *     size(filter(literal)) — a PURE FUNCTION of the row, monotone in
    *     the value, so buckets are contiguous runs of the
    *     (value, tieCols...) total order no matter how ties fall against
    *     a cut. Per-bucket counts → cumulative offsets (the only
    *     unpartitioned window runs over ≤ sketchCuts+1 COUNT rows, never
    *     the data); global rank = broadcast offset + per-bucket
    *     row_number; tile = CASE against the ntile cumulative bounds
    *     k·⌊N/n⌋ + min(k, N mod n) from a broadcast total.
    *
    * Sketch accuracy shapes bucket BALANCE (parallelism), never the
    * result: the output is bit-identical to exact `ntile(n)` for ANY
    * cuts (property-spec'd in NtileSpec with sketchCuts = 1).
    *
    * The value is compared in double space (monotone cast), while
    * within-bucket ranking uses the original column plus `tieCols` — so
    * ordering stays exact even when the double cast collapses
    * neighbouring values.
    */
  def ntileBySketch(df: DataFrame, valueCol: String, tieCols: Seq[String],
      n: Int, sketchCuts: Int = 31, accuracy: Int = 1000,
      out: String = "tile"): DataFrame = {
    require(n >= 1 && sketchCuts >= 1)
    val fracs = (1 to sketchCuts).map(i => i.toDouble / (sketchCuts + 1))
    val cutVals: Seq[Double] = df
      .agg(expr(s"approx_percentile(CAST($valueCol AS DOUBLE), " +
        s"array(${fracs.mkString(",")}), $accuracy)").as("cuts"))
      .head.getSeq[Double](0)
    val bucketed = df.withColumn("__b", size(filter(
      typedLit(cutVals), x => x <= col(valueCol).cast("double"))))
    val counts = bucketed.groupBy("__b").agg(count(lit(1)).as("__pc"))
    val offs = counts
      .withColumn("__off", coalesce(sum("__pc").over(
        Window.orderBy(asc("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__b", "__off")
    val total = counts.agg(sum("__pc").as("__ntot"))
    val wIn = Window.partitionBy("__b")
      .orderBy(asc(valueCol) +: tieCols.map(asc): _*)
    val cum = (k: Int) => lit(k.toLong) *
      floor(col("__ntot") / lit(n)).cast("long") +
      least(lit(k.toLong), pmod(col("__ntot"), lit(n)))
    val ranked = bucketed
      .join(broadcast(offs), "__b")
      .withColumn("__rk", col("__off") + row_number().over(wIn))
      .crossJoin(broadcast(total))
    val tile = (1 until n).foldLeft(when(lit(false), 0)) {
      (acc, k) => acc.when(col("__rk") <= cum(k), k)
    }.otherwise(n)
    ranked.withColumn(out, tile)
      .drop("__b", "__pc", "__off", "__rk", "__ntot")
  }

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

    // W3b: RANGE frame — the VALUE-based frame ROWS cannot express:
    // "everything in the trailing hour" spans however many events fall
    // in the interval (w3's ROWS BETWEEN 2 PRECEDING is always 3
    // events regardless of their spacing — the distinction the r14
    // e_rollmed redocumentation made explicit). Ordering on raw
    // epoch-µs makes the frame bound an exact integer (3600000000)
    // and RANGE semantics include order-value PEERS in both engines
    // identically, so ties need no disclosure. The decimal sum keeps
    // the aggregate order-independent.
    "w8_range" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tsus"))
        .rangeBetween(-3600000000L, 0L)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("tsus"),
          col("value"))
        .select(col("user_id"), col("event_id"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("value").cast("decimal(18,2)")).over(w)
            .cast("double").as("sum_1h"))
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

    // w4_topk_group with the leaderboard MAINTAINED BY THE STREAMING
    // SINK — the continuously-current top-k, the second non-additive
    // maintained state (latestMaintain's argmax generalized from k=1):
    // top-k under a total order is a semilattice, so merging per-batch
    // top-ks is EXACTLY the one-shot top-k over the whole stream —
    // which is why this row shares w4_topk_group's oracle VERBATIM.
    // Per batch the merge window sees ≤ 2k rows per group no matter
    // how much the stream has seen; at 100 TB the leaderboard never
    // rescans history. The read side re-derives rn over |groups|·k
    // state rows.
    "l_topk_maintained" -> ((s, d) => {
      val o = t(s, d, "orders")
      val mid = o.agg(max("o_orderkey")).head.getLong(0) / 2
      val (base, stream) = Replay.twoBatchStream(s, "topk", d,
        graft.etl.Tables.schemas("orders"), "ord",
        o.filter(col("o_orderkey") < mid),
        o.filter(col("o_orderkey") >= mid))
      val statePath = new java.io.File(base, "topk").getPath
      val q = graft.streaming.Streams.topkMaintain(stream, statePath,
        "o_orderstatus", 3,
        Seq(desc("o_totalprice"), asc("o_orderkey")))
      require(q.awaitTermination(600000),
        "top-k maintenance stream must drain (AvailableNow)")
      require(q.recentProgress.map(_.batchId).distinct.length >= 2,
        "replay must span two micro-batches or the semilattice merge " +
          "is untested")
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      graft.streaming.Streams.readGenMaintained(s, statePath)
        .select(col("o_orderstatus"), col("o_orderkey"),
          col("o_totalprice").cast("decimal(18,2)").cast("double")
            .as("o_totalprice"),
          row_number().over(w).as("rn"))
        .orderBy("o_orderstatus", "rn")
    }),

    // W6: distribution windows — cume_dist / percent_rank per customer.
    // The tie-break column is INSIDE the ORDER BY, so every frame is a
    // total order: each row is its own peer group and both functions
    // reduce to exact rational arithmetic on (row position, partition
    // size) — identical IEEE doubles in any engine. Partitioned by
    // customer, so the window parallelizes across the key like w1-w4
    // (never an unpartitioned global funnel).
    "w6_cume" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(asc("o_totalprice"), asc("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          cume_dist().over(w).as("cd"),
          percent_rank().over(w).as("pr"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // W-family completion: value-extraction windows — first_value /
    // last_value over the FULL frame and nth_value — the
    // bookend-comparison shape (each order next to its customer's
    // cheapest, priciest, and second-cheapest order). The frame must
    // be UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING explicitly:
    // last_value over the default running frame is the current row,
    // the classic window bug both engines share; making the frame
    // explicit is the point of the row. Total order (totalprice,
    // orderkey) keeps every pick deterministic.
    "w7_value" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(asc("o_totalprice"), asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("cheapest"),
          last(col("o_orderkey")).over(w).as("priciest"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_cheapest"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // W5: ntile quantile bucketing — equal-frequency binning for score
    // calibration / cohort splits. Total order (acctbal, custkey) makes
    // tile assignment deterministic in both engines. The scale shape —
    // NOT `ntile(4) OVER (ORDER BY ...)` (one-task funnel, the r4-audit
    // scale-killer), NOT a shared approx_percentile plan subtree (the
    // r6-ADVICE evaluation-count hazard) — lives in ntileBySketch above:
    // sketch job → driver cut literal → parallel rank job, bit-identical
    // to exact ntile. The oracle keeps the window formulation as the
    // cross-check.
    "w5_ntile" -> ((s, d) => {
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_acctbal"))
      ntileBySketch(c, "c_acctbal", Seq("c_custkey"), 4, out = "quartile")
        .groupBy("quartile")
        .agg(count("*").as("n"),
          min(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("min_bal"),
          max(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("max_bal"))
        .orderBy("quartile")
    }))

  private lazy val topkSql: String =
    """SELECT o_orderstatus, o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
             AS o_totalprice, rn
         FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderstatus
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders)
         WHERE rn <= 3 ORDER BY o_orderstatus, rn"""

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
    "w8_range" ->
      """SELECT user_id, event_id,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
             AS sum_1h
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",
    "w4_topk_group" -> topkSql,
    // the maintained leaderboard must equal the one-shot top-k — the
    // semilattice identity, checked with w4's oracle VERBATIM
    "l_topk_maintained" -> topkSql,
    "w6_cume" ->
      """SELECT o_custkey, o_orderkey,
           cume_dist() OVER w AS cd,
           percent_rank() OVER w AS pr
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
           ORDER BY o_totalprice ASC, o_orderkey ASC)
         ORDER BY o_custkey, o_orderkey""",
    // same explicit unbounded frame — last_value over the default
    // running frame would be the current row in BOTH engines
    "w7_value" ->
      """SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS cheapest,
           last_value(o_orderkey) OVER w AS priciest,
           nth_value(o_orderkey, 2) OVER w AS second_cheapest
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
           ORDER BY o_totalprice ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_custkey, o_orderkey""",
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
