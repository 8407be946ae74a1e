package graft.ops

import org.apache.spark.sql.expressions.Window
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

    // Burst detection: flag hours where a type's count exceeds 2× its
    // trailing-24-observation average — the monitoring/anomaly pass on
    // event streams. The flag is evaluated as an INTEGER cross-multiply
    // (n·cnt24 > 2·sum24), never a float average: exact in both engines,
    // no stddev (whose Welford-vs-sum-of-squares evaluation differs
    // across engines). One exchange on event_type serves the window.
    "e_burst" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = t(s, d, "events")
        .select(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .groupBy("h", "event_type").agg(count("*").as("n"))
      val w = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(-24, -1)
      hourly
        .withColumn("sum24", sum("n").over(w))
        .withColumn("cnt24", count("n").over(w))
        .filter(col("cnt24") >= 12) // demand half a day of history
        .select(col("event_type"), col("h"), col("n"),
          col("sum24"), col("cnt24"),
          (col("n") * col("cnt24") > col("sum24") * 2).cast("int")
            .as("burst"))
        .orderBy("event_type", "h")
    }),

    // Daily-count anomaly report — e_burst's batch-offline twin at day
    // grain: for each event_type, the daily series' sample mean and
    // std derive from three INTEGER moments (nd, Σc, Σc²) so the only
    // doubles are one sqrt and one division, and each day's z-score
    // flags |z| ≥ 2 — the monitoring query a pipeline runs over its
    // own rollup table. z = (c·nd − Σc) / (nd·std): the numerator is
    // exact integer arithmetic, the comparison runs on the same
    // grid-rounded value both engines emit, so boundary days cannot
    // diverge. One pass over |days × types| rows; stats broadcast.
    "e_anomaly" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val stats = daily.groupBy("event_type")
        .agg(count(lit(1)).as("nd"), sum("c").as("sc"),
          sum(col("c") * col("c")).as("sc2"))
        .filter(col("nd") >= 2)
        // zero-variance guard (same class as x_changepoint's
        // degenerate-day fix): a type whose daily counts are all equal
        // has nd·sc2 = sc² exactly (integer arithmetic), std = 0, and
        // z would be 0/0 = NaN — whose ordering semantics differ
        // between engines. Such a type has no anomalous days by
        // definition; drop it on BOTH sides before the division.
        .filter(col("nd") * col("sc2") =!= col("sc") * col("sc"))
      val std = sqrt((col("nd") * col("sc2") - col("sc") * col("sc"))
        .cast("double") /
        (col("nd") * (col("nd") - 1)).cast("double"))
      daily.join(broadcast(stats), "event_type")
        .select(col("event_type"), col("day"), col("c"),
          roundf((col("c") * col("nd") - col("sc")).cast("double") /
            (col("nd").cast("double") * std), 4).as("z"))
        .filter(abs(col("z")) >= 2.0)
        .orderBy("event_type", "day")
    }),

    // DAU/WAU stickiness — the engagement ratio product teams track
    // daily. WAU is an EXACT rolling 7-day distinct-user count via
    // e_rolling28's inverted contribution (each distinct (user, day)
    // fans to its ≤7 target days; the answer is a distinct count per
    // target — bounded 7× fan, NO count-distinct window, which Spark
    // does not support over frames anyway); DAU is the plain per-day
    // distinct; stickiness = dau/wau as one rational division.
    // Partial leading windows are kept and mirrored — a 7-day WAU on
    // day 3 genuinely means "actives so far", both engines agree.
    "x_stickiness" -> ((s, d) => {
      val act = t(s, d, "events")
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
      val dau = act.groupBy("day").agg(count(lit(1)).as("dau"))
      val spanned = act.select(col("user_id"),
          explode(sequence(col("day"),
            col("day") + expr("INTERVAL 6 DAYS"),
            expr("INTERVAL 1 DAY"))).as("t"))
        .distinct()
      val wau = spanned.groupBy(col("t").as("day"))
        .agg(count(lit(1)).as("wau"))
      // clip to observed days: the fan extends 6 days past the last
      // real day, which would emit phantom trailing rows
      dau.join(wau, "day")
        .select(col("day"), col("dau"), col("wau"),
          roundf(col("dau").cast("double") / col("wau").cast("double"),
            4).as("stickiness"))
        .orderBy("day")
    }),

    // Rolling 7-OBSERVATION MEDIAN of the daily series — the robust
    // smoother dashboards pair with e_ewma (a single spike day moves
    // the mean, not the median). ROW-based, not calendar-based: the
    // frame is the trailing 7 OBSERVED days (rowsBetween(-6,0)), so on
    // a series with missing days it spans more than 7 calendar days —
    // the honest semantics for an as-logged series (a calendar-true
    // variant would first densify day gaps per type, paying a
    // generate-join for zeros that the logging layer never emitted).
    // The window collects exactly 7 integer counts (|days × types|
    // rows, never events), sorts the 7-element array, and takes the
    // middle — an EXACT order statistic, no interpolation, no float.
    // Days without 7 trailing observations are excluded (the e_burst
    // cnt-guard convention) rather than emitting a shorter-window
    // median that silently means something else.
    "e_rollmed" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-6, 0)
      daily
        .withColumn("arr", collect_list(col("c")).over(w))
        .filter(size(col("arr")) === 7)
        .select(col("event_type"), col("day"), col("c"),
          element_at(array_sort(col("arr")), 4).as("med7"))
        .orderBy("event_type", "day")
    }),

    // CALENDAR-TRUE rolling 7-day median — e_rollmed's other
    // semantics, behind its own registered lever (the as-logged
    // ROW-based form above stays the default; ROADMAP r16 #5): the
    // daily series is DENSIFIED per event_type over its own observed
    // span (sequence + left join, zero-filled gap days — paying the
    // generate-join the row-based form's comment prices), so the
    // trailing-7-ROW frame IS the trailing 7 CALENDAR days and the
    // median genuinely answers "median daily volume this week" even
    // when the logging layer skipped days. Gap days appear in the
    // output with c=0 (the dashboard has a value every day). The fan
    // is |types × span-days| rows — calendar-bounded, never events.
    // EventsSpec proves the two variants diverge exactly on a series
    // with a gap.
    "e_rollmed_cal" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val dense = daily.groupBy("event_type")
        .agg(min("day").as("lo"), max("day").as("hi"))
        .select(col("event_type"), explode(sequence(col("lo"),
          col("hi"), expr("INTERVAL 1 DAY"))).as("day"))
        .join(daily, Seq("event_type", "day"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-6, 0)
      dense
        .withColumn("arr", collect_list(col("c")).over(w))
        .filter(size(col("arr")) === 7)
        .select(col("event_type"), col("day"), col("c"),
          element_at(array_sort(col("arr")), 4).as("med7"))
        .orderBy("event_type", "day")
    }),

    // Seasonal-naive forecast backtest — the baseline every real
    // forecasting pipeline must beat, evaluated the way a 100 TB
    // pipeline can afford: forecast(day) = count at the 7th PRIOR
    // OBSERVATION (lag(c, 7) — row-based, so on a series with missing
    // days the "week-ago" anchor is the 7th observed day back, which
    // may be further than 7 calendar days; same disclosed row-based
    // semantics as e_rollmed) via one lag window over the daily
    // series, error = WMAPE
    // (Σ|f−a| / Σa — the aggregate form keeps everything INTEGER
    // until one final division, where per-day MAPE would divide
    // per row and average floats). Per event_type: evaluated days,
    // exact integer absolute-error total, and the rational WMAPE.
    "e_forecast_eval" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("event_type").orderBy("day")
      daily
        .withColumn("f", lag(col("c"), 7).over(w))
        .filter(col("f").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("f") - col("c"))).as("abs_err"),
          sum(col("c")).as("actual"))
        .select(col("event_type"), col("n_days"), col("abs_err"),
          roundf(col("abs_err").cast("double") /
            col("actual").cast("double"), 6).as("wmape"))
        .orderBy("event_type")
    }),

    // CALENDAR-TRUE seasonal-naive backtest — e_forecast_eval's other
    // semantics, completing the row/calendar pair the same way
    // e_rollmed_cal does: the daily series is densified per type
    // (zero-filled gap days over the observed span), so lag(c, 7) IS
    // the count 7 CALENDAR days ago — the anchor a "week-ago naive"
    // forecast actually means — and gap days are themselves evaluated
    // (forecasting a day the logging layer skipped counts its full
    // forecast as error, which is honest: the forecast was wrong).
    // Same integer error sums, one final division. RollmedSpec proves
    // the divergence on the gap fixture (WMAPE 3.5 row vs 5.0 cal).
    "e_forecast_eval_cal" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val dense = daily.groupBy("event_type")
        .agg(min("day").as("lo"), max("day").as("hi"))
        .select(col("event_type"), explode(sequence(col("lo"),
          col("hi"), expr("INTERVAL 1 DAY"))).as("day"))
        .join(daily, Seq("event_type", "day"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      val w = Window.partitionBy("event_type").orderBy("day")
      dense
        .withColumn("f", lag(col("c"), 7).over(w))
        .filter(col("f").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("f") - col("c"))).as("abs_err"),
          sum(col("c")).as("actual"))
        .select(col("event_type"), col("n_days"), col("abs_err"),
          roundf(col("abs_err").cast("double") /
            col("actual").cast("double"), 6).as("wmape"))
        .orderBy("event_type")
    }),

    // Cohort LTV curves — e_retention's value-weighted sibling and the
    // unit-economics readout every growth team tracks: users keyed by
    // first-active day, cumulative per-user value at each weekly age.
    // Per-cohort-per-age value sums are exact decimals (the rollup
    // grid), the cumulative sum is a window over ≤ |cohorts × ages|
    // rows (calendar-bounded, never events), cohort sizes are one
    // distinct count, and the per-user division is the single double
    // at the end. The first-day join reuses the user_id partitioning
    // the cohort build already created (the e_retention exchange-reuse
    // argument).
    "e_ltv" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
          roundf(col("value"), 4).cast("decimal(18,4)").as("v"))
      val first = ev.groupBy("user_id").agg(min("day").as("cday"))
      val aged = ev.join(first, "user_id")
        .select(col("cday"),
          floor(datediff(col("day"), col("cday")) / 7).cast("int")
            .as("age_weeks"),
          col("v"))
        .groupBy("cday", "age_weeks")
        .agg(sum("v").cast("decimal(38,4)").as("rev"))
      val sizes = first.groupBy("cday")
        .agg(count(lit(1)).as("n_users"))
      val w = Window.partitionBy("cday").orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, 0)
      aged
        .withColumn("cum_rev", sum("rev").over(w).cast("decimal(38,4)"))
        .join(sizes, "cday")
        .select(col("cday").as("cohort_day"), col("age_weeks"),
          col("n_users"),
          roundf(col("cum_rev").cast("double") /
            col("n_users").cast("double"), 4).as("ltv_per_user"))
        .orderBy("cohort_day", "age_weeks")
    }),

    // Exponentially-weighted daily trend — the smoothing statistic
    // dashboards overlay on e_anomaly's raw series. Weights are a
    // 1-day half-life over a 7-day tail: 2⁻ᵏ is an EXACT binary
    // fraction, so the weighted sum of integer counts is exact IEEE
    // arithmetic and no transcendental (exp/ln smoothing constant)
    // reaches the hash surface. Missing leading days shorten the tail
    // (the lag/coalesce pair drops both the term and its weight), so
    // the first days are plain shorter-tail averages, not zero-padded
    // underestimates. Seven lag columns over one type-partitioned
    // sort — |days × types| rows, never events.
    "e_ewma" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val terms = (0 to 6).map { k =>
        val lk = if (k == 0) col("c") else lag(col("c"), k).over(w)
        (when(lk.isNotNull, lk.cast("double") / lit(math.pow(2.0, k)))
          .otherwise(lit(0.0)),
         when(lk.isNotNull, lit(1.0 / math.pow(2.0, k)))
          .otherwise(lit(0.0)))
      }
      val num = terms.map(_._1).reduce(_ + _)
      val den = terms.map(_._2).reduce(_ + _)
      daily
        .withColumn("ewma", roundf(num / den, 4))
        .select("event_type", "day", "c", "ewma")
        .orderBy("event_type", "day")
    }),

    // Cohort retention matrix: users keyed by first-active day, counted
    // on each later active day — the standard product-analytics view.
    // Shape: one distinct on (user, day), one per-user min, one
    // re-join + count; the cohort table is |users| rows (broadcast at
    // this SF, plain hash join at 100 TB — both sides already partition
    // on user_id, so Catalyst reuses the exchange).
    "e_retention" -> ((s, d) => {
      val act = t(s, d, "events")
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
      val coh = act.groupBy("user_id").agg(min("day").as("cohort_day"))
      act.join(coh, "user_id")
        .select(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast("long")
            .as("day_offset"))
        .groupBy("cohort_day", "day_offset")
        .agg(count("*").as("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),

    // Rolling 28-day distinct actives per day (the MAU curve) — EXACT,
    // via the inverted-window contribution pattern: instead of a
    // count-distinct window over 28 days of raw events (a per-day
    // re-scan, or a giant state store), each DISTINCT (user, day) row
    // fans out to the ≤28 target days it keeps the user active for, and
    // the answer is a plain count of distinct (user, target) pairs.
    // Every stage partial-aggregates; total shuffle is a bounded 28× of
    // the user-day table (itself ≪ events), never a function of window
    // count × window width. Target days are semi-joined to days that
    // actually occur (the day dimension is tiny → broadcast). The
    // approximate scale alternative — per-day HLL sketches merged across
    // 28 days — drops the 28× fan at the cost of the a3_approx bound.
    "e_rolling28" -> ((s, d) => {
      val ud = t(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val days = ud.select(col("day").as("t_day")).distinct()
      val contrib = ud
        .withColumn("t_day",
          explode(sequence(col("day"), date_add(col("day"), 27))))
        .select("user_id", "t_day").distinct()
      contrib.join(broadcast(days), Seq("t_day"))
        .groupBy("t_day").agg(count(lit(1)).as("active_28d"))
        .orderBy("t_day")
    }),

    // Ordered funnel: view → first click AFTER the first view → first
    // purchase AFTER that click, per user; one row of stage populations.
    // The sequential dependency makes this three conditional min-aggs,
    // each joined back on user_id — every stage shuffles on the SAME key,
    // so the exchanges after stage 1 are reused, and each stage's input
    // shrinks (funnels only narrow).
    "e_funnel" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t_view"))
      val c = ev.join(v, "user_id")
        .filter(col("event_type") === "click" && col("ts") > col("t_view"))
        .groupBy("user_id").agg(min("ts").as("t_click"))
      val p = ev.join(c, "user_id")
        .filter(col("event_type") === "purchase" &&
          col("ts") > col("t_click"))
        .groupBy("user_id").agg(min("ts").as("t_purchase"))
      v.agg(count("*").as("n_view_users"))
        .crossJoin(c.agg(count("*").as("n_click_users")))
        .crossJoin(p.agg(count("*").as("n_purchase_users")))
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

    // Event-type transition matrix (first-order Markov counts) — the
    // behavior-modeling staple over clickstreams. The lag window is
    // partitioned by user_id: ONE shuffle of events on their natural
    // key, per-user frames sort locally, and the (prev, next) pair
    // counts partial-aggregate before the |types|²-row final shuffle.
    // The share normalization windows over those ≤|types|² count rows,
    // never the raw events. Deterministic ordering: (ts, event_id)
    // tie-break inside the frame.
    "e_transitions" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val tr = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNotNull)
      val counts = tr.groupBy("prev_type", "event_type")
        .agg(count(lit(1)).as("n"))
      val wt = Window.partitionBy("prev_type")
      counts
        .withColumn("share", roundf(col("n").cast("double") /
          sum(col("n")).over(wt).cast("double"), 4))
        .orderBy("prev_type", "event_type")
    }),

    // Incremental extract: SystemModstamp high-water-mark filter, applied
    // on the raw INT64 column so it pushes into the parquet scan
    // (PushedFilters: GreaterThan) — at 100 TB this is the difference
    // between reading a day and reading a decade. Note `>` on the raw
    // unit is a strict superset of `>` on truncated micros only when the
    // watermark is on a whole-µs boundary (ours is, by construction),
    // keeping oracle parity. The watermark DERIVES from the data's own
    // range (1/3 depth, two footer-stat scalars, embedded as a literal
    // so the pushdown survives) — a fixed date goes vacuous-but-green
    // under a regenerated calendar.
    "e_incremental" -> ((s, d) => {
      val mm = graft.etl.Tables.load(s, d, "events")
        .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
        .head()
      val wmMicros = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 3
      graft.etl.Tables.eventsSince(s, d,
          java.time.Instant.ofEpochSecond(wmMicros / 1000000L,
            (wmMicros % 1000000L) * 1000L))
        .groupBy("event_type")
        .agg(count("*").as("n"), min(col("ts")).as("first_ts"),
          max(col("ts")).as("last_ts"))
        .orderBy("event_type")
    }),

    // Day-of-week seasonality profile — the third time-series
    // diagnostic (autocorrelation, changepoint, now seasonality): per
    // event type, the weekday distribution plus a chi-squared
    // uniformity verdict whose expected count is n/7 — a RATIO of the
    // group's own total, so the only constants are the df=6 critical
    // value (12.5916) and the calendar. One |types × 7|-row aggregate;
    // the x_chisq two-stage evaluation keeps the statistic
    // deterministic.
    "e_dow_profile" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type"), dayofweek(col("ts")).as("dow"))
      val cells = ev.groupBy("event_type", "dow")
        .agg(count(lit(1)).as("obs"))
      val tot = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      val contrib = cells.join(tot, "event_type")
        .withColumn("exp", col("n").cast("double") / lit(7.0))
        .withColumn("chi",
          (col("obs").cast("double") - col("exp")) *
            (col("obs").cast("double") - col("exp")) / col("exp"))
      val stat = contrib.groupBy("event_type")
        .agg(roundf(sum(roundf(col("chi"), 9).cast("decimal(38,9)"))
          .cast("double"), 6).as("chi2"))
      contrib.join(stat, "event_type")
        .select(col("event_type"), col("dow"), col("obs"),
          roundf(col("exp"), 4).as("expected"),
          roundf(col("chi"), 6).as("contrib"), col("chi2"),
          (col("chi2") > lit(12.5916)).as("reject_uniform"))
        .orderBy("event_type", "dow")
    }),

    // Funnel stage latency — how long do conversions take? For every
    // user completing view → click → purchase (e_funnel's sequential
    // mins), the stage deltas in µs, summarized per stage pair by
    // EXACT rank-selected median and p90: rank r = the element at
    // position ceil(q·n) under the (delta, user_id) total order — a
    // deterministic order statistic, not an interpolation, so both
    // engines agree bit-for-bit. The rank window runs over
    // |converted users| rows (funnels only narrow — bounded), never
    // the event stream.
    "e_funnel_time" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t_view"))
      val c = ev.join(v, "user_id")
        .filter(col("event_type") === "click" && col("ts") > col("t_view"))
        .groupBy("user_id").agg(min("ts").as("t_click"))
      val p = ev.join(c, "user_id")
        .filter(col("event_type") === "purchase" &&
          col("ts") > col("t_click"))
        .groupBy("user_id").agg(min("ts").as("t_purchase"))
      val full = v.join(c, "user_id").join(p, "user_id")
      val stages = full.select(col("user_id"),
          explode(array(
            struct(lit("1_view_to_click").as("stage"),
              (unix_micros(col("t_click")) -
                unix_micros(col("t_view"))).as("delta_us")),
            struct(lit("2_click_to_purchase").as("stage"),
              (unix_micros(col("t_purchase")) -
                unix_micros(col("t_click"))).as("delta_us")))).as("e"))
        .select(col("user_id"), col("e.stage"), col("e.delta_us"))
      val w = Window.partitionBy("stage")
        .orderBy(asc("delta_us"), asc("user_id"))
      val ranked = stages
        .withColumn("rk", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("stage")))
      ranked.groupBy("stage", "n").agg(
          max(when(col("rk") === ceil(col("n") * lit(0.5)),
            col("delta_us"))).as("median_us"),
          max(when(col("rk") === ceil(col("n") * lit(0.9)),
            col("delta_us"))).as("p90_us"))
        .select(col("stage"), col("n"), col("median_us"), col("p90_us"))
        .orderBy("stage")
    }),

    // Top behavioral paths — the e_transitions idea extended to
    // 3-step sequences (the product-analytics "what do users do
    // before X" query): per-user event streams ordered by
    // (ts, event_id), consecutive type trigrams via two lead windows
    // over ONE user-partitioned sort (the same single natural-key
    // shuffle as e_transitions — no self-joins), trigram counts
    // partial-aggregate map-side to ≤ |types|³ rows, and the top-20
    // resolves with a deterministic (count DESC, path ASC) tie-break
    // so LIMIT is stable in both engines.
    "e_pathing" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val tri = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("t2", lead("event_type", 1).over(w))
        .withColumn("t3", lead("event_type", 2).over(w))
        .filter(col("t3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("t2"),
          col("t3")).as("path"))
      tri.groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("path"))
        .limit(20)
    }),

    // RFM segmentation — the classic customer-value triage (recency /
    // frequency / monetary quartiles): one groupBy builds the three
    // per-customer metrics (recency in whole days off the corpus max
    // date — one footer-stat scalar embedded as a literal; monetary as
    // an exact decimal sum), then each metric is quartiled with
    // Windows.ntileBySketch — the TWO-JOB exact equal-frequency
    // bucketing (approx cut points bound each sketch bucket, global
    // rank = bucket offset + within-bucket row_number), so no
    // customer-cardinality window ever runs on one partition. Ties
    // break on customer id, making all three tile columns and the
    // concatenated segment label deterministic. Oracle = plain SQL
    // ntile(4) over the identical total orders — the exact-tiling
    // equivalence w5_ntile already pins.
    "e_rfm" -> ((s, d) => {
      val o = t(s, d, "orders")
      val maxMic = o.agg(max(unix_micros(col("o_orderdate"))))
        .head.getLong(0)
      val per = o.groupBy("o_custkey").agg(
          max(unix_micros(col("o_orderdate"))).as("lastmic"),
          count(lit(1)).as("frequency"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("monetary"))
        .withColumn("recency_days",
          expr(s"($maxMic - lastmic) DIV 86400000000"))
        .drop("lastmic")
      val tiled = Windows.ntileBySketch(
        Windows.ntileBySketch(
          Windows.ntileBySketch(per, "recency_days", Seq("o_custkey"),
            4, out = "r_tile"),
          "frequency", Seq("o_custkey"), 4, out = "f_tile"),
        "monetary", Seq("o_custkey"), 4, out = "m_tile")
      tiled.select(col("o_custkey"), col("recency_days"),
          col("frequency"), col("monetary"),
          col("r_tile"), col("f_tile"), col("m_tile"),
          concat(col("r_tile").cast("string"),
            col("f_tile").cast("string"),
            col("m_tile").cast("string")).as("rfm"))
        .orderBy("o_custkey")
    }),

    // Multi-touch attribution — first-touch, last-touch, and linear
    // credit per channel for every conversion (purchase), over the
    // user's click/view touchpoints in a 7-day lookback. The join is
    // EQUI on user_id with the time range as a residual predicate —
    // one hash exchange on the natural key, per-user touch lists stay
    // local, no banded self-join needed because conversions and
    // touches co-partition. First/last resolve via min/max over
    // (ts, event_id, channel) structs — two partial-agg'd hash aggs,
    // no per-conversion sort (the lpaArgmax discipline); linear
    // credit is cnt/n grid-rounded to 1e-9 then summed as exact
    // decimals, and the revenue split (value·cnt/n) to 1e-4 — the
    // wpagerank determinism discipline, so both engines agree
    // bit-for-bit on fractional credit. Conversions with zero
    // in-window touches drop out of every model consistently.
    "e_attribution" -> ((s, d) => {
      val ev = t(s, d, "events")
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("conv_id"), col("user_id"),
          col("ts").as("cts"), col("value"))
      val touch = ev.filter(col("event_type").isin("click", "view"))
        .select(col("event_id").as("tid"), col("user_id"),
          col("ts").as("tts"), col("event_type").as("channel"))
      val tj = conv.join(touch, Seq("user_id"))
        .filter(col("tts") < col("cts") &&
          col("tts") >= col("cts") - expr("INTERVAL 7 DAYS"))
      val per = tj.groupBy("conv_id").agg(
        count(lit(1)).as("n"),
        min(struct(col("tts"), col("tid"), col("channel"))).as("f"),
        max(struct(col("tts"), col("tid"), col("channel"))).as("l"),
        min(col("value")).as("value"))
      val perCh = tj.groupBy("conv_id", "channel")
        .agg(count(lit(1)).as("cnt"))
      val linear = perCh
        .join(per.select("conv_id", "n", "value"), "conv_id")
        .select(col("channel"),
          roundf(col("cnt") / col("n"), 9).as("lc"),
          roundf(col("value") * col("cnt") / col("n"), 4).as("lv"))
        .groupBy("channel").agg(
          roundf(sum(col("lc").cast("decimal(38,9)")).cast("double"), 6)
            .as("linear_conversions"),
          sum(col("lv").cast("decimal(22,4)")).cast("double")
            .as("linear_value"))
      val firstT = per.groupBy(col("f.channel").as("channel"))
        .agg(count(lit(1)).as("n_first"))
      val lastT = per.groupBy(col("l.channel").as("channel"))
        .agg(count(lit(1)).as("n_last"))
      linear.join(firstT, Seq("channel"), "left")
        .join(lastT, Seq("channel"), "left")
        .select(col("channel"),
          coalesce(col("n_first"), lit(0L)).as("n_first"),
          coalesce(col("n_last"), lit(0L)).as("n_last"),
          col("linear_conversions"), col("linear_value"))
        .orderBy("channel")
    }))

  val oracles: Map[String, String] = Map(
    // DuckDB dayofweek is 0=Sunday; Spark is 1=Sunday — the +1 aligns
    "e_dow_profile" ->
      """WITH ev AS (
           SELECT event_type, dayofweek(ts) + 1 AS dow FROM events),
         cells AS (SELECT event_type, dow, COUNT(*) AS obs
                   FROM ev GROUP BY 1, 2),
         tot AS (SELECT event_type, COUNT(*) AS n FROM ev GROUP BY 1),
         e1 AS (
           SELECT c.event_type, c.dow, c.obs, t.n::DOUBLE / 7.0 AS exp
           FROM cells c JOIN tot t USING (event_type)),
         e2 AS (
           SELECT *, (obs::DOUBLE - exp) * (obs::DOUBLE - exp) / exp
             AS chi
           FROM e1),
         stat AS (
           SELECT event_type,
             floor(CAST(SUM(CAST(floor(chi * 1000000000.0 + 0.5)
               / 1000000000.0 AS DECIMAL(38,9))) AS DOUBLE)
               * 1000000.0 + 0.5) / 1000000.0 AS chi2
           FROM e2 GROUP BY 1)
         SELECT e2.event_type, e2.dow, e2.obs,
           floor(e2.exp * 10000.0 + 0.5) / 10000.0 AS expected,
           floor(e2.chi * 1000000.0 + 0.5) / 1000000.0 AS contrib,
           st.chi2, st.chi2 > 12.5916 AS reject_uniform
         FROM e2 JOIN stat st USING (event_type)
         ORDER BY event_type, dow""",
    // exact rank-selected order statistics over the same total order
    "e_funnel_time" ->
      """WITH ev AS (SELECT user_id, event_type, ts FROM events),
         v AS (SELECT user_id, MIN(ts) AS t_view FROM ev
               WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, MIN(e.ts) AS t_click
               FROM ev e JOIN v ON e.user_id = v.user_id
               WHERE e.event_type = 'click' AND e.ts > v.t_view
               GROUP BY 1),
         p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
               FROM ev e JOIN c ON e.user_id = c.user_id
               WHERE e.event_type = 'purchase' AND e.ts > c.t_click
               GROUP BY 1),
         full_ AS (
           SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
           FROM v JOIN c USING (user_id) JOIN p USING (user_id)),
         stages AS (
           SELECT user_id, '1_view_to_click' AS stage,
             epoch_us(t_click) - epoch_us(t_view) AS delta_us
           FROM full_
           UNION ALL
           SELECT user_id, '2_click_to_purchase',
             epoch_us(t_purchase) - epoch_us(t_click)
           FROM full_),
         ranked AS (
           SELECT stage, user_id, delta_us,
             row_number() OVER (PARTITION BY stage
               ORDER BY delta_us, user_id) AS rk,
             COUNT(*) OVER (PARTITION BY stage) AS n
           FROM stages)
         SELECT stage, n,
           MAX(CASE WHEN rk = CAST(ceil(n * 0.5) AS BIGINT)
             THEN delta_us END) AS median_us,
           MAX(CASE WHEN rk = CAST(ceil(n * 0.9) AS BIGINT)
             THEN delta_us END) AS p90_us
         FROM ranked GROUP BY stage, n ORDER BY stage""",
    "e_pathing" ->
      """WITH seq AS (
           SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         paths AS (
           SELECT event_type || '>' || t2 || '>' || t3 AS path
           FROM seq WHERE t3 IS NOT NULL)
         SELECT path, COUNT(*) AS n FROM paths
         GROUP BY 1 ORDER BY n DESC, path LIMIT 20""",
    // plain ntile(4) over the identical (metric, custkey) total
    // orders — equal to the sketch-bucketed exact tiling by the
    // boundary formula both implementations share
    "e_rfm" ->
      """WITH mx AS (SELECT epoch_us(MAX(o_orderdate)) AS mm
                     FROM orders),
         per AS (
           SELECT o_custkey,
             ((SELECT mm FROM mx) - epoch_us(MAX(o_orderdate)))
               // 86400000000 AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS monetary
           FROM orders GROUP BY 1),
         t AS (
           SELECT *,
             ntile(4) OVER (ORDER BY recency_days, o_custkey) AS r_tile,
             ntile(4) OVER (ORDER BY frequency, o_custkey) AS f_tile,
             ntile(4) OVER (ORDER BY monetary, o_custkey) AS m_tile
           FROM per)
         SELECT o_custkey, recency_days, frequency, monetary,
           r_tile, f_tile, m_tile,
           r_tile::VARCHAR || f_tile::VARCHAR || m_tile::VARCHAR AS rfm
         FROM t ORDER BY o_custkey""",
    // first/last via row_number windows — a different evaluation of
    // the same (ts, event_id) total order the Spark struct-min uses
    "e_attribution" ->
      """WITH conv AS (
           SELECT event_id AS conv_id, user_id, ts AS cts, value
           FROM events WHERE event_type = 'purchase'),
         touch AS (
           SELECT event_id AS tid, user_id, ts AS tts,
             event_type AS channel
           FROM events WHERE event_type IN ('click', 'view')),
         tj AS (
           SELECT c.conv_id, c.value, t.channel, t.tts, t.tid
           FROM conv c JOIN touch t ON t.user_id = c.user_id
            AND t.tts < c.cts AND t.tts >= c.cts - INTERVAL 7 DAY),
         ranked AS (
           SELECT *,
             row_number() OVER (PARTITION BY conv_id
               ORDER BY tts, tid) AS rf,
             row_number() OVER (PARTITION BY conv_id
               ORDER BY tts DESC, tid DESC) AS rl,
             count(*) OVER (PARTITION BY conv_id) AS n
           FROM tj),
         firstt AS (SELECT channel, count(*) AS n_first
                    FROM ranked WHERE rf = 1 GROUP BY 1),
         lastt AS (SELECT channel, count(*) AS n_last
                   FROM ranked WHERE rl = 1 GROUP BY 1),
         lin AS (
           SELECT conv_id, channel, count(*) AS cnt, min(n) AS n,
             min(value) AS value
           FROM ranked GROUP BY 1, 2),
         linagg AS (
           SELECT channel,
             floor(CAST(SUM(CAST(
                 floor(cnt / n * 1000000000.0 + 0.5) / 1000000000.0
                 AS DECIMAL(38,9))) AS DOUBLE) * 1000000.0 + 0.5)
               / 1000000.0 AS linear_conversions,
             CAST(SUM(CAST(
                 floor(value * cnt / n * 10000.0 + 0.5) / 10000.0
                 AS DECIMAL(22,4))) AS DOUBLE) AS linear_value
           FROM lin GROUP BY 1)
         SELECT l.channel,
           COALESCE(f.n_first, 0) AS n_first,
           COALESCE(t.n_last, 0) AS n_last,
           l.linear_conversions, l.linear_value
         FROM linagg l
         LEFT JOIN firstt f USING (channel)
         LEFT JOIN lastt t USING (channel)
         ORDER BY channel""",
    "e_transitions" ->
      """WITH tr AS (
           SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_type
           FROM events),
         c AS (SELECT prev_type, event_type, COUNT(*) AS n
               FROM tr WHERE prev_type IS NOT NULL GROUP BY 1, 2)
         SELECT prev_type, event_type, n,
           floor(n::DOUBLE / (SUM(n) OVER (PARTITION BY prev_type))::DOUBLE
             * 10000.0 + 0.5) / 10000.0 AS share
         FROM c ORDER BY prev_type, event_type""",
    "e_retention" ->
      """WITH act AS (
           -- CAST: DuckDB date_trunc('day') yields DATE; Spark's yields
           -- TIMESTAMP — align the oracle's type with the Spark side
           SELECT DISTINCT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
           FROM events),
         coh AS (SELECT user_id, min(day) AS cohort_day
                 FROM act GROUP BY 1)
         SELECT coh.cohort_day,
           date_diff('day', coh.cohort_day, act.day) AS day_offset,
           COUNT(*) AS n_users
         FROM act JOIN coh USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "e_rolling28" ->
      """WITH ud AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         days AS (SELECT DISTINCT day AS t_day FROM ud),
         c AS (
           SELECT DISTINCT user_id, t_day
           FROM ud JOIN days ON t_day BETWEEN day AND day + 27)
         SELECT t_day, COUNT(*) AS active_28d
         FROM c GROUP BY t_day ORDER BY t_day""",
    "e_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, ts FROM events),
         v AS (SELECT user_id, min(ts) AS t_view FROM ev
               WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT ev.user_id, min(ev.ts) AS t_click
               FROM ev JOIN v USING (user_id)
               WHERE ev.event_type = 'click' AND ev.ts > v.t_view
               GROUP BY 1),
         p AS (SELECT ev.user_id, min(ev.ts) AS t_purchase
               FROM ev JOIN c USING (user_id)
               WHERE ev.event_type = 'purchase' AND ev.ts > c.t_click
               GROUP BY 1)
         SELECT (SELECT COUNT(*) FROM v) AS n_view_users,
                (SELECT COUNT(*) FROM c) AS n_click_users,
                (SELECT COUNT(*) FROM p) AS n_purchase_users""",
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
    "e_burst" ->
      """WITH hourly AS (
           SELECT date_trunc('hour', ts) AS h, event_type,
             COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         trailed AS (
           SELECT event_type, h, n,
             SUM(n) OVER (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS sum24,
             COUNT(n) OVER (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS cnt24
           FROM hourly)
         SELECT event_type, h, n,
           CAST(sum24 AS BIGINT) AS sum24,
           CAST(cnt24 AS BIGINT) AS cnt24,
           CASE WHEN n * cnt24 > sum24 * 2 THEN 1 ELSE 0 END AS burst
         FROM trailed WHERE cnt24 >= 12
         ORDER BY event_type, h""",
    // identical fan + distinct counts; the inner join clips the
    // phantom trailing fan days
    "x_stickiness" ->
      """WITH act AS (
           SELECT DISTINCT user_id, date_trunc('day', ts) AS day
           FROM events),
         dau AS (SELECT day, COUNT(*) AS dau FROM act GROUP BY 1),
         sp AS (
           SELECT DISTINCT user_id, day + (k * INTERVAL 1 DAY) AS t
           FROM act, (SELECT unnest(range(0, 7)) AS k)),
         wau AS (SELECT t AS day, COUNT(*) AS wau FROM sp GROUP BY 1)
         SELECT CAST(d.day AS TIMESTAMP) AS day, d.dau, w.wau,
           floor(d.dau::DOUBLE / w.wau::DOUBLE * 10000.0 + 0.5)
             / 10000.0 AS stickiness
         FROM dau d JOIN wau w USING (day)
         ORDER BY day""",
    // identical 7-element window collection, sort, middle pick
    "e_rollmed" ->
      """WITH daily AS (
           SELECT event_type, date_trunc('day', ts) AS day,
             COUNT(*) AS c
           FROM events GROUP BY 1, 2),
         lg AS (
           SELECT event_type, day, c,
             list(c) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS arr
           FROM daily)
         SELECT event_type, CAST(day AS TIMESTAMP) AS day, c,
           list_sort(arr)[4] AS med7
         FROM lg WHERE len(arr) = 7
         ORDER BY event_type, day""",
    // identical per-type densification (generate_series over the
    // observed span, zero-filled), identical 7-element window pick
    "e_rollmed_cal" ->
      """WITH daily AS (
           SELECT event_type, date_trunc('day', ts) AS day,
             COUNT(*) AS c
           FROM events GROUP BY 1, 2),
         span AS (
           SELECT event_type, MIN(day) AS lo, MAX(day) AS hi
           FROM daily GROUP BY 1),
         dense AS (
           SELECT s.event_type, g.day, COALESCE(d.c, 0) AS c
           FROM span s
           CROSS JOIN LATERAL (
             SELECT unnest(generate_series(s.lo, s.hi,
               INTERVAL 1 DAY)) AS day) g
           LEFT JOIN daily d
             ON d.event_type = s.event_type AND d.day = g.day),
         lg AS (
           SELECT event_type, day, c,
             list(c) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS arr
           FROM dense)
         SELECT event_type, CAST(day AS TIMESTAMP) AS day,
           CAST(c AS BIGINT) AS c, list_sort(arr)[4] AS med7
         FROM lg WHERE len(arr) = 7
         ORDER BY event_type, day""",
    // identical lag-7 forecast, integer error sums, one division
    "e_forecast_eval" ->
      """WITH daily AS (
           SELECT event_type, date_trunc('day', ts) AS day,
             COUNT(*) AS c
           FROM events GROUP BY 1, 2),
         lg AS (
           SELECT event_type, day, c,
             lag(c, 7) OVER (PARTITION BY event_type ORDER BY day)
               AS f
           FROM daily)
         SELECT event_type, COUNT(*) AS n_days,
           CAST(SUM(abs(f - c)) AS BIGINT) AS abs_err,
           floor(SUM(abs(f - c))::DOUBLE / SUM(c)::DOUBLE
             * 1000000.0 + 0.5) / 1000000.0 AS wmape
         FROM lg WHERE f IS NOT NULL
         GROUP BY event_type ORDER BY event_type""",
    // identical per-type densification (e_rollmed_cal's dense CTE),
    // identical lag-7 forecast over the DENSE series
    "e_forecast_eval_cal" ->
      """WITH daily AS (
           SELECT event_type, date_trunc('day', ts) AS day,
             COUNT(*) AS c
           FROM events GROUP BY 1, 2),
         span AS (
           SELECT event_type, MIN(day) AS lo, MAX(day) AS hi
           FROM daily GROUP BY 1),
         dense AS (
           SELECT s.event_type, g.day, COALESCE(d.c, 0) AS c
           FROM span s
           CROSS JOIN LATERAL (
             SELECT unnest(generate_series(s.lo, s.hi,
               INTERVAL 1 DAY)) AS day) g
           LEFT JOIN daily d
             ON d.event_type = s.event_type AND d.day = g.day),
         lg AS (
           SELECT event_type, day, c,
             lag(c, 7) OVER (PARTITION BY event_type ORDER BY day)
               AS f
           FROM dense)
         SELECT event_type, COUNT(*) AS n_days,
           CAST(SUM(abs(f - c)) AS BIGINT) AS abs_err,
           floor(SUM(abs(f - c))::DOUBLE / SUM(c)::DOUBLE
             * 1000000.0 + 0.5) / 1000000.0 AS wmape
         FROM lg WHERE f IS NOT NULL
         GROUP BY event_type ORDER BY event_type""",
    // identical exact-decimal grid sums, calendar-bounded cumsum, one
    // final division
    "e_ltv" ->
      """WITH ev AS (
           SELECT user_id, date_trunc('day', ts) AS day,
             CAST(floor(value * 10000.0 + 0.5) / 10000.0
               AS DECIMAL(18,4)) AS v
           FROM events),
         f AS (SELECT user_id, MIN(day) AS cday FROM ev GROUP BY 1),
         aged AS (
           SELECT f.cday,
             CAST(floor(date_diff('day', f.cday, ev.day) / 7.0)
               AS INT) AS age_weeks,
             CAST(SUM(ev.v) AS DECIMAL(38,4)) AS rev
           FROM ev JOIN f USING (user_id)
           GROUP BY 1, 2),
         sz AS (SELECT cday, COUNT(*) AS n_users FROM f GROUP BY 1),
         cum AS (
           SELECT cday, age_weeks,
             CAST(SUM(rev) OVER (PARTITION BY cday ORDER BY age_weeks
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DECIMAL(38,4)) AS cum_rev
           FROM aged)
         SELECT CAST(c.cday AS TIMESTAMP) AS cohort_day, c.age_weeks,
           s.n_users,
           floor(c.cum_rev::DOUBLE / s.n_users::DOUBLE * 10000.0 + 0.5)
             / 10000.0 AS ltv_per_user
         FROM cum c JOIN sz s USING (cday)
         ORDER BY cohort_day, age_weeks""",
    // exact binary-fraction weights: every term and both sums are
    // exactly representable, so the only rounding is the output grid
    "e_ewma" ->
      """WITH daily AS (
           SELECT event_type, date_trunc('day', ts) AS day,
             COUNT(*) AS c
           FROM events GROUP BY 1, 2),
         lg AS (
           SELECT event_type, day, c,
             lag(c, 1) OVER w AS l1, lag(c, 2) OVER w AS l2,
             lag(c, 3) OVER w AS l3, lag(c, 4) OVER w AS l4,
             lag(c, 5) OVER w AS l5, lag(c, 6) OVER w AS l6
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day))
         SELECT event_type, CAST(day AS TIMESTAMP) AS day, c,
           floor((c::DOUBLE
               + COALESCE(l1::DOUBLE / 2.0, 0.0)
               + COALESCE(l2::DOUBLE / 4.0, 0.0)
               + COALESCE(l3::DOUBLE / 8.0, 0.0)
               + COALESCE(l4::DOUBLE / 16.0, 0.0)
               + COALESCE(l5::DOUBLE / 32.0, 0.0)
               + COALESCE(l6::DOUBLE / 64.0, 0.0))
             / (1.0
               + CASE WHEN l1 IS NULL THEN 0.0 ELSE 0.5 END
               + CASE WHEN l2 IS NULL THEN 0.0 ELSE 0.25 END
               + CASE WHEN l3 IS NULL THEN 0.0 ELSE 0.125 END
               + CASE WHEN l4 IS NULL THEN 0.0 ELSE 0.0625 END
               + CASE WHEN l5 IS NULL THEN 0.0 ELSE 0.03125 END
               + CASE WHEN l6 IS NULL THEN 0.0 ELSE 0.015625 END)
             * 10000.0 + 0.5) / 10000.0 AS ewma
         FROM lg ORDER BY event_type, day""",
    // identical integer moments; z rounds on both sides before the
    // |z| >= 2 gate so boundary days cannot diverge
    "e_anomaly" ->
      """WITH daily AS (
           SELECT event_type, date_trunc('day', ts) AS day,
             COUNT(*) AS c
           FROM events GROUP BY 1, 2),
         st AS (
           SELECT event_type, COUNT(*) AS nd, SUM(c) AS sc,
             SUM(c * c) AS sc2
           FROM daily GROUP BY 1
           HAVING COUNT(*) >= 2
             AND COUNT(*) * SUM(c * c) <> SUM(c) * SUM(c)),
         z AS (
           SELECT d.event_type, CAST(d.day AS TIMESTAMP) AS day, d.c,
             floor((d.c * st.nd - st.sc)::DOUBLE /
               (st.nd::DOUBLE * sqrt((st.nd * st.sc2 - st.sc * st.sc)
                 ::DOUBLE / (st.nd * (st.nd - 1))::DOUBLE))
               * 10000.0 + 0.5) / 10000.0 AS z
           FROM daily d JOIN st USING (event_type))
         SELECT event_type, day, c, z FROM z
         WHERE abs(z) >= 2.0 ORDER BY event_type, day""",
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
    // watermark = min + (max-min)//3 in integer µs, mirroring the Spark
    // side's Long truncation exactly
    "e_incremental" ->
      """WITH mm AS (SELECT epoch_us(MIN(ts)) AS l0, epoch_us(MAX(ts)) AS h0
                     FROM events),
         w AS (SELECT l0 + (h0 - l0) // 3 AS wm FROM mm)
         SELECT event_type, COUNT(*) AS n, MIN(ts) AS first_ts,
           MAX(ts) AS last_ts
         FROM events, w WHERE epoch_us(ts) > w.wm
         GROUP BY event_type ORDER BY event_type""")
}
