package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core (SURVEY §2.2 P*, §2.3 J*, §2.4 A*, §2.6 O*).
  *
  * These evaluate, natively on Spark, the SOQL query surface the reference
  * pushes down verbatim to Salesforce (oxidized-force/src/client.rs:199-205)
  * plus the relationship-query joins implied by its FK model
  * (sql-builder/src/main.rs:89). Every query is a declarative DataFrame plan:
  * Catalyst handles predicate pushdown / column pruning / join selection, and
  * AQE re-plans shuffles at runtime — nothing here hand-schedules execution.
  *
  * Determinism contract (for the DuckDB hash oracle): every query ends in a
  * total ORDER BY over a unique key set, double measures go through the
  * decimal-cast helpers in the package object, and column names match the
  * oracle SQL exactly.
  */
object Relational {

  /** Pass-Join τ=2 segment-blocked fuzzy link (see j_fuzzy_blocked's
    * query comment). `probes` carries (probe_key, dirty_name); `master`
    * carries (c_custkey, c_name). Output: (probe_key, dirty_name,
    * matched_key, dist ≤ 2) — provably identical to the unblocked
    * levenshtein join (FuzzySpec asserts it on varied-length synthetic
    * strings including the L < 3 fallback branch).
    */
  def fuzzyLinkBlocked(probes: org.apache.spark.sql.DataFrame,
      master: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val τ = 2
    val m = master.withColumn("ml", length(col("c_name")))
    val p = probes.withColumn("pl", length(col("dirty_name")))
    // segment layout of a length-L string: b = L div 3, r = L mod 3,
    // lens = [b+(r>0), b+(r>1), b], starts cumulative (1-based)
    def b(l: org.apache.spark.sql.Column) =
      ((l - pmod(l, lit(3))) / lit(3)).cast("int")
    def len_(l: org.apache.spark.sql.Column,
        i: org.apache.spark.sql.Column) = {
      val r = pmod(l, lit(3))
      when(i === 0, b(l) + when(r > 0, 1).otherwise(0))
        .when(i === 1, b(l) + when(r > 1, 1).otherwise(0))
        .otherwise(b(l))
    }
    def start_(l: org.apache.spark.sql.Column,
        i: org.apache.spark.sql.Column) =
      when(i === 0, lit(1))
        .when(i === 1, lit(1) + len_(l, lit(0)))
        .otherwise(lit(1) + len_(l, lit(0)) + len_(l, lit(1)))
    // master: 3 keyed segment rows (requires L ≥ 3 for the pigeonhole
    // to hold — shorter masters take the length-band fallback below)
    val mSeg = m.filter(col("ml") >= 3)
      .select(col("c_custkey"), col("c_name"), col("ml"),
        explode(array((0 to 2).map(i => struct(lit(i).as("si"),
          col("c_name").substr(start_(col("ml"), lit(i)),
            len_(col("ml"), lit(i))).as("seg"))): _*)).as("e"))
      .select(col("c_custkey"), col("c_name"), col("ml"),
        col("e.si"), col("e.seg"))
    // probe: decode a flat 0..74 index into (candidate master length,
    // segment idx, shift), keep in-bounds substrings
    val combos = transform(sequence(lit(0), lit(5 * 3 * 5 - 1)), idx => {
      val lm = col("pl") - τ + (idx / lit(15)).cast("int")
      val si = (pmod(idx, lit(15)) / lit(5)).cast("int")
      val sh = pmod(idx, lit(5)) - τ
      val ln = len_(lm, si)
      val st = start_(lm, si) + sh
      struct(lm.as("lm"), si.as("si"),
        col("dirty_name").substr(st, ln).as("seg"),
        (lm >= 3 && ln >= 1 && st >= 1 &&
          st + ln - lit(1) <= col("pl")).as("ok"))
    })
    val pSeg = p
      .select(col("probe_key"), col("dirty_name"), col("pl"),
        explode(filter(combos, c => c.getField("ok"))).as("e"))
      .select(col("probe_key"), col("dirty_name"),
        col("e.lm"), col("e.si"), col("e.seg"))
      .distinct()
    val candSeg = pSeg.join(mSeg,
        pSeg("lm") === mSeg("ml") && pSeg("si") === mSeg("si") &&
        pSeg("seg") === mSeg("seg"))
      .select(col("probe_key"), col("dirty_name"),
        col("c_custkey"), col("c_name"))
    // fallback: masters shorter than τ+1 chars have no 3-segment
    // pigeonhole — every probe in the ±τ length band is a candidate
    // (via the probe's already-enumerated lm values, still equi)
    val candShort = p
      .select(col("probe_key"), col("dirty_name"),
        explode(sequence(col("pl") - τ, col("pl") + τ)).as("lm"))
      .join(m.filter(col("ml") < 3), col("lm") === col("ml"))
      .select(col("probe_key"), col("dirty_name"),
        col("c_custkey"), col("c_name"))
    // thresholded levenshtein: banded O(τ·n) with early exit instead of
    // the full O(n·m) table; returns -1 above τ and the exact distance
    // otherwise, so filtering >= 0 keeps the result identical
    candSeg.union(candShort).distinct()
      .select(col("probe_key"), col("dirty_name"),
        col("c_custkey").as("matched_key"),
        levenshtein(col("dirty_name"), col("c_name"), τ).as("dist"))
      .filter(col("dist") >= 0)
  }

  private val fuzzySql: String =
    """WITH probes AS (
         SELECT c_custkey AS probe_key,
           substr(c_name, 1, 4) || substr(c_name, 6) AS dirty_name
         FROM customer WHERE c_custkey % 100 = 0)
       SELECT probe_key, dirty_name, c_custkey AS matched_key,
         CAST(levenshtein(dirty_name, c_name) AS INT) AS dist
       FROM probes JOIN customer
         ON abs(length(c_name) - length(dirty_name)) <= 2
           AND levenshtein(dirty_name, c_name) <= 2
       ORDER BY probe_key, matched_key"""

  val queries: Map[String, Q] = Map(

    // P1: explicit field-list projection (client.rs:217 SELECT {fields}).
    "p1_project" -> ((s, d) => {
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // P2: full-width projection (describe→all fields→select all,
    // main.rs:69-74).
    "p2_star" -> ((s, d) => {
      t(s, d, "nation").select(col("*")).orderBy("n_nationkey")
    }),

    // P3: WHERE surface — comparison, IN, LIKE, AND/OR/NOT, range.
    "p3_filter" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      li.filter(
          col("l_shipdate") >= lit("1995-06-01").cast("timestamp") &&
          col("l_returnflag").isin("A", "R") &&
          !(col("l_linestatus") === "O") &&
          (col("l_quantity") < 10 || col("l_discount") > 0.07) &&
          col("l_returnflag").like("%A%"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // P4: scalar expression evaluation in the projection.
    "p4_expr" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          roundf(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("disc_price"),
          roundf(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax")), 4).as("charge"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // J1: FK = PK equi inner join (Case.AccountId = Account.Id shape).
    "j1_inner" -> ((s, d) => {
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .select(col("o_orderkey"), col("c_name"),
          col("o_totalprice").cast("decimal(18,2)").cast("double")
            .as("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // J2: left outer join over a nillable FK — parent columns null-padded.
    "j2_left" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .select(col("c_custkey"), col("o_orderkey"))
        .orderBy(asc("c_custkey"), asc_nulls_first("o_orderkey"))
    }),

    // J2b: FULL OUTER join — null padding in BOTH directions. The sides
    // are per-customer aggregates of different order subsets ('F' vs 'O'
    // status), so each has keys the other lacks. Scale shape: both sides
    // partial-aggregate BEFORE the join (the shuffle carries |custkeys|,
    // not |orders|), and since Spark has no broadcast form for full
    // outer, the sort-merge equi-join this plans to IS the 100 TB plan.
    "j2_full" -> ((s, d) => {
      val o = t(s, d, "orders")
      val f = o.filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey").as("ck_f")).agg(count(lit(1)).as("n_f"))
      val g = o.filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey").as("ck_o")).agg(count(lit(1)).as("n_o"))
      f.join(g, col("ck_f") === col("ck_o"), "full_outer")
        .select(coalesce(col("ck_f"), col("ck_o")).as("c_custkey"),
          coalesce(col("n_f"), lit(0L)).as("n_f"),
          coalesce(col("n_o"), lit(0L)).as("n_o"))
        .orderBy("c_custkey")
    }),

    // J3: parent→child relationship subquery, flattened as per-parent child
    // aggregates (SOQL `SELECT Id, (SELECT ... FROM Contacts)` shape).
    "j3_children" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      val agg = o.groupBy("o_custkey").agg(
        count("*").as("n_orders"),
        dsum(col("o_totalprice")).as("sum_total"),
        min("o_orderkey").as("first_orderkey"))
      c.join(agg, c("c_custkey") === agg("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("sum_total"), lit(0.0)).as("sum_total"),
          col("first_orderkey"))
        .orderBy("c_custkey")
    }),

    // J3b: the literal SOQL nested-subquery shape — child rows
    // materialized per parent as an ordered list (`SELECT Id, (SELECT ...
    // FROM Contacts) FROM Account`). Emitted as a joined string so the
    // hash oracle can compare the nesting exactly.
    "j3_nested" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 200000.0)
      val nested = o.groupBy("o_custkey")
        .agg(array_join(transform(array_sort(collect_list(col("o_orderkey"))),
          x => x.cast("string")), ",").as("child_ids"))
      c.join(nested, c("c_custkey") === nested("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("child_ids"), lit("")).as("child_ids"))
        .orderBy("c_custkey")
    }),

    // J4: semi join (WHERE Id IN (SELECT ...)).
    "j4_semi" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // J5: anti join (NOT IN (SELECT ...)).
    "j5_anti" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 100000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // J6: star-schema join with explicit broadcast of the small dimensions —
    // at 100 TB the fact side never shuffles for dim joins.
    "j6_star" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val su = t(s, d, "supplier")
      val na = t(s, d, "nation")
      val re = t(s, d, "region")
      li.join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
        .join(broadcast(na), su("s_nationkey") === na("n_nationkey"))
        .join(broadcast(re), na("n_regionkey") === re("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count("*").as("n_items"),
          dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
        .orderBy("r_name", "n_name")
    }),

    // Salted skew join — THE manual lever for a hot fact key joining a
    // dim too big to broadcast (AQE's skew-join splits sort-merge
    // partitions, but only AFTER a shuffle materializes the skew; and a
    // 5-row salt domain can defeat its splitting like a2_salted's agg
    // case). Fact side: salt = f(row) mod S; dim side: replicate ×S via
    // explode. Every (key, salt) bucket caps at 1/S of the hot key —
    // result provably identical to the plain join (the oracle IS the
    // plain join). S=8 here; size S to hottest-key-rows / target-task-
    // rows at 100 TB. Salting composes with any join impl (BHJ here at
    // test SF; the pattern targets shuffle joins).
    "j_salted" -> ((s, d) => {
      val S = 8
      val li = t(s, d, "lineitem").withColumn("salt",
        pmod(col("l_orderkey") * 31 + col("l_linenumber"), lit(S))
          .cast("int"))
      val p = t(s, d, "part").withColumn("salt",
        explode(sequence(lit(0), lit(S - 1))))
      li.join(p, li("l_partkey") === p("p_partkey") &&
          li("salt") === p("salt"))
        .groupBy("p_brand")
        .agg(count("*").as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("p_brand")
    }),

    // Bloom-prefiltered fact⋈dim join — Spark's runtime-filter pattern
    // (InjectRuntimeFilter plants this same BloomFilterMightContain
    // predicate under shuffle joins) made EXPLICIT: a KB-sized bloom
    // sketch of the filtered dim keys is built driver-side
    // (df.stat.bloomFilter — a sketch fetch like AQE's runtime stats,
    // never key data) and embedded as a foldable binary literal, so the
    // fact scan drops non-joining rows BEFORE any exchange. At 100 TB
    // this is THE lever for a selective dim filter against a fact table
    // too big to shuffle in full: no false negatives (exact join result
    // preserved — the oracle IS the plain join), bounded false positives
    // (fpp 1%) that the exact join then removes. Whole predicate stays
    // inside WholeStageCodegen; sketch deserializes once per task.
    "j_bloom" -> ((s, d) => {
      val dim = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") > 250000)
        .select(col("o_orderkey"))
      // size the sketch from the true key count (one scalar job);
      // floor of 1000 keeps fpp honest when the filter matches few rows
      val nDim = dim.count()
      val bf = dim.stat.bloomFilter("o_orderkey",
        math.max(nDim, 1000L), 0.01)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      val fact = t(s, d, "lineitem")
      fact
        .filter(org.apache.spark.sql.graftshim.BloomFilters
          .mightContain(bos.toByteArray, col("l_orderkey")))
        .join(broadcast(dim), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(count("*").as("n_items"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderkey")
    }),

    // Fuzzy record linkage — the dirty-data join every CRM ETL runs
    // (matching hand-keyed names against the master table). A probe set
    // of deterministically CORRUPTED names (5th char dropped from every
    // 100th customer) links back to the master via levenshtein ≤ 2,
    // blocked on name length ±2 so the quadratic edit-distance verify
    // touches only length-compatible candidates — same
    // block-then-verify shape as the dedup suite, and the small probe
    // side broadcasts at any master-table scale.
    "j_fuzzy" -> ((s, d) => {
      val master = t(s, d, "customer")
        .select(col("c_custkey"), col("c_name"),
          length(col("c_name")).as("ml"))
      val probes = t(s, d, "customer")
        .filter(col("c_custkey") % 100 === 0)
        .select(col("c_custkey").as("probe_key"),
          concat(substring(col("c_name"), 1, 4),
            substring(col("c_name"), 6, 1000)).as("dirty_name"))
        .withColumn("pl", length(col("dirty_name")))
      // edit distance computed ONCE per candidate (project then filter) —
      // folding it into the join condition re-evaluated it per row for
      // the condition AND the output (2.5-3× the lev() calls, measured
      // ~2× wall). On THIS corpus every name shares one length, so the
      // length block alone can't shrink candidates; the 100 TB answer
      // for that shape is partition-signature blocking (Pass-Join, Li et
      // al. 2011: τ+1 segments — ≤τ edits must leave one segment intact
      // as a substring), which trades this O(|probe|·|master|) verify
      // for segment-bucket joins.
      // thresholded levenshtein (Spark 3.5+): banded O(τ·n) with early
      // exit instead of the full O(n·m) dynamic-programming table —
      // returns -1 when the distance exceeds 2 and the exact distance
      // otherwise, so >= 0 keeps exactly the dist <= 2 rows with the
      // same dist values (oracle unchanged)
      probes.join(master, abs(col("ml") - col("pl")) <= 2)
        .select(col("probe_key"), col("dirty_name"),
          col("c_custkey").as("matched_key"),
          levenshtein(col("dirty_name"), col("c_name"), 2).as("dist"))
        .filter(col("dist") >= 0)
        .orderBy("probe_key", "matched_key")
    }),

    // The SCALE shape for fuzzy linkage: Pass-Join segment blocking
    // (Li, Deng, Feng: "PASS-JOIN: A Partition-based Method for
    // Similarity Joins", VLDB 2011). Pigeonhole: τ=2 edits touch ≤2 of
    // 3 segments, so a true match preserves ≥1 master segment VERBATIM,
    // shifted ≤τ — candidates come from a plain EQUI-join on
    // (master_len, segment_idx, segment_text) against the probe's
    // enumerated substrings (5 lengths × 3 segments × 5 shifts = 75
    // constant fan-out per probe), then the exact levenshtein verify
    // touches bucket-mates only. Same oracle as j_fuzzy: the blocking
    // is result-invariant (FuzzySpec proves set-equality and that the
    // plan is the segment equi-join, not a nested loop). MEASURED on
    // THIS corpus (sf0.1): 9.4 s vs the plain join's 6.8 s — every name
    // is "Customer#0…" so shared segments ("er#000…") collide across
    // the whole table and candidates stay ≈ all pairs, plus blocking
    // overhead. That is a property of the synthetic names, not the
    // algorithm: on real name data (varied lengths/prefixes) segment
    // buckets shatter and this is the all-pairs killer. Both shapes
    // ship; pick by corpus — exactly the d_embed_pairs story.
    "j_fuzzy_blocked" -> ((s, d) => {
      val master = t(s, d, "customer")
        .select(col("c_custkey"), col("c_name"))
      val probes = t(s, d, "customer")
        .filter(col("c_custkey") % 100 === 0)
        .select(col("c_custkey").as("probe_key"),
          concat(substring(col("c_name"), 1, 4),
            substring(col("c_name"), 6, 1000)).as("dirty_name"))
      fuzzyLinkBlocked(probes, master)
        .orderBy("probe_key", "matched_key")
    }),

    // A1: result cardinality as a first-class value (total_size,
    // response.rs:7) + distinct cardinality.
    "a1_count" -> ((s, d) => {
      t(s, d, "lineitem").agg(
        count("*").as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"))
    }),

    // A2: TPC-H Q1 shape — grouped SUM/AVG/COUNT with exact decimal sums.
    "a2_group" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count("*").as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // A2b: skew-safe two-phase aggregation — salt the hot key, partial-agg
    // per (key, salt), then re-aggregate per key. events has only 5
    // event_type values, the classic hot-key shape: at 100 TB a direct
    // groupBy lands each type on ONE reducer; the salt spreads it across
    // 16, and the second phase combines 16×5 tiny rows. Result provably
    // equals the direct groupBy (the oracle IS the direct groupBy).
    "a2_salted" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(col("event_type"), (col("event_id") % 16).as("salt"))
        .agg(count("*").as("pn"), dsum(col("value")).as("psum"))
        .groupBy("event_type")
        .agg(sum(col("pn")).as("n"),
          sum(col("psum").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // A3approx: HLL approximate distinct — the 100 TB form of A3 (no
    // exact-distinct shuffle). HLL sketches are engine-specific, so the
    // hash-checkable output is the BOUND, not the estimate: within_bound
    // = |approx − exact|/exact ≤ 0.05 (rsd 0.02 ⇒ comfortably inside),
    // plus the exact side both engines can agree on. The oracle computes
    // exact + literal TRUE; a drifting sketch flips the boolean and the
    // row hash goes red — the last by-design gap is now end-to-end green.
    "a3_approx" -> ((s, d) => {
      t(s, d, "orders")
        .agg(approx_count_distinct(col("o_custkey"), rsd = 0.02)
            .as("approx"),
          countDistinct(col("o_custkey")).as("exact_custs"),
          count("*").as("n"))
        .select(
          (abs(col("approx") - col("exact_custs")).cast("double") /
            col("exact_custs") <= 0.05).as("within_bound"),
          col("exact_custs"), col("n"))
    }),

    // A3: COUNT(DISTINCT) per group (SOQL COUNT_DISTINCT).
    "a3_distinct" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
          .as("month"))
        .agg(
          countDistinct(col("o_custkey")).as("n_custs"),
          count("*").as("n_orders"))
        .orderBy("month")
    }),

    // A4: ROLLUP with grouping flags.
    "a4_rollup" -> ((s, d) => {
      t(s, d, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count("*").as("n"), dsum(col("o_totalprice")).as("sum_total"))
        .select(col("o_orderstatus"), col("o_orderpriority"), col("n"),
          col("sum_total"))
        .orderBy(asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority"))
    }),

    // A4b: CUBE.
    "a4_cube" -> ((s, d) => {
      t(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count("*").as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"))
    }),

    // A4c: arbitrary GROUPING SETS (beyond rollup/cube) — per-status and
    // per-priority marginals in one pass over the fact table.
    "a4_gsets" -> ((s, d) => {
      t(s, d, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count("*").as("n"), dsum(col("o_totalprice")).as("sum_total"))
        .orderBy(asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority"))
    }),

    // A5: HAVING — post-aggregation filter.
    "a5_having" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(count("*").as("n_orders"), dsum(col("o_totalprice")).as("spend"))
        .filter(col("n_orders") >= 12)
        .orderBy("o_custkey")
    }),

    // O1: multi-key ORDER BY with mixed direction.
    "o1_sort" -> ((s, d) => {
      t(s, d, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .withColumn("o_totalprice",
          col("o_totalprice").cast("decimal(18,2)").cast("double"))
        .orderBy(asc("o_orderstatus"), desc("o_totalprice"), asc("o_orderkey"))
    }),

    // O2: LIMIT + OFFSET over a total order.
    "o2_limit_offset" -> ((s, d) => {
      t(s, d, "orders")
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
        .offset(37)
        .limit(100)
    }),

    // O3: top-k — Catalyst plans TakeOrderedAndProject (no full sort at scale).
    "o3_topk" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").cast("decimal(18,2)").cast("double")
            .as("l_extendedprice"))
        .orderBy(desc("l_extendedprice"), asc("l_orderkey"),
          asc("l_linenumber"))
        .limit(50)
    }),

    // O4: UNION ALL of partitioned extracts (page-concat, response.rs:9).
    "o4_union" -> ((s, d) => {
      val o = t(s, d, "orders")
      val hi = o.filter(col("o_totalprice") > 250000.0)
        .select(col("o_orderkey"), lit("hi").as("bucket"))
      val lo = o.filter(col("o_totalprice") < 5000.0)
        .select(col("o_orderkey"), lit("lo").as("bucket"))
      hi.union(lo).orderBy("o_orderkey", "bucket")
    }),

    // O5: INTERSECT — load reconciliation (source vs target key sets).
    "o5_intersect" -> ((s, d) => {
      val o = t(s, d, "orders")
      val f = o.filter(col("o_orderstatus") === "F").select("o_custkey")
      val p = o.filter(col("o_orderstatus") === "P").select("o_custkey")
      f.intersect(p).orderBy("o_custkey")
    }),

    // O5b: EXCEPT.
    "o5_except" -> ((s, d) => {
      val o = t(s, d, "orders")
      val f = o.filter(col("o_orderstatus") === "F").select("o_custkey")
      val p = o.filter(col("o_orderstatus") === "P").select("o_custkey")
      f.except(p).orderBy("o_custkey")
    }),

    // O6: DISTINCT (exact dedup of extracted rows).
    "o6_distinct" -> ((s, d) => {
      t(s, d, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // [EXT] Skyline / Pareto frontier — "orders not dominated on
    // (price, recency)": no other order has ≥ price AND ≥ date with at
    // least one strict. The naive plan is the O(n²) dominance
    // self-join; 2-D skylines have an O(n log n) SORT-based algorithm
    // instead: over distinct points sorted (price DESC, date DESC),
    // a point is dominated iff the running max of date over PRECEDING
    // rows reaches its own date (preceding ⇔ higher price, or equal
    // price + later date — exactly the dominator set once duplicates
    // are collapsed). A single global window is the classic
    // one-partition scale trap, so the plan is TWO-PHASE: local
    // skylines per hash bucket first (skyline is union-composable —
    // a point dominated within any subset is dominated globally, so
    // bucket pruning is safe), then the exact global pass over the
    // few bucket survivors. The oracle is the quadratic NOT EXISTS
    // truth — a frontier point lost to bucket pruning or a dominated
    // survivor goes hash-red.
    "o_skyline" -> ((s, d) => {
      val pts = t(s, d, "orders")
        .select(col("o_totalprice").as("price"),
          col("o_orderdate").as("odate"))
        .distinct()
      val wLocal = Window.partitionBy("bk")
        .orderBy(desc("price"), desc("odate"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val local = pts
        .withColumn("bk",
          pmod(xxhash64(col("price"), col("odate")), lit(32)))
        .withColumn("dmax", max("odate").over(wLocal))
        .filter(col("dmax").isNull || col("dmax") < col("odate"))
      val wG = Window.orderBy(desc("price"), desc("odate"))
        .rowsBetween(Window.unboundedPreceding, -1)
      local.select("price", "odate")
        .withColumn("dmax", max("odate").over(wG))
        .filter(col("dmax").isNull || col("dmax") < col("odate"))
        .select(col("price"), col("odate"))
        .orderBy(desc("price"), desc("odate"))
    }))

  val oracles: Map[String, String] = Map(
    "p1_project" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "p2_star" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "p3_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-06-01'
           AND l_returnflag IN ('A','R')
           AND NOT (l_linestatus = 'O')
           AND (l_quantity < 10 OR l_discount > 0.07)
           AND l_returnflag LIKE '%A%'
         ORDER BY l_orderkey, l_linenumber""",
    "p4_expr" ->
      """SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) / 10000.0 AS disc_price,
           floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 10000.0 + 0.5) / 10000.0 AS charge
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "j1_inner" ->
      """SELECT o_orderkey, c_name,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "j2_left" ->
      """SELECT c_custkey, o_orderkey
         FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
           ON c_custkey = o.o_custkey
         ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""",
    "j2_full" ->
      """WITH f AS (SELECT o_custkey, COUNT(*) AS n_f FROM orders
             WHERE o_orderstatus = 'F' GROUP BY 1),
           g AS (SELECT o_custkey, COUNT(*) AS n_o FROM orders
             WHERE o_orderstatus = 'O' GROUP BY 1)
         SELECT COALESCE(f.o_custkey, g.o_custkey) AS c_custkey,
           COALESCE(n_f, 0) AS n_f, COALESCE(n_o, 0) AS n_o
         FROM f FULL OUTER JOIN g ON f.o_custkey = g.o_custkey
         ORDER BY c_custkey""",
    "j3_children" ->
      """SELECT c_custkey,
           COALESCE(a.n_orders, 0) AS n_orders,
           COALESCE(a.sum_total, 0.0) AS sum_total,
           a.first_orderkey
         FROM customer LEFT JOIN (
           SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
             MIN(o_orderkey) AS first_orderkey
           FROM orders GROUP BY o_custkey) a
           ON c_custkey = a.o_custkey
         ORDER BY c_custkey""",
    "j3_nested" ->
      """SELECT c_custkey,
           COALESCE(n.child_ids, '') AS child_ids
         FROM customer LEFT JOIN (
           SELECT o_custkey,
             array_to_string(list(o_orderkey ORDER BY o_orderkey), ',')
               AS child_ids
           FROM orders WHERE o_totalprice > 200000.0
           GROUP BY o_custkey) n
           ON c_custkey = n.o_custkey
         ORDER BY c_custkey""",
    "j4_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey IN
           (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "j5_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
         ORDER BY c_custkey""",
    "j_fuzzy" -> fuzzySql,
    // the blocked variant is result-invariant, so its oracle IS the
    // plain unblocked join (same as d_embed_pairs' triangle shape)
    "j_fuzzy_blocked" -> fuzzySql,
    // the bloom prefilter is result-invariant (no false negatives; the
    // exact join removes false positives), so its oracle IS the plain
    // filtered join — a recall bug in the sketch path goes hash-red
    "j_bloom" ->
      """SELECT o_orderkey, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 250000
         GROUP BY o_orderkey ORDER BY o_orderkey""",
    "j_salted" ->
      """SELECT p_brand, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",
    "j6_star" ->
      """SELECT r_name, n_name, COUNT(*) AS n_items,
           CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) / 10000.0 AS DECIMAL(22,4))) AS DOUBLE) AS revenue
         FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name
         ORDER BY r_name, n_name""",
    "a1_count" ->
      """SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders
         FROM lineitem""",
    "a2_group" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) / 10000.0 AS DECIMAL(22,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           COUNT(*) AS count_order
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "a2_salted" ->
      """SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "a3_approx" ->
      """SELECT TRUE AS within_bound,
           COUNT(DISTINCT o_custkey) AS exact_custs,
           CAST(COUNT(*) AS BIGINT) AS n
         FROM orders""",
    "a3_distinct" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
           COUNT(DISTINCT o_custkey) AS n_custs, COUNT(*) AS n_orders
         FROM orders GROUP BY 1 ORDER BY month""",
    "a4_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "a4_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "a4_gsets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_total
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
         ORDER BY o_orderstatus ASC NULLS FIRST,
           o_orderpriority ASC NULLS FIRST""",
    "a5_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
         FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
         ORDER BY o_custkey""",
    "o1_sort" ->
      """SELECT o_orderkey, o_orderstatus,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
         FROM orders
         ORDER BY o_orderstatus ASC,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) DESC,
           o_orderkey ASC""",
    "o2_limit_offset" ->
      """SELECT o_orderkey, o_custkey FROM orders
         ORDER BY o_orderkey LIMIT 100 OFFSET 37""",
    "o3_topk" ->
      """SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS l_extendedprice
         FROM lineitem
         ORDER BY 3 DESC, l_orderkey ASC, l_linenumber ASC
         LIMIT 50""",
    "o4_union" ->
      """SELECT * FROM (
           SELECT o_orderkey, 'hi' AS bucket FROM orders WHERE o_totalprice > 250000.0
           UNION ALL
           SELECT o_orderkey, 'lo' AS bucket FROM orders WHERE o_totalprice < 5000.0)
         ORDER BY o_orderkey, bucket""",
    "o5_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
         ORDER BY o_custkey""",
    "o5_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
         ORDER BY o_custkey""",
    "o6_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    // the quadratic dominance truth the sort-based plan must equal
    "o_skyline" ->
      """WITH pts AS (
           SELECT DISTINCT o_totalprice AS price, o_orderdate AS odate
           FROM orders)
         SELECT price, odate FROM pts o
         WHERE NOT EXISTS (
           SELECT 1 FROM pts x
           WHERE x.price >= o.price AND x.odate >= o.odate
             AND (x.price > o.price OR x.odate > o.odate))
         ORDER BY price DESC, odate DESC""")
}
