package graft.ops

import graft.soql.Soql

/** SOQL text front-end rows on the ORACLE surface — the raw query
  * strings below are the registered artifact (parsed + translated on
  * every Verify run), so a tokenizer, grammar, relationship-resolution,
  * or translation regression goes hash-red against DuckDB instead of
  * only spec-red (SoqlSpec keeps the golden shape-by-shape coverage).
  * The shapes are the reference's canonical ones — raw text through
  * `client.query(q)` (oxidized-force/src/client.rs:199-205), the
  * bulk-job field list (client.rs:214-217), relationship dot paths,
  * the parent-child nested subquery — plus the r15 WHERE surface:
  * anchored date literals (with raw-scan pushdown), date functions,
  * multipicklist INCLUDES/EXCLUDES, multi-hop chains, COUNT_DISTINCT +
  * ROLLUP, FIELDS(ALL), and the events actor dot path whose streaming
  * twin is Streams.soqlExtract.
  */
object SoqlFront {

  val queries: Map[String, Q] = Map(
    // dot path → LEFT join + flattened parent fields, with paging
    "soql_dot" -> ((s, d) => Soql.query(s, d,
      "SELECT o_orderkey, customer.c_name, customer.c_mktsegment" +
        " FROM orders WHERE customer.c_mktsegment = 'BUILDING'" +
        " ORDER BY o_orderkey")),

    // plain filter + multi-key ORDER BY + LIMIT/OFFSET (deterministic:
    // the unique key breaks acctbal ties, so the page is well-defined)
    "soql_page" -> ((s, d) => Soql.query(s, d,
      "SELECT c_custkey, c_acctbal FROM customer" +
        " WHERE c_acctbal >= 0 ORDER BY c_acctbal DESC, c_custkey ASC" +
        " LIMIT 20 OFFSET 10")),

    // parent-child nested subquery → the j3_nested shape (ordered
    // comma-joined child list; deliberately a DIFFERENT threshold than
    // j3_nested so the two rows cannot mask each other)
    "soql_children" -> ((s, d) => Soql.query(s, d,
      "SELECT c_custkey, (SELECT o_orderkey FROM orders WHERE" +
        " o_totalprice > 150000) FROM customer ORDER BY c_custkey")),

    // child ORDER BY + LIMIT — SOQL's top-k-children-per-parent (the
    // w4_topk_group mechanic behind the text grammar): each customer's
    // three highest-value open orders, listed in rank order with the
    // selected key as the pinned tie-break
    "soql_children2" -> ((s, d) => Soql.query(s, d,
      "SELECT c_custkey, (SELECT o_orderkey FROM orders" +
        " WHERE o_orderstatus = 'O'" +
        " ORDER BY o_totalprice DESC LIMIT 3)" +
        " FROM customer ORDER BY c_custkey")),

    // child ORDER BY with explicit NULLS FIRST/LAST (r16's last SOQL
    // refusal, closed r17): the null placement rides the same
    // top-k-per-parent window; fixture caveat disclosed — the child
    // tables carry no nulls, so this row pins grammar + translation
    // (the null-ordering mechanics are Spark's own asc_nulls_* /
    // DuckDB's NULLS keywords, mirrored verbatim)
    "soql_children3" -> ((s, d) => Soql.query(s, d,
      "SELECT c_custkey, (SELECT o_orderkey FROM orders" +
        " WHERE o_totalprice > 250000" +
        " ORDER BY o_orderdate ASC NULLS LAST, o_totalprice DESC" +
        " NULLS FIRST LIMIT 2)" +
        " FROM customer ORDER BY c_custkey")),

    // aggregate shape: COUNT() + exact MIN/MAX (no floating
    // accumulation — the grid discipline stays trivial) with GROUP BY,
    // aliases, and SOQL's default exprN naming exercised via the alias
    // column names the oracle mirrors
    "soql_groupby" -> ((s, d) => Soql.query(s, d,
      "SELECT o_orderpriority, COUNT() n, MIN(o_totalprice) lo," +
        " MAX(o_totalprice) hi FROM orders WHERE o_orderstatus != 'P'" +
        " GROUP BY o_orderpriority ORDER BY o_orderpriority")),

    // date literals, anchored to a fixed `today` inside the events
    // corpus (2024-01-01..30) so the row is deterministic: LAST_N_DAYS
    // includes the anchor day plus the n preceding days; `< TODAY`
    // is strictly-before-the-range (SOQL range semantics)
    "soql_datelit" -> ((s, d) => Soql.query(s, d,
      "SELECT event_id, event_type FROM events" +
        " WHERE ts >= LAST_N_DAYS:7 AND ts < TODAY" +
        " ORDER BY event_id",
      today = Some(java.time.LocalDate.of(2024, 1, 25)))),

    // month/= containment semantics: `= LAST_MONTH` is membership in
    // the literal's half-open day range, anchored mid-corpus on orders
    "soql_datelit2" -> ((s, d) => Soql.query(s, d,
      "SELECT o_orderkey, o_orderdate FROM orders" +
        " WHERE o_orderdate = LAST_MONTH AND o_totalprice > 250000" +
        " ORDER BY o_orderkey",
      today = Some(java.time.LocalDate.of(1998, 6, 15)))),

    // date functions in select + GROUP BY (SOQL requires the agg
    // shape); counts only — the float-accumulation grid stays trivial
    "soql_datefn" -> ((s, d) => Soql.query(s, d,
      "SELECT CALENDAR_YEAR(o_orderdate) yr," +
        " CALENDAR_MONTH(o_orderdate) mo, COUNT() n," +
        " MAX(o_totalprice) hi FROM orders" +
        " WHERE o_orderstatus = 'F'" +
        " GROUP BY CALENDAR_YEAR(o_orderdate)," +
        " CALENDAR_MONTH(o_orderdate) ORDER BY yr, mo")),

    // semi-join subquery — the j4_semi shape through the text grammar
    // (SOQL's `WHERE Id IN (SELECT ...)` idiom): customers holding at
    // least one >400k order; the subquery filter pushes into ITS scan
    // and the key set dedups through the LEFT SEMI join itself
    "soql_semi" -> ((s, d) => Soql.query(s, d,
      "SELECT c_custkey, c_name FROM customer" +
        " WHERE c_custkey IN (SELECT o_custkey FROM orders" +
        " WHERE o_totalprice > 400000)" +
        " ORDER BY c_custkey")),

    // anti-join subquery (NOT IN): suppliers with NO max-quantity
    // deep-discount line; null subquery keys are dropped (the pinned
    // anti-join semantics, not SQL NOT IN's three-valued poison)
    "soql_anti" -> ((s, d) => Soql.query(s, d,
      "SELECT s_suppkey, s_name FROM supplier" +
        " WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem" +
        " WHERE l_quantity = 50 AND l_discount > 0.09)" +
        " ORDER BY s_suppkey")),

    // FISCAL date functions over the injected February-start grid
    // (FISCAL_YEAR pinned to the year the fiscal year STARTS in; a
    // January 1998 order lands in fy=1997 fq=4 — only derivable
    // through the fiscal config), plus CALENDAR_QUARTER
    "soql_datefn2" -> ((s, d) => Soql.query(s, d,
      "SELECT FISCAL_YEAR(o_orderdate) fy," +
        " FISCAL_QUARTER(o_orderdate) fq," +
        " CALENDAR_QUARTER(o_orderdate) cq, COUNT() n," +
        " MAX(o_totalprice) hi FROM orders" +
        " WHERE o_orderstatus = 'F'" +
        " GROUP BY FISCAL_YEAR(o_orderdate)," +
        " FISCAL_QUARTER(o_orderdate), CALENDAR_QUARTER(o_orderdate)" +
        " ORDER BY fy, fq, cq",
      fiscalStartMonth = 2)),

    // INCLUDES/EXCLUDES over the multipicklist wire format (`flags`
    // is the derived semicolon-joined field, e_multipick's fixture):
    // INCLUDES matches rows containing EVERY value of SOME item
    "soql_includes" -> ((s, d) => Soql.query(s, d,
      "SELECT l_orderkey, l_linenumber, flags FROM lineitem" +
        " WHERE flags INCLUDES ('A;F', 'R') AND l_quantity >= 45" +
        " ORDER BY l_orderkey, l_linenumber")),
    "soql_excludes" -> ((s, d) => Soql.query(s, d,
      "SELECT l_orderkey, l_linenumber, flags FROM lineitem" +
        " WHERE flags EXCLUDES ('O', 'N;F') AND l_quantity >= 48" +
        " ORDER BY l_orderkey, l_linenumber")),

    // multi-level dot paths: 2-hop select column, 3-hop WHERE filter
    // (orders→customer→nation→region), flattened as rel1_rel2_field
    "soql_dot2" -> ((s, d) => Soql.query(s, d,
      "SELECT o_orderkey, customer.nation.n_name FROM orders" +
        " WHERE customer.nation.region.r_name = 'ASIA'" +
        " AND o_totalprice > 300000 ORDER BY o_orderkey")),

    // COUNT_DISTINCT + GROUP BY ROLLUP: subtotal rows carry NULL group
    // keys, so ORDER BY pins NULLS FIRST on both sides of the oracle
    "soql_rollup" -> ((s, d) => Soql.query(s, d,
      "SELECT o_orderpriority, o_orderstatus, COUNT() n," +
        " COUNT_DISTINCT(o_custkey) nc FROM orders" +
        " GROUP BY ROLLUP(o_orderpriority, o_orderstatus)" +
        " ORDER BY o_orderpriority NULLS FIRST," +
        " o_orderstatus NULLS FIRST")),

    // multi-hop GROUP BY + HAVING on an aggregate call + agg-alias
    // ORDER BY — the dotted group key orders by its output name
    "soql_having2" -> ((s, d) => Soql.query(s, d,
      "SELECT customer.nation.n_name, COUNT() n FROM orders" +
        " GROUP BY customer.nation.n_name HAVING COUNT() > 300" +
        " ORDER BY customer.nation.n_name")),

    // FIELDS(ALL) — SOQL's full-width projection (p2_star through the
    // text grammar), bounded the way real FIELDS(ALL) queries must be
    "soql_fieldsall" -> ((s, d) => Soql.query(s, d,
      "SELECT FIELDS(ALL) FROM supplier WHERE s_acctbal > 1000" +
        " ORDER BY s_suppkey LIMIT 50")),

    // the event feed's actor lookup: date-literal pushdown AND a
    // parent dot path on the same extract — the exact shape
    // Streams.soqlExtract streams (StreamsSpec proves stream=batch
    // parity for it); here the batch translation is oracle-pinned
    "soql_user" -> ((s, d) => Soql.query(s, d,
      "SELECT event_id, event_type, user.c_mktsegment FROM events" +
        " WHERE ts >= LAST_N_DAYS:3 AND user.c_acctbal > 5000" +
        " ORDER BY event_id",
      today = Some(java.time.LocalDate.of(2024, 1, 20)))),

    // week-granule date literals, ISO Monday-start (the pinned
    // convention — see Soql.dateRange): anchor 2024-01-17 is a
    // Wednesday, so LAST_WEEK = [2024-01-08, 2024-01-15) and `=` is
    // containment in that range; both bounds push onto the raw scan
    "soql_datelit3" -> ((s, d) => Soql.query(s, d,
      "SELECT event_id, event_type FROM events" +
        " WHERE ts = LAST_WEEK AND value >= 50" +
        " ORDER BY event_id",
      today = Some(java.time.LocalDate.of(2024, 1, 17)))),

    // quarter-granule parameterized literal: anchor 1998-05-10 sits in
    // Q2, and LAST_N_QUARTERS:2 EXCLUDES the current quarter (the
    // documented SOQL granule-N asymmetry with LAST_N_DAYS) —
    // [1997-10-01, 1998-04-01)
    "soql_datelit4" -> ((s, d) => Soql.query(s, d,
      "SELECT o_orderkey, o_orderdate FROM orders" +
        " WHERE o_orderdate = LAST_N_QUARTERS:2 AND o_totalprice > 280000" +
        " ORDER BY o_orderkey",
      today = Some(java.time.LocalDate.of(1998, 5, 10)))),

    // point-period literal: N_QUARTERS_AGO:2 from the same anchor is
    // the SINGLE quarter [1997-10-01, 1998-01-01) — a strict subset of
    // soql_datelit4's LAST_N_QUARTERS:2 window, so the pair pins the
    // span-vs-point distinction against the oracle
    "soql_datelit6" -> ((s, d) => Soql.query(s, d,
      "SELECT o_orderkey, o_orderdate FROM orders" +
        " WHERE o_orderdate = N_QUARTERS_AGO:2 AND o_totalprice > 280000" +
        " ORDER BY o_orderkey",
      today = Some(java.time.LocalDate.of(1998, 5, 10)))),

    // FISCAL grid with an injected February start month (quarters
    // Feb-Apr / May-Jul / Aug-Oct / Nov-Jan — deliberately misaligned
    // with the calendar grid, so these bounds are only derivable
    // through the fiscal config): anchor 1998-03-15 is in the fiscal
    // quarter [1998-02-01, 05-01), and LAST_N_FISCAL_QUARTERS:3 =
    // [1997-05-01, 1998-02-01)
    "soql_datelit5" -> ((s, d) => Soql.query(s, d,
      "SELECT o_orderkey, o_orderdate FROM orders" +
        " WHERE o_orderdate = LAST_N_FISCAL_QUARTERS:3" +
        " AND o_totalprice > 290000" +
        " ORDER BY o_orderkey",
      today = Some(java.time.LocalDate.of(1998, 3, 15)),
      fiscalStartMonth = 2)),

    // DECLARED 4-4-5 fiscal calendar (13-week quarters, Sunday-start
    // retail year beginning 1997-02-02): N_FISCAL_QUARTERS_AGO:2 from
    // the 1998-03-15 anchor is the single quarter [1997-08-03,
    // 1997-11-02) — boundaries land mid-week/mid-month, derivable ONLY
    // through the declared calendar, never from any start-month grid
    "soql_datelit7" -> ((s, d) => {
      def ld(y: Int, m: Int, dd: Int) = java.time.LocalDate.of(y, m, dd)
      Soql.query(s, d,
        "SELECT o_orderkey, o_orderdate FROM orders" +
          " WHERE o_orderdate = N_FISCAL_QUARTERS_AGO:2" +
          " AND o_totalprice > 260000" +
          " ORDER BY o_orderkey",
        today = Some(ld(1998, 3, 15)),
        fiscalCalendar = Some(Seq(
          ld(1997, 2, 2), ld(1997, 5, 4), ld(1997, 8, 3),
          ld(1997, 11, 2), ld(1998, 2, 1), ld(1998, 5, 3),
          ld(1998, 8, 2), ld(1998, 11, 1), ld(1999, 1, 31))))
    }),

    // FIELDS(STANDARD) — the category-restricted width projection:
    // the object's describe-declared custom fields drop out of the
    // frozen-schema order (orders declares o_orderpriority custom in
    // the testdata graph, the stand-in for the describe `custom` flag)
    "soql_fieldsstd" -> ((s, d) => Soql.query(s, d,
      "SELECT FIELDS(STANDARD) FROM orders WHERE o_totalprice > 350000" +
        " ORDER BY o_orderkey")),

    // TYPEOF over the polymorphic actor lookup (Salesforce WhoId):
    // even user_ids resolve to a Customer, odd to a Supplier; each
    // branch's fields populate only on its own type's rows, and the
    // flattened actor_type column carries the discriminator
    "soql_typeof" -> ((s, d) => Soql.query(s, d,
      "SELECT event_id, TYPEOF actor WHEN Customer THEN c_name," +
        " c_mktsegment WHEN Supplier THEN s_name, s_acctbal END" +
        " FROM events WHERE ts >= LAST_N_DAYS:2 AND value > 90" +
        " ORDER BY event_id",
      today = Some(java.time.LocalDate.of(2024, 1, 28)))),

    // IN-list NULL + date literals (r16 verdict #5, two refusals now
    // defined semantics): `category` is the nullable derived field
    // (null below value 50), so IN (null, 'click') matches low-value
    // rows AND high-value clicks; `ts IN (YESTERDAY, TODAY)` is the
    // union of two half-open day ranges; the NOT IN conjunct proves
    // the negation excludes null rows
    "soql_inlist" -> ((s, d) => Soql.query(s, d,
      "SELECT event_id, event_type, value FROM events" +
        " WHERE category IN (null, 'click')" +
        " AND ts IN (YESTERDAY, TODAY)" +
        " AND event_type NOT IN ('error', null)" +
        " ORDER BY event_id",
      today = Some(java.time.LocalDate.of(2024, 1, 28)))),

    // TYPEOF with ELSE (r16 verdict #4): branch-matched rows project
    // their branch fields; every OTHER type's rows get the ELSE
    // fields, which must be COMMON to all declared targets (Id/Name —
    // the PolyTarget.common standard-field identity); here Supplier
    // rows flow through ELSE
    "soql_typeof2" -> ((s, d) => Soql.query(s, d,
      "SELECT event_id, TYPEOF actor WHEN Customer THEN c_name," +
        " c_acctbal ELSE Name, Id END" +
        " FROM events WHERE ts >= LAST_N_DAYS:2 AND value > 90" +
        " ORDER BY event_id",
      today = Some(java.time.LocalDate.of(2024, 1, 28)))))

  val oracles: Map[String, String] = Map(
    "soql_dot" ->
      """SELECT o_orderkey,
           c_name AS customer_c_name,
           c_mktsegment AS customer_c_mktsegment
         FROM orders LEFT JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         ORDER BY o_orderkey""",
    "soql_page" ->
      """SELECT c_custkey, c_acctbal FROM customer
         WHERE c_acctbal >= 0
         ORDER BY c_acctbal DESC, c_custkey ASC
         LIMIT 20 OFFSET 10""",
    "soql_groupby" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
         FROM orders WHERE o_orderstatus != 'P'
         GROUP BY 1 ORDER BY 1""",
    "soql_children" ->
      """SELECT c_custkey,
           COALESCE(n.orders_o_orderkey_list, '')
             AS orders_o_orderkey_list
         FROM customer LEFT JOIN (
           SELECT o_custkey,
             array_to_string(list(o_orderkey ORDER BY o_orderkey), ',')
               AS orders_o_orderkey_list
           FROM orders WHERE o_totalprice > 150000
           GROUP BY o_custkey) n
           ON c_custkey = n.o_custkey
         ORDER BY c_custkey""",
    // rank-ordered top-3 list per parent, tie-broken on the selected key
    "soql_children2" ->
      """SELECT c_custkey,
           COALESCE(n.orders_o_orderkey_list, '')
             AS orders_o_orderkey_list
         FROM customer LEFT JOIN (
           SELECT o_custkey,
             array_to_string(list(o_orderkey ORDER BY rk), ',')
               AS orders_o_orderkey_list
           FROM (
             SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS rk
             FROM orders WHERE o_orderstatus = 'O')
           WHERE rk <= 3
           GROUP BY o_custkey) n
           ON c_custkey = n.o_custkey
         ORDER BY c_custkey""",
    // explicit NULLS placement mirrored verbatim in the window order
    "soql_children3" ->
      """SELECT c_custkey,
           COALESCE(n.orders_o_orderkey_list, '')
             AS orders_o_orderkey_list
         FROM customer LEFT JOIN (
           SELECT o_custkey,
             array_to_string(list(o_orderkey ORDER BY rk), ',')
               AS orders_o_orderkey_list
           FROM (
             SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC NULLS LAST,
                   o_totalprice DESC NULLS FIRST, o_orderkey) AS rk
             FROM orders WHERE o_totalprice > 250000)
           WHERE rk <= 2
           GROUP BY o_custkey) n
           ON c_custkey = n.o_custkey
         ORDER BY c_custkey""",
    // anchor 2024-01-25: LAST_N_DAYS:7 = [2024-01-18, 2024-01-26);
    // `>=` includes the range, `< TODAY` is before [2024-01-25, 26)
    "soql_datelit" ->
      """SELECT event_id, event_type FROM events
         WHERE ts >= TIMESTAMP '2024-01-18 00:00:00'
           AND ts < TIMESTAMP '2024-01-25 00:00:00'
         ORDER BY event_id""",
    // anchor 1998-06-15: LAST_MONTH = [1998-05-01, 1998-06-01);
    // `=` is containment in the half-open day range
    "soql_datelit2" ->
      """SELECT o_orderkey, o_orderdate FROM orders
         WHERE o_orderdate >= TIMESTAMP '1998-05-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
           AND o_totalprice > 250000
         ORDER BY o_orderkey""",
    "soql_datefn" ->
      """SELECT year(o_orderdate)::INT AS yr,
           month(o_orderdate)::INT AS mo,
           COUNT(*) AS n, MAX(o_totalprice) AS hi
         FROM orders WHERE o_orderstatus = 'F'
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "soql_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders
           WHERE o_totalprice > 400000)
         ORDER BY c_custkey""",
    // mirror the pinned null-drop: the filtered key set never contains
    // NULL here, so NOT IN and the anti join agree by construction
    "soql_anti" ->
      """SELECT s_suppkey, s_name FROM supplier
         WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem
           WHERE l_quantity = 50 AND l_discount > 0.09
             AND l_suppkey IS NOT NULL)
         ORDER BY s_suppkey""",
    // February-start fiscal grid: fy = year the fiscal year starts in,
    // fq = 3-month block index from the start month
    "soql_datefn2" ->
      """SELECT (year(o_orderdate)
             - CASE WHEN month(o_orderdate) < 2 THEN 1 ELSE 0 END)::INT
             AS fy,
           (((month(o_orderdate) - 2 + 12) % 12) // 3 + 1)::INT AS fq,
           quarter(o_orderdate)::INT AS cq,
           COUNT(*) AS n, MAX(o_totalprice) AS hi
         FROM orders WHERE o_orderstatus = 'F'
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    // flags = returnflag;linestatus — INCLUDES('A;F','R') matches rows
    // whose value set contains {A,F} or contains {R}
    "soql_includes" ->
      """SELECT l_orderkey, l_linenumber,
           l_returnflag || ';' || l_linestatus AS flags
         FROM lineitem
         WHERE (((l_returnflag = 'A' OR l_linestatus = 'A')
                 AND (l_returnflag = 'F' OR l_linestatus = 'F'))
             OR (l_returnflag = 'R' OR l_linestatus = 'R'))
           AND l_quantity >= 45
         ORDER BY l_orderkey, l_linenumber""",
    "soql_excludes" ->
      """SELECT l_orderkey, l_linenumber,
           l_returnflag || ';' || l_linestatus AS flags
         FROM lineitem
         WHERE NOT ((l_returnflag = 'O' OR l_linestatus = 'O')
             OR ((l_returnflag = 'N' OR l_linestatus = 'N')
                 AND (l_returnflag = 'F' OR l_linestatus = 'F')))
           AND l_quantity >= 48
         ORDER BY l_orderkey, l_linenumber""",
    "soql_dot2" ->
      """SELECT o_orderkey, n_name AS customer_nation_n_name
         FROM orders
           LEFT JOIN customer ON o_custkey = c_custkey
           LEFT JOIN nation ON c_nationkey = n_nationkey
           LEFT JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA' AND o_totalprice > 300000
         ORDER BY o_orderkey""",
    "soql_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
           COUNT(DISTINCT o_custkey) AS nc
         FROM orders
         GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
         ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""",
    "soql_having2" ->
      """SELECT n_name AS customer_nation_n_name, COUNT(*) AS n
         FROM orders
           LEFT JOIN customer ON o_custkey = c_custkey
           LEFT JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1 HAVING COUNT(*) > 300
         ORDER BY 1""",
    "soql_fieldsall" ->
      """SELECT * FROM supplier WHERE s_acctbal > 1000
         ORDER BY s_suppkey LIMIT 50""",
    // anchor 2024-01-20: LAST_N_DAYS:3 = [2024-01-17, 2024-01-21)
    "soql_user" ->
      """SELECT event_id, event_type,
           c_mktsegment AS user_c_mktsegment
         FROM events LEFT JOIN customer ON user_id = c_custkey
         WHERE ts >= TIMESTAMP '2024-01-17 00:00:00'
           AND c_acctbal > 5000
         ORDER BY event_id""",
    // anchor 2024-01-17 (Wed) → ISO LAST_WEEK = [2024-01-08, 01-15)
    "soql_datelit3" ->
      """SELECT event_id, event_type FROM events
         WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
           AND ts < TIMESTAMP '2024-01-15 00:00:00'
           AND value >= 50
         ORDER BY event_id""",
    // anchor 1998-05-10 → LAST_N_QUARTERS:2 = [1997-10-01, 1998-04-01)
    // (current quarter excluded)
    "soql_datelit4" ->
      """SELECT o_orderkey, o_orderdate FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1998-04-01 00:00:00'
           AND o_totalprice > 280000
         ORDER BY o_orderkey""",
    // anchor 1998-05-10 → N_QUARTERS_AGO:2 = [1997-10-01, 1998-01-01)
    "soql_datelit6" ->
      """SELECT o_orderkey, o_orderdate FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
           AND o_totalprice > 280000
         ORDER BY o_orderkey""",
    // Feb-start fiscal grid, anchor 1998-03-15 →
    // LAST_N_FISCAL_QUARTERS:3 = [1997-05-01, 1998-02-01)
    "soql_datelit5" ->
      """SELECT o_orderkey, o_orderdate FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-05-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1998-02-01 00:00:00'
           AND o_totalprice > 290000
         ORDER BY o_orderkey""",
    // 4-4-5 calendar, anchor 1998-03-15 (quarter idx 4) →
    // N_FISCAL_QUARTERS_AGO:2 = [cal(2), cal(3)) = [1997-08-03, 11-02)
    "soql_datelit7" ->
      """SELECT o_orderkey, o_orderdate FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-08-03 00:00:00'
           AND o_orderdate < TIMESTAMP '1997-11-02 00:00:00'
           AND o_totalprice > 260000
         ORDER BY o_orderkey""",
    // the frozen orders schema minus the declared custom field
    "soql_fieldsstd" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate
         FROM orders WHERE o_totalprice > 350000
         ORDER BY o_orderkey""",
    // anchor 2024-01-28: LAST_N_DAYS:2 = [2024-01-26, 2024-01-29);
    // each branch LEFT-joins gated on the discriminator, so the other
    // type's rows keep NULL branch fields
    "soql_typeof" ->
      """SELECT event_id,
           CASE WHEN user_id % 2 = 0 THEN 'Customer'
                ELSE 'Supplier' END AS actor_type,
           c.c_name AS actor_customer_c_name,
           c.c_mktsegment AS actor_customer_c_mktsegment,
           s.s_name AS actor_supplier_s_name,
           s.s_acctbal AS actor_supplier_s_acctbal
         FROM events
           LEFT JOIN customer c
             ON user_id = c.c_custkey AND user_id % 2 = 0
           LEFT JOIN supplier s
             ON user_id = s.s_suppkey AND user_id % 2 = 1
         WHERE ts >= TIMESTAMP '2024-01-26 00:00:00' AND value > 90
         ORDER BY event_id""",
    // category = event_type when value >= 50 else NULL; IN with a
    // NULL item ORs an IS NULL test; date literals are day ranges
    // (anchor 2024-01-28); NOT IN ('error', null) = type != 'error'
    // AND type IS NOT NULL (no-op on this null-free column, pinned
    // anyway)
    "soql_inlist" ->
      """SELECT event_id, event_type, value FROM events
         WHERE ((CASE WHEN value >= 50 THEN event_type END) = 'click'
                OR (CASE WHEN value >= 50 THEN event_type END) IS NULL)
           AND ((ts >= TIMESTAMP '2024-01-27 00:00:00'
                 AND ts < TIMESTAMP '2024-01-28 00:00:00')
                OR (ts >= TIMESTAMP '2024-01-28 00:00:00'
                    AND ts < TIMESTAMP '2024-01-29 00:00:00'))
           AND NOT (event_type = 'error' OR event_type IS NULL)
         ORDER BY event_id""",
    // ELSE = the unmatched target's shared standard fields (Supplier
    // here), null on branch-matched rows
    "soql_typeof2" ->
      """SELECT event_id,
           CASE WHEN user_id % 2 = 0 THEN 'Customer'
                ELSE 'Supplier' END AS actor_type,
           c.c_name AS actor_customer_c_name,
           c.c_acctbal AS actor_customer_c_acctbal,
           s.s_name AS actor_else_name,
           s.s_suppkey AS actor_else_id
         FROM events
           LEFT JOIN customer c
             ON user_id = c.c_custkey AND user_id % 2 = 0
           LEFT JOIN supplier s
             ON user_id = s.s_suppkey AND user_id % 2 = 1
         WHERE ts >= TIMESTAMP '2024-01-26 00:00:00' AND value > 90
         ORDER BY event_id""")
}
