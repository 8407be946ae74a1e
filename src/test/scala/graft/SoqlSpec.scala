package graft

import org.apache.spark.sql.functions._
import graft.soql.Soql

/** Golden tests for the SOQL text front-end: each canonical reference
  * shape (oxidized-force/src/client.rs:199-205's raw-text `query`,
  * :214-217's built `SELECT f,… FROM o`) parses, translates, and
  * produces EXACTLY the rows of the equivalent hand-written DataFrame
  * query — including the registry queries the shapes map to (p1/p3/o1/
  * o2/j2/j3 families), so the translator is pinned to oracle-green
  * semantics without needing its own oracle rows.
  */
class SoqlSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def same(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.columns.toSeq == b.columns.toSeq,
      s"column mismatch: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "row multiset mismatch")
  }

  test("SELECT fields FROM obj — the bulk-job shape (client.rs:214-217)") {
    val got = Soql.query(spark, dir,
      "SELECT c_custkey, c_name, c_acctbal FROM customer")
    val want = ops.t(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
    same(got, want)
  }

  test("WHERE with comparison/IN/LIKE/AND/OR/NOT and parentheses") {
    val got = Soql.query(spark, dir,
      "SELECT o_orderkey FROM orders WHERE (o_orderpriority = '1-URGENT'" +
        " OR o_orderpriority IN ('2-HIGH', '3-MEDIUM')) AND NOT" +
        " o_orderstatus = 'F' AND o_totalprice >= 1000 AND" +
        " o_orderpriority LIKE '%-%'")
    val o = ops.t(spark, dir, "orders")
    val want = o.filter(
        (col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority").isin("2-HIGH", "3-MEDIUM")) &&
          !(col("o_orderstatus") === "F") &&
          col("o_totalprice") >= 1000L &&
          col("o_orderpriority").like("%-%"))
      .select("o_orderkey")
    same(got, want)
    assert(got.count() > 0, "predicate fixture selected nothing")
  }

  test("ORDER BY multi-key + LIMIT/OFFSET — the o1/o2 shapes") {
    val got = Soql.query(spark, dir,
      "SELECT c_custkey, c_acctbal FROM customer" +
        " ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 10 OFFSET 5")
    val want = ops.t(spark, dir, "customer")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      .select("c_custkey", "c_acctbal")
      .offset(5).limit(10)
    // deterministic total order (acctbal ties broken by unique key), so
    // position-wise comparison is exact
    assert(got.collect().toSeq.map(_.toSeq) ==
      want.collect().toSeq.map(_.toSeq))
    assert(got.count() == 10)
  }

  test("child-parent dot path translates to a LEFT join (j2 semantics)") {
    val got = Soql.query(spark, dir,
      "SELECT o_orderkey, customer.c_name, customer.c_mktsegment" +
        " FROM orders WHERE customer.c_mktsegment = 'BUILDING'")
    val o = ops.t(spark, dir, "orders")
    val c = ops.t(spark, dir, "customer")
    val want = o.join(c, o("o_custkey") === c("c_custkey"), "left")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("o_orderkey"), col("c_name").as("customer_c_name"),
        col("c_mktsegment").as("customer_c_mktsegment"))
    same(got, want)
    assert(got.count() > 0)
  }

  test("dot path on a row with NO parent yields null fields, row kept " +
      "when unfiltered (SOQL outer semantics)") {
    // nation → region is total in TPC-H, so synthesize the absent
    // parent through the graph on lineitem → part with a filter that
    // keeps null-parent rows visible: select WITHOUT a where
    val got = Soql.query(spark, dir,
      "SELECT n_nationkey, region.r_name FROM nation")
    assert(got.count() == ops.t(spark, dir, "nation").count(),
      "unfiltered dot path must keep every child row (left join)")
    assert(got.columns.toSeq == Seq("n_nationkey", "region_r_name"))
  }

  test("parent-child nested subquery translates to the j3_nested shape") {
    val got = Soql.query(spark, dir,
      "SELECT c_custkey, (SELECT o_orderkey FROM orders WHERE" +
        " o_totalprice > 200000) FROM customer ORDER BY c_custkey")
    val c = ops.t(spark, dir, "customer")
    val o = ops.t(spark, dir, "orders")
      .filter(col("o_totalprice") > 200000L)
    val nested = o.groupBy("o_custkey")
      .agg(array_join(transform(
        array_sort(collect_list(col("o_orderkey"))),
        x => x.cast("string")), ",").as("orders_o_orderkey_list"))
    val want = c.join(nested, c("c_custkey") === nested("o_custkey"),
        "left")
      .select(col("c_custkey"),
        coalesce(col("orders_o_orderkey_list"), lit(""))
          .as("orders_o_orderkey_list"))
      .orderBy("c_custkey")
    same(got, want)
    // the j3_nested registry query is this exact shape — cross-check
    // the translator against the oracle-green query verbatim
    val reg = ops.Relational.queries("j3_nested")(spark, dir)
      .withColumnRenamed("child_ids", "orders_o_orderkey_list")
    same(got.orderBy("c_custkey"), reg)
  }

  test("relationship names resolve through the object graph; unknown " +
      "names refuse loudly with the known set") {
    val ex = intercept[RuntimeException] {
      Soql.query(spark, dir,
        "SELECT o_orderkey, supplier.s_name FROM orders")
    }
    assert(ex.getMessage.contains("no parent relationship") &&
      ex.getMessage.contains("customer"),
      s"unhelpful resolution error: ${ex.getMessage}")
    val ex2 = intercept[RuntimeException] {
      Soql.query(spark, dir,
        "SELECT c_custkey, (SELECT x FROM contacts) FROM customer")
    }
    assert(ex2.getMessage.contains("no child relationship"),
      s"unhelpful child resolution error: ${ex2.getMessage}")
  }

  test("grammar refusals: trailing garbage, OFFSET without LIMIT, " +
      "more than 5 relationship hops") {
    intercept[IllegalArgumentException] {
      Soql.parse("SELECT a FROM b WITH SECURITY_ENFORCED")
    }
    intercept[IllegalArgumentException] {
      Soql.parse("SELECT a FROM b OFFSET 5")
    }
    // SOQL caps relationship traversal at 5 hops; the 6-hop path
    // refuses before any resolution
    intercept[IllegalArgumentException] {
      Soql.query(spark, dir,
        "SELECT a.b.c.d.e.f.x FROM orders")
    }
  }

  test("multi-level dot paths chain LEFT joins (2-hop select, 3-hop " +
      "WHERE), flattened as rel1_rel2_field") {
    val got = Soql.query(spark, dir,
      "SELECT o_orderkey, customer.nation.n_name FROM orders" +
        " WHERE customer.nation.region.r_name = 'ASIA'" +
        " ORDER BY o_orderkey")
    val o = ops.t(spark, dir, "orders")
    val c = ops.t(spark, dir, "customer")
    val n = ops.t(spark, dir, "nation")
    val r = ops.t(spark, dir, "region")
    val want = o.join(c, o("o_custkey") === c("c_custkey"), "left")
      .join(n, c("c_nationkey") === n("n_nationkey"), "left")
      .join(r, n("n_regionkey") === r("r_regionkey"), "left")
      .filter(col("r_name") === "ASIA")
      .select(col("o_orderkey"),
        col("n_name").as("customer_nation_n_name"))
      .orderBy("o_orderkey")
    same(got, want)
    assert(got.count() > 0, "3-hop fixture selected nothing")
    // a chain and its prefix coexist: each hop joins exactly once
    val both = Soql.query(spark, dir,
      "SELECT o_orderkey, customer.c_name, customer.nation.n_name" +
        " FROM orders WHERE o_totalprice > 100000")
    assert(both.columns.toSeq == Seq("o_orderkey", "customer_c_name",
      "customer_nation_n_name"))
    assert(both.count() ==
      o.filter(col("o_totalprice") > 100000L).count(),
      "left-join chain must not duplicate or drop base rows")
  }

  test("date literals: anchored half-open day ranges with SOQL range " +
      "semantics for =/!=/</<=/>/>=") {
    val t0 = Some(java.time.LocalDate.of(1998, 6, 15))
    val o = ops.t(spark, dir, "orders")
    def ts(s: String) = to_timestamp(lit(s))
    // `=` is containment in the literal's range
    same(
      Soql.query(spark, dir, "SELECT o_orderkey FROM orders" +
        " WHERE o_orderdate = LAST_MONTH", today = t0),
      o.filter(col("o_orderdate") >= ts("1998-05-01 00:00:00") &&
          col("o_orderdate") < ts("1998-06-01 00:00:00"))
        .select("o_orderkey"))
    // `<` is strictly BEFORE the range; `>` strictly AFTER it
    same(
      Soql.query(spark, dir, "SELECT o_orderkey FROM orders" +
        " WHERE o_orderdate < THIS_MONTH", today = t0),
      o.filter(col("o_orderdate") < ts("1998-06-01 00:00:00"))
        .select("o_orderkey"))
    same(
      Soql.query(spark, dir, "SELECT o_orderkey FROM orders" +
        " WHERE o_orderdate > YESTERDAY", today = t0),
      o.filter(col("o_orderdate") >= ts("1998-06-15 00:00:00"))
        .select("o_orderkey"))
    // LAST_N_DAYS:n includes the anchor day plus the n preceding days
    same(
      Soql.query(spark, dir, "SELECT o_orderkey FROM orders" +
        " WHERE o_orderdate >= LAST_N_DAYS:30 AND" +
        " o_orderdate != THIS_YEAR", today = t0),
      o.filter(col("o_orderdate") >= ts("1998-05-16 00:00:00") &&
          !(col("o_orderdate") >= ts("1998-01-01 00:00:00") &&
            col("o_orderdate") < ts("1999-01-01 00:00:00")))
        .select("o_orderkey"))
    // a date literal inside IN expands to its range test (r16 refusal
    // now defined): IN (TODAY) ≡ = TODAY
    same(
      Soql.query(spark, dir,
        "SELECT o_orderkey FROM orders WHERE o_orderdate IN (TODAY)",
        today = t0),
      Soql.query(spark, dir,
        "SELECT o_orderkey FROM orders WHERE o_orderdate = TODAY",
        today = t0))
    intercept[IllegalArgumentException] {
      Soql.parse("SELECT a FROM b WHERE c >= LAST_N_DAYS:0")
    }
  }

  test("date functions CALENDAR_YEAR/CALENDAR_MONTH/DAY_ONLY in WHERE " +
      "and (grouped) in the select list") {
    val o = ops.t(spark, dir, "orders")
    same(
      Soql.query(spark, dir, "SELECT o_orderkey FROM orders" +
        " WHERE CALENDAR_YEAR(o_orderdate) = 1997"),
      o.filter(year(col("o_orderdate")) === 1997L)
        .select("o_orderkey"))
    val got = Soql.query(spark, dir,
      "SELECT CALENDAR_YEAR(o_orderdate) yr, COUNT() n FROM orders" +
        " GROUP BY CALENDAR_YEAR(o_orderdate) ORDER BY yr")
    val want = o.groupBy(year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("n")).orderBy("yr")
    same(got, want)
    // ungrouped date-function select item refuses (SOQL rule)
    intercept[IllegalArgumentException] {
      Soql.parse("SELECT DAY_ONLY(o_orderdate) FROM orders")
    }
  }

  test("INCLUDES/EXCLUDES multipicklist predicates over the derived " +
      "semicolon-joined field") {
    val l = ops.t(spark, dir, "lineitem")
    // INCLUDES: contains EVERY value of SOME item (items OR together)
    same(
      Soql.query(spark, dir, "SELECT l_orderkey, l_linenumber FROM" +
        " lineitem WHERE flags INCLUDES ('A;F', 'R')" +
        " ORDER BY l_orderkey, l_linenumber"),
      l.filter((col("l_returnflag") === "A" &&
          col("l_linestatus") === "F") ||
          col("l_returnflag") === "R" || col("l_linestatus") === "R")
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber"))
    // EXCLUDES is the negation
    same(
      Soql.query(spark, dir, "SELECT l_orderkey, l_linenumber FROM" +
        " lineitem WHERE flags EXCLUDES ('O')" +
        " ORDER BY l_orderkey, l_linenumber"),
      l.filter(!(col("l_returnflag") === "O" ||
          col("l_linestatus") === "O"))
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber"))
    // empty value sets refuse loudly
    intercept[IllegalArgumentException] {
      Soql.parse("SELECT a FROM b WHERE f INCLUDES ('')")
    }
    intercept[IllegalArgumentException] {
      Soql.parse("SELECT a FROM b WHERE f INCLUDES ('A;;B')")
    }
  }

  test("COUNT_DISTINCT and GROUP BY ROLLUP/CUBE") {
    val o = ops.t(spark, dir, "orders")
    val got = Soql.query(spark, dir,
      "SELECT o_orderstatus, COUNT_DISTINCT(o_custkey) nc FROM orders" +
        " GROUP BY o_orderstatus ORDER BY o_orderstatus")
    val want = o.groupBy("o_orderstatus")
      .agg(count_distinct(col("o_custkey")).as("nc"))
      .orderBy("o_orderstatus")
    same(got, want)
    val roll = Soql.query(spark, dir,
      "SELECT o_orderpriority, o_orderstatus, COUNT() n FROM orders" +
        " GROUP BY ROLLUP(o_orderpriority, o_orderstatus)" +
        " ORDER BY o_orderpriority NULLS FIRST," +
        " o_orderstatus NULLS FIRST")
    val wantRoll = o.rollup("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)
    same(roll, wantRoll)
    // grand-total row present exactly once
    assert(roll.filter(col("o_orderpriority").isNull &&
      col("o_orderstatus").isNull).count() == 1)
    val cube = Soql.query(spark, dir,
      "SELECT o_orderstatus, COUNT() n FROM orders" +
        " GROUP BY CUBE(o_orderstatus)" +
        " ORDER BY o_orderstatus NULLS FIRST")
    same(cube, o.cube("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first))
  }

  test("identifier matching is case-insensitive: GROUP BY and HAVING " +
      "resolve select items regardless of case") {
    val got = Soql.query(spark, dir,
      "SELECT O_OrderPriority, COUNT() n FROM orders" +
        " GROUP BY o_orderpriority HAVING count() > 0" +
        " ORDER BY o_orderpriority")
    assert(got.count() > 0)
    assert(got.columns.length == 2,
      "case-differing HAVING agg must reuse the select item, not " +
        "compute a duplicate")
  }

  test("FIELDS(ALL) projects the full frozen schema; STANDARD/CUSTOM " +
      "and mixed select lists refuse") {
    val got = Soql.query(spark, dir,
      "SELECT FIELDS(ALL) FROM region ORDER BY r_regionkey")
    val want = ops.t(spark, dir, "region").orderBy("r_regionkey")
    same(got, want)
    // a relationship WHERE may widen the join frame, but the output
    // stays the object's own columns
    val filtered = Soql.query(spark, dir,
      "SELECT FIELDS(ALL) FROM orders" +
        " WHERE customer.c_mktsegment = 'BUILDING'")
    assert(filtered.columns.toSeq ==
      etl.Tables.schemas("orders").fieldNames.toSeq)
    assert(filtered.count() > 0)
    intercept[IllegalArgumentException] {
      Soql.parse("SELECT o_orderkey, FIELDS(ALL) FROM orders")
    }
  }

  test("FIELDS(STANDARD)/FIELDS(CUSTOM) partition the schema by the " +
      "describe field categories (r15 refusal now accepted)") {
    // orders declares o_orderpriority custom in the testdata graph
    val std = Soql.query(spark, dir,
      "SELECT FIELDS(STANDARD) FROM orders ORDER BY o_orderkey")
    assert(std.columns.toSeq == Seq("o_orderkey", "o_custkey",
      "o_orderstatus", "o_totalprice", "o_orderdate"))
    val cst = Soql.query(spark, dir,
      "SELECT FIELDS(CUSTOM) FROM orders")
    assert(cst.columns.toSeq == Seq("o_orderpriority"))
    assert(std.count() == cst.count())
    // an object with no declared custom fields: STANDARD = ALL,
    // CUSTOM refuses (an empty projection would be silent nonsense)
    val rstd = Soql.query(spark, dir,
      "SELECT FIELDS(STANDARD) FROM region ORDER BY r_regionkey")
    same(rstd, ops.t(spark, dir, "region").orderBy("r_regionkey"))
    val e = intercept[IllegalArgumentException] {
      Soql.query(spark, dir, "SELECT FIELDS(CUSTOM) FROM region")
    }
    assert(e.getMessage.contains("no custom fields"))
    intercept[RuntimeException] {
      Soql.parse("SELECT FIELDS(BOGUS) FROM orders")
    }
  }

  test("customFieldsOf bridges a live describe (JSON -> schema with " +
      "graft.custom metadata) into the FIELDS category partition") {
    val st = graft.schema.Mapping.describeToStructType(
      new SchemaSpec().describeJson)
    assert(Soql.customFieldsOf(st) == Set("tags__c", "payload__c"))
  }

  test("TYPEOF over the polymorphic actor relationship: branch fields " +
      "populate only on their own type's rows") {
    import org.apache.spark.sql.Row
    val got = Soql.query(spark, dir,
      "SELECT event_id, TYPEOF actor WHEN Customer THEN c_name" +
        " WHEN Supplier THEN s_name, s_acctbal END FROM events" +
        " ORDER BY event_id LIMIT 500")
    assert(got.columns.toSeq == Seq("event_id", "actor_type",
      "actor_customer_c_name", "actor_supplier_s_name",
      "actor_supplier_s_acctbal"))
    val rows = got.collect()
    assert(rows.nonEmpty)
    // the discriminator and the branch gating agree on every row
    val ev = ops.t(spark, dir, "events").orderBy("event_id").limit(500)
      .select("event_id", "user_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val even = ev(r.getLong(0)) % 2 == 0
      assert(r.getString(1) == (if (even) "Customer" else "Supplier"))
      if (even) assert(r.isNullAt(3) && r.isNullAt(4),
        s"supplier branch populated on a Customer row: $r")
      else assert(r.isNullAt(2),
        s"customer branch populated on a Supplier row: $r")
    }
    // both types actually occur, and joined names resolve when present
    assert(rows.exists(r => !r.isNullAt(2)) &&
      rows.exists(r => !r.isNullAt(3)))
  }

  test("IN-list NULL and date literals (r16 refusals now defined): " +
      "NULL matches null fields, NOT IN excludes them, dates are ranges") {
    val today = Some(java.time.LocalDate.of(2024, 1, 28))
    // category (derived) is null below value 50 — IN (null, 'x')
    // matches every low-value row plus high-value x rows
    val in = Soql.query(spark, dir,
      "SELECT event_id, value, event_type FROM events" +
        " WHERE category IN (null, 'click') AND ts >= LAST_N_DAYS:2",
      today = today).collect()
    assert(in.nonEmpty)
    assert(in.forall(r =>
      r.getDouble(1) < 50 || r.getString(2) == "click"))
    assert(in.exists(_.getDouble(1) < 50) &&
      in.exists(r => r.getDouble(1) >= 50 &&
        r.getString(2) == "click"))
    // NOT IN with a NULL item excludes null-category rows entirely
    val notIn = Soql.query(spark, dir,
      "SELECT event_id, value, event_type FROM events" +
        " WHERE category NOT IN (null, 'click') AND ts >= LAST_N_DAYS:2",
      today = today).collect()
    assert(notIn.nonEmpty)
    assert(notIn.forall(r =>
      r.getDouble(1) >= 50 && r.getString(2) != "click"))
    // the two sides partition the base set exactly
    val base = Soql.query(spark, dir,
      "SELECT event_id FROM events WHERE ts >= LAST_N_DAYS:2",
      today = today).count()
    assert(in.length + notIn.length == base)
    // date literals inside IN = union of half-open day ranges
    val dl = Soql.query(spark, dir,
      "SELECT event_id FROM events WHERE ts IN (YESTERDAY, TODAY)",
      today = today).count()
    val y = Soql.query(spark, dir,
      "SELECT event_id FROM events WHERE ts = YESTERDAY",
      today = today).count()
    val t = Soql.query(spark, dir,
      "SELECT event_id FROM events WHERE ts = TODAY",
      today = today).count()
    assert(dl == y + t && dl > 0)
  }

  test("TYPEOF ELSE (r16 refusal now accepted): shared standard fields " +
      "populate only on rows no WHEN branch matched") {
    val got = Soql.query(spark, dir,
      "SELECT event_id, TYPEOF actor WHEN Customer THEN c_name" +
        " ELSE Name, Id END FROM events ORDER BY event_id LIMIT 500")
    assert(got.columns.toSeq == Seq("event_id", "actor_type",
      "actor_customer_c_name", "actor_else_name", "actor_else_id"))
    val rows = got.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (r.getString(1) == "Customer")
        assert(r.isNullAt(3) && r.isNullAt(4),
          s"ELSE populated on a branch-matched row: $r")
      else
        // fixture caveat: an odd user_id above the supplier keyspace
        // dangles (no parent row — oracle-mirrored), so ELSE fields
        // are null TOGETHER or populated together
        assert(r.isNullAt(3) == r.isNullAt(4),
          s"ELSE fields partially populated: $r")
    }
    assert(rows.exists(_.getString(1) == "Customer") &&
      rows.exists(r => r.getString(1) == "Supplier" && !r.isNullAt(3)),
      "no resolved Supplier row exercised the ELSE projection")
  }

  test("TYPEOF refusals: non-common ELSE field, unknown relationship, " +
      "undeclared type, aggregate mix, dotted branch fields") {
    // ELSE fields must be common to EVERY target type — event_id is
    // not in any target's shared standard-field map
    intercept[IllegalArgumentException] {
      Soql.query(spark, dir,
        "SELECT TYPEOF actor WHEN Customer THEN c_name" +
          " ELSE event_id END FROM events")
    }
    // and dotted ELSE fields refuse at parse
    intercept[IllegalArgumentException] {
      Soql.parse("SELECT TYPEOF actor WHEN Customer THEN c_name" +
        " ELSE nation.n_name END FROM events")
    }
    intercept[RuntimeException] {
      Soql.query(spark, dir,
        "SELECT TYPEOF owner WHEN Customer THEN c_name END FROM events")
    }
    intercept[RuntimeException] {
      Soql.query(spark, dir,
        "SELECT TYPEOF actor WHEN Nation THEN n_name END FROM events")
    }
    intercept[IllegalArgumentException] {
      Soql.parse("SELECT COUNT(), TYPEOF actor WHEN Customer THEN" +
        " c_name END FROM events")
    }
    intercept[IllegalArgumentException] {
      Soql.parse("SELECT TYPEOF actor WHEN Customer THEN" +
        " nation.n_name END FROM events")
    }
  }

  test("week-granule date literals: ISO Monday-start bounds (r15 " +
      "refusal now accepted, convention pinned)") {
    import graft.soql.Soql.{dateRange, DLit}
    def us(d: java.time.LocalDate) = d.toEpochDay * 86400000000L
    val wed = java.time.LocalDate.of(2024, 1, 17)
    assert(dateRange(DLit("THIS_WEEK", 0), wed) ==
      ((us(java.time.LocalDate.of(2024, 1, 15)),
        us(java.time.LocalDate.of(2024, 1, 22)))))
    assert(dateRange(DLit("LAST_WEEK", 0), wed) ==
      ((us(java.time.LocalDate.of(2024, 1, 8)),
        us(java.time.LocalDate.of(2024, 1, 15)))))
    assert(dateRange(DLit("NEXT_WEEK", 0), wed) ==
      ((us(java.time.LocalDate.of(2024, 1, 22)),
        us(java.time.LocalDate.of(2024, 1, 29)))))
    // a Monday anchor starts its own week (previousOrSame)
    val mon = java.time.LocalDate.of(2024, 1, 15)
    assert(dateRange(DLit("THIS_WEEK", 0), mon)._1 == us(mon))
  }

  test("quarter + fiscal date literals: grids, granule-N current-period " +
      "exclusion, injectable fiscal start month (r15 refusal accepted)") {
    import graft.soql.Soql.{dateRange, DLit}
    def us(d: java.time.LocalDate) = d.toEpochDay * 86400000000L
    def ld(y: Int, m: Int, d: Int) = java.time.LocalDate.of(y, m, d)
    val t = ld(1998, 5, 10) // calendar Q2
    assert(dateRange(DLit("THIS_QUARTER", 0), t) ==
      ((us(ld(1998, 4, 1)), us(ld(1998, 7, 1)))))
    // granule-N families EXCLUDE the current period (the documented
    // SOQL asymmetry with LAST_N_DAYS, which includes today)
    assert(dateRange(DLit("LAST_N_QUARTERS", 2), t) ==
      ((us(ld(1997, 10, 1)), us(ld(1998, 4, 1)))))
    assert(dateRange(DLit("LAST_N_MONTHS", 3), t) ==
      ((us(ld(1998, 2, 1)), us(ld(1998, 5, 1)))))
    assert(dateRange(DLit("NEXT_N_WEEKS", 2), ld(2024, 1, 17)) ==
      ((us(ld(2024, 1, 22)), us(ld(2024, 2, 5)))))
    assert(dateRange(DLit("LAST_N_YEARS", 2), t) ==
      ((us(ld(1996, 1, 1)), us(ld(1998, 1, 1)))))
    // fiscal grid, February start: quarters Feb-Apr/May-Jul/Aug-Oct/
    // Nov-Jan; 1998-03-15 sits in [1998-02-01, 05-01)
    val f = ld(1998, 3, 15)
    assert(dateRange(DLit("THIS_FISCAL_QUARTER", 0), f, 2) ==
      ((us(ld(1998, 2, 1)), us(ld(1998, 5, 1)))))
    assert(dateRange(DLit("LAST_N_FISCAL_QUARTERS", 3), f, 2) ==
      ((us(ld(1997, 5, 1)), us(ld(1998, 2, 1)))))
    // an anchor BEFORE the start month falls in the PRIOR fiscal year
    // (1998-01-15 with an April start is still FY starting 1997-04-01,
    // in its Jan-Mar fourth quarter)
    val jan = ld(1998, 1, 15)
    assert(dateRange(DLit("THIS_FISCAL_YEAR", 0), jan, 4) ==
      ((us(ld(1997, 4, 1)), us(ld(1998, 4, 1)))))
    assert(dateRange(DLit("THIS_FISCAL_QUARTER", 0), jan, 4) ==
      ((us(ld(1998, 1, 1)), us(ld(1998, 4, 1)))))
    // January default = Salesforce's standard fiscal year: fiscal and
    // calendar grids coincide
    assert(dateRange(DLit("THIS_FISCAL_QUARTER", 0), t) ==
      dateRange(DLit("THIS_QUARTER", 0), t))
    // point-period *_AGO family: the documented SOQL equivalences
    assert(dateRange(DLit("N_DAYS_AGO", 0), t) ==
      dateRange(DLit("TODAY", 0), t))
    assert(dateRange(DLit("N_MONTHS_AGO", 1), t) ==
      dateRange(DLit("LAST_MONTH", 0), t))
    assert(dateRange(DLit("N_QUARTERS_AGO", 2), t) ==
      ((us(ld(1997, 10, 1)), us(ld(1998, 1, 1)))))
    assert(dateRange(DLit("N_FISCAL_QUARTERS_AGO", 1), f, 2) ==
      dateRange(DLit("LAST_FISCAL_QUARTER", 0), f, 2))
    assert(dateRange(DLit("N_FISCAL_YEARS_AGO", 1), jan, 4) ==
      ((us(ld(1996, 4, 1)), us(ld(1997, 4, 1)))))
    // the fiscal literal parses through the grammar end-to-end
    val q = Soql.parse("SELECT event_id FROM events" +
      " WHERE ts >= THIS_FISCAL_QUARTER")
    assert(q.where.nonEmpty)
    // parameterized fiscal form needs its :n
    intercept[RuntimeException] {
      Soql.parse("SELECT event_id FROM events" +
        " WHERE ts = LAST_N_FISCAL_QUARTERS")
    }
  }

  test("declared 4-4-5 fiscal calendar: index navigation over quarter " +
      "boundaries; out-of-range and malformed calendars refuse") {
    import graft.soql.Soql.{dateRange, DLit}
    def us(d: java.time.LocalDate) = d.toEpochDay * 86400000000L
    def ld(y: Int, m: Int, d: Int) = java.time.LocalDate.of(y, m, d)
    // two 4-4-5 years (13-week quarters) + the terminal boundary
    val cal = Some(Seq(
      ld(1997, 2, 2), ld(1997, 5, 4), ld(1997, 8, 3), ld(1997, 11, 2),
      ld(1998, 2, 1), ld(1998, 5, 3), ld(1998, 8, 2), ld(1998, 11, 1),
      ld(1999, 1, 31)))
    val t = ld(1998, 3, 15) // inside quarter idx 4
    assert(dateRange(DLit("THIS_FISCAL_QUARTER", 0), t, 1, cal) ==
      ((us(ld(1998, 2, 1)), us(ld(1998, 5, 3)))))
    assert(dateRange(DLit("N_FISCAL_QUARTERS_AGO", 2), t, 1, cal) ==
      ((us(ld(1997, 8, 3)), us(ld(1997, 11, 2)))))
    assert(dateRange(DLit("LAST_N_FISCAL_QUARTERS", 3), t, 1, cal) ==
      ((us(ld(1997, 5, 4)), us(ld(1998, 2, 1)))))
    // fiscal years are every-4th-entry groups
    assert(dateRange(DLit("THIS_FISCAL_YEAR", 0), t, 1, cal) ==
      ((us(ld(1998, 2, 1)), us(ld(1999, 1, 31)))))
    assert(dateRange(DLit("LAST_FISCAL_YEAR", 0), t, 1, cal) ==
      ((us(ld(1997, 2, 2)), us(ld(1998, 2, 1)))))
    // the declared grid diverges from EVERY month-aligned grid: no
    // start month puts a quarter boundary on 1998-02-01 AND 1998-05-03
    assert((1 to 12).forall(m =>
      dateRange(DLit("THIS_FISCAL_QUARTER", 0), t, m) !=
        dateRange(DLit("THIS_FISCAL_QUARTER", 0), t, 1, cal)))
    // a literal reaching outside the declared range refuses loudly
    val e1 = intercept[IllegalArgumentException] {
      dateRange(DLit("LAST_N_FISCAL_QUARTERS", 9), t, 1, cal)
    }
    assert(e1.getMessage.contains("cannot be extrapolated"))
    intercept[IllegalArgumentException] { // NEXT_FISCAL_YEAR undeclared
      dateRange(DLit("NEXT_FISCAL_YEAR", 0), t, 1, cal)
    }
    // anchor outside the declared span refuses
    intercept[IllegalArgumentException] {
      dateRange(DLit("THIS_FISCAL_QUARTER", 0), ld(1996, 6, 1), 1, cal)
    }
    // malformed calendars refuse: wrong arity, non-ascending
    intercept[IllegalArgumentException] {
      dateRange(DLit("THIS_FISCAL_QUARTER", 0), t, 1,
        Some(Seq(ld(1997, 2, 2), ld(1997, 5, 4))))
    }
    intercept[IllegalArgumentException] {
      dateRange(DLit("THIS_FISCAL_QUARTER", 0), t, 1,
        Some(Seq(ld(1997, 2, 2), ld(1997, 5, 4), ld(1997, 5, 4),
          ld(1997, 11, 2), ld(1998, 2, 1))))
    }
    // non-fiscal literals ignore the calendar entirely
    assert(dateRange(DLit("THIS_MONTH", 0), t, 1, cal) ==
      dateRange(DLit("THIS_MONTH", 0), t))
  }

  test("a derived field behind a relationship path refuses loudly") {
    // derived (describe-computed) fields exist only on their own
    // object's scan; traversal would surface an opaque
    // unresolved-column error, so the resolver names the cause
    val g = Soql.testdataGraph
    val withDerived = g.copy(derived = g.derived +
      ("customer" -> Map("segtag" ->
        concat_ws("|", col("c_mktsegment"), col("c_name")))))
    val ex = intercept[IllegalArgumentException] {
      Soql.toDataFrame(
        Soql.parse("SELECT o_orderkey, customer.segtag FROM orders"),
        spark, dir, graph = withDerived)
    }
    assert(ex.getMessage.contains("derived field") &&
      ex.getMessage.contains("segtag"), ex.getMessage)
    // ...while the same derived field queried on its OWN object works
    val ok = Soql.toDataFrame(
      Soql.parse("SELECT c_custkey, segtag FROM customer LIMIT 5"),
      spark, dir, graph = withDerived)
    assert(ok.count() == 5 && ok.columns.contains("segtag"))
  }

  test("string-literal escapes decode the standard set; unknown " +
      "escapes refuse") {
    val q = Soql.parse("SELECT a FROM b WHERE c = 'x\\ny\\t\\\\z'")
    q.where.get match {
      case Soql.Cmp(_, "=", Soql.SLit(s)) =>
        assert(s == "x\ny\t\\z", s"mis-decoded escape: ${s.toList}")
      case other => fail(s"unexpected predicate $other")
    }
    intercept[RuntimeException] {
      Soql.parse("SELECT a FROM b WHERE c = 'bad\\qescape'")
    }
  }

  test("aggregate query: COUNT()/SUM/MIN/MAX/AVG with GROUP BY and " +
      "aliases; SOQL default exprN names when unaliased") {
    val got = Soql.query(spark, dir,
      "SELECT o_orderpriority, COUNT() n, MIN(o_totalprice) lo," +
        " MAX(o_totalprice) hi, SUM(o_custkey) FROM orders" +
        " WHERE o_orderstatus != 'P' GROUP BY o_orderpriority" +
        " ORDER BY o_orderpriority")
    val want = ops.t(spark, dir, "orders")
      .filter(col("o_orderstatus") =!= "P")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), min("o_totalprice").as("lo"),
        max("o_totalprice").as("hi"), sum("o_custkey").as("expr3"))
      .orderBy("o_orderpriority")
      .select("o_orderpriority", "n", "lo", "hi", "expr3")
    same(got, want)
    assert(got.count() > 0)
    // ungrouped COUNT() — the client.rs count shape
    val c = Soql.query(spark, dir, "SELECT COUNT() FROM customer")
    assert(c.columns.toSeq == Seq("expr0") &&
      c.head().getLong(0) == ops.t(spark, dir, "customer").count())
  }

  test("aggregate over a DOT PATH joins the parent before grouping") {
    val got = Soql.query(spark, dir,
      "SELECT o_orderstatus, MAX(customer.c_acctbal) mx, COUNT() n" +
        " FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus")
    val o = ops.t(spark, dir, "orders")
    val c = ops.t(spark, dir, "customer")
    val want = o.join(c, o("o_custkey") === c("c_custkey"), "left")
      .groupBy("o_orderstatus")
      .agg(max("c_acctbal").as("mx"), count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
      .select("o_orderstatus", "mx", "n")
    same(got, want)
    assert(got.count() > 0)
  }

  test("HAVING filters on selected AND unselected aggregate calls; " +
      "the hidden agg column never reaches the output") {
    val o = ops.t(spark, dir, "orders")
    val nAvg = o.count() / 3  // statuses F/O/P are uneven — F and O
                              // sit above the mean, P far below
    val got = Soql.query(spark, dir,
      s"SELECT o_orderstatus, COUNT() n FROM orders" +
        s" GROUP BY o_orderstatus HAVING COUNT() > $nAvg AND" +
        s" MIN(o_totalprice) >= 0 ORDER BY o_orderstatus")
    val want = o.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), min("o_totalprice").as("mn"))
      .filter(col("n") > nAvg && col("mn") >= 0L)
      .orderBy("o_orderstatus")
      .select("o_orderstatus", "n")
    same(got, want)
    val allGroups = o.select("o_orderstatus").distinct().count()
    assert(got.count() > 0 && got.count() < allGroups,
      s"HAVING fixture does not discriminate: ${got.count()} of " +
        s"$allGroups groups survived")
    assert(got.columns.toSeq == Seq("o_orderstatus", "n"),
      "a hidden HAVING agg column leaked into the output")
    intercept[IllegalArgumentException] {
      Soql.parse("SELECT c_name FROM customer HAVING COUNT() > 1")
    }
  }

  test("GROUP BY dotted key NOT in the select list resolves — the " +
      "relationship joins before grouping (eager key resolution)") {
    val got = Soql.query(spark, dir,
      "SELECT COUNT() n FROM orders GROUP BY customer.c_mktsegment")
    val o = ops.t(spark, dir, "orders")
    val c = ops.t(spark, dir, "customer")
    val want = o.join(c, o("o_custkey") === c("c_custkey"), "left")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .select("n")
    same(got, want)
    assert(got.count() > 1, "grouping fixture collapsed to one group")
  }

  test("aggregate grammar refusals: ungrouped plain field, GROUP BY " +
      "without aggregate, agg mixed with child subquery") {
    intercept[IllegalArgumentException] {
      Soql.parse("SELECT o_orderkey, COUNT() FROM orders")
    }
    intercept[IllegalArgumentException] {
      Soql.parse("SELECT o_orderkey FROM orders GROUP BY o_orderkey")
    }
    intercept[IllegalArgumentException] {
      Soql.parse("SELECT COUNT(), (SELECT o_orderkey FROM orders)" +
        " FROM customer")
    }
  }

  test("semi-join subqueries: IN (SELECT ...) is a LEFT SEMI join, " +
      "NOT IN a LEFT ANTI join; OR-combined semi-joins refuse") {
    val c = ops.t(spark, dir, "customer")
    val o = ops.t(spark, dir, "orders")
    // IN ≡ left_semi
    val semi = Soql.query(spark, dir,
      "SELECT c_custkey FROM customer WHERE c_custkey IN" +
        " (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)")
    val wantSemi = c.join(
      o.filter(col("o_totalprice") > 450000L).select("o_custkey"),
      col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey")
    same(semi, wantSemi)
    assert(semi.count() > 0 && semi.count() < c.count(),
      "semi fixture is degenerate")
    // NOT IN ≡ left_anti; the two partition the base exactly
    val anti = Soql.query(spark, dir,
      "SELECT c_custkey FROM customer WHERE c_custkey NOT IN" +
        " (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)")
    assert(semi.count() + anti.count() == c.count(),
      "semi + anti must partition the base object")
    // composes with a residual conjunct on either side of the AND
    val mixed = Soql.query(spark, dir,
      "SELECT c_custkey FROM customer WHERE c_acctbal > 0 AND" +
        " c_custkey IN (SELECT o_custkey FROM orders" +
        " WHERE o_totalprice > 450000)")
    same(mixed, wantSemi.filter(col("c_acctbal") > 0)
      .select("c_custkey"))
    // SOQL's own restriction: no semi-joins under OR/NOT
    val e1 = intercept[RuntimeException] {
      Soql.query(spark, dir,
        "SELECT c_custkey FROM customer WHERE c_acctbal < 0 OR" +
          " c_custkey IN (SELECT o_custkey FROM orders)").collect()
    }
    assert(e1.getMessage.contains("semi-join"), e1.getMessage)
    // subquery WHERE must not traverse relationships
    val e2 = intercept[IllegalArgumentException] {
      Soql.query(spark, dir,
        "SELECT c_custkey FROM customer WHERE c_custkey IN" +
          " (SELECT o_custkey FROM orders" +
          " WHERE customer.c_acctbal > 0)").collect()
    }
    assert(e2.getMessage.contains("direct fields"), e2.getMessage)
  }

  test("null comparisons and NOT IN") {
    val got = Soql.query(spark, dir,
      "SELECT o_orderkey FROM orders WHERE o_orderdate != null AND" +
        " o_orderpriority NOT IN ('1-URGENT')")
    val o = ops.t(spark, dir, "orders")
    val want = o.filter(col("o_orderdate").isNotNull &&
        !col("o_orderpriority").isin("1-URGENT"))
      .select("o_orderkey")
    same(got, want)
  }
}
