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
      "multi-level dot paths") {
    intercept[IllegalArgumentException] {
      Soql.parse("SELECT a FROM b WITH SECURITY_ENFORCED")
    }
    intercept[IllegalArgumentException] {
      Soql.parse("SELECT a FROM b OFFSET 5")
    }
    intercept[RuntimeException] {
      Soql.query(spark, dir,
        "SELECT lineitem.orders.o_orderdate FROM lineitem")
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
