package graft.ops

import graft.soql.Soql

/** SOQL text front-end rows on the ORACLE surface — the raw query
  * strings below are the registered artifact (parsed + translated on
  * every Verify run), so a tokenizer, grammar, relationship-resolution,
  * or translation regression goes hash-red against DuckDB instead of
  * only spec-red (SoqlSpec keeps the golden shape-by-shape coverage).
  * The shapes are the reference's canonical ones: raw text through
  * `client.query(q)` (oxidized-force/src/client.rs:199-205), the
  * bulk-job field list (client.rs:214-217), relationship dot paths,
  * and the parent-child nested subquery.
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

    // aggregate shape: COUNT() + exact MIN/MAX (no floating
    // accumulation — the grid discipline stays trivial) with GROUP BY,
    // aliases, and SOQL's default exprN naming exercised via the alias
    // column names the oracle mirrors
    "soql_groupby" -> ((s, d) => Soql.query(s, d,
      "SELECT o_orderpriority, COUNT() n, MIN(o_totalprice) lo," +
        " MAX(o_totalprice) hi FROM orders WHERE o_orderstatus != 'P'" +
        " GROUP BY o_orderpriority ORDER BY o_orderpriority")))

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
         ORDER BY c_custkey""")
}
