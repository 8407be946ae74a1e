package graft.soql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SOQL-dialect text front-end — the one reference surface with no
  * engine analog until now: the reference's entry point accepts SOQL
  * *text* (`oxidized-force/src/client.rs:199-205` passes the raw string
  * as the `q` parameter; `client.rs:214-217` builds `SELECT f,… FROM o`
  * for bulk jobs), while this engine exposes the DataFrame DSL and
  * `spark.sql`. This translator closes that parity gap for the
  * reference's canonical query shapes:
  *
  *   - `SELECT f1, f2 FROM obj WHERE … ORDER BY … LIMIT n OFFSET m`
  *   - child-parent DOT PATHS (`SELECT customer.c_name FROM orders`),
  *     including MULTI-LEVEL chains (`customer.nation.n_name`, up to
  *     SOQL's 5-hop limit) — SOQL's relationship traversal, translated
  *     to LEFT OUTER joins (SOQL yields null fields for an absent
  *     parent, exactly the j2_left semantics);
  *   - parent-child NESTED SUBQUERY
  *     (`SELECT c_custkey, (SELECT o_orderkey FROM orders) FROM
  *     customer`) — translated to the j3_nested shape: the child rows
  *     materialize per parent as an ordered comma-joined string, which
  *     keeps the result hash-comparable; child `ORDER BY … [LIMIT k]`
  *     (top-k children per parent) ranks via one FK-partitioned
  *     row_number window and emits the list in rank order (a child
  *     LIMIT without ORDER BY refuses — no stable order exists);
  *   - SEMI-JOIN subqueries `field [NOT] IN (SELECT f FROM obj
  *     [WHERE …])` — LEFT SEMI / LEFT ANTI joins, valid only as
  *     top-level AND conjuncts (SOQL's own restriction: no semi-joins
  *     under OR/NOT); NOT IN pins anti-join semantics (null subquery
  *     keys dropped, not three-valued-logic poison — see the
  *     translation note);
  *   - AGGREGATE queries: COUNT()/COUNT/COUNT_DISTINCT/SUM/MIN/MAX/
  *     AVG(field-or-dot-path) with optional aliases (SOQL's default
  *     exprN naming otherwise), GROUP BY (plain fields, dot paths, or
  *     date functions) including `GROUP BY ROLLUP(...)`/`CUBE(...)`
  *     grouping supersets (subtotal rows carry NULL group keys —
  *     Spark's rollup/cube verbatim), and HAVING whose aggregate calls
  *     resolve to select items or hidden agg columns. ORDER BY in an
  *     aggregate query resolves against output names: group keys
  *     (dotted/function keys included), aggregate aliases, or exprN;
  *   - DATE LITERALS (`TODAY`, `YESTERDAY`, `TOMORROW`,
  *     `LAST_N_DAYS:n`, `NEXT_N_DAYS:n`, `LAST_90_DAYS`,
  *     `THIS_MONTH`, `LAST_MONTH`, `NEXT_MONTH`, `THIS_YEAR`,
  *     `LAST_YEAR`, `NEXT_YEAR`, the week granule `THIS_WEEK` /
  *     `LAST_WEEK` / `NEXT_WEEK` pinned to ISO Monday-start weeks —
  *     see dateRange for the convention note — the calendar-quarter
  *     granule `THIS/LAST/NEXT_QUARTER`, the FISCAL granule
  *     `THIS/LAST/NEXT_FISCAL_QUARTER` and `_FISCAL_YEAR` anchored to
  *     an injectable per-org fiscal start month (January default —
  *     Salesforce's own standard-fiscal-year default; see dateRange),
  *     and every `LAST_N_*`/`NEXT_N_*` parameterized family over those
  *     grids, which EXCLUDE the current period per the documented SOQL
  *     semantics, unlike `LAST_N_DAYS` which includes today) — the
  *     single most common WHERE idiom
  *     in real incremental extracts (`SystemModstamp >= LAST_N_DAYS:7`;
  *     the reference passes them through verbatim, client.rs:199-205).
  *     Each literal denotes a half-open day-aligned range [lo, hi) and
  *     comparisons follow SOQL's range semantics: `=` is containment,
  *     `<` is before-the-range, `>` is after-the-range, `<=`/`>=`
  *     include it. `LAST_N_DAYS:n` includes today plus the n preceding
  *     days (the documented "starts 00:00:00 n days before the current
  *     day" reading). The anchor day defaults to the wall-clock UTC
  *     date but is injectable (`today` parameter) so tests and the
  *     oracle rows stay deterministic against the corpus calendar;
  *   - DATE FUNCTIONS `CALENDAR_YEAR(f)` / `CALENDAR_MONTH(f)` /
  *     `CALENDAR_QUARTER(f)` / `DAY_ONLY(f)` and the fiscal family
  *     `FISCAL_YEAR(f)` / `FISCAL_QUARTER(f)` / `FISCAL_MONTH(f)`
  *     (sharing the literals' injectable start month — see dateFnCol
  *     for the year-naming pin) in WHERE predicates and (with GROUP
  *     BY, as SOQL requires) in the select list;
  *   - `INCLUDES` / `EXCLUDES` multipicklist predicates
  *     (`flags INCLUDES ('A;F', 'R')`) — the reference's very first
  *     type mapping is multipicklist → array (main.rs:88; wire format
  *     semicolon-joined). Each list item is itself a semicolon-joined
  *     value SET: the row matches when the field contains EVERY value
  *     of SOME item; EXCLUDES is the negation. NULL fields follow SQL
  *     three-valued logic (a Salesforce blank multipicklist is the
  *     empty string, not NULL, so the distinction never arises on real
  *     wire data). Multipicklist fields are declared in the
  *     [[ObjectGraph]] as DERIVED columns — the describe-metadata
  *     analog: the testdata has no semicolon-joined column, so `flags`
  *     on lineitem is declared as returnflag;linestatus exactly like
  *     `e_multipick` synthesizes it.
  *
  * Deliberately NOT covered (the reference itself never emits these
  * through its typed API): the FOR UPDATE/WITH clauses. The grammar
  * refuses loudly rather than mistranslating. Custom fiscal calendars
  * (4-4-5 retail and the like) ARE covered via an injectable
  * declared-period calendar — see dateRange; a literal reaching
  * outside the declared range refuses loudly because a declared
  * calendar cannot be extrapolated.
  *
  * The relationship model is explicit (an [[ObjectGraph]] of parent
  * and child relationships with their key columns) because SOQL
  * resolves relationship NAMES, not foreign keys — the testdata graph
  * below mirrors TPC-H's FK structure the way a Salesforce org's
  * describe metadata would. Translation is to the DataFrame DSL, so
  * every query inherits Catalyst's pushdown/pruning and the same
  * physical planning as the hand-written registry queries (broadcast
  * for the dim-sized parents, partial aggregation under the nested
  * subquery's collect; date-literal bounds are embedded as foldable
  * `timestamp_micros` literals so they push into the parquet scan).
  */
object Soql {

  // ---------- AST ----------

  sealed trait Lit
  final case class SLit(v: String) extends Lit
  final case class NLit(v: BigDecimal) extends Lit
  final case class BLit(v: Boolean) extends Lit
  case object NullLit extends Lit
  /** A SOQL date literal: `kind` is the canonical upper-case name,
    * `n` the `:n` suffix for the parameterized forms (0 otherwise). */
  final case class DLit(kind: String, n: Int) extends Lit

  sealed trait Expr
  final case class Cmp(path: Seq[String], op: String, v: Lit) extends Expr
  final case class InList(path: Seq[String], vs: Seq[Lit],
      negated: Boolean) extends Expr
  /** SOQL semi-join subquery: `path [NOT] IN (SELECT field FROM obj
    * [WHERE ...])`. Only valid as a top-level AND conjunct — SOQL
    * itself refuses semi-joins under OR/NOT. */
  final case class InSubq(path: Seq[String], field: String, obj: String,
      where: Option[Expr], negated: Boolean) extends Expr
  final case class LikeE(path: Seq[String], pattern: String) extends Expr
  /** Multipicklist INCLUDES/EXCLUDES: each item is a semicolon-joined
    * value SET ("A;F" = contains A AND F); items OR together. */
  final case class IncludesE(path: Seq[String], items: Seq[String],
      negated: Boolean) extends Expr
  final case class AndE(l: Expr, r: Expr) extends Expr
  final case class OrE(l: Expr, r: Expr) extends Expr
  final case class NotE(e: Expr) extends Expr

  final case class Order(path: Seq[String], asc: Boolean,
      nullsFirst: Option[Boolean])
  final case class ChildQuery(field: String, rel: String,
      where: Option[Expr], orderBy: Seq[Order] = Seq.empty,
      limit: Option[Int] = None)
  /** One aggregate select item: COUNT() (field None), or
    * COUNT/SUM/MIN/MAX/AVG(field) [alias]. */
  final case class AggItem(fn: String, field: Option[Seq[String]],
      alias: Option[String])
  /** One non-aggregate select or GROUP BY item: a (possibly dotted)
    * field path, optionally wrapped in a date function
    * (CALENDAR_YEAR/CALENDAR_MONTH/DAY_ONLY), optionally aliased
    * (function items only — SOQL has no plain-field aliases). */
  final case class Field(fn: Option[String], path: Seq[String],
      alias: Option[String])
  /** `groupMode` is "" for a plain GROUP BY, or "ROLLUP"/"CUBE" for
    * SOQL's `GROUP BY ROLLUP(...)`/`GROUP BY CUBE(...)` — grouping
    * supersets whose subtotal rows carry NULL group keys, exactly
    * Spark's `rollup`/`cube`. */
  /** One `TYPEOF rel WHEN Type THEN f,… … END` select item over a
    * polymorphic relationship: each branch names the fields to emit
    * when the row's target resolves to that type. */
  final case class TypeofBranch(typeName: String, fields: Seq[String])
  final case class TypeofItem(rel: String, branches: Seq[TypeofBranch],
      elseFields: Seq[String] = Seq.empty)
  /** `fieldsMode` marks a `SELECT FIELDS(...)` projection: "" (none),
    * "ALL" (full width — the p2_star shape), "STANDARD"/"CUSTOM"
    * (category-restricted width from the object's describe field
    * categories); it must be the only select item. */
  final case class Query(fields: Seq[Field],
      children: Seq[ChildQuery], aggs: Seq[AggItem], obj: String,
      where: Option[Expr], groupBy: Seq[Field], groupMode: String,
      having: Option[Expr], orderBy: Seq[Order],
      limit: Option[Int], offset: Option[Int],
      fieldsMode: String = "",
      typeofs: Seq[TypeofItem] = Seq.empty)

  /** HAVING predicates reference aggregate calls; they ride the same
    * Expr tree with the call encoded as a sentinel path
    * ("$agg", FN, field-or-""). Never produced by `path()`, so
    * WHERE cannot accidentally contain one. */
  private val AggMark = "$agg"
  /** Date-function calls in WHERE predicates ride the Expr tree as a
    * sentinel path ("$fn", FN, field...). */
  private val FnMark = "$fn"

  private val aggFns =
    Set("COUNT", "COUNT_DISTINCT", "SUM", "MIN", "MAX", "AVG")
  private val dateFns = Set("CALENDAR_YEAR", "CALENDAR_MONTH",
    "CALENDAR_QUARTER", "DAY_ONLY",
    "FISCAL_YEAR", "FISCAL_QUARTER", "FISCAL_MONTH")

  // ---------- relationship model ----------

  /** One parent relationship: `name` is the SOQL relationship name a
    * dot path traverses; the join is obj.fk = parentTable.pk. */
  final case class ParentRel(name: String, table: String, fk: String,
      pk: String)

  /** One child relationship: `name` is the SOQL child-relationship
    * name a nested subquery FROM names; child rows attach on
    * childTable.fk = obj.pk. */
  final case class ChildRel(name: String, table: String, fk: String,
      pk: String)

  /** One target type of a polymorphic relationship. `common` maps the
    * lower-cased SHARED standard field names (what Salesforce lets a
    * TYPEOF ELSE project — Id, Name, …) to this target's own column —
    * the cross-type field identity a live describe carries for
    * standard fields present on every object. */
  final case class PolyTarget(table: String, pk: String,
      common: Map[String, String] = Map.empty)

  /** A POLYMORPHIC parent relationship (Salesforce WhoId/WhatId): one
    * FK whose target TYPE varies per row. `typeExpr` is the
    * discriminator — a column over the base object's own fields whose
    * value names the target type (describe metadata carries this as
    * the `referenceTo` list plus the companion Type field); `targets`
    * maps each type name to its parent table/pk, insertion-ordered so
    * translation is deterministic. */
  final case class PolyRel(name: String, fk: String, typeExpr: Column,
      targets: Seq[(String, PolyTarget)])

  /** `derived` declares per-object computed fields (lower-case name →
    * column expression over the object's own columns) — the
    * describe-metadata analog for multipicklist fields, whose wire
    * format is a semicolon-joined string (main.rs:88).
    * `customFields` is the per-object field-CATEGORY metadata (the
    * describe `custom` flag, schema/Mapping.scala stamps it as
    * `graft.custom`): the lower-case names of the object's custom
    * fields, which `FIELDS(STANDARD)`/`FIELDS(CUSTOM)` partition the
    * schema by. `polys` holds the polymorphic relationships TYPEOF
    * traverses. */
  final case class ObjectGraph(
      parents: Map[String, Map[String, ParentRel]],
      children: Map[String, Map[String, ChildRel]],
      derived: Map[String, Map[String, Column]] = Map.empty,
      customFields: Map[String, Set[String]] = Map.empty,
      polys: Map[String, Map[String, PolyRel]] = Map.empty)

  /** Field-category extraction from a describe-frozen schema: the
    * field names whose [[graft.schema.Mapping]] metadata carries the
    * describe `custom` flag — the bridge that turns a live describe
    * (JSON → StructType with `graft.custom` markers) into the
    * [[ObjectGraph.customFields]] entry FIELDS(STANDARD)/FIELDS(CUSTOM)
    * partition by. */
  def customFieldsOf(schema: org.apache.spark.sql.types.StructType)
      : Set[String] =
    schema.fields.collect {
      case f if f.metadata.contains(graft.schema.Mapping.K.Custom) &&
          f.metadata.getBoolean(graft.schema.Mapping.K.Custom) =>
        f.name.toLowerCase
    }.toSet

  /** The testdata object graph — TPC-H FK structure expressed as SOQL
    * relationship names (what a Salesforce describe would carry). */
  val testdataGraph: ObjectGraph = ObjectGraph(
    parents = Map(
      "orders" -> Map(
        "customer" -> ParentRel("customer", "customer", "o_custkey",
          "c_custkey")),
      "customer" -> Map(
        "nation" -> ParentRel("nation", "nation", "c_nationkey",
          "n_nationkey")),
      "supplier" -> Map(
        "nation" -> ParentRel("nation", "nation", "s_nationkey",
          "n_nationkey")),
      "nation" -> Map(
        "region" -> ParentRel("region", "region", "n_regionkey",
          "r_regionkey")),
      "lineitem" -> Map(
        "orders" -> ParentRel("orders", "orders", "l_orderkey",
          "o_orderkey"),
        "supplier" -> ParentRel("supplier", "supplier", "l_suppkey",
          "s_suppkey"),
        "part" -> ParentRel("part", "part", "l_partkey", "p_partkey")),
      // the event feed's actor lookup (every user_id resolves to a
      // customer in the testdata, exactly a Salesforce polymorphic
      // owner field pinned to one type)
      "events" -> Map(
        "user" -> ParentRel("user", "customer", "user_id",
          "c_custkey"))),
    children = Map(
      "customer" -> Map(
        "orders" -> ChildRel("orders", "orders", "o_custkey",
          "c_custkey")),
      "orders" -> Map(
        "lineitems" -> ChildRel("lineitems", "lineitem", "l_orderkey",
          "o_orderkey")),
      "nation" -> Map(
        "customers" -> ChildRel("customers", "customer", "c_nationkey",
          "n_nationkey"))),
    derived = Map(
      // the multipicklist fixture: wire format "A;F" exactly as
      // e_multipick (ops/Etl.scala) synthesizes it
      "lineitem" -> Map(
        "flags" -> concat_ws(";", col("l_returnflag"),
          col("l_linestatus"))),
      // a genuinely NULLABLE field (the testdata parquet carries no
      // nulls anywhere): category is the event type only for
      // high-value events — the fixture the IN-list NULL semantics
      // are exercised against
      "events" -> Map(
        "category" -> when(col("value") >= 50, col("event_type")))),
    // the field-category stand-in for describe `custom` flags (the
    // testdata parquet has no __c fields; a live org's categories come
    // through customFieldsOf over the describe-frozen schema — see
    // SoqlSpec's describe-JSON round-trip)
    customFields = Map(
      "orders" -> Set("o_orderpriority"),
      "customer" -> Set("c_mktsegment", "c_acctbal")),
    // the polymorphic actor lookup (Salesforce WhoId): events.user_id
    // resolves to a Customer for even ids and a Supplier for odd ones
    // — the discriminator expression is the testdata stand-in for the
    // companion Type field a real org stores alongside a polymorphic FK
    polys = Map(
      "events" -> Map(
        "actor" -> PolyRel("actor", "user_id",
          when(col("user_id") % 2 === 0, "Customer")
            .otherwise("Supplier"),
          Seq(
            // `common` = the shared standard fields a TYPEOF ELSE may
            // project (Salesforce: Id, Name, …), mapped to each
            // target's own column
            "Customer" -> PolyTarget("customer", "c_custkey",
              Map("id" -> "c_custkey", "name" -> "c_name")),
            "Supplier" -> PolyTarget("supplier", "s_suppkey",
              Map("id" -> "s_suppkey", "name" -> "s_name")))))))

  // ---------- tokenizer ----------

  private sealed trait Tok
  private final case class TId(s: String) extends Tok
  private final case class TNum(s: String) extends Tok
  private final case class TStr(s: String) extends Tok
  private final case class TP(s: String) extends Tok

  private def tokenize(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_') {
        val j0 = i
        while (i < n && (q.charAt(i).isLetterOrDigit ||
          q.charAt(i) == '_')) i += 1
        out += TId(q.substring(j0, i))
      } else if (c.isDigit || (c == '-' && i + 1 < n &&
          q.charAt(i + 1).isDigit)) {
        val j0 = i
        i += 1
        while (i < n && (q.charAt(i).isDigit || q.charAt(i) == '.'))
          i += 1
        out += TNum(q.substring(j0, i))
      } else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        while (i < n && q.charAt(i) != '\'') {
          // the standard SOQL escape set; unknown escapes refuse loudly
          // rather than silently dropping the backslash
          if (q.charAt(i) == '\\' && i + 1 < n) {
            sb.append(q.charAt(i + 1) match {
              case 'n' => '\n'
              case 't' => '\t'
              case 'r' => '\r'
              case 'b' => '\b'
              case 'f' => '\f'
              case '"' => '"'
              case '\'' => '\''
              case '\\' => '\\'
              case other => sys.error(
                s"unsupported escape \\$other in SOQL string literal: $q")
            })
            i += 2
          } else { sb.append(q.charAt(i)); i += 1 }
        }
        require(i < n, s"unterminated string literal in SOQL: $q")
        i += 1
        out += TStr(sb.toString)
      } else {
        val two = if (i + 1 < n) q.substring(i, i + 2) else ""
        if (two == "!=" || two == "<>" || two == "<=" || two == ">=") {
          out += TP(two); i += 2
        } else if ("(),.=<>:".indexOf(c) >= 0) {
          out += TP(c.toString); i += 1
        } else sys.error(s"unexpected character '$c' in SOQL at $i: $q")
      }
    }
    out.result()
  }

  // ---------- parser (recursive descent over the token vector) ----------

  /** Parameterless date literals. */
  private val dateLit0 = Set("TODAY", "YESTERDAY", "TOMORROW",
    "LAST_90_DAYS", "THIS_MONTH", "LAST_MONTH", "NEXT_MONTH",
    "THIS_YEAR", "LAST_YEAR", "NEXT_YEAR",
    "THIS_WEEK", "LAST_WEEK", "NEXT_WEEK",
    "THIS_QUARTER", "LAST_QUARTER", "NEXT_QUARTER",
    "THIS_FISCAL_QUARTER", "LAST_FISCAL_QUARTER", "NEXT_FISCAL_QUARTER",
    "THIS_FISCAL_YEAR", "LAST_FISCAL_YEAR", "NEXT_FISCAL_YEAR")
  /** `:n`-parameterized date literals. */
  private val dateLitN = Set("LAST_N_DAYS", "NEXT_N_DAYS",
    "LAST_N_WEEKS", "NEXT_N_WEEKS", "LAST_N_MONTHS", "NEXT_N_MONTHS",
    "LAST_N_QUARTERS", "NEXT_N_QUARTERS", "LAST_N_YEARS", "NEXT_N_YEARS",
    "LAST_N_FISCAL_QUARTERS", "NEXT_N_FISCAL_QUARTERS",
    "LAST_N_FISCAL_YEARS", "NEXT_N_FISCAL_YEARS",
    // point-period family: the SINGLE period exactly n back
    "N_DAYS_AGO", "N_WEEKS_AGO", "N_MONTHS_AGO", "N_QUARTERS_AGO",
    "N_YEARS_AGO", "N_FISCAL_QUARTERS_AGO", "N_FISCAL_YEARS_AGO")

  private final class P(toks: Vector[Tok], q: String) {
    private var pos = 0
    def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    def next(): Tok = {
      require(pos < toks.length, s"unexpected end of SOQL: $q")
      val t = toks(pos); pos += 1; t
    }
    def kw(w: String): Boolean = peek match {
      case Some(TId(s)) if s.equalsIgnoreCase(w) => pos += 1; true
      case _ => false
    }
    def expectKw(w: String): Unit =
      require(kw(w), s"expected $w at token $pos in SOQL: $q")
    def punct(p: String): Boolean = peek match {
      case Some(TP(s)) if s == p => pos += 1; true
      case _ => false
    }
    def expectPunct(p: String): Unit =
      require(punct(p), s"expected '$p' at token $pos in SOQL: $q")
    def ident(): String = next() match {
      case TId(s) => s
      case t => sys.error(s"expected identifier, got $t in SOQL: $q")
    }
    def str(): String = next() match {
      case TStr(s) => s
      case t => sys.error(s"expected string literal, got $t in SOQL: $q")
    }
    def path(): Seq[String] = {
      val b = Seq.newBuilder[String]
      b += ident()
      while (punct(".")) b += ident()
      b.result()
    }
    def atEnd: Boolean = pos >= toks.length

    def lit(): Lit = next() match {
      case TStr(s) => SLit(s)
      case TNum(s) => NLit(BigDecimal(s))
      case TId(s) if s.equalsIgnoreCase("true") => BLit(true)
      case TId(s) if s.equalsIgnoreCase("false") => BLit(false)
      case TId(s) if s.equalsIgnoreCase("null") => NullLit
      case TId(s) if dateLitN(s.toUpperCase) =>
        expectPunct(":")
        next() match {
          case TNum(v) =>
            val n = v.toInt
            require(n > 0, s"date literal $s:$v needs a positive n: $q")
            DLit(s.toUpperCase, n)
          case t => sys.error(s"date literal $s needs :n, got $t: $q")
        }
      case TId(s) if dateLit0(s.toUpperCase) => DLit(s.toUpperCase, 0)
      case t => sys.error(s"expected literal, got $t in SOQL: $q")
    }

    // expr := term (OR term)* ; term := factor (AND factor)* ;
    // factor := NOT factor | '(' expr ')' | predicate
    def expr(): Expr = {
      var e = term()
      while (kw("OR")) e = OrE(e, term())
      e
    }
    private def term(): Expr = {
      var e = factor()
      while (kw("AND")) e = AndE(e, factor())
      e
    }
    private def factor(): Expr =
      if (kw("NOT")) NotE(factor())
      else if (punct("(")) { val e = expr(); expectPunct(")"); e }
      else predicate()
    /** When true (HAVING context), a predicate LHS may be an aggregate
      * call — encoded as the [[AggMark]] sentinel path. */
    var aggOk: Boolean = false

    private def predicate(): Expr = {
      val first = ident()
      val p: Seq[String] =
        if (aggOk && aggFns(first.toUpperCase) && punct("(")) {
          val f: Seq[String] = if (punct(")")) Seq.empty else {
            val x = path(); expectPunct(")"); x
          }
          require(f.nonEmpty || first.equalsIgnoreCase("COUNT"),
            s"only COUNT() may omit the field: $q")
          Seq(AggMark, first.toUpperCase) ++ f
        } else if (dateFns(first.toUpperCase) && punct("(")) {
          val x = path(); expectPunct(")")
          Seq(FnMark, first.toUpperCase) ++ x
        } else {
          val b = Seq.newBuilder[String]
          b += first
          while (punct(".")) b += ident()
          b.result()
        }
      if (kw("IN")) inList(p, negated = false)
      else if (kw("NOT")) { expectKw("IN"); inList(p, negated = true) }
      else if (kw("LIKE")) next() match {
        case TStr(s) => LikeE(p, s)
        case t => sys.error(s"LIKE needs a string pattern, got $t: $q")
      }
      else if (kw("INCLUDES")) IncludesE(p, strList(), negated = false)
      else if (kw("EXCLUDES")) IncludesE(p, strList(), negated = true)
      else next() match {
        case TP(op) if Set("=", "!=", "<>", "<", "<=", ">", ">=")(op) =>
          Cmp(p, if (op == "<>") "!=" else op, lit())
        case t => sys.error(s"expected comparison operator, got $t: $q")
      }
    }
    private def inList(p: Seq[String], negated: Boolean): Expr = {
      expectPunct("(")
      if (kw("SELECT")) {
        // semi-join subquery: [NOT] IN (SELECT f FROM obj [WHERE ...])
        val f = ident()
        expectKw("FROM")
        val o = ident()
        val w = if (kw("WHERE")) Some(expr()) else None
        expectPunct(")")
        return InSubq(p, f, o.toLowerCase, w, negated)
      }
      val vs = Seq.newBuilder[Lit]
      vs += lit()
      while (punct(",")) vs += lit()
      expectPunct(")")
      InList(p, vs.result(), negated)
    }
    private def strList(): Seq[String] = {
      expectPunct("(")
      val vs = Seq.newBuilder[String]
      def item(): Unit = {
        val s = str()
        require(s.nonEmpty && s.split(";", -1).forall(_.nonEmpty),
          s"INCLUDES/EXCLUDES items must be non-empty value sets: $q")
        vs += s
      }
      item()
      while (punct(",")) item()
      expectPunct(")")
      vs.result()
    }

    def orderItem(): Order = {
      val p = path()
      val asc = if (kw("DESC")) false else { kw("ASC"); true }
      val nf =
        if (kw("NULLS")) {
          if (kw("FIRST")) Some(true)
          else { expectKw("LAST"); Some(false) }
        } else None
      Order(p, asc, nf)
    }
  }

  /** Canonical form of a select/GROUP BY item for match-up: SOQL
    * identifiers are case-insensitive, so the function name and every
    * path segment normalize before comparison (the alias does not
    * participate). */
  private def norm(f: Field): (Option[String], Seq[String]) =
    (f.fn.map(_.toUpperCase), f.path.map(_.toLowerCase))

  /** Parse one SOQL statement into the AST. Loud on anything outside
    * the covered grammar. */
  def parse(q: String): Query = {
    val p = new P(tokenize(q), q)
    p.expectKw("SELECT")
    val fields = Seq.newBuilder[Field]
    val children = Seq.newBuilder[ChildQuery]
    val aggs = Seq.newBuilder[AggItem]
    val typeofs = Seq.newBuilder[TypeofItem]
    var fieldsMode = ""
    val stopAlias = Set("FROM", "WHERE", "GROUP", "ORDER", "LIMIT",
      "OFFSET", "HAVING")
    def alias(): Option[String] = p.peek match {
      case Some(TId(s)) if !stopAlias.contains(s.toUpperCase) =>
        p.next(); Some(s)
      case _ => None
    }
    def selectItem(): Unit =
      if (p.punct("(")) {
        // nested parent-child subquery: (SELECT f FROM childRel [WHERE …])
        p.expectKw("SELECT")
        val f = p.ident()
        require(!p.punct("."),
          s"nested subqueries select direct child fields only: $q")
        p.expectKw("FROM")
        val rel = p.ident()
        val w = if (p.kw("WHERE")) Some(p.expr()) else None
        // child ORDER BY [LIMIT k] — SOQL's top-k-children-per-parent
        val ob =
          if (p.kw("ORDER")) {
            p.expectKw("BY")
            val items = Seq.newBuilder[Order]
            items += p.orderItem()
            while (p.punct(",")) items += p.orderItem()
            items.result()
          } else Seq.empty
        val lim = if (p.kw("LIMIT")) Some(p.next() match {
          case TNum(s) => s.toInt
          case t => sys.error(s"child LIMIT needs an integer, got $t: $q")
        }) else None
        ob.foreach { o =>
          require(o.path.length == 1,
            s"child ORDER BY keys are direct child fields only: $q")
        }
        // an unordered LIMIT returns engine-order rows — refuse rather
        // than mistranslate (SOQL itself gives no stable order there)
        require(lim.isEmpty || ob.nonEmpty,
          s"child LIMIT without ORDER BY is non-deterministic: $q")
        p.expectPunct(")")
        children += ChildQuery(f, rel, w, ob, lim)
      } else {
        val first = p.ident()
        if (first.equalsIgnoreCase("FIELDS") && p.punct("(")) {
          // FIELDS(ALL | STANDARD | CUSTOM) — width projections;
          // STANDARD/CUSTOM partition the schema by the describe
          // field-category metadata the ObjectGraph carries
          val mode =
            if (p.kw("ALL")) "ALL"
            else if (p.kw("STANDARD")) "STANDARD"
            else if (p.kw("CUSTOM")) "CUSTOM"
            else sys.error(
              s"FIELDS(...) takes ALL, STANDARD, or CUSTOM: $q")
          p.expectPunct(")")
          fieldsMode = mode
        } else if (first.equalsIgnoreCase("TYPEOF") &&
            p.peek.exists(_.isInstanceOf[TId])) {
          // TYPEOF rel WHEN Type THEN f[,f…] [WHEN …]+ END — the
          // polymorphic-relationship projection. ELSE refuses loudly:
          // its fields must be common to EVERY possible target type
          // (Salesforce restricts them to shared standard fields),
          // and the graph model carries no cross-type field identity
          // to validate that against.
          val rel = p.ident()
          val branches = Seq.newBuilder[TypeofBranch]
          require(p.kw("WHEN"), s"TYPEOF needs at least one WHEN: $q")
          var more = true
          while (more) {
            val tn = p.ident()
            p.expectKw("THEN")
            val fs = Seq.newBuilder[String]
            fs += p.ident()
            require(!p.punct("."),
              s"TYPEOF branch fields are direct target fields only: $q")
            while (p.punct(",")) {
              fs += p.ident()
              require(!p.punct("."),
                s"TYPEOF branch fields are direct target fields only: $q")
            }
            branches += TypeofBranch(tn, fs.result())
            more = p.kw("WHEN")
          }
          // ELSE projects fields COMMON to every possible target type
          // (Salesforce restricts them to shared standard fields — the
          // graph's PolyTarget.common map carries that identity);
          // validation against the declared targets happens at
          // translation, where the relationship is resolved
          val elseFs =
            if (p.kw("ELSE")) {
              val fs = Seq.newBuilder[String]
              fs += p.ident()
              require(!p.punct("."),
                s"TYPEOF ELSE fields are direct shared fields only: $q")
              while (p.punct(",")) {
                fs += p.ident()
                require(!p.punct("."),
                  s"TYPEOF ELSE fields are direct shared fields only: $q")
              }
              fs.result()
            } else Seq.empty
          p.expectKw("END")
          typeofs += TypeofItem(rel, branches.result(), elseFs)
        } else if (aggFns(first.toUpperCase) && p.punct("(")) {
          // aggregate item: COUNT() | FN(field-or-dot-path) [alias]
          val f = if (p.punct(")")) None else {
            val x = p.path(); p.expectPunct(")"); Some(x)
          }
          require(f.isDefined || first.equalsIgnoreCase("COUNT"),
            s"only COUNT() may omit the field: $q")
          aggs += AggItem(first.toUpperCase, f, alias())
        } else if (dateFns(first.toUpperCase) && p.punct("(")) {
          // date-function item: FN(field-or-dot-path) [alias]
          val x = p.path(); p.expectPunct(")")
          fields += Field(Some(first.toUpperCase), x, alias())
        } else if (p.punct(".")) {
          // dotted path whose head we already consumed
          val b = Seq.newBuilder[String]
          b += first
          b += p.ident()
          while (p.punct(".")) b += p.ident()
          fields += Field(None, b.result(), None)
        } else fields += Field(None, Seq(first), None)
      }
    selectItem()
    while (p.punct(",")) selectItem()
    p.expectKw("FROM")
    val obj = p.ident()
    val where = if (p.kw("WHERE")) Some(p.expr()) else None
    var groupMode = ""
    val groupBy =
      if (p.kw("GROUP")) {
        p.expectKw("BY")
        if (p.kw("ROLLUP")) { groupMode = "ROLLUP"; p.expectPunct("(") }
        else if (p.kw("CUBE")) { groupMode = "CUBE"; p.expectPunct("(") }
        val items = Seq.newBuilder[Field]
        def groupItem(): Unit = {
          val first = p.ident()
          if (dateFns(first.toUpperCase) && p.punct("(")) {
            val x = p.path(); p.expectPunct(")")
            items += Field(Some(first.toUpperCase), x, None)
          } else if (p.punct(".")) {
            val b = Seq.newBuilder[String]
            b += first
            b += p.ident()
            while (p.punct(".")) b += p.ident()
            items += Field(None, b.result(), None)
          } else items += Field(None, Seq(first), None)
        }
        groupItem()
        while (p.punct(",")) groupItem()
        if (groupMode.nonEmpty) p.expectPunct(")")
        items.result()
      } else Seq.empty
    val having =
      if (p.kw("HAVING")) {
        p.aggOk = true
        val e = p.expr()
        p.aggOk = false
        Some(e)
      } else None
    val orderBy =
      if (p.kw("ORDER")) {
        p.expectKw("BY")
        val items = Seq.newBuilder[Order]
        items += p.orderItem()
        while (p.punct(",")) items += p.orderItem()
        items.result()
      } else Seq.empty
    val limit = if (p.kw("LIMIT")) Some(p.next() match {
      case TNum(s) => s.toInt
      case t => sys.error(s"LIMIT needs an integer, got $t: $q")
    }) else None
    val offset = if (p.kw("OFFSET")) Some(p.next() match {
      case TNum(s) => s.toInt
      case t => sys.error(s"OFFSET needs an integer, got $t: $q")
    }) else None
    require(p.atEnd, s"trailing tokens after OFFSET/LIMIT in SOQL: $q")
    require(offset.isEmpty || limit.isDefined,
      s"OFFSET without LIMIT is not supported: $q")
    val fs = fields.result()
    val as = aggs.result()
    val gb = groupBy
    require(as.isEmpty || children.result().isEmpty,
      s"aggregates and nested subqueries cannot mix: $q")
    require(gb.isEmpty || as.nonEmpty,
      s"GROUP BY without an aggregate select item: $q")
    // identifier matching is case-insensitive throughout (SOQL rule):
    // a select item GROUP BY'd with different case must still resolve
    require(as.isEmpty || fs.forall(f => gb.exists(g => norm(g) == norm(f))),
      s"in an aggregate query every non-aggregate select item must " +
        s"appear in GROUP BY: $q")
    require(fs.forall(_.fn.isEmpty) || as.nonEmpty,
      s"date functions in the select list require an aggregate query " +
        s"with GROUP BY (SOQL rule): $q")
    require(having.isEmpty || as.nonEmpty,
      s"HAVING requires an aggregate query: $q")
    val tfs = typeofs.result()
    require(fieldsMode.isEmpty ||
      (fs.isEmpty && as.isEmpty && children.result().isEmpty &&
        tfs.isEmpty),
      s"FIELDS($fieldsMode) must be the only select item: $q")
    require(tfs.isEmpty || as.isEmpty,
      s"TYPEOF cannot appear in an aggregate query: $q")
    Query(fs, children.result(), as, obj.toLowerCase, where, gb,
      groupMode, having, orderBy, limit, offset, fieldsMode, tfs)
  }

  // ---------- translation ----------

  private def litCol(v: Lit): Column = v match {
    case SLit(s) => lit(s)
    case NLit(n) =>
      if (n.isValidLong) lit(n.toLong) else lit(n.toDouble)
    case BLit(b) => lit(b)
    case NullLit => lit(null)
    case d: DLit => sys.error(
      s"date literal ${d.kind} is only valid as a comparison RHS")
  }

  /** The half-open [lo, hi) day-aligned range a date literal denotes,
    * as UTC epoch-microsecond bounds (the testdata timestamps are
    * UTC-naive and the session timezone is pinned to UTC, so the
    * day grid is unambiguous). */
  private[graft] def dateRange(d: DLit,
      today: java.time.LocalDate, fiscalStartMonth: Int = 1,
      fiscalCalendar: Option[Seq[java.time.LocalDate]] = None)
      : (Long, Long) = {
    import java.time.LocalDate
    def us(x: LocalDate): Long = x.toEpochDay * 86400000000L
    // period-grid anchors shared by the granule families below
    def weekStart: LocalDate = today.`with`(
      java.time.temporal.TemporalAdjusters
        .previousOrSame(java.time.DayOfWeek.MONDAY))
    def quarterStart: LocalDate = today.withDayOfMonth(1)
      .withMonth((today.getMonthValue - 1) / 3 * 3 + 1)
    // The fiscal grid has two implementations behind one navigation
    // pair — fq(i)/fy(i), the fiscal quarter/year i steps from the one
    // containing `today`:
    //  - MONTH-ALIGNED (default): the fiscal year starts on day 1 of
    //    the org's fiscal start month (a per-org Salesforce setting —
    //    injectable like the week anchor; January default =
    //    Salesforce's own "standard fiscal year = calendar year").
    //  - DECLARED CALENDAR: a custom (e.g. 4-4-5 retail) calendar as
    //    an ordered list of QUARTER START dates, every 4th entry a
    //    year start, the final entry the terminal boundary (so a
    //    k-year calendar has 4k+1 entries). Navigation is index
    //    arithmetic over the declared boundaries; a literal that
    //    reaches outside the declared range refuses loudly — a
    //    declared calendar cannot be extrapolated.
    def fiscalYearStartAligned: LocalDate = {
      val f = today.withDayOfMonth(1).withMonth(fiscalStartMonth)
      if (f.isAfter(today)) f.minusYears(1) else f
    }
    def fq(i: Int): (LocalDate, LocalDate) = fiscalCalendar match {
      case None =>
        val fy = fiscalYearStartAligned
        val m = (today.getYear - fy.getYear) * 12 +
          (today.getMonthValue - fy.getMonthValue)
        val q = fy.plusMonths((m / 3 * 3).toLong)
        (q.plusMonths(3L * i), q.plusMonths(3L * i + 3))
      case Some(cal) =>
        val cur = calIdx(cal)
        require(cur + i >= 0 && cur + i + 1 < cal.length,
          s"the declared fiscal calendar does not cover quarter " +
            s"${cur + i} (declared quarters 0..${cal.length - 2}) — " +
            "a declared calendar cannot be extrapolated")
        (cal(cur + i), cal(cur + i + 1))
    }
    def fy(i: Int): (LocalDate, LocalDate) = fiscalCalendar match {
      case None =>
        val f = fiscalYearStartAligned
        (f.plusYears(i.toLong), f.plusYears(i.toLong + 1))
      case Some(cal) =>
        val y = calIdx(cal) / 4 + i
        require(y >= 0 && 4 * y + 4 <= cal.length - 1,
          s"the declared fiscal calendar does not cover fiscal year " +
            s"$y (declared years 0..${(cal.length - 1) / 4 - 1})")
        (cal(4 * y), cal(4 * y + 4))
    }
    def calIdx(cal: Seq[LocalDate]): Int = {
      require(cal.length >= 5 && (cal.length - 1) % 4 == 0,
        "a declared fiscal calendar lists quarter starts with every " +
          "4th entry a year start plus the terminal boundary " +
          s"(4k+1 entries, k >= 1) — got ${cal.length}")
      require(cal.sliding(2).forall(p => p(0).isBefore(p(1))),
        "declared fiscal calendar boundaries must be strictly ascending")
      val i = cal.lastIndexWhere(!_.isAfter(today))
      require(i >= 0 && i < cal.length - 1,
        s"anchor $today is outside the declared fiscal calendar " +
          s"[${cal.head}, ${cal.last})")
      i
    }
    val (lo, hi): (LocalDate, LocalDate) = d.kind match {
      case "TODAY" => (today, today.plusDays(1))
      case "YESTERDAY" => (today.minusDays(1), today)
      case "TOMORROW" => (today.plusDays(1), today.plusDays(2))
      // includes today plus the n preceding days (the documented
      // "starts 00:00:00 of the day n days before the current day"
      // reading)
      case "LAST_N_DAYS" => (today.minusDays(d.n.toLong),
        today.plusDays(1))
      case "NEXT_N_DAYS" => (today.plusDays(1), today.plusDays(1L + d.n))
      case "LAST_90_DAYS" => (today.minusDays(90), today.plusDays(1))
      // week granule, PINNED to ISO weeks (Monday start) the way
      // LAST_N_DAYS pins its half-open convention: Salesforce's week
      // start is locale-dependent (Sunday in en_US orgs), so a
      // deployment whose org uses another locale passes its own
      // anchor-day convention by adjusting `today` — the literal
      // itself stays deterministic rather than environment-sniffing
      case "THIS_WEEK" => (weekStart, weekStart.plusWeeks(1))
      case "LAST_WEEK" => (weekStart.minusWeeks(1), weekStart)
      case "NEXT_WEEK" => (weekStart.plusWeeks(1), weekStart.plusWeeks(2))
      // the granule-N families EXCLUDE the current period (documented
      // SOQL semantics: "n months before the CURRENT month … to the
      // end of the PREVIOUS month") — deliberately asymmetric with
      // LAST_N_DAYS, which includes today
      case "LAST_N_WEEKS" => (weekStart.minusWeeks(d.n.toLong), weekStart)
      case "NEXT_N_WEEKS" =>
        (weekStart.plusWeeks(1), weekStart.plusWeeks(1L + d.n))
      case "LAST_N_MONTHS" =>
        val f = today.withDayOfMonth(1); (f.minusMonths(d.n.toLong), f)
      case "NEXT_N_MONTHS" =>
        val f = today.withDayOfMonth(1)
        (f.plusMonths(1), f.plusMonths(1L + d.n))
      case "THIS_QUARTER" => (quarterStart, quarterStart.plusMonths(3))
      case "LAST_QUARTER" => (quarterStart.minusMonths(3), quarterStart)
      case "NEXT_QUARTER" =>
        (quarterStart.plusMonths(3), quarterStart.plusMonths(6))
      case "LAST_N_QUARTERS" =>
        (quarterStart.minusMonths(3L * d.n), quarterStart)
      case "NEXT_N_QUARTERS" =>
        (quarterStart.plusMonths(3), quarterStart.plusMonths(3L + 3L * d.n))
      case "LAST_N_YEARS" =>
        val f = today.withDayOfYear(1); (f.minusYears(d.n.toLong), f)
      case "NEXT_N_YEARS" =>
        val f = today.withDayOfYear(1)
        (f.plusYears(1), f.plusYears(1L + d.n))
      // fiscal grid — every shape expressed through fq/fy, so the
      // month-aligned and declared-calendar implementations cannot
      // drift apart per-literal
      case "THIS_FISCAL_YEAR" => fy(0)
      case "LAST_FISCAL_YEAR" => fy(-1)
      case "NEXT_FISCAL_YEAR" => fy(1)
      case "LAST_N_FISCAL_YEARS" => (fy(-d.n)._1, fy(0)._1)
      case "NEXT_N_FISCAL_YEARS" => (fy(1)._1, fy(d.n + 1)._1)
      case "THIS_FISCAL_QUARTER" => fq(0)
      case "LAST_FISCAL_QUARTER" => fq(-1)
      case "NEXT_FISCAL_QUARTER" => fq(1)
      case "LAST_N_FISCAL_QUARTERS" => (fq(-d.n)._1, fq(0)._1)
      case "NEXT_N_FISCAL_QUARTERS" => (fq(1)._1, fq(d.n + 1)._1)
      // point-period *_AGO family: the SINGLE period exactly n back
      // (N_DAYS_AGO:0 = today, N_MONTHS_AGO:1 = last month — the
      // documented SOQL equivalences)
      case "N_DAYS_AGO" =>
        val x = today.minusDays(d.n.toLong); (x, x.plusDays(1))
      case "N_WEEKS_AGO" =>
        val x = weekStart.minusWeeks(d.n.toLong); (x, x.plusWeeks(1))
      case "N_MONTHS_AGO" =>
        val x = today.withDayOfMonth(1).minusMonths(d.n.toLong)
        (x, x.plusMonths(1))
      case "N_QUARTERS_AGO" =>
        val x = quarterStart.minusMonths(3L * d.n); (x, x.plusMonths(3))
      case "N_YEARS_AGO" =>
        val x = today.withDayOfYear(1).minusYears(d.n.toLong)
        (x, x.plusYears(1))
      case "N_FISCAL_QUARTERS_AGO" => fq(-d.n)
      case "N_FISCAL_YEARS_AGO" => fy(-d.n)
      case "THIS_MONTH" =>
        val f = today.withDayOfMonth(1); (f, f.plusMonths(1))
      case "LAST_MONTH" =>
        val f = today.withDayOfMonth(1); (f.minusMonths(1), f)
      case "NEXT_MONTH" =>
        val f = today.withDayOfMonth(1); (f.plusMonths(1), f.plusMonths(2))
      case "THIS_YEAR" =>
        val f = today.withDayOfYear(1); (f, f.plusYears(1))
      case "LAST_YEAR" =>
        val f = today.withDayOfYear(1); (f.minusYears(1), f)
      case "NEXT_YEAR" =>
        val f = today.withDayOfYear(1); (f.plusYears(1), f.plusYears(2))
      case other => sys.error(s"unsupported date literal $other")
    }
    (us(lo), us(hi))
  }

  /** The Spark column a date function denotes (UTC session timezone —
    * matches DuckDB's naive-timestamp semantics). The FISCAL_* family
    * shares dateRange's injectable start-month convention, with
    * FISCAL_YEAR pinned to the calendar year the fiscal year STARTS in
    * (the unambiguous choice — Salesforce's year-naming is itself an
    * org setting no fixed convention can express). */
  private def dateFnCol(fn: String, c: Column,
      fiscalStartMonth: Int = 1): Column = fn match {
    case "CALENDAR_YEAR" => year(c)
    case "CALENDAR_MONTH" => month(c)
    case "CALENDAR_QUARTER" => quarter(c)
    case "DAY_ONLY" => to_date(c)
    case "FISCAL_MONTH" =>
      (month(c) - fiscalStartMonth + 12) % 12 + 1
    case "FISCAL_QUARTER" =>
      floor(((month(c) - fiscalStartMonth + 12) % 12) / 3)
        .cast("int") + 1
    case "FISCAL_YEAR" =>
      year(c) - when(month(c) < fiscalStartMonth, 1).otherwise(0)
    case other => sys.error(s"unsupported date function $other")
  }

  /** Resolve a (possibly dotted, possibly multi-hop) path to a Column,
    * recording the parent-relationship CHAIN that must be joined;
    * `aggResolve` maps the HAVING sentinel paths (an aggregate call)
    * to their computed columns. */
  private final class Resolver(obj: String, graph: ObjectGraph,
      aggResolve: (String, Option[Seq[String]]) => Column =
        (fn, _) => sys.error(
          s"aggregate call $fn(...) outside a HAVING clause"),
      fiscalStartMonth: Int = 1) {
    /** chain key ("customer", "customer__nation", …) → (parent chain
      * key or "" for a base-object hop, the relationship). Insertion
      * is walk order, so a chain's prefix always joins first. */
    val needed =
      scala.collection.mutable.LinkedHashMap[String, (String, ParentRel)]()
    def col(path: Seq[String]): Column = path match {
      case AggMark +: fn +: rest =>
        aggResolve(fn, if (rest.isEmpty) None else Some(rest))
      case FnMark +: fn +: rest =>
        dateFnCol(fn, col(rest), fiscalStartMonth)
      case Seq(f) =>
        graph.derived.getOrElse(obj, Map.empty).get(f.toLowerCase) match {
          case Some(e) => e
          case None => org.apache.spark.sql.functions.col(f)
        }
      case _ =>
        require(path.length <= 6,
          s"SOQL allows at most 5 relationship hops: " +
            path.mkString("."))
        val rels = path.init
        val f = path.last
        var table = obj
        var key = ""
        for (rel <- rels) {
          val pr = graph.parents.getOrElse(table, Map.empty)
            .getOrElse(rel.toLowerCase, sys.error(
              s"object $table has no parent relationship '$rel' — " +
                "known: " + graph.parents.getOrElse(table, Map.empty)
                .keys.mkString(", ")))
          val parentKey = key
          key = if (key.isEmpty) pr.name else s"${key}__${pr.name}"
          needed.getOrElseUpdate(key, (parentKey, pr))
          table = pr.table
        }
        // a DERIVED field of the target object has no physical column
        // to pick up through the join's rename — refuse loudly instead
        // of surfacing an opaque unresolved-column analysis error
        require(!graph.derived.getOrElse(table, Map.empty)
          .contains(f.toLowerCase),
          s"derived field '$f' of $table cannot be reached through a " +
            s"relationship path (${path.mkString(".")}) — query " +
            s"$table directly")
        org.apache.spark.sql.functions.col(s"__${key}__$f")
    }
    def fieldCol(fd: Field): Column = fd.fn match {
      case Some(fn) => dateFnCol(fn, col(fd.path), fiscalStartMonth)
      case None => col(fd.path)
    }
  }

  /** Output column name of a non-aggregate select item: the alias if
    * given, else `fn_path_segments` for function items / flattened
    * `rel_field` for paths. */
  private def outName(f: Field): String = f.alias.getOrElse(f.fn match {
    case Some(fn) => (fn +: f.path).map(_.toLowerCase).mkString("_")
    case None => f.path.mkString("_")
  })

  private def cond(e: Expr, r: Resolver,
      today: java.time.LocalDate, fiscalStartMonth: Int = 1,
      fiscalCalendar: Option[Seq[java.time.LocalDate]] = None): Column =
    e match {
    case Cmp(p, op, d: DLit) =>
      // SOQL range semantics: `=` is containment in the literal's
      // half-open day range, `<`/`>` are strictly before/after it
      val (lo, hi) = dateRange(d, today, fiscalStartMonth,
        fiscalCalendar)
      val c = r.col(p)
      def ts(us: Long): Column = timestamp_micros(lit(us))
      op match {
        case "=" => c >= ts(lo) && c < ts(hi)
        case "!=" => !(c >= ts(lo) && c < ts(hi))
        case "<" => c < ts(lo)
        case "<=" => c < ts(hi)
        case ">" => c >= ts(hi)
        case ">=" => c >= ts(lo)
        case other => sys.error(s"unsupported operator $other")
      }
    case Cmp(p, "=", NullLit) => r.col(p).isNull
    case Cmp(p, "!=", NullLit) => r.col(p).isNotNull
    case Cmp(p, "=", v) => r.col(p) === litCol(v)
    case Cmp(p, "!=", v) => r.col(p) =!= litCol(v)
    case Cmp(p, "<", v) => r.col(p) < litCol(v)
    case Cmp(p, "<=", v) => r.col(p) <= litCol(v)
    case Cmp(p, ">", v) => r.col(p) > litCol(v)
    case Cmp(p, ">=", v) => r.col(p) >= litCol(v)
    case Cmp(_, op, _) => sys.error(s"unsupported operator $op")
    case InList(p, vs, neg) =>
      // IN = OR over per-value membership tests (r16 verdict #5, two
      // refusals now defined):
      //  - NULL matches null-valued fields (SOQL treats null as a
      //    comparable value inside IN); NOT IN with a NULL item
      //    therefore EXCLUDES null rows — the negation of (… OR
      //    isNull) is null-free by construction;
      //  - a date literal expands to containment in its half-open day
      //    range (the Cmp `=` semantics), so IN over date literals is
      //    a union of ranges.
      // Plain values keep the engine's pinned SQL comparison
      // convention (the Cmp family's, oracle-mirrored): without a
      // NULL item, null rows satisfy neither IN nor NOT IN.
      val c = r.col(p)
      val pred = vs.map {
        case NullLit => c.isNull
        case d: DLit =>
          val (lo, hi) = dateRange(d, today, fiscalStartMonth,
            fiscalCalendar)
          c >= timestamp_micros(lit(lo)) &&
            c < timestamp_micros(lit(hi))
        case SLit(s) => c === org.apache.spark.sql.functions.lit(s)
        case NLit(n) => c === org.apache.spark.sql.functions.lit(
          if (n.isValidLong) n.toLong else n.toDouble)
        case BLit(b) => c === org.apache.spark.sql.functions.lit(b)
      }.reduce(_ || _)
      if (neg) !pred else pred
    case LikeE(p, pat) => r.col(p).like(pat)
    case IncludesE(p, items, neg) =>
      // multipicklist membership over the semicolon-joined wire format:
      // contains EVERY value of SOME item (items OR, values AND)
      val arr = split(r.col(p), ";")
      val pred = items.map { item =>
        item.split(";").toSeq
          .map(v => array_contains(arr, lit(v)))
          .reduce(_ && _)
      }.reduce(_ || _)
      if (neg) !pred else pred
    case _: InSubq => sys.error(
      "a semi-join subquery is only valid as a top-level AND " +
        "conjunct (SOQL refuses semi-joins under OR/NOT)")
    case AndE(l, rr) =>
      cond(l, r, today, fiscalStartMonth, fiscalCalendar) &&
        cond(rr, r, today, fiscalStartMonth, fiscalCalendar)
    case OrE(l, rr) =>
      cond(l, r, today, fiscalStartMonth, fiscalCalendar) ||
        cond(rr, r, today, fiscalStartMonth, fiscalCalendar)
    case NotE(x) => !cond(x, r, today, fiscalStartMonth, fiscalCalendar)
  }

  /** Translate parsed SOQL to a DataFrame over the testdata tables.
    * Dotted output columns flatten as `rel_field` (chained hops as
    * `rel1_rel2_field`); a nested subquery emits `<rel>_<field>_list`
    * — the child values sorted ascending and comma-joined (the
    * j3_nested shape, hash-comparable). `today` anchors date literals
    * (defaulting to the wall-clock UTC date; inject it for
    * deterministic tests/oracles). */
  /** `eventsBase` substitutes the events scan with a caller-supplied
    * frame (the STREAMING extract path — Streams.soqlExtract injects a
    * readStream source; the raw-column pushdown block is skipped
    * because a streaming source carries its own watermark bounds). */
  def toDataFrame(q: Query, spark: SparkSession, dir: String,
      graph: ObjectGraph = testdataGraph,
      today: Option[java.time.LocalDate] = None,
      eventsBase: Option[DataFrame] = None,
      fiscalStartMonth: Int = 1,
      fiscalCalendar: Option[Seq[java.time.LocalDate]] = None)
      : DataFrame = {
    require(fiscalStartMonth >= 1 && fiscalStartMonth <= 12,
      s"fiscalStartMonth must be a month number 1-12, got " +
        s"$fiscalStartMonth")
    val anchor = today.getOrElse(
      java.time.LocalDate.now(java.time.ZoneOffset.UTC))
    val r = new Resolver(q.obj, graph,
      fiscalStartMonth = fiscalStartMonth)
    // resolve every path first so `needed` is complete before joining
    val sel = q.fields.map(f => r.fieldCol(f).as(outName(f)))
    // semi-join subqueries peel off as top-level AND conjuncts (they
    // translate to joins, not Columns); anything deeper refuses —
    // SOQL itself disallows disjunctive semi-joins
    def wconj(e: Expr): Seq[Expr] = e match {
      case AndE(l, rr) => wconj(l) ++ wconj(rr)
      case x => Seq(x)
    }
    val wconjs = q.where.toSeq.flatMap(wconj)
    val subqs = wconjs.collect { case sq: InSubq => sq }
    val wcol = wconjs.filterNot(_.isInstanceOf[InSubq])
      .reduceOption(AndE.apply)
      .map(cond(_, r, anchor, fiscalStartMonth, fiscalCalendar))
    val ocols = q.orderBy.map { o =>
      val c0 = r.col(o.path)
      val c1 = if (o.asc) c0.asc else c0.desc
      o.nullsFirst match {
        case Some(true) => if (o.asc) c0.asc_nulls_first
          else c0.desc_nulls_first
        case Some(false) => if (o.asc) c0.asc_nulls_last
          else c0.desc_nulls_last
        case None => c1
      }
    }
    // aggregate-side resolution happens BEFORE the parent joins, so a
    // dotted agg field (MAX(customer.c_acctbal)) records the
    // relationship its column rides in on
    def aggFn(fn: String, field: Option[Seq[String]]): Column =
      (fn, field) match {
        case ("COUNT", None) => count(lit(1))
        case ("COUNT", Some(f)) => count(r.col(f))
        case ("COUNT_DISTINCT", Some(f)) => count_distinct(r.col(f))
        case ("SUM", Some(f)) => sum(r.col(f))
        case ("MIN", Some(f)) => min(r.col(f))
        case ("MAX", Some(f)) => max(r.col(f))
        case ("AVG", Some(f)) => avg(r.col(f))
        case _ => sys.error(s"unsupported aggregate $fn")
      }
    val aggCols = q.aggs.zipWithIndex.map { case (a, i) =>
      aggFn(a.fn, a.field).as(a.alias.getOrElse(s"expr$i"))
    }
    // group keys resolve EAGERLY — r.fieldCol here, BEFORE the
    // parent-join loop — so a dotted key's relationship lands in
    // `needed` even when the key is not a select item (SELECT COUNT()
    // ... GROUP BY customer.c_name). The resolved column is kept for
    // the post-join withColumn materialization; each key gets an
    // output-named column so dotted/function keys group and project
    // under a stable name.
    val keyed = q.groupBy.map { g =>
      val name = q.fields.find(f => Soql.norm(f) == Soql.norm(g))
        .map(outName).getOrElse(outName(g))
      (g, name, r.fieldCol(g))
    }
    // HAVING: an aggregate call matching a select item filters on that
    // item's output column; an unselected call computes a HIDDEN agg
    // column that the final projection drops. Matching is
    // case-insensitive (SOQL identifiers are).
    val hidden = scala.collection.mutable.ArrayBuffer[Column]()
    def aggColOf(fn: String, field: Option[Seq[String]]): Column = {
      val idx = q.aggs.indexWhere(a => a.fn == fn &&
        a.field.map(_.map(_.toLowerCase)) ==
          field.map(_.map(_.toLowerCase)))
      if (idx >= 0)
        col(q.aggs(idx).alias.getOrElse(s"expr$idx"))
      else {
        val name = s"__h${hidden.size}"
        hidden += aggFn(fn, field).as(name)
        col(name)
      }
    }
    val hr = new Resolver(q.obj, graph, aggResolve = aggColOf,
      fiscalStartMonth = fiscalStartMonth)
    val hcond = q.having.map(
      cond(_, hr, anchor, fiscalStartMonth, fiscalCalendar))
    require(hr.needed.isEmpty,
      "HAVING must not traverse parent relationships outside an " +
        "aggregate call")
    var df = q.obj match {
      case "events" if eventsBase.isDefined => eventsBase.get
      case "events" =>
        // The events scan converts the file's native INT64 epoch to a
        // timestamp (`timestamp_micros(ts DIV d)`), which is OPAQUE to
        // parquet — a date-literal WHERE on the converted column reads
        // the whole table at 100 TB. So every top-level AND-conjunct
        // of the form `ts <op> <date literal>` is ALSO applied to the
        // raw column before conversion (the Tables.eventsSince
        // discipline): for nonneg raw and d ≥ 1, ts DIV d ≥ lo ⟺
        // ts ≥ lo·d and ts DIV d < hi ⟺ ts < hi·d, so the raw bounds
        // are exact, push into the scan as row-group pruning, and the
        // original predicate still evaluates downstream (a redundant
        // residual, never a semantic change). `!=` (an OR of ranges)
        // is left to the residual.
        val (raw, div) = graft.etl.Tables.eventsRawScan(spark, dir)
        def conjuncts(e: Expr): Seq[Expr] = e match {
          case AndE(l, rr) => conjuncts(l) ++ conjuncts(rr)
          case x => Seq(x)
        }
        val pushed = q.where.toSeq.flatMap(conjuncts).collect {
          case Cmp(Seq(f), op, dl: DLit)
              if f.equalsIgnoreCase("ts") && op != "!=" =>
            val (lo, hi) = dateRange(dl, anchor, fiscalStartMonth,
              fiscalCalendar)
            op match {
              case "=" =>
                col("ts") >= lit(lo * div) && col("ts") < lit(hi * div)
              case "<" => col("ts") < lit(lo * div)
              case "<=" => col("ts") < lit(hi * div)
              case ">" => col("ts") >= lit(hi * div)
              case ">=" => col("ts") >= lit(lo * div)
              case other => sys.error(s"unsupported operator $other")
            }
        }
        pushed.foldLeft(raw)(_ filter _)
          .withColumn("ts", expr(s"timestamp_micros(ts DIV $div)"))
      case o => graft.ops.t(spark, dir, o)
    }
    // parent joins: LEFT OUTER (SOQL dot semantics — absent parent
    // yields null fields), parent columns prefixed by the relationship
    // CHAIN so multi-hop and repeated relations cannot collide;
    // dim-sized parents broadcast under the session's autoBroadcast
    // threshold exactly like the hand-written j-queries. A chained
    // hop's left key is the prefixed FK the previous hop rode in.
    for ((key, (parentKey, pr)) <- r.needed) {
      val parent = graft.ops.t(spark, dir, pr.table).columns
        .foldLeft(graft.ops.t(spark, dir, pr.table)) { (d, c) =>
          d.withColumnRenamed(c, s"__${key}__$c")
        }
      val leftKey =
        if (parentKey.isEmpty) df(pr.fk)
        else col(s"__${parentKey}__${pr.fk}")
      df = df.join(parent,
        leftKey === parent(s"__${key}__${pr.pk}"), "left")
    }
    // TYPEOF items: one LEFT join PER MENTIONED BRANCH, gated on the
    // discriminator (a row joins its branch's target only when its
    // type matches — rows of other types keep null branch fields, the
    // polymorphic-lookup semantics). Output: the flattened Type column
    // once per item, then each branch's fields prefixed
    // rel_type_field so branches can never collide.
    val typeofCols = Seq.newBuilder[Column]
    for (tf <- q.typeofs) {
      val pr = graph.polys.getOrElse(q.obj, Map.empty)
        .getOrElse(tf.rel.toLowerCase, sys.error(
          s"object ${q.obj} has no polymorphic relationship " +
            s"'${tf.rel}' — known: " +
            graph.polys.getOrElse(q.obj, Map.empty).keys.mkString(", ")))
      typeofCols += pr.typeExpr.as(s"${pr.name}_type")
      for (b <- tf.branches) {
        val (tname, tgt) = pr.targets
          .find(_._1.equalsIgnoreCase(b.typeName))
          .getOrElse(sys.error(
            s"relationship ${pr.name} never resolves to " +
              s"'${b.typeName}' — declared target types: " +
              pr.targets.map(_._1).mkString(", ")))
        val key = s"${pr.name}__${tname.toLowerCase}"
        val parent = graft.ops.t(spark, dir, tgt.table).columns
          .foldLeft(graft.ops.t(spark, dir, tgt.table)) { (d2, c) =>
            d2.withColumnRenamed(c, s"__${key}__$c")
          }
        df = df.join(parent,
          df(pr.fk) === parent(s"__${key}__${tgt.pk}") &&
            pr.typeExpr === lit(tname), "left")
        typeofCols ++= b.fields.map(f => col(s"__${key}__$f")
          .as(s"${pr.name}_${tname.toLowerCase}_$f"))
      }
      // ELSE: fields common to EVERY target type (validated against
      // each target's declared `common` map — an unshared field
      // refuses loudly), populated only for rows whose type matched NO
      // WHEN branch (the Salesforce semantics). One type-gated LEFT
      // join per UNMATCHED target; each ELSE column coalesces the
      // per-target columns — branch-matched rows stay null because
      // their targets are never joined for ELSE.
      if (tf.elseFields.nonEmpty) {
        for (f <- tf.elseFields; (tn, tgt) <- pr.targets)
          require(tgt.common.contains(f.toLowerCase),
            s"TYPEOF ELSE field '$f' is not common to every target " +
              s"type of ${pr.name} (missing from $tn — shared fields: " +
              pr.targets.flatMap(_._2.common.keys).distinct
                .mkString(", ") + ")")
        val unmatched = pr.targets.filterNot { case (tn, _) =>
          tf.branches.exists(_.typeName.equalsIgnoreCase(tn)) }
        val keyed = unmatched.map { case (tname, tgt) =>
          val key = s"${pr.name}__else_${tname.toLowerCase}"
          val parent = graft.ops.t(spark, dir, tgt.table).columns
            .foldLeft(graft.ops.t(spark, dir, tgt.table)) { (d2, c) =>
              d2.withColumnRenamed(c, s"__${key}__$c")
            }
          df = df.join(parent,
            df(pr.fk) === parent(s"__${key}__${tgt.pk}") &&
              pr.typeExpr === lit(tname), "left")
          (key, tgt)
        }
        typeofCols ++= tf.elseFields.map { f =>
          val srcs = keyed.map { case (key, tgt) =>
            col(s"__${key}__${tgt.common(f.toLowerCase)}")
          }
          (if (srcs.isEmpty) lit(null)
           else if (srcs.size == 1) srcs.head
           else coalesce(srcs: _*))
            .as(s"${pr.name}_else_${f.toLowerCase}")
        }
      }
    }
    // nested child subqueries: per-parent ordered comma-joined string
    val childCols = q.children.map { cq =>
      val cr = graph.children.getOrElse(q.obj, Map.empty)
        .getOrElse(cq.rel.toLowerCase, sys.error(
          s"object ${q.obj} has no child relationship '${cq.rel}' — " +
            "known: " + graph.children.getOrElse(q.obj, Map.empty)
            .keys.mkString(", ")))
      val childR = new Resolver(cr.table, graph,
        fiscalStartMonth = fiscalStartMonth)
      var child = graft.ops.t(spark, dir, cr.table)
      cq.where.map(cond(_, childR, anchor, fiscalStartMonth,
          fiscalCalendar))
        .foreach(c => child = child.filter(c))
      require(childR.needed.isEmpty,
        "nested subqueries must not traverse relationships")
      val listName = s"${cq.rel}_${cq.field}_list"
      val agg =
        if (cq.orderBy.isEmpty)
          child.groupBy(col(cr.fk).as("__ck"))
            .agg(array_join(transform(
              array_sort(collect_list(col(cq.field))),
              x => x.cast("string")), ",").as(listName))
        else {
          // child ORDER BY [LIMIT k] — top-k children per parent: a
          // row_number window PARTITIONED ON THE FK (one shuffle, on
          // the same key the parent attach joins), the selected field
          // appended as a pinned tie-break so the emitted list stays
          // deterministic under equal sort keys; the list joins in
          // RANK order (SOQL returns child rows in their ORDER BY),
          // not the unordered form's ascending-value convention
          import org.apache.spark.sql.expressions.Window
          // NULLS FIRST/LAST honored like the top-level ORDER BY path
          // (r16 refusal closed — the window's sort order carries the
          // explicit null placement; fixture caveat: the testdata
          // child tables carry no nulls, so the grammar + translation
          // are what the registered row pins)
          val ocols = cq.orderBy.map { o =>
            val c = col(o.path.head)
            o.nullsFirst match {
              case Some(true) =>
                if (o.asc) c.asc_nulls_first else c.desc_nulls_first
              case Some(false) =>
                if (o.asc) c.asc_nulls_last else c.desc_nulls_last
              case None => if (o.asc) c.asc else c.desc
            }
          } :+ col(cq.field).asc
          val w = Window.partitionBy(col(cr.fk)).orderBy(ocols: _*)
          val ranked = child.withColumn("__rk", row_number().over(w))
          val capped = cq.limit
            .map(k => ranked.filter(col("__rk") <= k)).getOrElse(ranked)
          capped.groupBy(col(cr.fk).as("__ck"))
            .agg(array_join(transform(
              array_sort(collect_list(struct(col("__rk").as("r"),
                col(cq.field).cast("string").as("v")))),
              x => x.getField("v")), ",").as(listName))
        }
      (cr, agg, listName)
    }
    for ((cr, agg, name) <- childCols)
      df = df.join(agg, df(cr.pk) === agg("__ck"), "left")
        .drop("__ck")
        .withColumn(name, coalesce(col(name), lit("")))
    // semi-join subqueries: LEFT SEMI (IN) / LEFT ANTI (NOT IN) on the
    // base field against the subquery's projected key. The subquery's
    // filter pushes into ITS scan, the key set dedups through the
    // semi-join itself (no distinct needed), and dim-sized key sets
    // broadcast under AQE exactly like the hand-written j4/j5 rows.
    // NOT IN is pinned to anti-join semantics (null subquery keys are
    // dropped, not three-valued-logic poison — Salesforce ID semi-join
    // keys are never null, so the distinction never arises on real
    // queries; the explicit filter keeps the pin honest at any input).
    for (sq <- subqs) {
      require(sq.path.length == 1,
        s"semi-join left side must be a direct field, got " +
          sq.path.mkString("."))
      val subR = new Resolver(sq.obj, graph,
        fiscalStartMonth = fiscalStartMonth)
      var sub = graft.ops.t(spark, dir, sq.obj)
      // build the condition FIRST: cond fills subR.needed, so the
      // relationship refusal fires before Spark's analyzer can throw
      // an opaque unresolved-column error
      val subCond = sq.where.map(
        cond(_, subR, anchor, fiscalStartMonth, fiscalCalendar))
      require(subR.needed.isEmpty,
        "a semi-join subquery WHERE supports direct fields only")
      subCond.foreach(c => sub = sub.filter(c))
      val proj = sub.select(col(sq.field).as("__inq"))
        .filter(col("__inq").isNotNull)
      df = df.join(proj, df(sq.path.head) === col("__inq"),
        if (sq.negated) "left_anti" else "left_semi")
    }
    wcol.foreach(c => df = df.filter(c))
    val out =
      if (q.fieldsMode.nonEmpty) {
        // FIELDS(ALL|STANDARD|CUSTOM): the object's frozen schema in
        // declared order (never the join-widened frame — parent joins
        // only exist if WHERE traversed a relationship), width-
        // restricted by the describe field categories for
        // STANDARD/CUSTOM
        if (ocols.nonEmpty) df = df.orderBy(ocols: _*)
        val all = graft.etl.Tables.schemas(q.obj).fieldNames.toSeq
        val custom = graph.customFields.getOrElse(q.obj, Set.empty)
        val names = q.fieldsMode match {
          case "ALL" => all
          case "STANDARD" => all.filterNot(f => custom(f.toLowerCase))
          case "CUSTOM" =>
            val cs = all.filter(f => custom(f.toLowerCase))
            require(cs.nonEmpty,
              s"object ${q.obj} declares no custom fields — " +
                "FIELDS(CUSTOM) would be an empty projection")
            cs
        }
        df.select(names.map(col): _*)
      } else if (q.aggs.isEmpty) {
        if (ocols.nonEmpty) df = df.orderBy(ocols: _*)
        df.select(sel ++ childCols.map(c => col(c._3)) ++
          typeofCols.result(): _*)
      } else {
        // aggregate query: group keys are the (validated) select items
        // plus any unselected GROUP BY fields; dotted and function
        // keys materialize under their output name first. Agg items
        // name SOQL's default exprN unless aliased (both resolved
        // above, before the parent joins). Output order: non-aggregate
        // select items in select order, then the aggregates.
        for ((g, name, kc) <- keyed if g.fn.isDefined || g.path.length > 1)
          df = df.withColumn(name, kc)
        val groupCols = keyed.map { case (g, name, _) =>
          if (g.fn.isEmpty && g.path.length == 1) col(g.path.head)
          else col(name)
        }
        val grouped = q.groupMode match {
          case "ROLLUP" => df.rollup(groupCols: _*)
          case "CUBE" => df.cube(groupCols: _*)
          case _ =>
            if (groupCols.nonEmpty) df.groupBy(groupCols: _*)
            else df.groupBy()
        }
        val all = aggCols ++ hidden.toSeq
        var g = grouped.agg(all.head, all.tail: _*)
        hcond.foreach(c => g = g.filter(c))
        // agg-query ORDER BY resolves against OUTPUT names: a group
        // key (by its normalized path — dotted/function keys included),
        // an aggregate alias, or SOQL's default exprN
        val aggOcols = q.orderBy.map { o =>
          val name = keyed
            .find { case (gk, _, _) =>
              Soql.norm(gk) == ((None, o.path.map(_.toLowerCase))) }
            .map(_._2)
            .orElse(
              // a group key's OUTPUT name (a date-function alias like
              // `yr`, or a flattened dotted name)
              if (o.path.length == 1)
                keyed.collectFirst { case (_, n, _)
                  if n.equalsIgnoreCase(o.path.head) => n }
              else None)
            .orElse(
              if (o.path.length == 1)
                q.aggs.zipWithIndex.collectFirst {
                  case (a, i) if a.alias.getOrElse(s"expr$i")
                    .equalsIgnoreCase(o.path.head) =>
                    a.alias.getOrElse(s"expr$i")
                }
              else None)
            .getOrElse(sys.error(
              s"ORDER BY ${o.path.mkString(".")} must name a GROUP BY " +
                "field or an aggregate alias in an aggregate query"))
          val c0 = col(name)
          o.nullsFirst match {
            case Some(true) =>
              if (o.asc) c0.asc_nulls_first else c0.desc_nulls_first
            case Some(false) =>
              if (o.asc) c0.asc_nulls_last else c0.desc_nulls_last
            case None => if (o.asc) c0.asc else c0.desc
          }
        }
        if (aggOcols.nonEmpty) g = g.orderBy(aggOcols: _*)
        g.select(q.fields.map(f => col(outName(f))) ++
          q.aggs.zipWithIndex.map { case (a, i) =>
            col(a.alias.getOrElse(s"expr$i")) }: _*)
      }
    (q.limit, q.offset) match {
      case (Some(l), Some(o)) => out.offset(o).limit(l)
      case (Some(l), None) => out.limit(l)
      case _ => out
    }
  }

  /** Parse + translate in one call — the `client.query(q)` analog. */
  def query(spark: SparkSession, dir: String, soql: String,
      today: Option[java.time.LocalDate] = None,
      fiscalStartMonth: Int = 1,
      fiscalCalendar: Option[Seq[java.time.LocalDate]] = None)
      : DataFrame =
    toDataFrame(parse(soql), spark, dir, today = today,
      fiscalStartMonth = fiscalStartMonth,
      fiscalCalendar = fiscalCalendar)
}
