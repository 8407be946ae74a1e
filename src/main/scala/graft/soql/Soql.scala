package graft.soql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal SOQL-dialect text front-end — the one reference surface with
  * no engine analog until now: the reference's entry point accepts SOQL
  * *text* (`oxidized-force/src/client.rs:199-205` passes the raw string
  * as the `q` parameter; `client.rs:214-217` builds `SELECT f,… FROM o`
  * for bulk jobs), while this engine exposes the DataFrame DSL and
  * `spark.sql`. This translator closes that parity gap for the
  * reference's canonical query shapes:
  *
  *   - `SELECT f1, f2 FROM obj WHERE … ORDER BY … LIMIT n OFFSET m`
  *   - child-parent DOT PATHS (`SELECT customer.c_name FROM orders`) —
  *     SOQL's relationship traversal, translated to a LEFT OUTER join
  *     (SOQL yields null fields for an absent parent, exactly the
  *     j2_left semantics);
  *   - parent-child NESTED SUBQUERY
  *     (`SELECT c_custkey, (SELECT o_orderkey FROM orders) FROM
  *     customer`) — translated to the j3_nested shape: the child rows
  *     materialize per parent as an ordered comma-joined string, which
  *     keeps the result hash-comparable.
  *
  * Deliberately NOT covered (the reference itself never emits these
  * through its typed API): aggregate functions, GROUP BY, multi-level
  * dot paths (`a.b.c`), date literals, and the FOR UPDATE/WITH
  * clauses. The grammar refuses loudly rather than mistranslating.
  *
  * The relationship model is explicit (an [[ObjectGraph]] of parent
  * and child relationships with their key columns) because SOQL
  * resolves relationship NAMES, not foreign keys — the testdata graph
  * below mirrors TPC-H's FK structure the way a Salesforce org's
  * describe metadata would. Translation is to the DataFrame DSL, so
  * every query inherits Catalyst's pushdown/pruning and the same
  * physical planning as the hand-written registry queries (broadcast
  * for the dim-sized parents, partial aggregation under the nested
  * subquery's collect).
  */
object Soql {

  // ---------- AST ----------

  sealed trait Lit
  final case class SLit(v: String) extends Lit
  final case class NLit(v: BigDecimal) extends Lit
  final case class BLit(v: Boolean) extends Lit
  case object NullLit extends Lit

  sealed trait Expr
  final case class Cmp(path: Seq[String], op: String, v: Lit) extends Expr
  final case class InList(path: Seq[String], vs: Seq[Lit],
      negated: Boolean) extends Expr
  final case class LikeE(path: Seq[String], pattern: String) extends Expr
  final case class AndE(l: Expr, r: Expr) extends Expr
  final case class OrE(l: Expr, r: Expr) extends Expr
  final case class NotE(e: Expr) extends Expr

  final case class Order(path: Seq[String], asc: Boolean,
      nullsFirst: Option[Boolean])
  final case class ChildQuery(field: String, rel: String,
      where: Option[Expr])
  /** One aggregate select item: COUNT() (field None), or
    * COUNT/SUM/MIN/MAX/AVG(field) [alias]. */
  final case class AggItem(fn: String, field: Option[String],
      alias: Option[String])
  final case class Query(fields: Seq[Seq[String]],
      children: Seq[ChildQuery], aggs: Seq[AggItem], obj: String,
      where: Option[Expr], groupBy: Seq[String], orderBy: Seq[Order],
      limit: Option[Int], offset: Option[Int])

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

  final case class ObjectGraph(
      parents: Map[String, Map[String, ParentRel]],
      children: Map[String, Map[String, ChildRel]])

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
        "part" -> ParentRel("part", "part", "l_partkey", "p_partkey"))),
    children = Map(
      "customer" -> Map(
        "orders" -> ChildRel("orders", "orders", "o_custkey",
          "c_custkey")),
      "orders" -> Map(
        "lineitems" -> ChildRel("lineitems", "lineitem", "l_orderkey",
          "o_orderkey")),
      "nation" -> Map(
        "customers" -> ChildRel("customers", "customer", "c_nationkey",
          "n_nationkey"))))

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
          // SOQL escapes a quote as \'
          if (q.charAt(i) == '\\' && i + 1 < n) {
            sb.append(q.charAt(i + 1)); i += 2
          } else { sb.append(q.charAt(i)); i += 1 }
        }
        require(i < n, s"unterminated string literal in SOQL: $q")
        i += 1
        out += TStr(sb.toString)
      } else {
        val two = if (i + 1 < n) q.substring(i, i + 2) else ""
        if (two == "!=" || two == "<>" || two == "<=" || two == ">=") {
          out += TP(two); i += 2
        } else if ("(),.=<>".indexOf(c) >= 0) {
          out += TP(c.toString); i += 1
        } else sys.error(s"unexpected character '$c' in SOQL at $i: $q")
      }
    }
    out.result()
  }

  // ---------- parser (recursive descent over the token vector) ----------

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
    private def predicate(): Expr = {
      val p = path()
      if (kw("IN")) inList(p, negated = false)
      else if (kw("NOT")) { expectKw("IN"); inList(p, negated = true) }
      else if (kw("LIKE")) next() match {
        case TStr(s) => LikeE(p, s)
        case t => sys.error(s"LIKE needs a string pattern, got $t: $q")
      }
      else next() match {
        case TP(op) if Set("=", "!=", "<>", "<", "<=", ">", ">=")(op) =>
          Cmp(p, if (op == "<>") "!=" else op, lit())
        case t => sys.error(s"expected comparison operator, got $t: $q")
      }
    }
    private def inList(p: Seq[String], negated: Boolean): Expr = {
      expectPunct("(")
      val vs = Seq.newBuilder[Lit]
      vs += lit()
      while (punct(",")) vs += lit()
      expectPunct(")")
      InList(p, vs.result(), negated)
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

  /** Parse one SOQL statement into the AST. Loud on anything outside
    * the covered grammar. */
  def parse(q: String): Query = {
    val p = new P(tokenize(q), q)
    p.expectKw("SELECT")
    val fields = Seq.newBuilder[Seq[String]]
    val children = Seq.newBuilder[ChildQuery]
    val aggs = Seq.newBuilder[AggItem]
    val aggFns = Set("COUNT", "SUM", "MIN", "MAX", "AVG")
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
        p.expectPunct(")")
        children += ChildQuery(f, rel, w)
      } else {
        val first = p.ident()
        if (aggFns(first.toUpperCase) && p.punct("(")) {
          // aggregate item: COUNT() | FN(field) [alias]
          val f = if (p.punct(")")) None else {
            val x = p.ident(); p.expectPunct(")"); Some(x)
          }
          require(f.isDefined || first.equalsIgnoreCase("COUNT"),
            s"only COUNT() may omit the field: $q")
          // SOQL allows an optional bare alias ident after the agg
          val alias = p.peek match {
            case Some(TId(s)) if !Set("FROM", "WHERE", "GROUP", "ORDER",
                "LIMIT", "OFFSET").contains(s.toUpperCase) =>
              p.next(); Some(s)
            case _ => None
          }
          aggs += AggItem(first.toUpperCase, f, alias)
        } else if (p.punct(".")) {
          // dotted path whose head we already consumed
          val b = Seq.newBuilder[String]
          b += first
          b += p.ident()
          while (p.punct(".")) b += p.ident()
          fields += b.result()
        } else fields += Seq(first)
      }
    selectItem()
    while (p.punct(",")) selectItem()
    p.expectKw("FROM")
    val obj = p.ident()
    val where = if (p.kw("WHERE")) Some(p.expr()) else None
    val groupBy =
      if (p.kw("GROUP")) {
        p.expectKw("BY")
        val items = Seq.newBuilder[String]
        items += p.ident()
        while (p.punct(",")) items += p.ident()
        items.result()
      } else Seq.empty
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
    require(as.isEmpty || fs.forall(f =>
        f.length == 1 && gb.contains(f.head)),
      s"in an aggregate query every plain field must be grouped: $q")
    Query(fs, children.result(), as, obj.toLowerCase, where, gb,
      orderBy, limit, offset)
  }

  // ---------- translation ----------

  private def litCol(v: Lit): Column = v match {
    case SLit(s) => lit(s)
    case NLit(n) =>
      if (n.isValidLong) lit(n.toLong) else lit(n.toDouble)
    case BLit(b) => lit(b)
    case NullLit => lit(null)
  }

  /** Resolve a (possibly dotted) path to a Column, recording parent
    * relationships that must be joined. */
  private final class Resolver(obj: String, graph: ObjectGraph) {
    val needed = scala.collection.mutable.LinkedHashMap[String, ParentRel]()
    def col(path: Seq[String]): Column = path match {
      case Seq(f) => org.apache.spark.sql.functions.col(f)
      case Seq(rel, f) =>
        val pr = graph.parents.getOrElse(obj, Map.empty)
          .getOrElse(rel.toLowerCase, sys.error(
            s"object $obj has no parent relationship '$rel' — known: " +
              graph.parents.getOrElse(obj, Map.empty).keys.mkString(", ")))
        needed.getOrElseUpdate(pr.name, pr)
        org.apache.spark.sql.functions.col(s"__${pr.name}__$f")
      case _ => sys.error(
        s"multi-level dot paths are not supported: ${path.mkString(".")}")
    }
    def outName(path: Seq[String]): String = path.mkString("_")
  }

  private def cond(e: Expr, r: Resolver): Column = e match {
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
      val c = r.col(p).isin(vs.map {
        case SLit(s) => s: Any
        case NLit(n) => (if (n.isValidLong) n.toLong else n.toDouble): Any
        case BLit(b) => b: Any
        case NullLit => sys.error("NULL inside IN list is not supported")
      }: _*)
      if (neg) !c else c
    case LikeE(p, pat) => r.col(p).like(pat)
    case AndE(l, rr) => cond(l, r) && cond(rr, r)
    case OrE(l, rr) => cond(l, r) || cond(rr, r)
    case NotE(x) => !cond(x, r)
  }

  /** Translate parsed SOQL to a DataFrame over the testdata tables.
    * Dotted output columns flatten as `rel_field`; a nested subquery
    * emits `<rel>_<field>_list` — the child values sorted ascending
    * and comma-joined (the j3_nested shape, hash-comparable). */
  def toDataFrame(q: Query, spark: SparkSession, dir: String,
      graph: ObjectGraph = testdataGraph): DataFrame = {
    val r = new Resolver(q.obj, graph)
    // resolve every path first so `needed` is complete before joining
    val sel = q.fields.map(p => r.col(p).as(r.outName(p)))
    val wcol = q.where.map(cond(_, r))
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
    var df = graft.ops.t(spark, dir, q.obj)
    // parent joins: LEFT OUTER (SOQL dot semantics — absent parent
    // yields null fields), parent columns prefixed so self-relations
    // cannot collide; dim-sized parents broadcast under the session's
    // autoBroadcast threshold exactly like the hand-written j-queries
    for (pr <- r.needed.values) {
      val parent = graft.ops.t(spark, dir, pr.table).columns
        .foldLeft(graft.ops.t(spark, dir, pr.table)) { (d, c) =>
          d.withColumnRenamed(c, s"__${pr.name}__$c")
        }
      df = df.join(parent,
        df(pr.fk) === parent(s"__${pr.name}__${pr.pk}"), "left")
    }
    // nested child subqueries: per-parent ordered comma-joined string
    val childCols = q.children.map { cq =>
      val cr = graph.children.getOrElse(q.obj, Map.empty)
        .getOrElse(cq.rel.toLowerCase, sys.error(
          s"object ${q.obj} has no child relationship '${cq.rel}' — " +
            "known: " + graph.children.getOrElse(q.obj, Map.empty)
            .keys.mkString(", ")))
      val childR = new Resolver(cr.table, graph)
      var child = graft.ops.t(spark, dir, cr.table)
      cq.where.map(cond(_, childR)).foreach(c => child = child.filter(c))
      require(childR.needed.isEmpty,
        "nested subqueries must not traverse relationships")
      val agg = child.groupBy(col(cr.fk).as("__ck"))
        .agg(array_join(transform(
          array_sort(collect_list(col(cq.field))),
          x => x.cast("string")), ",")
          .as(s"${cq.rel}_${cq.field}_list"))
      (cr, agg, s"${cq.rel}_${cq.field}_list")
    }
    for ((cr, agg, name) <- childCols)
      df = df.join(agg, df(cr.pk) === agg("__ck"), "left")
        .drop("__ck")
        .withColumn(name, coalesce(col(name), lit("")))
    wcol.foreach(c => df = df.filter(c))
    val out =
      if (q.aggs.isEmpty) {
        if (ocols.nonEmpty) df = df.orderBy(ocols: _*)
        df.select(sel ++ childCols.map(c => col(c._3)): _*)
      } else {
        // aggregate query: plain fields are the (validated) group keys;
        // agg items name SOQL's default exprN unless aliased. Output
        // order: grouped fields in select order, then the aggregates.
        val aggCols = q.aggs.zipWithIndex.map { case (a, i) =>
          val c = (a.fn, a.field) match {
            case ("COUNT", None) => count(lit(1))
            case ("COUNT", Some(f)) => count(r.col(Seq(f)))
            case ("SUM", Some(f)) => sum(r.col(Seq(f)))
            case ("MIN", Some(f)) => min(r.col(Seq(f)))
            case ("MAX", Some(f)) => max(r.col(Seq(f)))
            case ("AVG", Some(f)) => avg(r.col(Seq(f)))
            case _ => sys.error(s"unsupported aggregate ${a.fn}")
          }
          c.as(a.alias.getOrElse(s"expr$i"))
        }
        val grouped =
          if (q.groupBy.nonEmpty) df.groupBy(q.groupBy.map(col): _*)
          else df.groupBy()
        var g = grouped.agg(aggCols.head, aggCols.tail: _*)
        if (ocols.nonEmpty) g = g.orderBy(ocols: _*)
        g.select(q.fields.map(f => col(f.head)) ++
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
  def query(spark: SparkSession, dir: String, soql: String): DataFrame =
    toDataFrame(parse(soql), spark, dir)
}
