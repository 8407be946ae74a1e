package graft

import org.apache.spark.sql.functions._

/** Invariants from SURVEY §5.3, exhaustively/structurally checked. */
class PropertySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("dedup idempotence: dropDuplicates ∘ dropDuplicates = dropDuplicates") {
    val docs = etl.Tables.load(spark, dir, "documents")
    val doubled = docs.union(docs.filter(col("doc_id") % 3 === 0))
    val once = doubled.dropDuplicates("doc_id")
    val twice = once.dropDuplicates("doc_id")
    assert(once.count() == twice.count())
    // key-set equality (full-row exceptAll over chained dropDuplicates
    // trips INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND in Spark 4.1.2)
    assert(once.select("doc_id").exceptAll(twice.select("doc_id"))
      .count() == 0)
    assert(once.count() == docs.count())
  }

  test("BPE round-trip: decode(encode(x)) = x — merged symbols " +
      "concatenate back to the exact word list") {
    // t_bpe_encode emits per-doc dense token ids; decoding = reverse
    // vocabulary lookup + concatenating each word's symbols (token
    // boundaries inside a word carry no spaces; word boundaries do).
    // Rebuilding the vocabulary here mirrors the query: distinct final
    // symbols, lexicographic dense rank. If ANY merge or id assignment
    // lost information, some document's reconstruction diverges.
    val d = "/root/testdata/sf0.01"
    val enc = ops.Text.queries("t_bpe_encode")(spark, d)
      .select("doc_id", "token_ids").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // reverse vocab: replay the same training + final-symbol ranking
    val merges = ops.Text.queries("t_bpe_merges")(spark, d)
      .orderBy("round").select("pair", "merged").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val docs = etl.Tables.load(spark, d, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def encodeWord(w: String): Seq[String] = {
      var seq = " " + w.split("").mkString(" ") + " "
      merges.foreach { case (p, m) =>
        val Array(x, y) = p.split(" ", 2)
        seq = seq.replace(s" $x $y ", s" $m ")
      }
      seq.trim.split(" ").toSeq
    }
    val vocab = docs.values.toSeq
      .flatMap(_.split(" ").filter(_.nonEmpty).flatMap(encodeWord))
      .distinct.sorted
    val fromId = vocab.zipWithIndex
      .map { case (s, i) => (i + 1L).toString -> s }.toMap
    var checked = 0
    docs.foreach { case (id, text) =>
      enc.get(id).foreach { ids =>
        // decode = reverse-vocab lookup + concatenation. The id stream
        // does not carry word boundaries (no leading-space marker
        // convention in this tokenizer), so the lossless-content
        // contract is: decoded symbols concatenate to the document's
        // exact character stream (its words joined boundary-free).
        val rebuilt = ids.split(" ").map(fromId).mkString
        val expected = text.split(" ").filter(_.nonEmpty).mkString
        assert(rebuilt == expected, s"doc $id: decode(encode) diverged")
        checked += 1
      }
    }
    assert(checked >= 100, s"only $checked docs checked")
  }

  test("x_survival: KM structural invariants — telescoping risk set, " +
      "non-increasing survival, full-cohort start") {
    val ev = etl.Tables.load(spark, dir, "events")
    val cohort = ev.filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    val rows = SparkEntry.queries("x_survival")(spark, dir).collect()
    assert(rows.nonEmpty)
    // the first risk set is the whole signup cohort
    assert(rows.head.getAs[Long]("n_risk") == cohort)
    var prevS = 1.0
    var prevRisk = -1L
    var prevTot = -1L
    for (r <- rows) {
      val nRisk = r.getAs[Long]("n_risk")
      val nTot = r.getAs[Long]("n_events") + r.getAs[Long]("n_censored")
      val s = r.getAs[Double]("survival")
      // risk sets telescope exactly: whoever isn't counted at t is at
      // risk strictly later — a lost or double-counted user breaks it
      if (prevRisk >= 0) assert(nRisk == prevRisk - prevTot,
        s"risk set must telescope at duration ${r.get(0)}")
      assert(s <= prevS + 1e-9, "KM survival must be non-increasing")
      assert(s >= 0.0 && s <= 1.0)
      prevS = s; prevRisk = nRisk; prevTot = nTot
    }
    // everyone is accounted for exactly once
    assert(rows.map(r => r.getAs[Long]("n_events") +
      r.getAs[Long]("n_censored")).sum == cohort)
  }

  test("SOQL date-literal ranges: half-open day alignment, adjacency, " +
      "and composition identities over a year of anchors") {
    import graft.soql.Soql
    import java.time.LocalDate
    val DayUs = 86400000000L
    def r(kind: String, n: Int, t: LocalDate) =
      Soql.dateRange(Soql.DLit(kind, n), t)
    // 366 distinct anchors cross month/year boundaries and a leap day
    val anchors = (0 until 366).map(LocalDate.of(2024, 1, 1).plusDays(_))
    for (t <- anchors) {
      // every literal is a non-empty half-open range on the UTC day grid
      for (k <- Seq("TODAY", "YESTERDAY", "TOMORROW", "LAST_90_DAYS",
          "THIS_MONTH", "LAST_MONTH", "NEXT_MONTH", "THIS_YEAR",
          "LAST_YEAR", "NEXT_YEAR")) {
        val (lo, hi) = r(k, 0, t)
        assert(lo < hi && lo % DayUs == 0 && hi % DayUs == 0,
          s"$k at $t: [$lo, $hi)")
      }
      // adjacency: YESTERDAY + TODAY + TOMORROW tile three days
      assert(r("YESTERDAY", 0, t)._2 == r("TODAY", 0, t)._1)
      assert(r("TODAY", 0, t)._2 == r("TOMORROW", 0, t)._1)
      // LAST_N_DAYS:n = [today - n days, tomorrow) — includes today
      // plus the n preceding days; n=90 aligns with LAST_90_DAYS
      assert(r("LAST_N_DAYS", 90, t) == r("LAST_90_DAYS", 0, t))
      assert(r("LAST_N_DAYS", 1, t) ==
        ((r("YESTERDAY", 0, t)._1, r("TODAY", 0, t)._2)))
      // NEXT_N_DAYS:n starts tomorrow and spans n days
      val (nlo, nhi) = r("NEXT_N_DAYS", 7, t)
      assert(nlo == r("TOMORROW", 0, t)._1 && nhi - nlo == 7 * DayUs)
      // month/year literals tile: LAST | THIS | NEXT are adjacent
      assert(r("LAST_MONTH", 0, t)._2 == r("THIS_MONTH", 0, t)._1)
      assert(r("THIS_MONTH", 0, t)._2 == r("NEXT_MONTH", 0, t)._1)
      assert(r("LAST_YEAR", 0, t)._2 == r("THIS_YEAR", 0, t)._1)
      assert(r("THIS_YEAR", 0, t)._2 == r("NEXT_YEAR", 0, t)._1)
      // containment: today's day range sits inside its month and year
      val (tl, th) = r("TODAY", 0, t)
      val (ml, mh) = r("THIS_MONTH", 0, t)
      val (yl, yh) = r("THIS_YEAR", 0, t)
      assert(ml <= tl && th <= mh && yl <= ml && mh <= yh)
    }
  }

  test("registry parity: every query has an oracle, headline is valid") {
    // the driver's correctness gate only checks queries that have BOTH
    // a queries entry and an oracleSql entry — a key drift between the
    // two maps silently weakens the gate, so it fails here instead
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      (SparkEntry.queries.keySet diff SparkEntry.oracleSql.keySet)
        .union(SparkEntry.oracleSql.keySet diff SparkEntry.queries.keySet)
        .mkString(", "))
    assert(SparkEntry.benchQueries.nonEmpty) // throws on a typo'd name
  }

  test("chunkpack decomposition is shard-width-invariant") {
    // the two-phase cumsum (per-shard window + driver-prefixed bases)
    // must equal the single global cumsum for ANY shard width —
    // including width 1 (every doc its own shard: the result is pure
    // driver prefix) and a width larger than the corpus (one shard:
    // the result is pure window). Ragged widths catch off-by-one bugs
    // in the base prefix.
    val ref = ops.Text.chunkPack(spark, dir, shardWidth = 1000000L)
      .collect().toSeq
    for (wd <- Seq(1L, 7L, 64L, 499L)) {
      val got = ops.Text.chunkPack(spark, dir, shardWidth = wd)
        .collect().toSeq
      assert(got == ref, s"width $wd diverges from single-shard result")
    }
  }

  test("decimal-cast sums are partitioning-invariant") {
    val li = etl.Tables.load(spark, dir, "lineitem")
    def total(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(ops.dsum(col("l_extendedprice"))).collect()(0).getDouble(0)
    val base = total(li)
    assert(total(li.repartition(1)) == base)
    assert(total(li.repartition(17, col("l_suppkey"))) == base)
    assert(total(li.orderBy(desc("l_extendedprice"))) == base)
  }

  test("JVM portableHash60 equals the Spark SQL formulation") {
    import spark.implicits._
    val samples = Seq("", "a", "hello world", "0,63", "the fast key",
      "ünïcode ✓", "1:shingle text here")
    val viaSql = samples.toDF("s")
      .select(ops.Text.portableHash(col("s")).as("h"))
      .collect().map(_.getLong(0))
    val viaJvm = samples.map(functions.Hashing.portableHash60)
    assert(viaSql.toSeq == viaJvm)
  }

  test("exactQuantiles is bit-identical to the builtin percentile") {
    val li = etl.Tables.load(spark, dir, "lineitem")
    // mixed fractional + integer ranks, duplicates-heavy (l_quantity)
    // and near-distinct (l_extendedprice) distributions
    for (c <- Seq("l_extendedprice", "l_quantity")) {
      val ps = Seq(0.0, 0.05, 0.25, 0.5, 0.9, 1.0)
      val got = ops.Extras.exactQuantiles(li, c, ps, shards = 7)
      val want = li.agg(expr(
        s"percentile($c, array(${ps.mkString(",")}))")).head.getSeq[Double](0)
      assert(got == want.toSeq, s"$c: $got != $want")
    }
  }

  test("exactQuantiles edges: constant column, single row, extreme ps") {
    val sp = spark
    import sp.implicits._
    // constant column: every quantile is the constant, interpolation
    // must not divide by an empty rank span
    val const = Seq.fill(100)(7.5).toDF("v")
    assert(ops.Extras.exactQuantiles(const, "v", Seq(0.0, 0.5, 1.0))
      == Seq(7.5, 7.5, 7.5))
    // single row: floor==ceil at every p
    val one = Seq(42.0).toDF("v")
    assert(ops.Extras.exactQuantiles(one, "v", Seq(0.0, 0.3, 1.0))
      == Seq(42.0, 42.0, 42.0))
    // two rows: p=0.5 interpolates halfway
    val two = Seq(1.0, 2.0).toDF("v")
    assert(ops.Extras.exactQuantiles(two, "v", Seq(0.5)) == Seq(1.5))
    // more shards than distinct values (empty shards are legal)
    val few = Seq(1.0, 2.0, 3.0).toDF("v")
    assert(ops.Extras.exactQuantiles(few, "v", Seq(0.0, 1.0), shards = 16)
      == Seq(1.0, 3.0))
    // all-null input refuses loudly instead of returning garbage
    val nulls = Seq[Option[Double]](None, None).toDF("v")
    intercept[IllegalArgumentException] {
      ops.Extras.exactQuantiles(nulls, "v", Seq(0.5))
    }
  }

  test("x_quantiles_grouped is bit-identical to builtin percentile per group") {
    // before the round4 for the oracle, the distributed interpolation
    // must equal Spark's own percentile() exactly — same property the
    // ungrouped exactQuantiles pins
    val got = ops.Extras.queries("x_quantiles_grouped")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val want = etl.Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)"),
        expr("percentile(l_quantity, 0.9)"))
      .collect()
      .map(r => r.getString(0) ->
        (math.floor(r.getDouble(1) * 1e4 + 0.5) / 1e4,
          math.floor(r.getDouble(2) * 1e4 + 0.5) / 1e4))
      .toMap
    assert(got == want, s"$got != $want")
  }

  test("Misra-Gries guarantee holds under any partitioning") {
    import graft.functions.HeavyHitters
    val keyed = etl.Tables.load(spark, dir, "lineitem").select(
      when(col("l_orderkey") % 10 < 5,
        concat(lit("hot"), (col("l_orderkey") % 7).cast("string")))
      .otherwise(concat(lit("cold"), col("l_orderkey").cast("string")))
      .as("k"))
    val truth = keyed.groupBy("k").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    val k = 50
    val eps = n.toDouble / (k + 1)
    // merge order changes the summary contents; the guarantee must not
    for (parts <- Seq(1, 7, 32)) {
      val mg = keyed.repartition(parts)
        .agg(HeavyHitters.mgSketchCol(col("k"), k))
        .head.getMap[String, Long](0)
      assert(mg.size <= k, s"parts=$parts: summary exceeded k")
      for ((key, c) <- truth if c > eps)
        assert(mg.contains(key), s"parts=$parts: heavy $key absent")
      for ((key, est) <- mg) {
        val c = truth(key)
        assert(est <= c && est >= c - eps,
          s"parts=$parts: $key est $est outside [${c - eps}, $c]")
      }
    }
  }

  test("count-min: sketch is partition-invariant; bounds hold") {
    import graft.functions.HeavyHitters
    val keyed = etl.Tables.load(spark, dir, "lineitem").select(
      when(col("l_orderkey") % 10 < 5,
        concat(lit("hot"), (col("l_orderkey") % 7).cast("string")))
      .otherwise(concat(lit("cold"), col("l_orderkey").cast("string")))
      .as("k"))
    val width = 2048
    // unlike MG, the CM buffer is a pure elementwise sum — the sketch
    // ITSELF (not just its guarantees) must be identical under any
    // partitioning
    val sketches = Seq(1, 7, 32).map { parts =>
      keyed.repartition(parts)
        .agg(HeavyHitters.cmSketchCol(col("k"), width))
        .head.getSeq[Long](0).toArray
    }
    assert(sketches.forall(_.sameElements(sketches.head)))
    val truth = keyed.groupBy("k").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    val eps = 2.718281828459045 / width * n
    for ((key, c) <- truth) {
      val est = HeavyHitters.cmEstimate(sketches.head, width, key)
      assert(est >= c, s"$key underestimated: $est < $c")
      assert(est <= c + eps, s"$key est $est above $c + $eps")
    }
  }

  test("approx_count_distinct lands within 5% of exact") {
    // the query now emits the bound verdict itself (within_bound — the
    // hash-checkable form); assert it holds AND cross-check the exact
    // side against an independent distinct count
    val o = etl.Tables.load(spark, dir, "orders")
    val row = ops.Relational.queries("a3_approx")(spark, dir).collect()(0)
    assert(row.getAs[Boolean]("within_bound"),
      "HLL estimate drifted outside the 5% bound")
    val exact = o.select("o_custkey").distinct().count()
    assert(row.getAs[Long]("exact_custs") == exact)
  }

  test("salted two-phase aggregation equals the direct groupBy") {
    val direct = etl.Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(count("*").as("n"), ops.dsum(col("value")).as("sum_value"))
    val salted = ops.Relational.queries("a2_salted")(spark, dir)
    assert(salted.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(salted).count() == 0)
  }

  test("latestByKey is idempotent and keeps one row per key") {
    val ev = etl.Tables.load(spark, dir, "events")
    val once = etl.Load.latestByKey(ev, "user_id", "ts",
      tiebreak = Seq("event_id"))
    val twice = etl.Load.latestByKey(once, "user_id", "ts",
      tiebreak = Seq("event_id"))
    assert(once.count() ==
      ev.select("user_id").distinct().count())
    assert(once.exceptAll(twice).count() == 0)
  }

  test("int8 quantization: |q| <= 127, extremum saturates, fidelity high") {
    // q ships as a comma-joined string (driver-comparable form); split it
    // back to longs for the per-component properties
    val out = ops.Vectors.queries("v_quant")(spark, dir)
      .select(col("vec_id"),
        transform(split(col("q"), ","), x => x.cast("long")).as("q"),
        col("qcos"))
    val bad = out.filter(exists(col("q"),
      qi => abs(qi) > 127)).count()
    assert(bad == 0, s"$bad vectors quantized outside [-127, 127]")
    // the max-|x| component maps to exactly ±127 by construction
    val noSat = out.filter(!exists(col("q"),
      qi => abs(qi) === 127)).count()
    assert(noSat == 0, s"$noSat vectors lost their saturated extremum")
    // dequantized cosine stays near 1 (64-dim, 8-bit: tight)
    val minQcos = out.agg(min("qcos")).collect()(0).getDouble(0)
    assert(minQcos > 0.99, s"quantization fidelity collapsed: $minQcos")
  }

  test("SCD2 intervals: contiguous per user, one current row, real changes") {
    val out = ops.Etl.queries("l_scd2")(spark, dir)
      .select("user_id", "event_type", "valid_from", "valid_to",
        "is_current")
      .collect()
      .groupBy(_.getLong(0))
    assert(out.nonEmpty)
    out.foreach { case (user, rows) =>
      val sorted = rows.sortBy(_.getTimestamp(2).getTime)
      // exactly one open (current) interval per user, and it is the last
      assert(sorted.count(_.getInt(4) == 1) == 1, s"user $user currents")
      assert(sorted.last.getInt(4) == 1, s"user $user current not last")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // interval close of row i == open of row i+1 (no gaps/overlaps)
          assert(a.getTimestamp(3) == b.getTimestamp(2),
            s"user $user interval gap: ${a.getTimestamp(3)} vs " +
              s"${b.getTimestamp(2)}")
          // consecutive intervals carry DIFFERENT attribute values —
          // otherwise change detection failed to collapse
          assert(a.getString(1) != b.getString(1),
            s"user $user adjacent intervals share type ${a.getString(1)}")
        case _ =>
      }
    }
  }

  test("span dedup: counts bounded, verdict consistent, symmetric") {
    val out = ops.Text.queries("t_spandedup")(spark, dir)
    // n_dup_spans never exceeds n_spans; keep verdict matches dup_frac
    assert(out.filter(col("n_dup_spans") > col("n_spans")).count() == 0)
    assert(out.filter(
      (col("keep") === 1) =!= (col("dup_frac") < 0.5)).count() == 0)
    // duplication is symmetric: a span in ≥2 docs flags EVERY holder, so
    // the total dup count can never be 1 (a lone flagged doc would mean
    // its partner was missed)
    val total = out.agg(sum("n_dup_spans")).collect()(0).getLong(0)
    assert(total != 1)
    assert(total > 0, "corpus has template near-dups; expected shared spans")
  }

  test("funnel stages only narrow") {
    val r = ops.Events.queries("e_funnel")(spark, dir).collect()(0)
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel widened: $v -> $c -> $p")
    assert(v > 0)
  }

  test("gap-filled series is dense: every hour x type present exactly once") {
    val out = ops.Events.queries("e_gapfill")(spark, dir)
    val hours = out.select("h").distinct().count()
    val types = out.select("event_type").distinct().count()
    assert(out.count() == hours * types,
      "spine x types grid has holes or duplicates")
    assert(out.groupBy("h", "event_type").count()
      .filter(col("count") > 1).count() == 0)
  }
}
