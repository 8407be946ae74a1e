package graft

import org.apache.spark.sql.functions._

/** Incremental LPA (g_labelprop_incr): the frontier-restricted seeded
  * iteration must land on a TRUE fixpoint of the full graph — the
  * property the registered query's equivalence argument rests on — and
  * the maintained seed must actually save work versus from-scratch.
  */
class GraphIncrSpec extends SparkTestBase {
  private val testdataRoot =
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
  private def requireFixture(sf: String): String = {
    val d = s"$testdataRoot/$sf"
    assume(new java.io.File(d).isDirectory, s"fixture $d absent — skipping")
    d
  }

  test("g_labelprop_incr returns a fixpoint of the FULL graph") {
    // One more unrestricted synchronous round over the full edge list
    // must change zero labels. This checks the frontier restriction
    // dropped nothing: if any node outside the iterated frontier should
    // have changed, this full-sweep round finds it.
    val d = requireFixture("sf0.01")
    val lab = graft.ops.Extras.queries("g_labelprop_incr")(spark, d)
      .select(col("user_id").as("u"), col("label").as("lab"))
      .localCheckpoint()
    val ev = graft.etl.Tables.load(spark, d, "events")
    val act = ev.select(col("user_id"),
      date_trunc("hour", col("ts")).as("h")).distinct()
    val pairs = act.as("a").join(act.as("b"), Seq("h"))
      .filter(col("a.user_id") < col("b.user_id"))
      .groupBy(col("a.user_id").as("u"), col("b.user_id").as("v"))
      .agg(count(lit(1)).as("w")).filter(col("w") >= 3)
    val edges = pairs.select(col("u"), col("v"), col("w"))
      .unionByName(pairs.select(col("v").as("u"), col("u").as("v"),
        col("w")))
    val next = edges
      .join(lab.select(col("u").as("v"), col("lab")), "v")
      .groupBy("u", "lab").agg(sum("w").as("wsum"))
      .groupBy("u")
      .agg(max(struct(col("wsum"), (-col("lab")).as("nl"))).as("m"))
      .select(col("u"), (-col("m.nl")).as("lab2"))
    val changed = next.join(lab, "u")
      .filter(col("lab2") =!= col("lab")).count()
    assert(changed == 0,
      s"$changed node(s) would still change under a full sweep — the " +
        "frontier restriction dropped work it owed")
    // and the labeling covers exactly the full graph's node set
    val nNodes = edges.select("u").distinct().count()
    assert(lab.count() == nNodes)
  }

  test("g_sssp_incr relaxation: exact on a controlled insertion, and " +
      "DELTA-PROPORTIONAL — untouched regions never enter a frontier") {
    import spark.implicits._
    // path 1-2-3-4-5-6 plus an off-path appendage 2-7; insert the
    // shortcut (1, 5). Landmark = 1. True new distances: 5 improves
    // 4→1, then its neighbors 4 (3→2) and 6 (5→2) — exactly THREE
    // nodes change, one improvement each; nodes 2, 3, 7 must never
    // appear in any relaxation frontier.
    def sym(p: Seq[(Long, Long)]) =
      (p ++ p.map(e => (e._2, e._1))).toDF("u", "v")
    val pathE = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (2L, 7L))
    val edgesOld = sym(pathE)
    val edges = sym(pathE :+ ((1L, 5L)))
    val seeds = Seq((1L, 1L, 0)).toDF("lm", "u", "dist")
    val prev = graft.ops.Extras.ssspBfs(edgesOld, seeds)
    // old-graph truth sanity
    val pd = prev.collect().map(r =>
      r.getLong(1) -> r.getInt(2)).toMap
    assert(pd == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4,
      6L -> 5, 7L -> 2))
    // incremental: frontier seeded from the inserted edge only
    val delta = Seq((1L, 5L), (5L, 1L)).toDF("u", "v")
    val cand0 = prev.join(delta, "u")
      .select(col("lm"), col("v").as("u"),
        (col("dist") + lit(1)).as("dist"))
      .groupBy("lm", "u").agg(min("dist").as("dist"))
    val frontier0 = cand0
      .join(prev.withColumnRenamed("dist", "__sd"), Seq("lm", "u"),
        "left")
      .filter(col("__sd").isNull || col("dist") < col("__sd"))
      .select("lm", "u", "dist")
    val (state, sizes) = graft.ops.Extras.ssspRelax(edges, prev,
      frontier0)
    // exactness: must equal from-scratch BFS on the full graph
    val full = graft.ops.Extras.ssspBfs(edges, seeds)
    assert(state.exceptAll(full).isEmpty &&
      full.exceptAll(state).isEmpty,
      "incremental relaxation must land on the full-graph truth")
    // delta-proportionality: total frontier work = the 3 nodes whose
    // distance actually changed (5, then 4 and 6), one improvement
    // each — nothing outside the cascade ever enters a frontier
    assert(sizes.sum == 3, s"frontier sizes $sizes — relaxation " +
      "touched rows outside the improvement cascade")
    val changed = state.withColumnRenamed("dist", "nd")
      .join(prev.withColumnRenamed("dist", "od"), Seq("lm", "u"))
      .filter(col("nd") < col("od"))
      .select("u").collect().map(_.getLong(0)).toSet
    assert(changed == Set(4L, 5L, 6L))
  }

  test("warm-started PageRank: both starts are mixing-dominated here") {
    // The honest measurement behind g_wpagerank_incr (the
    // j_fuzzy_blocked precedent — ship the discipline, disclose what
    // the fixture actually shows): on this 150-node co-activity graph
    // the damped chain mixes to ~1e-5 L1 of a 6-round reference within
    // 3 COLD rounds, so a warm start has no headroom — and carries a
    // small old-graph bias (measured warm3 ≈ 1.3e-5 vs cold3 ≈ 5e-6,
    // both within the 1e-4 envelope asserted below). The warm-start
    // payoff regime is slow-mixing web-scale graphs where cold rounds
    // are the expensive resource; at test scale the spec pins that the
    // maintained-seed rig is exact and loses nothing material, not
    // that it wins.
    import graft.ops.Extras
    val d = requireFixture("sf0.01")
    val ev = graft.etl.Tables.load(spark, d, "events")
    val mm = ev.agg(unix_micros(min(col("ts"))),
      unix_micros(max(col("ts")))).head()
    val cut = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2
    def edgesOf(e: org.apache.spark.sql.DataFrame) = {
      val act = e.select(col("user_id"),
        date_trunc("hour", col("ts")).as("h")).distinct()
      val pairs = act.as("a").join(act.as("b"), Seq("h"))
        .filter(col("a.user_id") < col("b.user_id"))
        .groupBy(col("a.user_id").as("u"), col("b.user_id").as("v"))
        .agg(count(lit(1)).as("w")).filter(col("w") >= 3)
      pairs.select(col("u"), col("v"), col("w"))
        .unionByName(pairs.select(col("v").as("u"), col("u").as("v"),
          col("w")))
        .localCheckpoint()
    }
    val edgesOld = edgesOf(ev.filter(unix_micros(col("ts")) < lit(cut)))
    val edges = edgesOf(ev)
    val str = edges.groupBy("u").agg(sum("w").as("s"))
    val nc = str.agg(count(lit(1)).cast("double").as("nn"))
    val oldPr = Extras.wprChain(edgesOld, Extras.wprUniformSeed(edgesOld), 3)
    val warmSeed = str.select(col("u"))
      .join(oldPr.select(col("u"), col("pr").as("ppr")), Seq("u"), "left")
      .crossJoin(broadcast(nc))
      .select(col("u"),
        coalesce(col("ppr"),
          graft.ops.roundf(lit(1.0) / col("nn"), 9)).as("pr"))
    val warm3 = Extras.wprChain(edges, warmSeed, 3)
    val cold3 = Extras.wprChain(edges, Extras.wprUniformSeed(edges), 3)
    val ref6 = Extras.wprChain(edges, Extras.wprUniformSeed(edges), 6)
    def l1(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Double =
      a.select(col("u"), col("pr").as("pa"))
        .join(b.select(col("u"), col("pr").as("pb")), "u")
        .agg(sum(abs(col("pa") - col("pb")))).head.getDouble(0)
    val dWarm = l1(warm3, ref6)
    val dCold = l1(cold3, ref6)
    info(f"L1 to 6-round reference: warm3=$dWarm%.8f cold3=$dCold%.8f")
    assert(dCold < 1e-4,
      f"cold 3-round chain stopped mixing: $dCold%.8f — the " +
        "mixing-dominated premise of this disclosure broke")
    assert(dWarm < 1e-4,
      f"warm start drifted materially from the deep reference: " +
        f"$dWarm%.8f — old-graph bias is no longer washing out")
  }

  test("incremental seed converges in fewer frontier rounds than scratch") {
    // The point of seeding from the maintained labeling: the pre-cut
    // half's fixpoint already settles most nodes, so the seeded run's
    // changed-node counts should start well below the graph size and
    // hit zero within the cap. Measured here (not hardcoded): scratch
    // convergence takes >= 2 changing rounds on this fixture; the
    // seeded frontier must need no MORE rounds than scratch.
    val d = requireFixture("sf0.01")
    val ev = graft.etl.Tables.load(spark, d, "events")
    def edgesOf(e: org.apache.spark.sql.DataFrame) = {
      val act = e.select(col("user_id"),
        date_trunc("hour", col("ts")).as("h")).distinct()
      val pairs = act.as("a").join(act.as("b"), Seq("h"))
        .filter(col("a.user_id") < col("b.user_id"))
        .groupBy(col("a.user_id").as("u"), col("b.user_id").as("v"))
        .agg(count(lit(1)).as("w")).filter(col("w") >= 3)
      pairs.select(col("u"), col("v"), col("w"))
        .unionByName(pairs.select(col("v").as("u"), col("u").as("v"),
          col("w")))
        .localCheckpoint()
    }
    def roundsToFix(edges: org.apache.spark.sql.DataFrame,
        seed: org.apache.spark.sql.DataFrame): Int = {
      var lab = seed.localCheckpoint()
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < 12) {
        val next = edges
          .join(lab.select(col("u").as("v"), col("lab")), "v")
          .groupBy("u", "lab").agg(sum("w").as("wsum"))
          .groupBy("u")
          .agg(max(struct(col("wsum"), (-col("lab")).as("nl"))).as("m"))
          .select(col("u"), (-col("m.nl")).as("lab"))
          .localCheckpoint()
        changed = next.join(lab.select(col("u"), col("lab").as("p")), "u")
          .filter(col("lab") =!= col("p")).count()
        lab = next
        rounds += 1
      }
      assert(changed == 0, "did not converge within 12 rounds")
      rounds
    }
    val mm = ev.agg(unix_micros(min(col("ts"))),
      unix_micros(max(col("ts")))).head()
    val cut = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2
    val edgesOld = edgesOf(ev.filter(unix_micros(col("ts")) < lit(cut)))
    val edges = edgesOf(ev)
    val identity = edges.select(col("u")).distinct()
      .select(col("u"), col("u").as("lab"))
    val oldFix = {
      val seedO = edgesOld.select(col("u")).distinct()
        .select(col("u"), col("u").as("lab"))
      var lab = seedO.localCheckpoint()
      var changed = 1L
      while (changed > 0) {
        val next = edgesOld
          .join(lab.select(col("u").as("v"), col("lab")), "v")
          .groupBy("u", "lab").agg(sum("w").as("wsum"))
          .groupBy("u")
          .agg(max(struct(col("wsum"), (-col("lab")).as("nl"))).as("m"))
          .select(col("u"), (-col("m.nl")).as("lab"))
          .localCheckpoint()
        changed = next.join(lab.select(col("u"), col("lab").as("p")), "u")
          .filter(col("lab") =!= col("p")).count()
        lab = next
      }
      lab
    }
    val seeded = edges.select(col("u")).distinct()
      .join(oldFix.select(col("u"), col("lab").as("plab")), Seq("u"), "left")
      .select(col("u"), coalesce(col("plab"), col("u")).as("lab"))
    val rScratch = roundsToFix(edges, identity)
    val rSeeded = roundsToFix(edges, seeded)
    info(s"full-sync rounds to fixpoint: scratch=$rScratch seeded=$rSeeded")
    assert(rScratch >= 2, "degenerate fixture: scratch converged instantly")
    assert(rSeeded <= rScratch,
      s"seeding from the maintained labeling must not add rounds: " +
        s"seeded=$rSeeded > scratch=$rScratch")
  }

  test("co-activity hour cap never binds at fixture scale") {
    // The graph oracles added in round 12 (g_degree_dist, g_kcore,
    // g_triangles) mirror coactivityEdges WITHOUT the capHourBand
    // 512-per-hour truncation — sound only while the cap is a no-op on
    // the fixtures. If a regenerated fixture ever packs more distinct
    // actives into one hour, this assertion names the cause instead of
    // leaving a bare hash-red row.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"$testdataRoot/$sf"
      if (new java.io.File(dir).isDirectory) {
        val maxPerHour = graft.etl.Tables.load(spark, dir, "events")
          .select(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .distinct()
          .groupBy("h").agg(count(lit(1)).as("n"))
          .agg(max("n")).head().getLong(0)
        assert(maxPerHour < graft.ops.Extras.CoActivityHourCapK,
          s"$sf: $maxPerHour actives in the densest hour ≥ cap " +
            s"${graft.ops.Extras.CoActivityHourCapK} — the uncapped " +
            "graph oracles (g_degree_dist/g_kcore/g_triangles/" +
            "g_neighborhood/g_jaccard_sim) no longer mirror " +
            "capHourBand; mirror the hash-rank cap in their SQL or " +
            "raise CoActivityHourCapK")
      }
    }
  }
}
