package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational

/** Pass-Join segment blocking must be RESULT-INVARIANT: the candidate set
  * it prunes to may only drop pairs that cannot be within edit distance
  * τ. These tests compare against the unblocked quadratic join on inputs
  * chosen to stress the layout math (varied lengths, L ≡ 0/1/2 mod 3),
  * the shift tolerance (insertions/deletions early in the string), and
  * the L < 3 fallback branch the fixed-length customer corpus never hits.
  */
class FuzzySpec extends SparkTestBase {

  private def brute(probes: org.apache.spark.sql.DataFrame,
      master: org.apache.spark.sql.DataFrame) =
    probes.join(master,
        abs(length(col("c_name")) - length(col("dirty_name"))) <= 2)
      .select(col("probe_key"), col("dirty_name"),
        col("c_custkey").as("matched_key"),
        levenshtein(col("dirty_name"), col("c_name")).as("dist"))
      .filter(col("dist") <= 2)

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("probe_key", "matched_key", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("thresholded levenshtein pins full-levenshtein semantics") {
    // the fuzzy verifies use levenshtein(l, r, 2) (banded, early-exit);
    // this pins the contract the oracles rely on: exact distance when
    // <= threshold, -1 otherwise — including the empty-string and
    // length-gap edges
    import spark.implicits._
    val ls = Seq("abcde", "abde", "xbcde", "abcdefgh", "a", "", "abcd")
    val rs = Seq("abcde", "abdce", "zzzzz", "ab", "")
    val rows = (for (a <- ls; b <- rs) yield (a, b))
      .toDF("l", "r")
      .select(levenshtein(col("l"), col("r")).as("full"),
        levenshtein(col("l"), col("r"), 2).as("thr"))
      .collect()
    rows.foreach { r =>
      val (full, thr) = (r.getInt(0), r.getInt(1))
      if (full <= 2) assert(thr == full, s"full=$full thr=$thr")
      else assert(thr == -1, s"full=$full thr=$thr")
    }
  }

  test("blocked equals brute force on varied-length dirty strings") {
    import spark.implicits._
    // master: lengths 1..24 across all residues mod 3
    val words = Seq("a", "ab", "abc", "abcd", "abcde", "kitten",
      "sitting", "saturday", "sunday", "alpha-beta", "alphabetagam",
      "abcdefghijklmn", "abcdefghijklmnopq", "the quick brown fox x",
      "pack my box with five dz", "zzz", "kitton", "abxd")
    val master = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("c_custkey", "c_name")
    // probes: deletions, substitutions, insertions at varied positions —
    // including edits in the FIRST characters (max shift stress) and
    // exact copies (dist 0)
    val dirty = Seq("a", "b", "abd", "bcd", "abcde", "kittenx", "xitten",
      "sittin", "satxrday", "sunda", "alpha-betaz", "aalphabetagam",
      "abcdefghijklm", "zzz", "zz", "xyzzy", "abxd", "bxd")
    val probes = dirty.zipWithIndex
      .map { case (w, i) => (1000L + i, w) }.toDF("probe_key", "dirty_name")
    val blocked = asSet(Relational.fuzzyLinkBlocked(probes, master))
    val exact = asSet(brute(probes, master))
    assert(exact.nonEmpty)
    assert(blocked == exact,
      s"missed=${exact -- blocked} spurious=${blocked -- exact}")
  }

  test("randomized soundness: no pair within distance 2 is ever missed") {
    import spark.implicits._
    // 120 random masters (lengths 1..20) + probes derived by 0-2 random
    // edits (insert/delete/substitute at random positions) — the blocked
    // candidate set must contain EVERY (probe, its source master) pair,
    // since each is within distance ≤ 2 by construction. Seeded RNG:
    // deterministic, but exercises edit/position/length combinations no
    // hand-written vector list covers.
    val rnd = new scala.util.Random(0x60af7L)
    val alpha = "abcdefg" // small alphabet → frequent accidental matches
    def randStr(n: Int) =
      (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val masters = (0 until 120).map(i => (i.toLong, randStr(1 + rnd.nextInt(20))))
    def edit(s: String): String = {
      if (s.isEmpty) return s + alpha(rnd.nextInt(alpha.length))
      rnd.nextInt(3) match {
        case 0 => // substitute
          val p = rnd.nextInt(s.length)
          s.updated(p, alpha(rnd.nextInt(alpha.length)))
        case 1 => // delete
          val p = rnd.nextInt(s.length)
          s.substring(0, p) + s.substring(p + 1)
        case _ => // insert
          val p = rnd.nextInt(s.length + 1)
          s.substring(0, p) + alpha(rnd.nextInt(alpha.length)) +
            s.substring(p)
      }
    }
    val probes = masters.map { case (i, m) =>
      var p = m
      (0 until rnd.nextInt(3)).foreach(_ => p = edit(p))
      (1000L + i, p, i) // remember the source master
    }
    val mDf = masters.toDF("c_custkey", "c_name")
    val pDf = probes.map { case (k, s, _) => (k, s) }
      .toDF("probe_key", "dirty_name")
    val blocked = asSet(Relational.fuzzyLinkBlocked(pDf, mDf))
    val exact = asSet(brute(pDf, mDf))
    assert(blocked == exact,
      s"missed=${exact -- blocked} spurious=${blocked -- exact}")
    // and every engineered (probe → source master) pair is present
    probes.foreach { case (pk, _, src) =>
      assert(blocked.exists(t => t._1 == pk && t._2 == src),
        s"probe $pk lost its source master $src")
    }
  }

  test("j_fuzzy_blocked equals j_fuzzy on the customer corpus, via equi-join") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory, s"fixture $d absent")
    val blockedDf = graft.SparkEntry.queries("j_fuzzy_blocked")(spark, d)
    val plan = blockedDf.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"segment blocking must be an equi-join, not a nested loop:\n$plan")
    val blocked = asSet(blockedDf)
    val exact = asSet(graft.SparkEntry.queries("j_fuzzy")(spark, d))
    assert(exact.nonEmpty)
    assert(blocked == exact,
      s"missed=${exact -- blocked} spurious=${blocked -- exact}")
  }
}
