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
