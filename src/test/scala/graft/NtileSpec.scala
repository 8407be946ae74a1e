package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ntileBySketch contract: bit-identical to exact `ntile(n)` over the
  * global (value, tie) total order, for ANY sketch size — accuracy shapes
  * bucket balance (parallelism), never the assignment. Tested against
  * Spark's own unpartitioned ntile window (fine at test size; the helper
  * exists precisely so production never runs that one-task plan).
  */
class NtileSpec extends SparkTestBase {

  // deterministic values with heavy ties (mod 17) so tile boundaries land
  // inside tie runs — the case where a naive bucket-vs-cut comparison
  // could split equal values across tiles
  private lazy val df = {
    val s = spark
    import s.implicits._
    s.range(0, 997)
      .select(col("id").as("k"),
        (col("id") % 17).cast("double").as("v"))
      .cache()
  }

  private def exact(n: Int) = {
    val w = Window.orderBy(asc("v"), asc("k"))
    df.select(col("k"), ntile(n).over(w).as("tile"))
  }

  for (n <- Seq(1, 3, 4, 7); cuts <- Seq(1, 31)) {
    test(s"ntileBySketch(n=$n, sketchCuts=$cuts) == exact ntile") {
      val got = ops.Windows.ntileBySketch(df, "v", Seq("k"), n,
        sketchCuts = cuts).select("k", "tile")
      assert(got.except(exact(n)).isEmpty &&
        exact(n).except(got).isEmpty)
    }
  }

  test("ntileBySketch keeps all input columns and row count") {
    val out = ops.Windows.ntileBySketch(df, "v", Seq("k"), 5)
    assert(out.columns.toSet == Set("k", "v", "tile"))
    assert(out.count() == 997)
  }
}
