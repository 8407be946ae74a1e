package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorAgg

class VectorAggSpec extends SparkTestBase {

  test("vectorMean matches the posexplode formulation on real data") {
    val e = etl.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val viaAgg = e.groupBy("label")
      .agg(VectorAgg.vectorMeanCol(col("embedding")).as("c"))
      .select(col("label"), posexplode(col("c")).as(Seq("dim", "m")))
    val viaExplode = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("label", "dim")
      .agg((sum(col("x").cast("double")) / count("*")).as("m2"))
    val joined = viaAgg.join(viaExplode, Seq("label", "dim"))
      .select(abs(col("m") - col("m2")).as("err"))
      .agg(max("err")).collect()(0).getDouble(0)
    // double-sum order differs between the two plans; only ULP-level drift
    assert(joined < 1e-12, s"max err $joined")
  }

  test("vectorMean: empty group and dimension mismatch") {
    import spark.implicits._
    val df = Seq((1, Array(1.0f, 3.0f)), (1, Array(3.0f, 5.0f)))
      .toDF("k", "v")
    val out = df.groupBy("k").agg(VectorAgg.vectorMeanCol(col("v")).as("m"))
      .collect()(0).getSeq[Double](1)
    assert(out == Seq(2.0, 4.0))
    val bad = Seq((1, Array(1.0f)), (1, Array(1.0f, 2.0f))).toDF("k", "v")
    intercept[Exception] {
      bad.groupBy("k").agg(VectorAgg.vectorMeanCol(col("v"))).collect()
    }
  }
}
