package graft

import org.apache.spark.sql.functions._
import graft.etl.{Load, Tables}

/** Bucketed co-located joins: same-bucketed tables must join with NO
  * shuffle exchange — the fact⋈fact scale lever (ROADMAP #1).
  */
class BucketedJoinSpec extends SparkTestBase {

  test("same-key bucketed tables join without a shuffle") {
    val dir = "/root/testdata/sf0.001"
    // a fresh test JVM has an empty in-memory catalog, but the warehouse
    // DIRECTORY survives from prior runs and saveAsTable refuses to
    // reuse the location — clear both
    for (t <- Seq("orders_b", "customer_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    Load.writeBucketed(o, "orders_b", "o_custkey", 8)
    Load.writeBucketed(
      c.withColumnRenamed("c_custkey", "o_custkey"), "customer_b",
      "o_custkey", 8)
    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"), "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n${plan.take(800)}")
    // and it's still correct
    val expected = o.join(c, o("o_custkey") === c("c_custkey")).count()
    assert(joined.count() == expected)
  }

  test("decimal fidelity mode maps Currency precision to DecimalType") {
    import graft.schema._
    val cur = SfField("Amount", FieldType.Currency, length = 0,
      precision = 18, scale = 2)
    // reference-faithful default: varchar/string
    assert(Mapping.dataTypeOf(cur.fieldType) ==
      org.apache.spark.sql.types.StringType)
    // opt-in decimal mode recovers the lost precision metadata
    assert(Mapping.dataTypeOf(cur, decimalMode = true) ==
      org.apache.spark.sql.types.DecimalType(18, 2))
    // non-money types are unaffected by the flag
    val txt = SfField("Note", FieldType.TextArea, precision = 10)
    assert(Mapping.dataTypeOf(txt, decimalMode = true) ==
      org.apache.spark.sql.types.StringType)
  }
}
