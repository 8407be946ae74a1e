package graft

import java.nio.file.Files
import scala.concurrent.ExecutionContext.Implicits.global
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.etl.{Bulk, Load, Tables}

/** ETL-layer behavior: bulk CSV extract job lifecycle (client.rs:215-243
  * semantics on Spark job groups), extract round-trip losslessness, and
  * load-side transforms.
  */
class EtlSpec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-etl").toString

  test("bulk extract job runs to JobComplete and round-trips losslessly") {
    val out = tmp() + "/orders_csv"
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val jobs = new Bulk.Jobs(spark)
    val job = jobs.createQueryJob(orders, orders.columns.toSeq, out)
    assert(job.state == Bulk.InProgress)
    assert(job.contentType == "CSV" && job.columnDelimiter == "COMMA" &&
      job.lineEnding == "LF") // response.rs:40-43 physical format
    val done = jobs.awaitJob(job.id)
    assert(done.state == Bulk.JobComplete, done.error)
    val back = Bulk.readExtract(spark, out, Tables.orders)
    assert(back.count() == orders.count())
    // lossless including timestamp micros and double text round-trip
    assert(back.exceptAll(orders).count() == 0)
    assert(orders.exceptAll(back).count() == 0)
  }

  test("in-flight abort lands in Aborted and interrupts the write") {
    import spark.implicits._
    // a slow source: per-row sleep keeps the job InProgress long enough
    // to abort it mid-write
    val slow = spark.range(0, 2000, 1, 4)
      .map { i => Thread.sleep(5); i }
      .toDF("v")
    val jobs = new Bulk.Jobs(spark)
    val out = tmp() + "/slow"
    val job = jobs.createQueryJob(slow, Seq("v"), out)
    Thread.sleep(300) // let tasks start
    val aborted = jobs.abortQueryJob(job.id).get
    assert(aborted.state == Bulk.Aborted)
    val terminal = jobs.awaitJob(job.id, timeoutMs = 60000)
    // abort must stick: the failed write callback may not overwrite it
    assert(terminal.state == Bulk.Aborted, terminal.toString)
  }

  test("abort before completion is legal only from InProgress/Upload") {
    val jobs = new Bulk.Jobs(spark)
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val job = jobs.createQueryJob(orders, Seq("o_orderkey"), tmp() + "/x")
    val terminal = jobs.awaitJob(job.id)
    // after JobComplete, abort is a no-op (client.rs:236-243 legality)
    val after = jobs.abortQueryJob(job.id).get
    assert(after.state == Bulk.JobComplete)
    assert(jobs.getQueryJobStatus(job.id).get.state == Bulk.JobComplete)
    assert(terminal.state == Bulk.JobComplete)
  }

  test("splitMultiPicklist: null-safe wire decode (main.rs:88)") {
    import spark.implicits._
    val df = Seq("a;b;c", "solo", "", null)
      .toDF("picks")
      .select(Load.splitMultiPicklist($"picks").as("arr"))
    val got = df.collect().map(r =>
      Option(r.getSeq[String](0)).map(_.toList).orNull)
    assert(got(0) == List("a", "b", "c"))
    assert(got(1) == List("solo"))
    assert(got(2) == Nil)
    assert(got(3) == null)
  }

  test("applyDefaults coalesces configured columns only") {
    import spark.implicits._
    val df = Seq((1, null: String, null: String), (2, "x", null: String))
      .toDF("id", "a", "b")
    val out = Load.applyDefaults(df, Map("a" -> "dflt")).orderBy("id")
      .collect()
    assert(out(0) == Row(1, "dflt", null))
    assert(out(1) == Row(2, "x", null))
  }

  test("applyTypedDefaults type-checks and never widens the schema") {
    import spark.implicits._
    import graft.schema.SqlDefault
    val df = Seq((1, null.asInstanceOf[java.lang.Integer], null: String),
      (2, Int.box(7), "x")).toDF("id", "n", "s")
    val out = Load.applyTypedDefaults(df,
      Map("n" -> SqlDefault.Num(0), "s" -> SqlDefault.Text("d")))
    // the int column stays int — the long literal is cast, not widened
    assert(out.schema("n").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val rows = out.orderBy("id").collect()
    assert(rows(0) == Row(1, 0, "d"))
    assert(rows(1) == Row(2, 7, "x"))
    // a text default on an int column is rejected before any plan runs
    assertThrows[IllegalArgumentException](
      Load.applyTypedDefaults(df, Map("n" -> SqlDefault.Text("zero"))))
    assertThrows[IllegalArgumentException](
      Load.applyTypedDefaults(df, Map("missing" -> SqlDefault.Num(1))))
  }

  test("latestByKey keeps exactly one newest row per key") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 00:00:00", "old"),
      (1L, "2024-01-02 00:00:00", "new"),
      (2L, "2024-01-01 00:00:00", "only"),
      (3L, "2024-01-01 00:00:00", "tie-a"),
      (3L, "2024-01-01 00:00:00", "tie-b"))
      .toDF("id", "ts_s", "v")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("ts_s")))
    val out = Load.latestByKey(df, "id", "ts").orderBy("id").collect()
    assert(out.length == 3)
    assert(out(0).getAs[String]("v") == "new")
    assert(out(1).getAs[String]("v") == "only")
  }

  test("readExtract is FAILFAST on corrupt rows") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "bad.csv"),
      "o_orderkey,o_custkey\n1,notanumber\n")
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType)))
    val ex = intercept[Exception] {
      Bulk.readExtract(spark, dir, schema).collect()
    }
    assert(ex.getMessage != null)
  }
}
