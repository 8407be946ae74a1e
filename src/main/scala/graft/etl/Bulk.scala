package graft.etl

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import scala.concurrent.{ExecutionContext, Future}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Bulk CSV extract jobs: the reference's Bulk API 2.0 job lifecycle
  * (oxidized-force/src/client.rs:215-243; state machine response.rs:46-54)
  * with Spark as the execution engine. The "job" is an async Spark action
  * writing delimited CSV; status/abort map to Spark job groups
  * (`setJobGroup` / `cancelJobGroup`), the idiomatic async-cancellation
  * surface for a driver program.
  *
  * CSV physical format matches the job metadata the reference deserializes
  * (response.rs:40-43: contentType=CSV, columnDelimiter=COMMA,
  * lineEnding=LF — the mock at client.rs:477-481).
  */
object Bulk {

  /** Job states (response.rs:46-54). */
  sealed trait BulkState
  case object UploadComplete extends BulkState
  case object InProgress extends BulkState
  case object Aborted extends BulkState
  case object JobComplete extends BulkState
  case object Failed extends BulkState

  /** Job record (response.rs:30-44 envelope). */
  final case class QueryJob(
      id: String,
      query: String,
      state: BulkState,
      contentType: String = "CSV",
      columnDelimiter: String = "COMMA",
      lineEnding: String = "LF",
      outputPath: String = "",
      error: Option[String] = None)

  private val delimiters = Map(
    "COMMA" -> ",", "TAB" -> "\t", "PIPE" -> "|", "SEMICOLON" -> ";",
    "CARET" -> "^", "BACKQUOTE" -> "`")
  private val lineEndings = Map("LF" -> "\n", "CRLF" -> "\r\n")

  /** Async extract-job manager. One instance per session; thread-safe. */
  final class Jobs(spark: SparkSession)(implicit ec: ExecutionContext) {
    private val jobs = new ConcurrentHashMap[String, QueryJob]()

    /** `create_query_job(from, fields)` (client.rs:215-225): builds
      * `SELECT {fields} FROM {from}` (client.rs:217), launches the extract
      * asynchronously, returns the job record in `InProgress`.
      */
    def createQueryJob(
        from: DataFrame,
        fields: Seq[String],
        outputPath: String,
        columnDelimiter: String = "COMMA",
        lineEnding: String = "LF"): QueryJob = {
      val id = UUID.randomUUID().toString
      val soql = s"SELECT ${fields.mkString(",")} FROM <df>"
      val job = QueryJob(id, soql, InProgress,
        columnDelimiter = columnDelimiter, lineEnding = lineEnding,
        outputPath = outputPath)
      jobs.put(id, job)
      Future {
        spark.sparkContext.setJobGroup(id, s"bulk extract $id",
          interruptOnCancel = true)
        try {
          writeExtract(from.select(fields.map(from.col): _*), outputPath,
            columnDelimiter, lineEnding)
          jobs.computeIfPresent(id, (_, j) =>
            if (j.state == InProgress) j.copy(state = JobComplete) else j)
        } catch {
          case e: Throwable =>
            jobs.computeIfPresent(id, (_, j) =>
              if (j.state == Aborted) j
              else j.copy(state = Failed, error = Some(e.getMessage)))
        } finally spark.sparkContext.clearJobGroup()
      }
      job
    }

    /** `get_query_job_status` (client.rs:229-233). */
    def getQueryJobStatus(id: String): Option[QueryJob] = Option(jobs.get(id))

    /** `abort_query_job` (client.rs:236-243): legal only from
      * UploadComplete|InProgress, as in the reference. Cancels the Spark
      * job group so running tasks are interrupted.
      */
    def abortQueryJob(id: String): Option[QueryJob] =
      Option(jobs.computeIfPresent(id, (_, j) => j.state match {
        case UploadComplete | InProgress =>
          spark.sparkContext.cancelJobGroup(id)
          j.copy(state = Aborted)
        case _ => j
      }))

    /** Poll until terminal (the caller loop at client.rs:229-233). */
    def awaitJob(id: String, timeoutMs: Long = 600000): QueryJob = {
      val deadline = System.currentTimeMillis() + timeoutMs
      var j = jobs.get(id)
      while (j != null && (j.state == InProgress || j.state == UploadComplete)
          && System.currentTimeMillis() < deadline) {
        Thread.sleep(50)
        j = jobs.get(id)
      }
      if (j == null) throw new NoSuchElementException(s"no job $id") else j
    }
  }

  /** Write a CSV extract with the job's physical format. */
  def writeExtract(df: DataFrame, path: String,
      columnDelimiter: String = "COMMA", lineEnding: String = "LF"): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("delimiter", delimiters(columnDelimiter))
      .option("lineSep", lineEndings(lineEnding))
      // lossless micros — Spark's CSV default truncates to millis
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(path)

  /** Read a CSV extract back with a frozen schema — never inferSchema
    * (the reference introspects then freezes, SURVEY §1.3).
    */
  def readExtract(spark: SparkSession, path: String, schema: StructType,
      columnDelimiter: String = "COMMA", lineEnding: String = "LF"): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("delimiter", delimiters(columnDelimiter))
      .option("lineSep", lineEndings(lineEnding))
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .option("mode", "FAILFAST") // corrupt extract rows must fail loudly
      .csv(path)
}
