package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery, Trigger}

/** Structured Streaming surface (SURVEY §2.9). The reference's only
  * incremental notion is the Bulk-job poll loop (client.rs:229-233); real
  * SF pipelines need continuous extract. Batch-equivalent formulations of
  * every aggregation here are oracle-checked in ops.Events — these are the
  * same expressions bound to `readStream`, plus the stateful operators
  * batch can't express (dropDuplicatesWithinWatermark,
  * flatMapGroupsWithState).
  *
  * Job lifecycle mapping (BulkState, response.rs:46-54):
  * InProgress = query.isActive; JobComplete = AvailableNow trigger drained;
  * Aborted = query.stop(); Failed = StreamingQueryException.
  */
object Streams {

  /** File-source stream over the events table of a testdata directory,
    * with the same raw-nanos handling as the batch reader (Tables.load).
    * The source path must be a DIRECTORY (file-stream listing); the glob
    * filter selects the table file. maxFilesPerTrigger bounds
    * per-micro-batch work; at scale this is the backpressure knob.
    */
  def eventsStream(spark: SparkSession, sfDir: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(graft.etl.Tables.eventsRaw)
      .option("pathGlobFilter", "events.parquet")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sfDir)
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  }

  /** Tumbling 1-hour windowed counts with a 10-minute watermark — the
    * streaming twin of ops.Events "e_tumble"; late rows beyond the
    * watermark are dropped.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count("*").as("n"), sum(col("value").cast("decimal(18,2)"))
        .cast("double").as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"),
        col("sum_value"))

  /** Session windows (30-minute gap) per user under watermark — twin of
    * "e_session".
    */
  def sessionized(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count("*").as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Stateful exactly-once-per-key dedup bounded by the watermark — the
    * streaming version of exact dedup (state is GC'd once event-time
    * passes the watermark, so state size is bounded at any scale).
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming near-duplicate suppression: keep the first document per
    * MinHash signature within the watermark, drop near-identical
    * re-arrivals (identical 12-component signature ⇔ Jaccard ≈ 1 — the
    * streaming twin of exact dedup, widened to near-identity). State is
    * one row per distinct signature and GC'd past the watermark, so it's
    * bounded at any scale. `tsCol` must be an event-time column.
    */
  def nearDupSuppress(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__mh_key",
        org.apache.spark.sql.graftshim.ShingleMinHashes
          .shingleMinhashes(split(col(textCol), " "), 5, 12)
          .cast("array<string>"))
      .withColumn("__mh_key", concat_ws(",", col("__mh_key")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__mh_key")
      .drop("__mh_key")

  /** Per-user running aggregate via flatMapGroupsWithState: emits one
    * update row per input event with the user's cumulative count/value —
    * the custom-state shape (KeyValueGroupedDataset) that windowed aggs
    * can't express. ProcessingTimeTimeout keeps idle-user state collectable.
    */
  final case class UserEvent(event_id: Long, user_id: Long, value: Double)
  final case class UserRunning(user_id: Long, n: Long, total: Double)

  def runningPerUser(spark: SparkSession, events: DataFrame)
      : Dataset[UserRunning] = {
    import spark.implicits._
    events.select(col("event_id"), col("user_id"), col("value"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, it: Iterator[UserEvent],
         state: GroupState[UserRunning]) =>
          var cur = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          val out = it.map { e =>
            cur = UserRunning(uid, cur.n + 1, cur.total + e.value)
            cur
          }.toList
          state.update(cur)
          out.iterator
      }
  }

  /** transformWithState variant of the per-user running aggregate —
    * Spark 4's successor to flatMapGroupsWithState: explicit named state
    * variables on a StatefulProcessorHandle, TTL support, and (unlike
    * FMGWS) no MemoryStream NPE. Same output contract as runningPerUser.
    * REQUIRES the RocksDB state store
    * (spark.sql.streaming.stateStore.providerClass=
    * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider)
    * — the default HDFS-backed store can't host its column families.
    */
  private class RunningProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, UserEvent, UserRunning] {
    @transient private var state:
        org.apache.spark.sql.streaming.ValueState[UserRunning] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      import org.apache.spark.sql.Encoders
      state = getHandle.getValueState[UserRunning]("running",
        Encoders.product[UserRunning],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserRunning] = {
      var cur = Option(state.get()).getOrElse(UserRunning(key, 0L, 0.0))
      val out = rows.map { e =>
        cur = UserRunning(key, cur.n + 1, cur.total + e.value)
        cur
      }.toList
      state.update(cur)
      out.iterator
    }
  }

  def runningPerUserTws(spark: SparkSession, events: DataFrame)
      : Dataset[UserRunning] = {
    import spark.implicits._
    events.select(col("event_id"), col("user_id"), col("value"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(new RunningProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append)
  }

  /** Run a streaming query to completion over the files currently present
    * (Trigger.AvailableNow — the batch-parity mode), writing to an
    * in-memory table. Returns the drained query. This is the "bulk job"
    * lifecycle: start → InProgress → JobComplete.
    */
  def runAvailableNow(df: DataFrame, name: String,
      outputMode: String = "append",
      timeoutMs: Long = 600000): StreamingQuery = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    // Bounded wait: stateful queries with processing-time timeouts may not
    // self-terminate under AvailableNow (observed on flatMapGroupsWithState)
    // — a hung unbounded await would wedge the caller.
    if (!q.awaitTermination(timeoutMs)) q.stop()
    q
  }
}
