package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared 2-batch file-replay rig for the maintained-table queries
  * (l_rollup_maintained, l_hh_maintained, l_cm_maintained,
  * d_index_maintained): the test-scale stand-in for a real stream is a
  * file source fed two single-file halves of a batch table, with
  * `maxFilesPerTrigger = 1` forcing one micro-batch per half so the
  * sink's cross-batch merge/append path is genuinely exercised.
  *
  * Factoring note: the `coalesce(1)` staging write below is a
  * TEST-SCALE convenience — each half must be exactly ONE file for the
  * one-file-per-trigger split to mean one micro-batch per half — and
  * lives here, behind the rig boundary, so no registered query body
  * carries a coalesce. At production scale the replay rig does not
  * exist at all: the stream is a real source (files as they land,
  * Kafka, CDC) and the sinks are exactly as registered.
  */
private[graft] object Replay {

  /** Scratch dir for `tag` scoped to the sf dir `d` — wiped first, so
    * re-runs cannot double-count stale parts into maintained state.
    */
  def scratchDir(tag: String, d: String): java.io.File = {
    val base = new java.io.File(
      s"/tmp/graft_$tag/x${d.replaceAll("[^0-9a-zA-Z.]", "_")}")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    rm(base)
    base.mkdirs()
    base
  }

  /** Write `df` as exactly one parquet file named `name` under `base`
    * (staged single-part write, then the part file is copied to the
    * target name so the glob filter can address it).
    */
  def writeOneFile(df: DataFrame, base: java.io.File,
      name: String): Unit = {
    val stage = new java.io.File(base, s"stage_$name")
    df.coalesce(1).write.parquet(stage.getPath)
    val part = stage.listFiles()
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no parquet part under $stage"))
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(base, name).toPath)
    ()
  }

  /** The full rig: wipe+create the scratch dir, land the two halves as
    * `a_<fileTag>.parquet` / `b_<fileTag>.parquet`, and return the dir
    * plus a file-source stream that replays them as two micro-batches.
    * `schema` must be the halves' schema (streaming sources need it
    * upfront); rows outside the glob (sink state written later under
    * the same dir) are invisible to the source.
    */
  def twoBatchStream(s: SparkSession, tag: String, d: String,
      schema: StructType, fileTag: String,
      a: DataFrame, b: DataFrame): (java.io.File, DataFrame) = {
    val base = scratchDir(tag, d)
    writeOneFile(a, base, s"a_$fileTag.parquet")
    writeOneFile(b, base, s"b_$fileTag.parquet")
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", s"*_$fileTag.parquet")
      .parquet(base.getPath)
    (base, stream)
  }
}
