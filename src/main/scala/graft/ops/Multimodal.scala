package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (north-star): image/audio/video as opaque `binary`
  * columns + typed metadata, with decode / feature-extract / frame-sample
  * as per-partition batch transforms over a typed Dataset.
  *
  * The Spark-side plumbing is REAL — schema, partitioning, typed
  * mapPartitions with micro-batched iteration (the Scala analogue of
  * mapInPandas batch shape), explode-based frame sampling. The codec is a
  * clearly-marked STUB (this container has no image/audio libraries): it
  * derives "decoded" features from the md5 of the payload, which keeps the
  * whole path deterministic AND oracle-replicable in SQL — swap
  * `StubCodec` for a real JNI/FFmpeg-backed codec to productionize; every
  * other line stays.
  *
  * No media testdata exists, so media rows are synthesized 1:1 from
  * `documents` (payload = utf-8 text bytes, kind round-robins
  * image/audio/video, metadata derived from doc fields) — deterministic,
  * and the oracle synthesizes identically.
  */
object Multimodal {

  /** One media object: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      width: Int, height: Int, // image/video
      sample_rate: Int, // audio
      duration_ms: Long) // audio/video

  /** Decoded per-object features (what a real decode would summarize). */
  final case class MediaFeatures(
      media_id: Long, kind: String, luma: Long, n_pixels: Long)

  /** Decode interface. Production: JNI/FFmpeg/javax.imageio. */
  trait MediaCodec extends Serializable {
    def decode(m: MediaRow): MediaFeatures
  }

  /** ===== STUB ===== Deterministic fake decode: "luminance" is derived
    * from the md5 of the payload (same 60-bit portable-hash family as
    * Text.portableHash, computed JVM-side). NOT a real decoder — the
    * container ships no media libs; see class doc.
    */
  object StubCodec extends MediaCodec {
    def hash60(bytes: Array[Byte]): Long =
      graft.functions.Hashing.portableHash60(bytes)
    def decode(m: MediaRow): MediaFeatures =
      MediaFeatures(m.media_id, m.kind, hash60(m.content) % 1000L,
        m.width.toLong * m.height.toLong)
  }

  /** Synthesize the media table from documents (see class doc). */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col("doc_id") % 3).cast("int") + 1).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      lit(640).as("width"), lit(480).as("height"),
      lit(16000).as("sample_rate"),
      (lit(1000L) + (col("doc_id") % 60) * 250L).as("duration_ms"))

  /** Decode features over partition-local micro-batches of 64 (the batch
    * shape a columnar/Arrow codec wants); `repartition` first so decode CPU
    * spreads evenly regardless of upstream file layout.
    */
  def decodeFeatures(s: SparkSession, media: DataFrame,
      codec: MediaCodec, partitions: Int): DataFrame = {
    import s.implicits._
    media.as[MediaRow]
      .repartition(partitions, col("media_id"))
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch => batch.iterator.map(codec.decode) }
      }
      .toDF()
  }

  val queries: Map[String, Q] = Map(

    // Decode + per-kind feature aggregation through the typed
    // mapPartitions path (integer features → order-independent sums).
    "m_decode_features" -> ((s, d) => {
      decodeFeatures(s, mediaTable(s, d), StubCodec,
        s.sparkContext.defaultParallelism)
        .groupBy("kind")
        .agg(count("*").as("n"), sum("luma").as("sum_luma"),
          sum("n_pixels").as("sum_pixels"))
        .orderBy("kind")
    }),

    // Frame sampling: 4 evenly-spaced frames per video, each with a
    // deterministic per-frame feature (hash of payload ++ frame index) —
    // declarative explode, no UDF, so it scales as a plain generator.
    "m_frames" -> ((s, d) => {
      t(s, d, "documents").filter(col("doc_id") % 3 === 2)
        .select(col("doc_id").as("media_id"), col("text"),
          (lit(1000L) + (col("doc_id") % 60) * 250L).as("duration_ms"),
          explode(sequence(lit(0), lit(3))).as("frame_idx"))
        .select(col("media_id"), col("frame_idx"),
          expr("frame_idx * duration_ms DIV 4").as("frame_ts_ms"),
          (Text.portableHash(concat(col("text"), lit(":"),
            col("frame_idx").cast("string"))) % 1000L).as("frame_feature"))
        .orderBy("media_id", "frame_idx")
    }))

  val oracles: Map[String, String] = Map(
    "m_decode_features" ->
      """SELECT kind, COUNT(*) AS n,
           CAST(SUM(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000)
             AS BIGINT) AS sum_luma,
           CAST(SUM(640::BIGINT * 480::BIGINT) AS BIGINT) AS sum_pixels
         FROM (SELECT doc_id,
                 ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
                 text
               FROM documents)
         GROUP BY kind ORDER BY kind""",
    "m_frames" ->
      """SELECT doc_id AS media_id, f AS frame_idx,
           (f * (1000 + (doc_id % 60) * 250)) // 4 AS frame_ts_ms,
           ('0x' || substr(md5(text || ':' || f), 1, 15))::BIGINT % 1000
             AS frame_feature
         FROM documents, range(0, 4) t(f)
         WHERE doc_id % 3 = 2
         ORDER BY media_id, frame_idx""")
}
