package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (north-star): image/audio/video as opaque `binary`
  * columns + typed metadata, with decode / feature-extract / frame-sample
  * as per-partition batch transforms over a typed Dataset.
  *
  * The Spark-side plumbing is REAL — schema, partitioning, typed
  * mapPartitions with micro-batched iteration (the Scala analogue of
  * mapInPandas batch shape), explode-based frame sampling. Codecs come in
  * two flavors:
  *  - REAL, JDK-only: `ImageIoCodec` (javax.imageio → actual pixels,
  *    m_decode_real / m_resize_real) and `JavaSoundCodec`
  *    (javax.sound.sampled → actual 16-bit PCM samples, m_audio_real) —
  *    both oracle-checked end-to-end against closed-form arithmetic.
  *  - STUB: `StubCodec` derives "decoded" features from the md5 of the
  *    payload, keeping the synthesized-from-text queries deterministic
  *    AND oracle-replicable in SQL.
  * VIDEO decode is stub-only BY DESIGN: the JDK ships no video decoder
  * and adding a native dependency (FFmpeg/JavaCV) is out of scope for
  * this container — m_frames exercises the real Spark-side shape
  * (explode-based frame enumeration, per-frame features) with the stub
  * feature function; swapping in a JNI-backed codec changes no plumbing.
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

  /** A resized visual object (aspect-preserving fit into a square). */
  final case class MediaResized(
      media_id: Long, kind: String, out_w: Int, out_h: Int, checksum: Long)

  /** Decoded per-clip audio features (what a real decode summarizes):
    * everything integer so sums are order-independent and the oracle is
    * closed-form. sample_rate comes from the DECODED stream format,
    * never the row's metadata.
    */
  final case class AudioFeatures(
      media_id: Long, sample_rate: Int, n_samples: Long,
      sum_amp: Long, peak: Long)

  /** A perceptual difference-hash of a decoded raster: 8 rows × 8
    * horizontal-gradient bits off a 9×8 nearest-neighbor luma grid,
    * emitted as a 64-char '0'/'1' string (a BIGINT would overflow the
    * sign bit in the SQL mirror; the string groups and compares
    * identically in both engines). */
  final case class MediaHash(media_id: Long, dhash: String)

  /** Decode interface. Production: JNI/FFmpeg/javax.imageio. */
  trait MediaCodec extends Serializable {
    def decode(m: MediaRow): MediaFeatures
    def resize(m: MediaRow, target: Int): MediaResized
    def decodeAudio(m: MediaRow): AudioFeatures
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
    // Aspect-preserving fit: INTEGER arithmetic only ((w·T) div max-side)
    // so every engine and re-run lands on identical output dims; the
    // checksum stands in for a resampled-pixels digest.
    def resize(m: MediaRow, target: Int): MediaResized = {
      val mx = math.max(m.width, m.height)
      val ow = m.width * target / mx
      val oh = m.height * target / mx
      MediaResized(m.media_id, m.kind, ow, oh,
        (hash60(m.content) + ow.toLong * 31L + oh.toLong) % 1000L)
    }
    // stub audio "decode": metadata-derived sample count, hash-derived
    // amplitude digest — same deterministic-fake contract as decode
    def decodeAudio(m: MediaRow): AudioFeatures = {
      val n = m.duration_ms * m.sample_rate / 1000L
      AudioFeatures(m.media_id, m.sample_rate, n,
        hash60(m.content) % 100000L, hash60(m.content) % 1000L)
    }
  }

  /** ===== REAL ===== JDK-only image codec: `content` is an ENCODED
    * image (PNG et al.), decoded to actual pixels via `javax.imageio`
    * (ships in every JDK — no new dependency). This is the honest decode
    * path the StubCodec stands in for on the synthesized-from-text oracle
    * queries (those payloads are utf-8 text, not images); MultimodalSpec
    * drives THIS codec through the same typed mapPartitions plumbing over
    * deterministically synthesized PNGs and asserts known pixel values.
    *
    * Determinism contract (it must hold on any JVM/executor):
    *  - luma is the integer Rec.601 mean: floor((299r+587g+114b)/1000)
    *    summed over pixels, then divided by pixel count — all integer ops;
    *  - resize is hand-rolled nearest-neighbor (source index =
    *    x·srcW div outW) rather than Java2D rendering, whose
    *    interpolation could vary across implementations;
    *  - n_pixels/dims come from the DECODED raster, never the row's
    *    metadata (a real pipeline treats metadata as advisory).
    */
  object ImageIoCodec extends MediaCodec {
    private def read(m: MediaRow): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(m.content))
      require(img != null,
        s"media_id=${m.media_id}: payload is not a decodable image")
      img
    }
    private def lumaOf(rgb: Int): Long = {
      val r = (rgb >> 16) & 0xff
      val g = (rgb >> 8) & 0xff
      val b = rgb & 0xff
      (299L * r + 587L * g + 114L * b) / 1000L
    }
    def decode(m: MediaRow): MediaFeatures = {
      val img = read(m)
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += lumaOf(img.getRGB(x, y)); x += 1 }
        y += 1
      }
      val n = w.toLong * h
      MediaFeatures(m.media_id, m.kind, sum / n, n)
    }
    def resize(m: MediaRow, target: Int): MediaResized = {
      val img = read(m)
      val (w, h) = (img.getWidth, img.getHeight)
      val mx = math.max(w, h)
      val ow = math.max(w * target / mx, 1)
      val oh = math.max(h * target / mx, 1)
      // checksum = Σ luma(resampled pixel) mod p — a digest of the ACTUAL
      // resampled raster, so a resampling change is visible in the value
      var sum = 0L
      var y = 0
      while (y < oh) {
        var x = 0
        while (x < ow) {
          sum = (sum + lumaOf(img.getRGB(x * w / ow, y * h / oh))) %
            1000000007L
          x += 1
        }
        y += 1
      }
      MediaResized(m.media_id, m.kind, ow, oh, sum)
    }
    def decodeAudio(m: MediaRow): AudioFeatures =
      throw new UnsupportedOperationException(
        s"media_id=${m.media_id}: ImageIoCodec decodes images, not audio")

    /** dHash over the DECODED raster: sample a 9×8 luma grid by
      * nearest neighbor (the resize discipline — integer index
      * arithmetic, never Java2D interpolation), then each of the 64
      * bits is the strict sign of one horizontal gradient. Uniform
      * brightness shifts cancel in the gradient comparison — the
      * invariance that makes dHash a NEAR-duplicate key where a byte
      * or luma-sum hash sees distinct files. */
    def dhashBits(m: MediaRow): MediaHash = {
      val img = read(m)
      val (w, h) = (img.getWidth, img.getHeight)
      val grid = Array.tabulate(8, 9) { (gy, gx) =>
        lumaOf(img.getRGB(gx * w / 9, gy * h / 8))
      }
      val sb = new java.lang.StringBuilder(64)
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          sb.append(if (grid(gy)(gx + 1) > grid(gy)(gx)) '1' else '0')
          gx += 1
        }
        gy += 1
      }
      MediaHash(m.media_id, sb.toString)
    }
  }

  /** ===== REAL ===== JDK-only audio codec: `content` is an ENCODED WAV
    * container, parsed by `javax.sound.sampled` (ships in every JDK —
    * no new dependency): AudioSystem reads the RIFF/fmt chunks, the
    * sample rate comes from the DECODED AudioFormat, and the PCM frames
    * stream through the AudioInputStream — the audio analogue of
    * ImageIoCodec's real pixel path.
    *
    * Determinism contract: features are integer folds of the decoded
    * 16-bit samples (sum, peak, count) — order-fixed within a clip,
    * independent of partitioning across clips.
    */
  object JavaSoundCodec extends MediaCodec {
    def decode(m: MediaRow): MediaFeatures =
      throw new UnsupportedOperationException(
        s"media_id=${m.media_id}: JavaSoundCodec decodes audio, not images")
    def resize(m: MediaRow, target: Int): MediaResized =
      throw new UnsupportedOperationException(
        s"media_id=${m.media_id}: audio has no raster to resize")
    def decodeAudio(m: MediaRow): AudioFeatures = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.content))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        !fmt.isBigEndian,
        s"media_id=${m.media_id}: expected 16-bit LE mono PCM, got $fmt")
      val bytes = ais.readAllBytes()
      var i = 0
      var n = 0L
      var sum = 0L
      var peak = 0L
      while (i + 1 < bytes.length) {
        val s = ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort.toLong
        sum += s
        if (math.abs(s) > peak) peak = math.abs(s)
        n += 1
        i += 2
      }
      AudioFeatures(m.media_id, fmt.getSampleRate.toInt, n, sum, peak)
    }

    /** Acoustic difference-fingerprint over the DECODED PCM — the
      * audio analogue of ImageIoCodec.dhashBits: 64 sign bits of
      * sample differences at a fixed hop. A uniform DC offset cancels
      * in every comparison (the brightness-invariance argument,
      * transposed), so re-encoded or level-shifted copies of a clip
      * share the fingerprint while a byte or amplitude-sum hash sees
      * distinct files. Requires n ≥ 64·hop + 1 decoded frames. */
    def audioFingerprint(m: MediaRow, hop: Int = 12): MediaHash = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.content))
      val bytes = ais.readAllBytes()
      def sAt(i: Int): Int =
        ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
      require(bytes.length >= 2 * (64 * hop + 1),
        s"media_id=${m.media_id}: clip too short for a 64-bit " +
          s"fingerprint at hop $hop")
      val sb = new java.lang.StringBuilder(64)
      var k = 0
      while (k < 64) {
        sb.append(if (sAt((k + 1) * hop) > sAt(k * hop)) '1' else '0')
        k += 1
      }
      MediaHash(m.media_id, sb.toString)
    }
  }

  /** Deterministic WAV synthesis for the real-codec oracle queries:
    * sample i of clip `id` is ((id·31 + i·17) mod 2001) − 1000 — pure
    * integer arithmetic, so the DuckDB oracle reproduces the decoded
    * fold analytically with a lateral range join. Encoding goes through
    * the JDK's own WAVE writer (AudioSystem.write), so the payload is a
    * genuine RIFF container, not a hand-rolled header the decoder might
    * be accidentally lenient about.
    */
  def synthWav(id: Long, n: Int, sampleRate: Int): Array[Byte] =
    synthWavOf(n, sampleRate,
      i => ((((id * 31 + i.toLong * 17) % 2001) - 1000)).toInt)

  /** [[synthWav]] generalized to an arbitrary sample function — the
    * audio analogue of [[synthGrayPng]], for fixtures whose decoded
    * PCM must be closed-form in SQL. */
  def synthWavOf(n: Int, sampleRate: Int,
      sample: Int => Int): Array[Byte] = {
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = sample(i).toShort
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic PNG synthesis for specs/demos: pixel (x, y) takes
    * `colors(((x*7 + y*13 + seed) mod colors.length))` — pure integer
    * indexing, byte-identical PNG output for a given (seed, w, h, colors).
    */
  def synthPng(seed: Int, w: Int, h: Int, colors: Seq[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, colors(((x * 7 + y * 13 + seed) % colors.length +
          colors.length) % colors.length))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic grayscale PNG for the dHash oracle: pixel (x, y) is
    * the uniform gray v(x, y) (0..255), so the Rec.601 luma of a gray
    * pixel is exactly v — floor((299+587+114)·v/1000) = v — and the
    * sampled 9×8 grid is closed-form integer arithmetic in SQL.
    */
  def synthGrayPng(w: Int, h: Int, lum: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = lum(x, y)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** One video frame as an opaque image payload. */
  final case class FrameRow(
      media_id: Long, frame_idx: Int, content: Array[Byte])

  /** Integer mean luma of one decoded frame. */
  final case class FrameLuma(media_id: Long, frame_idx: Int, luma: Long)

  /** Per-frame mean luma of REAL decoded rasters through the typed
    * mapPartitions path — the per-frame feature every visual
    * segmentation (scene cut, shot boundary, black-frame trim) runs
    * on. Integer mean (sum DIV pixels) so the fold is exact and the
    * synthesized-fixture oracle is closed-form. */
  def frameMeanLumas(s: SparkSession, frames: DataFrame,
      partitions: Int): DataFrame = {
    import s.implicits._
    frames.as[FrameRow]
      .repartition(partitions, col("media_id"))
      .mapPartitions { it =>
        it.grouped(64).flatMap(_.iterator.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.content))
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              sum += (img.getRGB(x, y) & 0xff)
              x += 1
            }
            y += 1
          }
          FrameLuma(r.media_id, r.frame_idx,
            sum / (img.getWidth.toLong * img.getHeight.toLong))
        })
      }
      .toDF()
  }

  /** dHash through the same typed mapPartitions micro-batch path. */
  def dhashAll(s: SparkSession, media: DataFrame,
      partitions: Int): DataFrame = {
    import s.implicits._
    media.as[MediaRow]
      .repartition(partitions, col("media_id"))
      .mapPartitions { it =>
        it.grouped(64).flatMap(_.iterator.map(ImageIoCodec.dhashBits))
      }
      .toDF()
  }

  /** Audio fingerprints through the same typed mapPartitions path. */
  def afpAll(s: SparkSession, media: DataFrame,
      partitions: Int): DataFrame = {
    import s.implicits._
    media.as[MediaRow]
      .repartition(partitions, col("media_id"))
      .mapPartitions { it =>
        it.grouped(64).flatMap(
          _.iterator.map(JavaSoundCodec.audioFingerprint(_)))
      }
      .toDF()
  }

  /** Synthesize the media table from documents (see class doc). */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col("doc_id") % 3).cast("int") + 1).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      // per-row dims (not a constant): resize/decode outputs must vary
      (lit(320) + (col("doc_id") % 5).cast("int") * 160).as("width"),
      (lit(240) + (col("doc_id") % 7).cast("int") * 120).as("height"),
      lit(16000).as("sample_rate"),
      (lit(1000L) + (col("doc_id") % 60) * 250L).as("duration_ms"))

  /** Resize through the same typed mapPartitions micro-batch path as
    * decodeFeatures — the per-partition batch shape a real resampler
    * (libvips/ffmpeg) wants.
    */
  def resizeAll(s: SparkSession, media: DataFrame, codec: MediaCodec,
      target: Int, partitions: Int): DataFrame = {
    import s.implicits._
    media.as[MediaRow]
      .repartition(partitions, col("media_id"))
      .mapPartitions { it =>
        it.grouped(64).flatMap(_.iterator.map(codec.resize(_, target)))
      }
      .toDF()
  }

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

  /** Audio analogue of decodeFeatures: same typed mapPartitions
    * micro-batch path, emitting per-clip integer folds of the DECODED
    * PCM stream.
    */
  def decodeAudioAll(s: SparkSession, media: DataFrame,
      codec: MediaCodec, partitions: Int): DataFrame = {
    import s.implicits._
    media.as[MediaRow]
      .repartition(partitions, col("media_id"))
      .mapPartitions { it =>
        it.grouped(64).flatMap(_.iterator.map(codec.decodeAudio))
      }
      .toDF()
  }

  /** One fixed-length analysis frame of a decoded clip: `energy` is
    * Σ|sample| over the frame — an integer fold, so it is exact,
    * order-independent, and closed-form for a synthesized fixture. */
  final case class AudioFrame(
      media_id: Long, frame_idx: Int, energy: Long)

  /** Per-frame energies of the DECODED PCM through the same typed
    * mapPartitions path: decode once per clip, emit n DIV frameLen
    * full frames (a trailing partial frame is dropped — at a real
    * frame hop the tail is sub-perceptual, and the oracle mirrors the
    * same DIV). The frame stream is the input every acoustic
    * segmentation (VAD, silence trim, scene split) runs on; only the
    * decode lives here — thresholding and segment assembly stay
    * declarative on the DataFrame so Catalyst owns them. */
  def audioFrameEnergies(s: SparkSession, media: DataFrame,
      frameLen: Int, partitions: Int): DataFrame = {
    import s.implicits._
    media.as[MediaRow]
      .repartition(partitions, col("media_id"))
      .mapPartitions { it =>
        it.grouped(64).flatMap(_.iterator.flatMap { m =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(m.content))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            !fmt.isBigEndian,
            s"media_id=${m.media_id}: expected 16-bit LE mono PCM, got " +
              fmt)
          val bytes = ais.readAllBytes()
          val nFrames = (bytes.length / 2) / frameLen
          (0 until nFrames).iterator.map { f =>
            var j = f * frameLen
            var acc = 0L
            while (j < (f + 1) * frameLen) {
              val v = ((bytes(2 * j + 1) << 8) |
                (bytes(2 * j) & 0xff)).toShort.toLong
              acc += math.abs(v)
              j += 1
            }
            AudioFrame(m.media_id, f, acc)
          }
        })
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

    // Resize (visual kinds only) into a 224-box through the typed codec
    // path: the standard vision-model preprocessing stage; audio rows are
    // filtered before the shuffle, not after the decode.
    "m_resize" -> ((s, d) => {
      resizeAll(s, mediaTable(s, d).filter(col("kind") =!= "audio"),
        StubCodec, target = 224,
        s.sparkContext.defaultParallelism)
        .orderBy("media_id")
    }),

    // REAL decode, oracle-checked: payloads are deterministic
    // solid-color PNGs (color/dims pure integer functions of doc_id),
    // synthesized ON THE EXECUTORS and decoded back to actual pixels by
    // ImageIoCodec through the same typed mapPartitions path. The oracle
    // needs no image library: a solid color's mean Rec.601 luma is
    // closed-form integer arithmetic — floor((299r+587g+114b)/1000) —
    // so the DuckDB side computes what the decoded raster MUST yield,
    // and any pixel-path bug (codec, color channels, raster dims) goes
    // hash-red. This is the end-to-end proof the stub queries can't give.
    "m_decode_real" -> ((s, d) => {
      import s.implicits._
      val rows = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val r = ((id * 37) % 256).toInt
          val g = ((id * 59) % 256).toInt
          val b = ((id * 83) % 256).toInt
          val w = (32 + (id % 4) * 16).toInt
          val h = (24 + (id % 3) * 12).toInt
          MediaRow(id, "image",
            synthPng(0, w, h, Seq((r << 16) | (g << 8) | b)), w, h, 0, 0L)
        }
      decodeFeatures(s, rows.toDF(), ImageIoCodec,
        s.sparkContext.defaultParallelism)
        .select(col("media_id"), col("luma"), col("n_pixels"))
        .orderBy("media_id")
    }),

    // REAL resize, oracle-checked the same way: nearest-neighbor
    // resampling of a solid color is still that color, so the raster
    // digest is exactly out_w·out_h·luma_px mod p — analytic in DuckDB.
    "m_resize_real" -> ((s, d) => {
      import s.implicits._
      val rows = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val r = ((id * 37) % 256).toInt
          val g = ((id * 59) % 256).toInt
          val b = ((id * 83) % 256).toInt
          val w = (32 + (id % 4) * 16).toInt
          val h = (24 + (id % 3) * 12).toInt
          MediaRow(id, "image",
            synthPng(0, w, h, Seq((r << 16) | (g << 8) | b)), w, h, 0, 0L)
        }
      resizeAll(s, rows.toDF(), ImageIoCodec, target = 16,
        s.sparkContext.defaultParallelism)
        .select(col("media_id"), col("out_w"), col("out_h"),
          col("checksum"))
        .orderBy("media_id")
    }),

    // IMAGE NEAR-DUP DETECTION over real decoded pixels — the
    // multimodal member of the dedup family: perceptual dHash (9×8
    // nearest-neighbor luma grid → 64 horizontal-gradient sign bits)
    // groups images that a byte hash or luma sum sees as distinct.
    // The fixture makes the invariance REAL: each of 25 gradient
    // patterns (a quadratic-residue texture — a LINEAR gradient's
    // sign bits quasi-repeat and collapsed 25 classes to 8 hashes in
    // the first cut; (a²) mod 199 textures give 25 distinct 64-bit
    // hashes) appears under 20 doc_ids whose rasters differ by a
    // uniform brightness shift (offset = id·13 mod 3, varying within
    // every class) — different PNG bytes, different luma sums,
    // identical gradient signs — so the duplicate census is exactly
    // the 25 pattern classes. Decode runs through ImageIO on the
    // executors (the real-pixel path); the oracle computes the grid
    // closed-form (a gray pixel's luma IS its gray level) and replays
    // the bit extraction analytically, so a decode, sampling, or
    // gradient bug goes hash-red. At 100 TB this is hash-groupBy
    // dedup: one decode pass, |corpus| hash rows, exact-key shuffle —
    // the d_exact cost shape with a perceptual key.
    "m_dhash_dups" -> ((s, d) => {
      import s.implicits._
      val rows = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val p = (id % 25).toInt
          val off = (id * 13 % 3).toInt
          MediaRow(id, "image",
            synthGrayPng(36, 16, (x, y) => {
              val a = p * 53 + x * 17 + y * 29 + 7
              (a * a) % 199 + off
            }),
            36, 16, 0, 0L)
        }
      dhashAll(s, rows.toDF(), s.sparkContext.defaultParallelism)
        .groupBy("dhash")
        .agg(count(lit(1)).as("n_members"),
          min("media_id").as("first_id"),
          max("media_id").as("last_id"))
        .filter(col("n_members") >= 2)
        .orderBy("dhash")
    }),

    // HAMMING-TOLERANT image near-dup — the composition of m_dhash_dups
    // (perceptual hash over real pixels) and d_simhash_hamming's
    // pigeonhole discipline: images that differ by a small LOCAL edit
    // flip a few dHash bits, so exact-hash grouping misses them and
    // candidates must come from a 4×16-bit block equi-join (any pair
    // within Hamming ≤ 3 shares a block — the Manku pigeonhole), then
    // verify exact Hamming ≤ 1. The fixture plants the edit ON the
    // sampled raster point (x=0, y=2): members of a texture class
    // carry per-member deltas {0,3,6} there, so within-class hashes
    // sit at Hamming ∈ {0,1} while cross-class textures are far —
    // different bytes, near-identical perception, found ONLY by the
    // tolerant join. Decode runs through ImageIO on the executors;
    // the oracle replays grid, bits, blocks, and the Hamming verify
    // analytically. Never all-pairs — the candidate join is
    // block-keyed (PlanAuditSpec discipline).
    "m_dhash_near" -> ((s, d) => {
      import s.implicits._
      val rows = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val p = (id % 25).toInt
          // odd generations of a class carry the EDIT: the sampled
          // point (0,2) moves to the far side of its right neighbour
          // g4, so bit (gy=1, gx=0) provably flips — one real dHash
          // bit of distance between the two halves of every class.
          // (A class whose g4 is 0 and bit already 0 has no valid
          // below-zero luma — it stays unperturbed, honestly: its
          // pairs sit at Hamming 0 like m_dhash_dups'.)
          val flagged = (id / 25) % 2 == 1
          val g0 = { val a = p * 53 + 2 * 29 + 7; (a * a) % 199 }
          val g4 = { val a = p * 53 + 4 * 17 + 2 * 29 + 7; (a * a) % 199 }
          val edited =
            if (!flagged) g0
            else if (g4 > g0) g4 + 1
            else if (g4 >= 1) g4 - 1
            else g0
          MediaRow(id, "image",
            synthGrayPng(36, 16, (x, y) => {
              if (x == 0 && y == 2) edited
              else { val a = p * 53 + x * 17 + y * 29 + 7; (a * a) % 199 }
            }),
            36, 16, 0, 0L)
        }
      val hashes = dhashAll(s, rows.toDF(),
        s.sparkContext.defaultParallelism).localCheckpoint()
      val blocks = hashes.select(col("media_id"), col("dhash"),
          explode(expr("transform(sequence(0, 3), " +
            "b -> struct(b as b, substring(dhash, b * 16 + 1, 16) " +
            "as blk))")).as("s"))
        .select(col("media_id"), col("dhash"),
          col("s.b").as("b"), col("s.blk").as("blk"))
      val ham = expr("aggregate(zip_with(split(x.dhash, ''), " +
        "split(y.dhash, ''), (a, b) -> CASE WHEN a <> b THEN 1 " +
        "ELSE 0 END), 0, (acc, v) -> acc + v)")
      val res = blocks.as("x").join(blocks.as("y"),
          col("x.b") === col("y.b") && col("x.blk") === col("y.blk") &&
          col("x.media_id") < col("y.media_id"))
        .select(col("x.media_id").as("a"), col("y.media_id").as("bid"),
          ham.as("hamming"))
        .dropDuplicates("a", "bid")
        .filter(col("hamming") <= 1)
        .select(col("a"), col("bid").as("b"),
          col("hamming").cast("long").as("hamming"))
        .localCheckpoint()
      // fixture-shape guard: the planted edits must actually produce
      // nonzero-Hamming pairs, or this row silently degenerates to
      // exact-hash grouping (the first cut of the fixture did exactly
      // that — all deltas fell short of their gradient thresholds)
      require(res.filter(col("hamming") >= 1).count() > 0,
        "no Hamming≥1 pairs — the tolerant join is vacuous")
      res.orderBy("a", "b")
    }),

    // AUDIO NEAR-DUP DETECTION over real decoded PCM — completing the
    // dedup triad across modalities (text: minhash; image: dHash;
    // audio: this). The fingerprint is 64 sign bits of sample
    // differences at hop 12, so a uniform DC/level shift cancels in
    // every comparison: the fixture's 25 quadratic-residue waveforms
    // (the m_dhash_dups collapse lesson — linear ramps quasi-repeat)
    // each recur under 20 doc_ids whose clips carry per-member DC
    // offsets {0,7,14} — different RIFF bytes, different amplitude
    // sums, identical fingerprints — and the census recovers exactly
    // the 25 classes. Clips are genuine WAVE containers decoded by
    // javax.sound on the executors; the oracle replays the sample
    // formula and bit extraction analytically. Same hash-groupBy
    // dedup cost shape as its image twin.
    "m_afp_dups" -> ((s, d) => {
      import s.implicits._
      val rows = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val p = (id % 25).toInt
          val dc = ((id / 25) % 3).toInt * 7
          MediaRow(id, "audio",
            synthWavOf(800, 16000, { i =>
              val a = p * 53 + i * 17 + 7
              (a.toLong * a % 1999).toInt - 999 + dc
            }),
            0, 0, 16000, 50L)
        }
      afpAll(s, rows.toDF(), s.sparkContext.defaultParallelism)
        .groupBy("dhash")
        .agg(count(lit(1)).as("n_members"),
          min("media_id").as("first_id"),
          max("media_id").as("last_id"))
        .filter(col("n_members") >= 2)
        .select(col("dhash").as("afp"), col("n_members"),
          col("first_id"), col("last_id"))
        .orderBy("afp")
    }),

    // HAMMING-TOLERANT audio matching — m_dhash_near transposed to the
    // acoustic fingerprint: clips that differ by a small LOCAL edit
    // (one corrupted sample — a dropout, a click) flip one difference
    // bit, so exact-fingerprint grouping misses them; candidates come
    // from the same 4×16-bit pigeonhole block equi-join, verified at
    // exact Hamming ≤ 1. The planted edit applies the
    // threshold-crossing lesson directly: fingerprint sample k=0
    // (frame 0) moves to the far side of frame 12's value for odd
    // generations of each class, so one bit provably flips (the one
    // class whose comparison cannot flip within int16 range stays
    // unperturbed, honestly). Never all-pairs; analytic PCM oracle.
    "m_afp_near" -> ((s, d) => {
      import s.implicits._
      val rows = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val p = (id % 25).toInt
          val flagged = (id / 25) % 2 == 1
          def base(i: Int): Int = {
            val a = p * 53 + i * 17 + 7
            (a.toLong * a % 1999).toInt - 999
          }
          val g0 = base(0)
          val g12 = base(12)
          val edited =
            if (!flagged) g0
            else if (g12 > g0) g12 + 1
            else if (g12 >= -998) g12 - 1
            else g0
          MediaRow(id, "audio",
            synthWavOf(800, 16000,
              i => if (i == 0) edited else base(i)),
            0, 0, 16000, 50L)
        }
      val fps = afpAll(s, rows.toDF(),
        s.sparkContext.defaultParallelism).localCheckpoint()
      val blocks = fps.select(col("media_id"), col("dhash"),
          explode(expr("transform(sequence(0, 3), " +
            "b -> struct(b as b, substring(dhash, b * 16 + 1, 16) " +
            "as blk))")).as("s"))
        .select(col("media_id"), col("dhash"),
          col("s.b").as("b"), col("s.blk").as("blk"))
      val ham = expr("aggregate(zip_with(split(x.dhash, ''), " +
        "split(y.dhash, ''), (a, b) -> CASE WHEN a <> b THEN 1 " +
        "ELSE 0 END), 0, (acc, v) -> acc + v)")
      val res = blocks.as("x").join(blocks.as("y"),
          col("x.b") === col("y.b") && col("x.blk") === col("y.blk") &&
          col("x.media_id") < col("y.media_id"))
        .select(col("x.media_id").as("a"), col("y.media_id").as("bid"),
          ham.as("hamming"))
        .dropDuplicates("a", "bid")
        .filter(col("hamming") <= 1)
        .select(col("a"), col("bid").as("b"),
          col("hamming").cast("long").as("hamming"))
        .localCheckpoint()
      require(res.filter(col("hamming") >= 1).count() > 0,
        "no Hamming≥1 pairs — the tolerant join is vacuous")
      res.orderBy("a", "b")
    }),

    // REAL audio decode, oracle-checked: payloads are genuine RIFF/WAVE
    // containers (synthWav encodes through the JDK's own AudioSystem
    // writer), synthesized ON THE EXECUTORS and decoded back to actual
    // 16-bit PCM samples by JavaSoundCodec through the same typed
    // mapPartitions path as the image queries. Sample i of clip `id` is
    // ((id·31 + i·17) mod 2001) − 1000 — pure integer arithmetic — so
    // the DuckDB oracle reproduces the decoded fold analytically with a
    // correlated range join; any decode bug (header parse, LE sample
    // reassembly, frame count, stream sample rate) goes hash-red. This
    // is the audio analogue of m_decode_real's end-to-end pixel proof.
    "m_audio_real" -> ((s, d) => {
      import s.implicits._
      val rows = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val n = (800 + (id % 5) * 400).toInt
          val rate = (8000 + (id % 3) * 4000).toInt
          MediaRow(id, "audio", synthWav(id, n, rate), 0, 0, rate, 0L)
        }
      decodeAudioAll(s, rows.toDF(), JavaSoundCodec,
        s.sparkContext.defaultParallelism)
        .select(col("media_id"), col("sample_rate"), col("n_samples"),
          col("sum_amp"), col("peak"))
        .orderBy("media_id")
    }),

    // Scene-cut segmentation over REAL decoded frames — m_vad's
    // pattern on the video modality, completing the curation triad
    // (image near-dup, audio VAD, video scene split). Fixtures: each
    // "video" is 12 genuine 16×12 PNGs with a PLANTED scene structure
    // (scene = frame DIV 3; per-scene base luma b jumps scene to
    // scene; within a scene only a fixed texture varies per pixel, so
    // the decoded mean luma is constant) — the detector must
    // rediscover the planted cuts, except where two adjacent scenes'
    // bases land within the threshold, which the oracle reproduces
    // identically (both sides run the same rule on the same closed
    // form). Codec side = frameMeanLumas (integer mean of actual
    // decoded pixels); cut detection (|Δ luma| ≥ 8 rising edge),
    // scene ids and per-scene bounds are declarative windows sharing
    // ONE (media_id) partitioning. At scale: |frames| rows in, one
    // shuffle, |scenes| rows out.
    "m_scenecut" -> ((s, d) => {
      import s.implicits._
      val frames = t(s, d, "documents").filter(col("doc_id") % 3 === 2)
        .select(col("doc_id")).as[Long]
        .flatMap { id =>
          (0 until 12).map { f =>
            // scene index s advances every 3 frames, but the BASE only
            // moves on s − s/3 — so scenes 2 and 3 of every video share
            // a base and must come out MERGED: the detector segments by
            // decoded content, not by the frame arithmetic
            val sIdx = f / 3
            val b = (((id * 20 + (sIdx - sIdx / 3)) * 37) % 200).toInt
            FrameRow(id, f, synthGrayPng(16, 12,
              (x, y) => b + (x * 3 + y * 5) % 17))
          }
        }
      val lum = frameMeanLumas(s, frames.toDF(),
        s.sparkContext.defaultParallelism)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("media_id").orderBy("frame_idx")
      val cum = w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      lum.withColumn("prev", lag("luma", 1).over(w))
        .withColumn("newscene",
          when(col("prev").isNull ||
            abs(col("luma") - col("prev")) >= 8, 1L).otherwise(0L))
        .withColumn("scene_id", sum("newscene").over(cum))
        .groupBy("media_id", "scene_id")
        .agg(min("frame_idx").as("start_frame"),
          max("frame_idx").as("end_frame"),
          count(lit(1)).as("n_frames"),
          min("luma").as("luma_lo"), max("luma").as("luma_hi"))
        .orderBy("media_id", "scene_id")
    }),

    // Energy VAD over REAL decoded PCM — the speech-curation pass every
    // audio training pipeline runs before transcription (silence/noise
    // trim). Fixtures are WAVs with a PLANTED voiced/silence region
    // structure ((id + region) mod 3, regions = analysis frames of 200
    // samples): loud regions draw ±1000, quiet ±20, so the detector
    // must rediscover exactly the planted segmentation or go hash-red.
    // Split of labor: the codec emits per-frame Σ|amp| integer
    // energies (audioFrameEnergies — the only non-Catalyst step, like
    // every codec); thresholding, run detection (voiced rising edge
    // via lag), segment ids (running sum) and per-segment bounds are
    // all declarative window/agg work Spark owns. Scale shape: frames
    // partition by clip, both windows share the ONE (media_id) hash
    // partitioning, and the output is |voiced segments| rows. Oracle
    // replays the synthesized samples closed-form (the synthGrayPng
    // discipline, transposed to PCM) and mirrors the rising-edge
    // recurrence with the same window functions.
    "m_vad" -> ((s, d) => {
      import s.implicits._
      val rows = t(s, d, "documents").filter(col("doc_id") % 3 === 1)
        .select(col("doc_id")).as[Long]
        .map { id =>
          val n = (800 + (id % 5) * 400).toInt
          val rate = (8000 + (id % 3) * 4000).toInt
          MediaRow(id, "audio", synthWavOf(n, rate, { i =>
            val r = i / 200
            if ((id + r) % 3 != 0)
              (((id * 31 + i.toLong * 17) % 2001) - 1000).toInt
            else (((id * 31 + i.toLong * 17) % 41) - 20).toInt
          }), 0, 0, rate, 0L)
        }
      val fr = audioFrameEnergies(s, rows.toDF(), 200,
        s.sparkContext.defaultParallelism)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("media_id").orderBy("frame_idx")
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      fr.withColumn("voiced", (col("energy") >= 20000L).cast("int"))
        .withColumn("newseg",
          when(col("voiced") === 1 &&
            coalesce(lag("voiced", 1).over(w), lit(0)) === 0, 1L)
            .otherwise(0L))
        .withColumn("seg_id", sum("newseg").over(cum))
        .filter(col("voiced") === 1)
        .groupBy("media_id", "seg_id")
        .agg(min("frame_idx").as("start_frame"),
          max("frame_idx").as("end_frame"),
          count(lit(1)).as("n_frames"),
          sum("energy").as("sum_energy"))
        .orderBy("media_id", "seg_id")
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
           CAST(SUM((320 + (doc_id % 5) * 160)::BIGINT
             * (240 + (doc_id % 7) * 120)::BIGINT) AS BIGINT) AS sum_pixels
         FROM (SELECT doc_id,
                 ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
                 text
               FROM documents)
         GROUP BY kind ORDER BY kind""",
    "m_resize" ->
      """WITH m AS (
           SELECT doc_id AS media_id,
             ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
             text,
             320 + (doc_id % 5) * 160 AS w,
             240 + (doc_id % 7) * 120 AS h
           FROM documents),
         r AS (
           SELECT media_id, kind, text, w, h, greatest(w, h) AS mx
           FROM m WHERE kind <> 'audio')
         SELECT media_id, kind,
           CAST((w * 224) // mx AS INT) AS out_w,
           CAST((h * 224) // mx AS INT) AS out_h,
           (('0x' || substr(md5(text), 1, 15))::BIGINT
             + ((w * 224) // mx) * 31 + ((h * 224) // mx)) % 1000
             AS checksum
         FROM r ORDER BY media_id""",
    // analytic mirror of the REAL pixel path: solid-color mean luma is
    // floor((299r+587g+114b)/1000), n_pixels is the synthesized raster
    "m_decode_real" ->
      """SELECT doc_id AS media_id,
           CAST((299 * ((doc_id * 37) % 256)
               + 587 * ((doc_id * 59) % 256)
               + 114 * ((doc_id * 83) % 256)) // 1000 AS BIGINT) AS luma,
           CAST((32 + (doc_id % 4) * 16) * (24 + (doc_id % 3) * 12)
             AS BIGINT) AS n_pixels
         FROM documents ORDER BY media_id""",
    "m_resize_real" ->
      """WITH m AS (
           SELECT doc_id AS media_id,
             (299 * ((doc_id * 37) % 256) + 587 * ((doc_id * 59) % 256)
               + 114 * ((doc_id * 83) % 256)) // 1000 AS luma_px,
             32 + (doc_id % 4) * 16 AS w,
             24 + (doc_id % 3) * 12 AS h
           FROM documents),
         r AS (
           SELECT media_id, luma_px, w, h,
             (w * 16) // greatest(w, h) AS out_w,
             (h * 16) // greatest(w, h) AS out_h
           FROM m)
         SELECT media_id, CAST(out_w AS INT) AS out_w,
           CAST(out_h AS INT) AS out_h,
           CAST((out_w * out_h * luma_px) % 1000000007 AS BIGINT)
             AS checksum
         FROM r ORDER BY media_id""",
    // analytic mirror of the REAL PCM path: the decoded fold over sample
    // i = ((id·31 + i·17) mod 2001) − 1000. DuckDB's range() takes no
    // lateral column args, so the per-clip length is an uncorrelated
    // range(0, max) + filter; n_samples comes out as the group count, so
    // a frame-count bug on either side is a row/hash mismatch, not a
    // silent agreement
    "m_audio_real" ->
      """SELECT doc_id AS media_id,
           CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(((doc_id * 31 + i * 17) % 2001) - 1000) AS BIGINT)
             AS sum_amp,
           CAST(MAX(ABS(((doc_id * 31 + i * 17) % 2001) - 1000)) AS BIGINT)
             AS peak
         FROM documents, range(0, 2400) t(i)
         WHERE i < 800 + (doc_id % 5) * 400
         GROUP BY doc_id ORDER BY media_id""",
    // closed-form raster replay: gray-pixel luma IS the gray level, so
    // the decoded mean luma is floor((192·b + Σ texture)/192) with the
    // texture sum a constant of the 16×12 grid; same rising-edge/
    // running-sum segmenter as m_vad's oracle
    "m_scenecut" ->
      """WITH tex AS (
           SELECT CAST(SUM((x * 3 + y * 5) % 17) AS BIGINT) AS tsum
           FROM range(0, 16) tx(x), range(0, 12) ty(y)),
         fr AS (
           SELECT doc_id AS media_id, f AS frame_idx,
             (192 * (((doc_id * 20 + (f // 3 - (f // 3) // 3)) * 37)
               % 200) + tex.tsum) // 192 AS luma
           FROM documents, range(0, 12) t(f), tex
           WHERE doc_id % 3 = 2),
         lg AS (
           SELECT *, LAG(luma) OVER (PARTITION BY media_id
             ORDER BY frame_idx) AS prev
           FROM fr),
         ns AS (
           SELECT *, CASE WHEN prev IS NULL OR abs(luma - prev) >= 8
             THEN 1 ELSE 0 END AS newscene
           FROM lg),
         sg AS (
           SELECT *, CAST(SUM(newscene) OVER (PARTITION BY media_id
             ORDER BY frame_idx ROWS BETWEEN UNBOUNDED PRECEDING AND
             CURRENT ROW) AS BIGINT) AS scene_id
           FROM ns)
         SELECT media_id, scene_id,
           CAST(MIN(frame_idx) AS INT) AS start_frame,
           CAST(MAX(frame_idx) AS INT) AS end_frame,
           COUNT(*) AS n_frames,
           MIN(luma) AS luma_lo, MAX(luma) AS luma_hi
         FROM sg GROUP BY 1, 2 ORDER BY 1, 2""",
    // closed-form PCM replay: same planted region rule, same Σ|amp|
    // per 200-sample frame, same rising-edge/running-sum segmenter
    "m_vad" ->
      """WITH a AS (
           SELECT doc_id AS media_id,
             CAST(800 + (doc_id % 5) * 400 AS BIGINT) AS n
           FROM documents WHERE doc_id % 3 = 1),
         sm AS (
           SELECT media_id, i // 200 AS frame_idx,
             CASE WHEN (media_id + (i // 200)) % 3 <> 0
               THEN abs((media_id * 31 + i * 17) % 2001 - 1000)
               ELSE abs((media_id * 31 + i * 17) % 41 - 20) END AS amp
           FROM a, LATERAL (SELECT unnest(range(0, n)) AS i) r),
         fr AS (
           SELECT media_id, frame_idx, CAST(SUM(amp) AS BIGINT) AS energy
           FROM sm GROUP BY 1, 2),
         fl AS (
           SELECT *, CASE WHEN energy >= 20000 THEN 1 ELSE 0 END AS voiced
           FROM fr),
         ns AS (
           SELECT *,
             CASE WHEN voiced = 1 AND COALESCE(LAG(voiced) OVER (
                 PARTITION BY media_id ORDER BY frame_idx), 0) = 0
               THEN 1 ELSE 0 END AS newseg
           FROM fl),
         sg AS (
           SELECT *, CAST(SUM(newseg) OVER (PARTITION BY media_id
             ORDER BY frame_idx ROWS BETWEEN UNBOUNDED PRECEDING AND
             CURRENT ROW) AS BIGINT) AS seg_id
           FROM ns)
         SELECT media_id, seg_id,
           CAST(MIN(frame_idx) AS INT) AS start_frame,
           CAST(MAX(frame_idx) AS INT) AS end_frame,
           COUNT(*) AS n_frames,
           CAST(SUM(energy) AS BIGINT) AS sum_energy
         FROM sg WHERE voiced = 1
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "m_frames" ->
      """SELECT doc_id AS media_id, f AS frame_idx,
           (f * (1000 + (doc_id % 60) * 250)) // 4 AS frame_ts_ms,
           ('0x' || substr(md5(text || ':' || f), 1, 15))::BIGINT % 1000
             AS frame_feature
         FROM documents, range(0, 4) t(f)
         WHERE doc_id % 3 = 2
         ORDER BY media_id, frame_idx""",
    // analytic mirror of the dHash path: a gray pixel's luma IS its
    // gray level, the sampled grid point (gx, gy) reads raster pixel
    // (4·gx, 2·gy), and the uniform brightness offset (doc_id·13
    // mod 3) rides on BOTH sides of each strict comparison — the
    // invariance, mirrored
    "m_dhash_dups" ->
      """WITH gy AS (SELECT unnest(range(0, 8)) AS gy),
         gx9 AS (SELECT unnest(range(0, 9)) AS gx),
         v AS (
           SELECT d.doc_id, gy.gy, gx9.gx,
             ((a.a * a.a) % 199) + ((d.doc_id * 13) % 3) AS lum
           FROM documents d, gy, gx9,
             LATERAL (SELECT (d.doc_id % 25) * 53 + (4 * gx9.gx) * 17
               + (2 * gy.gy) * 29 + 7 AS a) a),
         bits AS (
           SELECT v0.doc_id, v0.gy, v0.gx,
             CASE WHEN v1.lum > v0.lum THEN '1' ELSE '0' END AS b
           FROM v v0 JOIN v v1 ON v1.doc_id = v0.doc_id
             AND v1.gy = v0.gy AND v1.gx = v0.gx + 1
           WHERE v0.gx < 8),
         hashes AS (
           SELECT doc_id, string_agg(b, '' ORDER BY gy, gx) AS dhash
           FROM bits GROUP BY doc_id)
         SELECT dhash, COUNT(*) AS n_members,
           MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
         FROM hashes GROUP BY dhash HAVING COUNT(*) >= 2
         ORDER BY dhash""",
    // same grid/bit replay with the planted (gx=0, gy=1) delta, the
    // same 4×16 pigeonhole blocks, the same exact Hamming verify
    "m_dhash_near" ->
      """WITH gy AS (SELECT unnest(range(0, 8)) AS gy),
         gx9 AS (SELECT unnest(range(0, 9)) AS gx),
         v AS (
           SELECT d.doc_id, gy.gy, gx9.gx,
             CASE WHEN gx9.gx = 0 AND gy.gy = 1
                 AND (d.doc_id // 25) % 2 = 1 THEN
               CASE WHEN e.g4 > e.g0 THEN e.g4 + 1
                    WHEN e.g4 >= 1 THEN e.g4 - 1
                    ELSE e.g0 END
             ELSE (a.a * a.a) % 199 END AS lum
           FROM documents d, gy, gx9,
             LATERAL (SELECT (d.doc_id % 25) * 53 + (4 * gx9.gx) * 17
               + (2 * gy.gy) * 29 + 7 AS a) a,
             LATERAL (SELECT
               (((d.doc_id % 25) * 53 + 2 * 29 + 7)
                 * ((d.doc_id % 25) * 53 + 2 * 29 + 7)) % 199 AS g0,
               (((d.doc_id % 25) * 53 + 4 * 17 + 2 * 29 + 7)
                 * ((d.doc_id % 25) * 53 + 4 * 17 + 2 * 29 + 7)) % 199
                 AS g4) e),
         bits AS (
           SELECT v0.doc_id, v0.gy, v0.gx,
             CASE WHEN v1.lum > v0.lum THEN '1' ELSE '0' END AS b
           FROM v v0 JOIN v v1 ON v1.doc_id = v0.doc_id
             AND v1.gy = v0.gy AND v1.gx = v0.gx + 1
           WHERE v0.gx < 8),
         hashes AS (
           SELECT doc_id, string_agg(b, '' ORDER BY gy, gx) AS dhash
           FROM bits GROUP BY doc_id),
         blocks AS (
           SELECT doc_id, dhash, t.b,
             substring(dhash, t.b * 16 + 1, 16) AS blk
           FROM hashes, (SELECT unnest(range(0, 4)) AS b) t),
         cand AS (
           SELECT DISTINCT x.doc_id AS a, y.doc_id AS bid,
             x.dhash AS h1, y.dhash AS h2
           FROM blocks x JOIN blocks y
             ON x.b = y.b AND x.blk = y.blk
            AND x.doc_id < y.doc_id),
         ver AS (
           SELECT a, bid,
             list_sum([CASE WHEN h1[i] <> h2[i] THEN 1 ELSE 0 END
               for i in range(1, 65)]) AS hamming
           FROM cand)
         SELECT a, bid AS b, CAST(hamming AS BIGINT) AS hamming
         FROM ver WHERE hamming <= 1 ORDER BY a, b""",
    // analytic mirror of the PCM fingerprint: sample i of class p is
    // ((p·53 + i·17 + 7)² mod 1999) − 999 (+ the per-member DC, which
    // rides both sides of every strict comparison — the invariance,
    // mirrored); bits compare samples at k·12 and (k+1)·12
    "m_afp_dups" ->
      """WITH k64 AS (SELECT unnest(range(0, 64)) AS k),
         b AS (
           SELECT d.doc_id, k64.k,
             CASE WHEN
               ((a1.a * a1.a) % 1999) - 999 + ((d.doc_id // 25) % 3) * 7
               > ((a0.a * a0.a) % 1999) - 999 + ((d.doc_id // 25) % 3) * 7
               THEN '1' ELSE '0' END AS bit
           FROM documents d, k64,
             LATERAL (SELECT (d.doc_id % 25) * 53 + ((k64.k + 1) * 12)
               * 17 + 7 AS a) a1,
             LATERAL (SELECT (d.doc_id % 25) * 53 + (k64.k * 12) * 17
               + 7 AS a) a0),
         fps AS (
           SELECT doc_id, string_agg(bit, '' ORDER BY k) AS afp
           FROM b GROUP BY doc_id)
         SELECT afp, COUNT(*) AS n_members,
           MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
         FROM fps GROUP BY afp HAVING COUNT(*) >= 2
         ORDER BY afp""",
    // same sample formula with the planted frame-0 edit, the same
    // pigeonhole blocks, the same exact Hamming verify
    "m_afp_near" ->
      """WITH k64 AS (SELECT unnest(range(0, 64)) AS k),
         b AS (
           SELECT d.doc_id, k64.k,
             CASE WHEN
               ((a1.a * a1.a) % 1999) - 999
               > CASE WHEN k64.k = 0 AND (d.doc_id // 25) % 2 = 1 THEN
                   CASE WHEN e.g12 > e.g0 THEN e.g12 + 1
                        WHEN e.g12 >= -998 THEN e.g12 - 1
                        ELSE e.g0 END
                 ELSE ((a0.a * a0.a) % 1999) - 999 END
               THEN '1' ELSE '0' END AS bit
           FROM documents d, k64,
             LATERAL (SELECT (d.doc_id % 25) * 53 + ((k64.k + 1) * 12)
               * 17 + 7 AS a) a1,
             LATERAL (SELECT (d.doc_id % 25) * 53 + (k64.k * 12) * 17
               + 7 AS a) a0,
             LATERAL (SELECT
               ((((d.doc_id % 25) * 53 + 7)
                 * ((d.doc_id % 25) * 53 + 7)) % 1999) - 999 AS g0,
               ((((d.doc_id % 25) * 53 + 12 * 17 + 7)
                 * ((d.doc_id % 25) * 53 + 12 * 17 + 7)) % 1999) - 999
                 AS g12) e),
         fps AS (
           SELECT doc_id, string_agg(bit, '' ORDER BY k) AS afp
           FROM b GROUP BY doc_id),
         blocks AS (
           SELECT doc_id, afp, t.b,
             substring(afp, t.b * 16 + 1, 16) AS blk
           FROM fps, (SELECT unnest(range(0, 4)) AS b) t),
         cand AS (
           SELECT DISTINCT x.doc_id AS a, y.doc_id AS bid,
             x.afp AS h1, y.afp AS h2
           FROM blocks x JOIN blocks y
             ON x.b = y.b AND x.blk = y.blk
            AND x.doc_id < y.doc_id),
         ver AS (
           SELECT a, bid,
             list_sum([CASE WHEN h1[i] <> h2[i] THEN 1 ELSE 0 END
               for i in range(1, 65)]) AS hamming
           FROM cand)
         SELECT a, bid AS b, CAST(hamming AS BIGINT) AS hamming
         FROM ver WHERE hamming <= 1 ORDER BY a, b""")
}
