package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.ops.Multimodal.{MediaRow, StubCodec}

class MultimodalSpec extends SparkTestBase {

  test("media table carries binary payload + typed metadata") {
    val m = Multimodal.mediaTable(spark, "/root/testdata/sf0.001")
    val sch = m.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(sch("content") == "binary")
    assert(sch("kind") == "string" && sch("duration_ms") == "bigint")
    val kinds = m.select("kind").distinct().collect().map(_.getString(0))
    assert(kinds.toSet == Set("image", "audio", "video"))
  }

  test("decodeFeatures preserves cardinality and partitioning request") {
    val m = Multimodal.mediaTable(spark, "/root/testdata/sf0.001")
    val f = Multimodal.decodeFeatures(spark, m, StubCodec, partitions = 7)
    assert(f.rdd.getNumPartitions == 7)
    assert(f.count() == m.count())
    // features are deterministic: same input → same output
    val a = f.orderBy("media_id").collect()
    val b = Multimodal.decodeFeatures(spark, m, StubCodec, 3)
      .orderBy("media_id").collect()
    assert(a.sameElements(b))
  }

  test("ImageIoCodec decodes REAL pixels with known values") {
    import Multimodal.ImageIoCodec
    // solid (100, 150, 200): per-pixel Rec.601 luma =
    // floor((299·100 + 587·150 + 114·200)/1000) = floor(140.75) = 140
    val solid = Multimodal.synthPng(0, 64, 48, Seq(0x6496C8))
    // metadata dims are deliberately WRONG (9999×9999): a real decode
    // must take dims from the decoded raster, not the row metadata
    val row = MediaRow(1L, "image", solid, 9999, 9999, 0, 0L)
    val feat = ImageIoCodec.decode(row)
    assert(feat.n_pixels == 64L * 48L, "n_pixels must come from the raster")
    assert(feat.luma == 140L)
    // half black / half white columns: luma = floor((0 + 255)/2) = 127
    // (white = floor(255·(299+587+114)/1000) = 255, black = 0; the
    // synth pattern (x·7 + y·13) mod 2 alternates them evenly)
    val duo = Multimodal.synthPng(0, 64, 48, Seq(0x000000, 0xFFFFFF))
    assert(ImageIoCodec.decode(MediaRow(2L, "image", duo, 1, 1, 0, 0L))
      .luma == 127L)
  }

  test("ImageIoCodec resize is deterministic nearest-neighbor") {
    import Multimodal.ImageIoCodec
    val solid = Multimodal.synthPng(0, 64, 48, Seq(0x6496C8))
    val r = ImageIoCodec.resize(MediaRow(3L, "image", solid, 0, 0, 0, 0L),
      target = 32)
    // aspect-preserving fit: 64×48 → 32×24; solid color survives any
    // resampling, so the raster digest is exactly out_w·out_h·140
    assert(r.out_w == 32 && r.out_h == 24)
    assert(r.checksum == 32L * 24L * 140L % 1000000007L)
    // non-solid: checksum changes when the target (hence resampled
    // raster) changes — proves the digest reads the output, not the input
    val duo = Multimodal.synthPng(0, 64, 48, Seq(0x000000, 0xFFFFFF))
    val d32 = ImageIoCodec.resize(MediaRow(4L, "image", duo, 0, 0, 0, 0L), 32)
    val d16 = ImageIoCodec.resize(MediaRow(4L, "image", duo, 0, 0, 0, 0L), 16)
    assert(d32.checksum != d16.checksum || d32.out_w != d16.out_w)
  }

  test("ImageIoCodec runs through the SAME Spark plumbing as the stub") {
    import Multimodal.ImageIoCodec
    import spark.implicits._
    // 30 synthesized PNGs with varying dims, driven through the typed
    // mapPartitions micro-batch path — the codec swap is ONLY the codec
    val rows = (0 until 30).map { i =>
      val w = 16 + (i % 5) * 8
      val h = 12 + (i % 3) * 12
      MediaRow(i.toLong, "image",
        Multimodal.synthPng(i, w, h, Seq(0x6496C8)), w, h, 0, 0L)
    }
    val df = spark.createDataset(rows).toDF()
    val feats = Multimodal.decodeFeatures(spark, df, ImageIoCodec, 4)
      .orderBy("media_id").collect()
    assert(feats.length == 30)
    rows.zip(feats).foreach { case (r, f) =>
      assert(f.getLong(3) == r.width.toLong * r.height, s"id ${r.media_id}")
      assert(f.getLong(2) == 140L)
    }
    val rs = Multimodal.resizeAll(spark, df, ImageIoCodec, 224, 4)
      .orderBy("media_id").collect()
    rs.zip(rows).foreach { case (r, in) =>
      val mx = math.max(in.width, in.height)
      assert(r.getInt(2) == in.width * 224 / mx)
      assert(r.getInt(3) == in.height * 224 / mx)
    }
  }

  test("JavaSoundCodec decodes REAL PCM samples with known values") {
    import Multimodal.JavaSoundCodec
    // synthWav encodes sample i of clip `id` as ((id·31 + i·17) mod
    // 2001) − 1000 through the JDK's own RIFF writer; the decode fold
    // must reproduce the closed-form (n, sum, peak) exactly
    val id = 42L
    val n = 1000
    val wav = Multimodal.synthWav(id, n, sampleRate = 12000)
    // genuine RIFF container, not a bare PCM blob
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val samples = (0 until n).map(i => ((id * 31 + i * 17) % 2001) - 1000)
    // metadata sample_rate is deliberately WRONG (99): a real decode must
    // take the rate from the decoded AudioFormat, not the row metadata
    val f = JavaSoundCodec.decodeAudio(
      MediaRow(id, "audio", wav, 0, 0, 99, 0L))
    assert(f.sample_rate == 12000, "rate must come from the decoded format")
    assert(f.n_samples == n.toLong)
    assert(f.sum_amp == samples.sum)
    assert(f.peak == samples.map(math.abs).max)
  }

  test("audioFrameEnergies: per-frame Σ|amp| of the DECODED PCM, " +
      "trailing partial frame dropped") {
    import spark.implicits._
    // 10 full frames of 100 samples + a 37-sample tail that must NOT
    // produce an 11th frame; energies must equal the closed-form fold
    val id = 7L
    val n = 1037
    val wav = Multimodal.synthWavOf(n, 8000,
      i => (((id * 31 + i.toLong * 17) % 2001) - 1000).toInt)
    val rows = Seq(MediaRow(id, "audio", wav, 0, 0, 8000, 0L)).toDF()
    val fr = Multimodal.audioFrameEnergies(spark, rows, 100, 2)
      .orderBy("frame_idx").collect()
    assert(fr.length == 10, s"expected 10 full frames, got ${fr.length}")
    val samples = (0 until n).map(i => ((id * 31 + i * 17) % 2001) - 1000)
    for (f <- 0 until 10) {
      val want = samples.slice(f * 100, (f + 1) * 100).map(math.abs).sum
      assert(fr(f).getAs[Long]("energy") == want, s"frame $f")
    }
  }

  test("JavaSoundCodec runs through the SAME Spark plumbing as images") {
    import Multimodal.JavaSoundCodec
    import spark.implicits._
    val rows = (0 until 20).map { i =>
      val id = i.toLong
      val n = 400 + (i % 4) * 100
      Multimodal.MediaRow(id, "audio",
        Multimodal.synthWav(id, n, 8000), 0, 0, 8000, 0L)
    }
    val df = spark.createDataset(rows).toDF()
    val feats = Multimodal.decodeAudioAll(spark, df, JavaSoundCodec, 4)
      .orderBy("media_id").collect()
    assert(feats.length == 20)
    feats.zipWithIndex.foreach { case (r, i) =>
      val id = r.getLong(0)
      val n = 400 + (i % 4) * 100
      val samples = (0 until n).map(j => ((id * 31 + j * 17) % 2001) - 1000)
      assert(r.getInt(1) == 8000)
      assert(r.getLong(2) == n.toLong, s"id $id n_samples")
      assert(r.getLong(3) == samples.sum, s"id $id sum_amp")
      assert(r.getLong(4) == samples.map(math.abs).max, s"id $id peak")
    }
  }

  test("dHash is brightness-invariant on real pixels where byte and " +
      "luma-sum identity are not") {
    // two rasters of the same gradient pattern, shifted by a uniform
    // +2 gray levels: different PNG bytes, different mean luma,
    // IDENTICAL dHash — the invariance m_dhash_dups' fixture exercises
    // class-wide; a third image with a different pattern must differ
    def png(off: Int, p: Int) = Multimodal.synthGrayPng(36, 16,
      (x, y) => {
        val a = p * 53 + x * 17 + y * 29 + 7
        (a * a) % 199 + off
      })
    def rowOf(id: Long, off: Int, p: Int) = Multimodal.MediaRow(
      id, "image", png(off, p), 36, 16, 0, 0L)
    val a = Multimodal.ImageIoCodec.dhashBits(rowOf(1, 0, 7))
    val b = Multimodal.ImageIoCodec.dhashBits(rowOf(2, 2, 7))
    val c = Multimodal.ImageIoCodec.dhashBits(rowOf(3, 0, 8))
    assert(!java.util.Arrays.equals(png(0, 7), png(2, 7)),
      "fixture degenerate: shifted rasters encode to identical bytes")
    val lumaA = Multimodal.ImageIoCodec.decode(rowOf(1, 0, 7)).luma
    val lumaB = Multimodal.ImageIoCodec.decode(rowOf(2, 2, 7)).luma
    assert(lumaA != lumaB,
      "fixture degenerate: brightness shift left mean luma unchanged")
    assert(a.dhash == b.dhash,
      "uniform brightness shift must not move the gradient hash")
    assert(a.dhash != c.dhash,
      "different gradient patterns must not collide")
    assert(a.dhash.length == 64 && a.dhash.forall(ch =>
      ch == '0' || ch == '1'))
  }

  test("audio fingerprint is DC-invariant on real PCM where byte and " +
      "amplitude-sum identity are not") {
    def wav(dc: Int, p: Int) = Multimodal.synthWavOf(800, 16000, { i =>
      val a = p * 53 + i * 17 + 7
      (a.toLong * a % 1999).toInt - 999 + dc
    })
    def rowOf(id: Long, dc: Int, p: Int) = Multimodal.MediaRow(
      id, "audio", wav(dc, p), 0, 0, 16000, 50L)
    val a = Multimodal.JavaSoundCodec.audioFingerprint(rowOf(1, 0, 7))
    val b = Multimodal.JavaSoundCodec.audioFingerprint(rowOf(2, 14, 7))
    val c = Multimodal.JavaSoundCodec.audioFingerprint(rowOf(3, 0, 8))
    assert(!java.util.Arrays.equals(wav(0, 7), wav(14, 7)),
      "fixture degenerate: DC-shifted clips encode to identical bytes")
    val sumA = Multimodal.JavaSoundCodec.decodeAudio(rowOf(1, 0, 7)).sum_amp
    val sumB = Multimodal.JavaSoundCodec.decodeAudio(rowOf(2, 14, 7)).sum_amp
    assert(sumA != sumB,
      "fixture degenerate: DC shift left the amplitude sum unchanged")
    assert(a.dhash == b.dhash,
      "uniform DC shift must not move the difference fingerprint")
    assert(a.dhash != c.dhash,
      "different waveforms must not collide")
    assert(a.dhash.length == 64)
  }

  test("stub codec arithmetic is the portable hash family") {
    val bytes = "hello world".getBytes("UTF-8")
    val h = StubCodec.hash60(bytes)
    // md5('hello world') = 5eb63bbbe01eeed0..., first 15 hex digits
    assert(h == java.lang.Long.parseLong("5eb63bbbe01eeed", 16))
    val row = MediaRow(1L, "image", bytes, 640, 480, 0, 0L)
    val feat = StubCodec.decode(row)
    assert(feat.luma == h % 1000 && feat.n_pixels == 640L * 480L)
  }
}
