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
