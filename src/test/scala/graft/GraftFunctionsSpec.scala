package graft

import org.apache.spark.sql.graftshim.GraftFunctions

class GraftFunctionsSpec extends SparkTestBase {

  test("fvec_dot and shingle_minhashes callable from SQL after register") {
    GraftFunctions.register(spark)
    val dot = spark.sql(
      "SELECT fvec_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d")
      .collect()(0).getDouble(0)
    assert(dot == 11.0)
    val mh = spark.sql(
      """SELECT shingle_minhashes(split('a b c d e f', ' '), 5, 12) AS m""")
      .collect()(0).getSeq[Long](0)
    assert(mh.length == 12)
    assert(mh.forall(v => v >= 0 && v < 2147483647L))
    // registration is idempotent
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT fvec_dot(array(1.0f), array(2.0f))")
      .collect()(0).getDouble(0) == 2.0)
  }

  test("SQL shingle_minhashes agrees with the Dedup pipeline values") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // same doc through SQL-function and through the d_minhash signature
    // formulation used by the oracle (affine over md5 mod p)
    val text = "the fast key order sort table scan merge part window"
    val viaSql = spark.sql(
      s"SELECT shingle_minhashes(split('$text', ' '), 5, 12) AS m")
      .collect()(0).getSeq[Long](0)
    // independently: h0 per shingle via the portable hash, min of affine
    val words = text.split(" ")
    val shingles = (0 to words.length - 5).map(i =>
      words.slice(i, i + 5).mkString(" "))
    val p = 2147483647L
    val h0s = shingles.map(s =>
      functions.Hashing.portableHash60(s) % p)
    val expected = (0 until 12).map(k =>
      h0s.map(h => (h * ((k + 1) * 1299709L) + k * 15485863L) % p).min)
    assert(viaSql == expected)
  }

  test("ShingleHashes equals the composable sort-transform-distinct form") {
    import org.apache.spark.sql.functions._
    val docs = etl.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    def words(c: org.apache.spark.sql.Column) = split(c, " ")
    def shingles(c: org.apache.spark.sql.Column, k: Int) = {
      val w = words(c)
      array_distinct(transform(
        sequence(lit(1), greatest(size(w) - (k - 1), lit(1))),
        i => concat_ws(" ", slice(w, i, lit(k)))))
    }
    for (k <- Seq(1, 2, 5)) {
      val mismatch = docs.select(
        org.apache.spark.sql.graftshim.ShingleHashes
          .shingleHashes(words(col("text")), k).as("fused"),
        array_sort(transform(shingles(col("text"), k),
          b => ops.Text.portableHash(b))).as("composed"))
        .filter(col("fused") =!= col("composed")).count()
      assert(mismatch == 0, s"k=$k fused != composed on $mismatch docs")
    }
    // short-doc truncation convention: 3 words, k=5 → ONE truncated gram
    import spark.implicits._
    val one = Seq("a b c").toDF("text")
      .select(org.apache.spark.sql.graftshim.ShingleHashes
        .shingleHashes(split(col("text"), " "), 5).as("h"))
      .collect()(0).getSeq[Long](0)
    assert(one.length == 1)
    assert(one.head == functions.Hashing.portableHash60("a b c"))
  }

  test("SimHash60 equals the composable 60-HOF aggregate form") {
    import org.apache.spark.sql.functions._
    // real corpus: every sf0.001 doc, fused vs the formulation d_simhash
    // shipped before the codegen expression (and which the DuckDB oracle
    // still spells out) — bit-identical or the oracle would go hash-red
    val docs = etl.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val composed = docs
      .select(col("doc_id"),
        array_distinct(split(col("text"), " ")).as("dw"))
      .withColumn("n", size(col("dw")))
      .select(col("doc_id"), expr(
        """aggregate(sequence(0, 59), 0L, (acc, b) -> acc +
             IF(2 * size(filter(dw, x ->
                  (shiftright(CAST(conv(substring(md5(x),1,15),16,10)
                     AS BIGINT), b) & 1L) = 1L)) > n,
                shiftleft(1L, b), 0L))""").as("c"))
    val fused = docs.select(col("doc_id"),
      org.apache.spark.sql.graftshim.SimHash60
        .simhash60(split(col("text"), " ")).as("f"))
    val mismatch = fused.join(composed, "doc_id")
      .filter(col("f") =!= col("c")).count()
    assert(mismatch == 0, s"fused != composed on $mismatch docs")
    // duplicate words count ONCE (dedup precedes the majority vote):
    // "a a a b" has distinct set {a, b} — same fingerprint as "a b"
    import spark.implicits._
    val pair = Seq(("a a a b", "a b")).toDF("t1", "t2")
      .select(org.apache.spark.sql.graftshim.SimHash60
          .simhash60(split(col("t1"), " ")).as("h1"),
        org.apache.spark.sql.graftshim.SimHash60
          .simhash60(split(col("t2"), " ")).as("h2"))
      .collect()(0)
    assert(pair.getLong(0) == pair.getLong(1))
    // null array → null fingerprint
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT simhash60(CAST(NULL AS ARRAY<STRING>)) AS h")
      .collect()(0).isNullAt(0))
  }

  test("fvec_dot on non-nullable arrays (containsNull=false) via codegen") {
    // Regression for the nullable-override contract: with containsNull =
    // false on BOTH inputs and non-null columns, nullable must still be
    // computed (not assumed) — and the codegen'd path must compile and
    // run. A wrong override here is a latent janino failure (ev.isNull
    // written but never declared) that only a non-nullable schema hits.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = false),
        nullable = false),
      StructField("b", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),
      org.apache.spark.sql.Row(Seq(0.5f, -1.0f), Seq(2.0f, 2.0f)))
    val df = spark.createDataFrame(rows, schema)
    val out = df.select(
      org.apache.spark.sql.graftshim.FloatVecDot.fdot(col("a"), col("b"))
        .as("d"))
    // with containsNull=false both sides, the result is non-nullable
    assert(!out.schema("d").nullable)
    assert(out.collect().map(_.getDouble(0)).toSeq == Seq(11.0, -1.0))
    // and with the default containsNull=true, a null ELEMENT → null row
    import spark.implicits._
    val withNullElem = Seq((Seq(Some(1.0f), None), Seq(Some(2.0f),
      Some(3.0f)))).toDF("a", "b")
      .select(org.apache.spark.sql.graftshim.FloatVecDot
        .fdot(col("a"), col("b")).as("d"))
    assert(withNullElem.schema("d").nullable)
    assert(withNullElem.collect()(0).isNullAt(0))
  }

  test("HyperplaneBandKeys equals the composable when(fdot>=0) form") {
    // Pins the fused expression's contract to the formulation it
    // replaced: band b's key = (b+1)<<32 | Σ_i when(fdot(v, plane) >= 0,
    // 1<<i).otherwise(0) — including the null-element path (null element
    // in the folded range → fdot is NULL → NULL >= 0 is not true → bit
    // 0) and the short/empty-vector path (fold over own length; empty →
    // dot 0.0 → bit 1), which the d_embed_lsh corpus never exercises.
    // (A whole-NULL vector is out of scope on both paths: the fused
    // UnaryExpression null-propagates the row, a case the production
    // corpus — non-null embedding column — never produces.)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val nPlanes = 8
    val r = 2
    val dims = 6
    val w = functions.Hashing.planeWeights(nPlanes, dims)
    val rnd = new scala.util.Random(0xC0FFEE)
    def vec(n: Int): Seq[java.lang.Float] = Seq.fill(n)(
      java.lang.Float.valueOf((rnd.nextFloat() - 0.5f) * 4f))
    val nullF = null.asInstanceOf[java.lang.Float]
    val rows: Seq[Seq[java.lang.Float]] =
      (1 to 40).map(_ => vec(dims)) ++
        Seq(vec(3), vec(1), Seq.empty[java.lang.Float]) ++
        Seq(vec(dims).updated(2, nullF), vec(4).updated(0, nullF),
          Seq(nullF, nullF))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row(_)), 4),
      StructType(Seq(StructField("v",
        ArrayType(FloatType, containsNull = true)))))
    val fused = org.apache.spark.sql.graftshim.HyperplaneBandKeys
      .bandKeys(col("v"), nPlanes, r, dims)
    val composed = array((0 until nPlanes / r).map { b =>
      (0 until r).map { i =>
        when(ops.fdot(col("v"), typedLit(w(b * r + i).toSeq)) >= 0,
          lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _) + lit((b + 1).toLong << 32)
    }: _*)
    val out = df.select(fused.as("f"), composed.as("c"))
    assert(out.filter(col("f") =!= col("c")).count() == 0,
      out.filter(col("f") =!= col("c")).collect().mkString("\n"))
    assert(out.filter(col("f").isNull).count() == 0)
  }

  test("malformed usage yields a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception](
      spark.sql("SELECT fvec_dot(array(1.0f))").collect())
    assert(e.getMessage.contains("2 arguments"))
    val e2 = intercept[Exception](spark.sql(
      "SELECT shingle_minhashes(split('a b', ' '), 1+1, 12)").collect())
    assert(e2.getMessage.contains("integer literal"))
  }
}
