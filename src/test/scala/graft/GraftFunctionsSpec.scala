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
