package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** JVM-side twin of the portable 60-bit hash family (Text.portableHash):
  * first 15 hex digits of md5, parsed base-16. Identical values in Spark
  * SQL (`conv(substring(md5(c),1,15),16,10)`), DuckDB
  * (`('0x'||substr(md5(x),1,15))::BIGINT`), and driver-side Scala — used
  * wherever constants must be precomputed once instead of re-hashed per
  * row (LSH hyperplanes, stub media codec).
  */
object Hashing {

  def portableHash60(bytes: Array[Byte]): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  def portableHash60(s: String): Long =
    portableHash60(s.getBytes(StandardCharsets.UTF_8))

  /** Derived-hyperplane weight domain: hash60("p,j") % PlaneMod − PlaneOff
    * ∈ [−1000, 1000]. SINGLE source of truth for every consumer — the
    * composable plane bits in Vectors, the DuckDB oracle mirror
    * (Vectors.planesSql interpolates these constants), and the fused
    * HyperplaneBandKeys expression — so the plane family cannot silently
    * diverge between engines or between the fused and composable paths. */
  val PlaneMod = 2001
  val PlaneOff = 1000

  /** Deterministic hyperplane weights for (plane, dim): integers in
    * [−PlaneOff, PlaneOff] derived from the portable hash family, so
    * every engine and every cluster re-run builds identical planes with
    * no stored model artifact. Integers are exact in float, so a float
    * dot against them reproduces a ::DOUBLE fold bit-for-bit.
    *
    * Cached per (nPlanes, dims): each table is nPlanes·dims md5 calls,
    * and every plan-instance of HyperplaneBandKeys / the LSH queries
    * re-derives the same family (the weights are a pure function of the
    * shape, so sharing is safe — arrays are treated as read-only). */
  private val planeCache = scala.collection.concurrent.TrieMap
    .empty[(Int, Int), Array[Array[Float]]]

  def planeWeights(nPlanes: Int, dims: Int): Array[Array[Float]] =
    planeCache.getOrElseUpdate((nPlanes, dims),
      Array.tabulate(nPlanes, dims) { (p, j) =>
        ((portableHash60(s"$p,$j") % PlaneMod) - PlaneOff).toFloat
      })
}
