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
}
