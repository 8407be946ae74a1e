/** graftshim: sessionState/FunctionRegistry are private[sql]. */
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  Literal}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.IntegerType

/** SQL registration for the graft expressions, so they're callable from
  * `spark.sql("SELECT fvec_dot(a, b) ...")` and `expr("...")` strings —
  * the full §2.8 extension surface:
  *
  *  - `GraftFunctions.register(spark)` — runtime registration on any
  *    live session (works in shells and tests);
  *  - `spark.sql.extensions=graft.GraftExtensions` — config-time
  *    injection for cluster deployments (applies to every new session).
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private val fvecDotInfo = new ExpressionInfo(
    classOf[FloatVecDot].getName, "fvec_dot")
  private val fvecDotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => FloatVecDot(a, b)
    case other => throw new IllegalArgumentException(
      s"fvec_dot expects 2 arguments, got ${other.size}")
  }

  private val shingleInfo = new ExpressionInfo(
    classOf[ShingleMinHashes].getName, "shingle_minhashes")
  private val shingleBuilder: Seq[Expression] => Expression = {
    case Seq(words, k, n) =>
      ShingleMinHashes(words, intLit(k, "shingle size k"),
        intLit(n, "numHashes"))
    case other => throw new IllegalArgumentException(
      s"shingle_minhashes expects (words, k, numHashes), got ${other.size}")
  }

  private val shingleHashesInfo = new ExpressionInfo(
    classOf[ShingleHashes].getName, "shingle_hashes")
  private val shingleHashesBuilder: Seq[Expression] => Expression = {
    case Seq(words, k) => ShingleHashes(words, intLit(k, "shingle size k"))
    case other => throw new IllegalArgumentException(
      s"shingle_hashes expects (words, k), got ${other.size}")
  }

  private val simhash60Info = new ExpressionInfo(
    classOf[SimHash60].getName, "simhash60")
  private val simhash60Builder: Seq[Expression] => Expression = {
    case Seq(words) => SimHash60(words)
    case other => throw new IllegalArgumentException(
      s"simhash60 expects (words), got ${other.size}")
  }

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("fvec_dot", fvecDotBuilder, "built-in")
    reg.createOrReplaceTempFunction("shingle_minhashes", shingleBuilder,
      "built-in")
    reg.createOrReplaceTempFunction("shingle_hashes", shingleHashesBuilder,
      "built-in")
    reg.createOrReplaceTempFunction("simhash60", simhash60Builder,
      "built-in")
  }

  /** Config-time injection (for `spark.sql.extensions`). */
  def inject(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction(
      (FunctionIdentifier("fvec_dot"), fvecDotInfo, fvecDotBuilder))
    extensions.injectFunction(
      (FunctionIdentifier("shingle_minhashes"), shingleInfo,
        shingleBuilder))
    extensions.injectFunction(
      (FunctionIdentifier("shingle_hashes"), shingleHashesInfo,
        shingleHashesBuilder))
    extensions.injectFunction(
      (FunctionIdentifier("simhash60"), simhash60Info, simhash60Builder))
  }
}
