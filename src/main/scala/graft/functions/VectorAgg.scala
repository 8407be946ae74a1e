package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Single-pass vector-mean UDAF (SURVEY §2.4 A7, §2.8): one buffer of 64
  * doubles per group instead of the 64-way posexplode the oracle-checked
  * `v_centroid` query uses — at 100 TB this is 1/64th the shuffle rows.
  * Public `Aggregator` API only; no Catalyst internals.
  */
object VectorAgg {

  type Buf = (Array[Double], Long)

  /** Mean of Array[Float] vectors, elementwise, as Array[Double]. */
  val vectorMean: Aggregator[Array[Float], Buf, Array[Double]] =
    new Aggregator[Array[Float], Buf, Array[Double]] {
      def zero: Buf = (Array.emptyDoubleArray, 0L)

      def reduce(b: Buf, v: Array[Float]): Buf = {
        if (v == null) b
        else {
          val acc = if (b._1.isEmpty) new Array[Double](v.length) else b._1
          require(acc.length == v.length,
            s"dimension mismatch: ${acc.length} vs ${v.length}")
          var i = 0
          while (i < v.length) { acc(i) += v(i).toDouble; i += 1 }
          (acc, b._2 + 1)
        }
      }

      def merge(a: Buf, b: Buf): Buf =
        if (a._1.isEmpty) b
        else if (b._1.isEmpty) a
        else {
          require(a._1.length == b._1.length, "dimension mismatch")
          var i = 0
          while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
          (a._1, a._2 + b._2)
        }

      def finish(r: Buf): Array[Double] =
        if (r._2 == 0L) null else r._1.map(_ / r._2)

      def bufferEncoder: Encoder[Buf] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
      def outputEncoder: Encoder[Array[Double]] =
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[Array[Double]]()
    }

  /** Column form: `df.groupBy("label").agg(vectorMeanCol(col("emb")))`. */
  def vectorMeanCol(c: Column): Column = udaf(vectorMean).apply(c)
}
