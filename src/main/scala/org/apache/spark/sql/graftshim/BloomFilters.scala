/** In the graftshim package for the same reason as FloatVecDot: the
  * Column bridge (ExpressionUtils) is private[sql].
  */
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain,
  Literal}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Bridge to Spark's own runtime-filter membership expression
  * (`BloomFilterMightContain`, the codegen'd predicate the optimizer's
  * InjectRuntimeFilter rule plants under shuffle joins). The bloom is
  * passed as a serialized `org.apache.spark.util.sketch.BloomFilter`
  * (the exact format `DataFrame.stat.bloomFilter` produces and the
  * expression's `deserialize` expects) embedded as a FOLDABLE binary
  * literal — the expression's type check admits only constants and
  * scalar subqueries for the filter side, and a literal also lets the
  * whole predicate participate in whole-stage codegen with the sketch
  * deserialized once per task, not per row.
  */
object BloomFilters {

  /** `might_contain(bloom, value)` over a driver-built bloom sketch.
    * `value` must be LongType (the sketch hashes longs); no false
    * negatives, bounded false positives — callers keep the exact join
    * afterwards and use this only to shrink what reaches the shuffle.
    */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal.create(bloomBytes, BinaryType),
      ExpressionUtils.expression(value)))
}
