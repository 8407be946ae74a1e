package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Entry point for `--conf spark.sql.extensions=graft.GraftExtensions`:
  * injects the graft SQL functions (fvec_dot, shingle_minhashes) into
  * every session built on the cluster (SURVEY §2.8 — the
  * SparkSessionExtensions path; no custom Rule/Strategy is needed, §4).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    org.apache.spark.sql.graftshim.GraftFunctions.inject(extensions)
}
