package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Frees the block-manager storage behind a `localCheckpoint()`ed
  * Dataset. Checkpointed RDDs are cached with no lineage back to the
  * query, so dropping the Dataset reference does NOT release them and
  * `spark.catalog.clearCache()` does not see them either — an iterative
  * algorithm that checkpoints per round (Dedup.connectedComponents)
  * would otherwise grow executor storage by one labels-sized RDD per
  * round for the life of the session.
  */
object CheckpointCleanup {
  /** Unpersist the checkpoint RDD wrapped by `df` (no-op for anything
    * that is not a checkpointed Dataset). Non-blocking. */
  def unpersistCheckpoint(df: Dataset[_]): Unit = df match {
    case c: org.apache.spark.sql.classic.Dataset[_] =>
      c.queryExecution.logical match {
        case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    case _ => ()
  }
}
