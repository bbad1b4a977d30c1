package org.apache.spark.sql.graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic storage release for localCheckpoint'ed Datasets.
  *
  * Dataset.unpersist only uncaches CacheManager entries; the blocks
  * behind a localCheckpoint belong to the internal RDD referenced by
  * the plan's LogicalRDD leaf and are otherwise reclaimed only when
  * the ContextCleaner notices the RDD is garbage — nondeterministic,
  * GC-driven. Iterative operators (connected components) that
  * checkpoint every round would otherwise accumulate one full cached
  * table per round. Lives under org.apache.spark.sql because
  * LogicalRDD is private[sql] (same pattern as FloatDotProduct).
  */
object CheckpointUtils {
  def unpersistCheckpoint(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))
}
