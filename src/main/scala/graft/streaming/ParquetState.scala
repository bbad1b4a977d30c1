package graft.streaming

import org.apache.spark.sql.DataFrame

/** Shared scaffold for foreachBatch sinks that maintain a parquet
  * state table (SnapshotMerge's row snapshot, SketchRegistry's sketch
  * registry): read-or-empty bootstrap + the pin-before-overwrite
  * rule, in ONE place so a fix to either lands in both. */
private[streaming] object ParquetState {

  /** The state table at `path`, or an empty frame with `like`'s
    * schema before the first batch has COMMITTED anything (the
    * shared graft.operators.RegistryIO policy — a crashed first
    * write's _temporary-only dir is still "never written"). A state
    * table with committed data that cannot be read is corruption and
    * propagates: silently restarting from empty state would re-emit
    * every alert / forget every sketch (ADVICE r4). */
  def readOrEmpty(path: String, like: DataFrame): DataFrame = {
    val spark = like.sparkSession
    if (!graft.operators.RegistryIO.committedDataExists(spark, path)) like.limit(0)
    else spark.read.parquet(path)
  }

  /** Pin PRE-write state, then overwrite: a plan that reads the path
    * it is about to replace must materialize first (the README
    * plan-notes rule — a cache would be re-invalidated by the write
    * and silently re-derive from the new files). */
  def pinAndOverwrite(df: DataFrame, path: String): Unit =
    df.localCheckpoint(true).write.mode("overwrite").parquet(path)
}
