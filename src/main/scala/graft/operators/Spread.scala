package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Compute-parallelism helper. A small table often arrives as ONE
  * input split, so every downstream narrow stage (regex tokenize,
  * shingle HOFs, per-pair dot products) runs on a single core; and an
  * un-numbered repartition() gets coalesced back to one partition by
  * AQE because the bytes are tiny — the partition SIZE heuristic is
  * the wrong currency when the cost is per-row CPU, not I/O.
  *
  * repartition with an EXPLICIT count (defaultParallelism) is honored
  * by AQE and spreads the CPU-bound projection across the cluster.
  * The row shuffle it costs is trivially small by construction (it
  * only matters when the input was few-splits-small to begin with).
  */
object Spread {
  def byKey(keyCol: String)(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(keyCol))
}
