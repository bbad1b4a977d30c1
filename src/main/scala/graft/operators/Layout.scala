package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side layout operators. At 100 TB the WRITE layout decides
  * the read cost: range-partitioned + sorted files give parquet
  * zone-map (min/max) pruning on the layout keys, and co-sorted
  * z-order codes (see q113) extend that to multi-column predicates.
  *
  * `rangeLayout` is the engine's layout primitive:
  * repartitionByRange (a range exchange driven by a sampled sketch of
  * the key distribution) + sortWithinPartitions, so every output file
  * covers a disjoint key range and is internally sorted — the shape
  * both zone-map pruning and merge-style downstream joins want.
  */
object Layout {

  def rangeLayout(df: DataFrame, numPartitions: Int, keys: Column*): DataFrame =
    df.repartitionByRange(numPartitions, keys: _*)
      .sortWithinPartitions(keys: _*)

  /** Audit frame for a layout: per physical partition, the row count
    * and min/max of the (single) layout key — the zone-map a reader
    * would prune against. Disjointness of these ranges IS the
    * data-skipping guarantee (asserted in LayoutSpec). */
  def partitionRanges(df: DataFrame, key: String): DataFrame =
    df.select(spark_partition_id().as("pid"), col(key))
      .groupBy("pid")
      .agg(count(lit(1)).as("cnt"), min(key).as("lo"), max(key).as("hi"))
}
