package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Robust per-entity outlier detection: exact median / MAD (median
  * absolute deviation), flag rows where |value - med| > k * MAD.
  *
  * Scale design: both medians partition on the ENTITY column — the
  * high-cardinality key — so per-partition sort state stays tiny at
  * any corpus size; never on a low-cardinality group (a handful of
  * groups would serialize the table through a handful of sorts).
  * Medians are R-1 lower-nearest-rank picks (the value at position
  * ceil(n/2) in sort order), so every output number is an actual
  * input double — no averaging, no cross-engine float drift.
  */
object Robust {

  /** Per-entity lower-nearest-rank median of `valueCol` over the
    * NON-NULL values. Nulls are dropped first: Spark sorts nulls
    * FIRST ascending while the DuckDB oracles sort NULLS LAST, and a
    * null can never be a median — counting them in n would silently
    * shift the rank pick. */
  def groupMedian(df: DataFrame, entityCol: String, valueCol: String,
                  out: String): DataFrame = {
    // reserved working names (the AsOfJoin guard, review): a value
    // column literally named "n" would be overwritten by the group
    // count and the "median" silently becomes the group SIZE
    require(!Seq(entityCol, valueCol).exists(Set("rn", "n")),
      "Robust.groupMedian reserves rn/n as working columns")
    val w = Window.partitionBy(entityCol).orderBy(valueCol)
    df.filter(col(valueCol).isNotNull)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(entityCol)))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col(entityCol), col(valueCol).as(out))
  }

  /** Rows of `df` whose value deviates from its entity's median by
    * more than k MADs. Null values are never flagged (and don't move
    * the medians). Output: idCol, entityCol, valueCol, med, mad.
    */
  def madOutliers(df: DataFrame, entityCol: String, valueCol: String,
                  idCol: String, k: Double): DataFrame = {
    require(!Seq(entityCol, valueCol, idCol).exists(Set("med", "mad", "dev")),
      "Robust.madOutliers reserves med/mad/dev as working columns")
    val rows = df.select(idCol, entityCol, valueCol)
      .filter(col(valueCol).isNotNull)
    val m1 = groupMedian(rows.select(entityCol, valueCol), entityCol, valueCol, "med")
    // materialized once: the MAD derivation and the final probe both
    // consume it, and column pruning would re-run the median join per
    // consumer (the Dedup multi-consumer rule)
    val dev = Dedup.DefaultMaterialize(rows
      .join(m1, entityCol)
      .withColumn("dev", abs(col(valueCol) - col("med"))))
    val m2 = groupMedian(dev.select(col(entityCol), col("dev")), entityCol, "dev", "mad")
    dev.join(m2, entityCol)
      .filter(col("dev") > col("mad") * k)
      .select(idCol, entityCol, valueCol, "med", "mad")
  }
}
