package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join: for each left row, the most recent right row
  * with rightTs <= leftTs on the same key (the classic ticks-vs-quotes
  * operator; called out in SURVEY.md §7 as a custom-op candidate).
  *
  * Implementation is the scalable union+window form, NOT a range
  * cross-join: tag both sides, union, and forward-fill the right
  * payload over (key) ordered by (ts, side) — right rows sort before
  * left rows at equal timestamps, making the match inclusive. One
  * shuffle on the key, O(n log n) per partition, no row-pair blowup;
  * this is how a 100 TB ticks/quotes join must run.
  *
  * Right rows must be unique per (key, ts) — pre-deduplicate; with
  * duplicates the fill would be order-dependent.
  */
object AsOfJoin {

  /** @param payload right-side columns carried onto left rows
    *   (must not collide with left column names) */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("_ts", col(leftTs)).withColumn("_side", lit(1))
    val r = right
      .select((keys.map(col) :+ col(rightTs).as("_ts")) ++ payload.map(col): _*)
      .withColumn("_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(u) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }
}
