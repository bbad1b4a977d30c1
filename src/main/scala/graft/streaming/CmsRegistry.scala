package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Streaming count-min registry: the frequency counterpart of
  * KmvRegistry, folding q161's relational CMS cells across document
  * micro-batches so "how often has this term appeared EVER" is
  * answerable without rescanning history.
  *
  * The fold is cell-wise ADDITION — replay safety and compaction are
  * the AdditiveRegistry discipline (batch_id partition layout +
  * horizon-encoding base partitions); this object contributes only
  * the CMS shape: what a batch's cells ARE and how probes read the
  * folded sketch.
  *
  * Scale: a batch ships at most d*w cells (the partial-agg bound);
  * the registry grows one d*w-cell partition per batch and compacts
  * by re-summing — the same maintenance shape as q123's compaction
  * plan. Estimates never touch the corpus: probe terms broadcast-join
  * the folded d*w-cell table.
  */
object CmsRegistry {

  private val Keys = Seq("i", "bucket")

  /** One batch's cell deltas: (i, bucket, cell) summed over the
    * batch's term occurrences — d*w rows max, map-side combined. */
  def batchCells(docs: DataFrame, textCol: String, d: Int, w: Int): DataFrame =
    docs.select(explode(Text.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .select(col("term"), col("cnt"),
        explode(sequence(lit(0), lit(d - 1))).as("i"))
      .withColumn("bucket", Text.cmsBucket(col("i"), col("term"), w))
      .groupBy("i", "bucket").agg(sum("cnt").as("cell"))

  /** foreachBatch handler: write this batch's deltas under
    * batch_id=<id>, replacing that partition on replay. */
  def appendBatch(path: String, textCol: String, d: Int, w: Int)(
      batch: DataFrame, batchId: Long): Unit =
    IdempotentSink.parquetByBatch(path)(
      batchCells(batch, textCol, d, w), batchId)

  /** The folded sketch: cell-wise sum of the newest base plus every
    * live partition above its horizon (the CMS merge law, same as
    * q161's merge_law_ok). */
  def sketch(spark: SparkSession, path: String): DataFrame =
    AdditiveRegistry.fold(spark, path, Keys, "cell")

  /** Compact batches <= upToBatchId into one base partition
    * (AdditiveRegistry.compact with the CMS cell keys). */
  def compact(spark: SparkSession, path: String, upToBatchId: Long): Unit =
    AdditiveRegistry.compact(spark, path, Keys, "cell", upToBatchId)

  /** Point estimates for probe terms against a folded sketch:
    * min over hash rows of the probed cell; a never-touched cell is
    * an exact zero. Estimates >= true count, deterministically. */
  def estimate(terms: DataFrame, termCol: String, sk: DataFrame,
               d: Int, w: Int): DataFrame =
    terms.select(col(termCol).as("term"))
      .select(col("term"), explode(sequence(lit(0), lit(d - 1))).as("i"))
      .withColumn("bucket", Text.cmsBucket(col("i"), col("term"), w))
      .join(sk, Seq("i", "bucket"), "left")
      .groupBy("term").agg(min(coalesce(col("cell"), lit(0L))).as("est"))
}
