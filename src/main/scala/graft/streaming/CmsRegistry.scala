package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Streaming count-min registry: the frequency counterpart of
  * KmvRegistry, folding q161's relational CMS cells across document
  * micro-batches so "how often has this term appeared EVER" is
  * answerable without rescanning history.
  *
  * The fold is cell-wise ADDITION — commutative and associative but
  * NOT idempotent, so unlike the sketch-union registries
  * (SketchRegistry, KmvRegistry) replay safety cannot come from the
  * algebra. It comes from the layout instead: each batch's cell
  * deltas land in their own batch_id partition with dynamic
  * partition overwrite (the IdempotentSink discipline), so an
  * at-least-once replay overwrites its own partition byte-identically
  * and the folded sum is exactly-once.
  *
  * Scale: a batch ships at most d*w cells (the partial-agg bound);
  * the registry grows one d*w-cell partition per batch and compacts
  * by re-summing — the same maintenance shape as q123's compaction
  * plan. Estimates never touch the corpus: probe terms broadcast-join
  * the folded d*w-cell table.
  */
object CmsRegistry {

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

  /** The folded sketch: cell-wise sum across every batch partition
    * (the CMS merge law, same as q161's merge_law_ok). */
  def sketch(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy("i", "bucket").agg(sum("cell").as("cell"))

  /** The reserved batch_id of the compacted base partition — a value
    * foreachBatch can never produce, so a replayed batch can never
    * overwrite the base. */
  val CompactedBase: Long = -1L

  /** Compact every partition with batch_id <= upToBatchId into ONE
    * base partition (batch_id = -1), leaving newer partitions
    * untouched — the q123 maintenance shape applied to the registry,
    * bounding the partition count between checkpoints.
    *
    * SAFETY CONTRACT: only compact batch ids the stream's checkpoint
    * has committed. A replay of an absorbed batch would recreate its
    * partition NEXT TO the base that already contains it and
    * double-count; committed offsets are exactly the ids Structured
    * Streaming can no longer replay. */
  def compact(spark: SparkSession, path: String, upToBatchId: Long): Unit = {
    val all = spark.read.parquet(path)
      .withColumn("batch_id", col("batch_id").cast("long"))
    val pinned = all.filter(col("batch_id") <= upToBatchId)
      .groupBy("i", "bucket").agg(sum("cell").as("cell"))
      .withColumn("batch_id", lit(CompactedBase))
      .unionByName(all.filter(col("batch_id") > upToBatchId))
      // pin BEFORE overwriting the path the plan reads (the
      // ParquetState rule); static overwrite replaces the whole tree
      .localCheckpoint(true)
    pinned.write.mode("overwrite").partitionBy("batch_id").parquet(path)
  }

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
