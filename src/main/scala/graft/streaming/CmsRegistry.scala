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

  /** A base partition encodes WHICH batches it absorbs in its id:
    * compact(upTo = K) writes batch_id = -(K+2), so -2 absorbs batch
    * 0, -3 absorbs 0..1, ... Readers take the NEWEST base and ignore
    * both older bases and every live partition at or below its
    * horizon. That makes post-compaction cleanup garbage collection,
    * never a correctness step: a crash between base write and
    * cleanup double-counts nothing, a replay of an absorbed batch
    * recreates a partition readers already ignore, and appends
    * running CONCURRENTLY with compact land above the horizon and
    * survive untouched (the write is a dynamic overwrite of the
    * single new base partition, never the whole tree). */
  private def baseId(upTo: Long): Long = -(upTo + 2)

  /** The absorbed horizon encoded by the newest base partition, or
    * -1 when no compaction has run. 1-value driver read — registry
    * maintenance metadata, bounded by contract. */
  private def horizon(all: DataFrame): Long = {
    val h = all.agg(max(when(col("batch_id") <= -2L, -col("batch_id") - 2L)))
      .head().get(0)
    if (h == null) -1L else h.asInstanceOf[Long]
  }

  private def readAll(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .withColumn("batch_id", col("batch_id").cast("long"))

  /** Valid cells under horizon h: the base encoding h plus every
    * live partition above h. (With no base, h = -1 keeps exactly the
    * live partitions.) */
  private def valid(all: DataFrame, h: Long): DataFrame =
    all.filter(col("batch_id") === baseId(h) || col("batch_id") > h)

  /** The folded sketch: cell-wise sum of the newest base plus every
    * live partition above its horizon (the CMS merge law, same as
    * q161's merge_law_ok). */
  def sketch(spark: SparkSession, path: String): DataFrame = {
    val all = readAll(spark, path)
    valid(all, horizon(all))
      .groupBy("i", "bucket").agg(sum("cell").as("cell"))
  }

  /** Compact the current base and every live partition with
    * batch_id <= upToBatchId into ONE new base — the q123
    * maintenance shape applied to the registry, bounding partition
    * count. Absorbed partitions are then deleted as garbage;
    * correctness never depends on the deletion (see baseId doc). */
  def compact(spark: SparkSession, path: String, upToBatchId: Long): Unit = {
    val all = readAll(spark, path)
    val h = horizon(all)
    require(upToBatchId > h,
      s"CmsRegistry.compact: upToBatchId=$upToBatchId must exceed the " +
        s"current horizon $h (older batches are already absorbed)")
    val base = valid(all, h).filter(col("batch_id") <= upToBatchId)
      .groupBy("i", "bucket").agg(sum("cell").as("cell"))
      .withColumn("batch_id", lit(baseId(upToBatchId)))
      // pin BEFORE writing into the tree the plan reads (the
      // ParquetState rule)
      .localCheckpoint(true)
    base.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(path)
    // GC: drop absorbed live partitions and superseded bases — pure
    // cleanup, readers already ignore them
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(path)
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("batch_id=")) {
        val b = name.stripPrefix("batch_id=").toLong
        val absorbedLive = b >= 0 && b <= upToBatchId
        val oldBase = b <= -2 && b != baseId(upToBatchId)
        if (absorbedLive || oldBase) fs.delete(st.getPath, true)
      }
    }
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
