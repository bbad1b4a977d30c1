package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CONTINUOUS-ingest dedup: a parquet-backed fingerprint registry
  * that persists across runs, so every new corpus batch is deduped
  * against EVERYTHING ever accepted — the production shape of corpus
  * ingestion (the sinks.NotificationLog read-back loop applied to
  * content dedup).
  *
  * Scale notes: the registry is a one-column table of fingerprints —
  * at 10^10 docs it is still orders of magnitude narrower than the
  * corpus; the membership probe is a key-shuffle anti-join (swap in a
  * bloom-filter pre-probe when the registry outgrows comfortable
  * shuffle, same plan shape, q80's broadcast→bloom note). In-batch
  * duplicates resolve FIRST (keep the smallest id per fingerprint,
  * exactDedup's rule) so one batch can never register a fingerprint
  * twice.
  */
class DedupRegistry(path: String) {

  def read(spark: SparkSession): DataFrame = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL("fp STRING"))
    try {
      val d = spark.read.parquet(path)
      if (d.columns.isEmpty) empty else d
    } catch { case _: org.apache.spark.sql.AnalysisException => empty }
  }

  /** Dedup `batch` against the registry AND within itself, append the
    * survivors' fingerprints, return the surviving rows (original
    * schema). `fingerprint` is any deterministic Column over the
    * batch's columns (content md5, minhash band key, simhash...). */
  def dedupAppend(batch: DataFrame, idCol: String,
                  fingerprint: Column): DataFrame = {
    val spark = batch.sparkSession
    val withFp = batch.withColumn("_reg_fp", fingerprint)
    // in-batch winners: smallest id per fingerprint
    val inBatch = Dedup.exactDedup(withFp, idCol, col("_reg_fp"))
      .withColumnRenamed("dedup_key", "_reg_fp")
      .select(col(idCol))
    val winners = withFp.join(inBatch, Seq(idCol), "left_semi")
    // registry probe: drop fingerprints seen in ANY earlier batch
    val fresh = winners.join(
      read(spark).withColumnRenamed("fp", "_reg_fp"),
      Seq("_reg_fp"), "left_anti")
    // Materialize BEFORE appending: the survivors plan reads the
    // registry it is about to extend (same recache hazard as the
    // notification log, SURVEY.md §7 risk 6).
    val pinned = fresh.localCheckpoint(true)
    pinned.select(col("_reg_fp").as("fp"))
      .write.mode("append").parquet(path)
    pinned.drop("_reg_fp")
  }
}
