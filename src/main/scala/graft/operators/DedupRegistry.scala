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
    // Never-committed (absent, or only _temporary from a crashed
    // first append) is the ONLY case treated as empty — the shared
    // RegistryIO policy. A registry with committed data that cannot
    // be read as (fp STRING) is corruption: forgetting the whole
    // dedup history and silently re-admitting duplicates is the
    // worst possible failure mode, so schema errors propagate
    // (ADVICE r4, same rule as NearDupRegistry.read).
    if (!RegistryIO.committedDataExists(spark, path)) empty
    else {
      val d = spark.read.parquet(path)
      require(d.columns.contains("fp"),
        s"DedupRegistry at $path exists but has no 'fp' column " +
          s"(found: ${d.columns.mkString(", ")}) — refusing to treat " +
          "a corrupt registry as empty")
      d.select("fp")
    }
  }

  /** Dedup `batch` against the registry AND within itself, persist
    * the survivors via `persist`, THEN append their fingerprints, and
    * return the surviving rows (original schema). `fingerprint` is
    * any deterministic Column over the batch's columns (content md5,
    * minhash band key, simhash...).
    *
    * WRITE ORDER is the delivery guarantee: the corpus sink runs
    * BEFORE the registry append, so a crash between the two replays
    * the batch as duplicates (at-least-once, fixable downstream) —
    * never as silent loss. Registering first would make any failure
    * before the sink drop those documents FOREVER: the replay
    * anti-joins against its own fingerprints and returns nothing. */
  def dedupAppend(batch: DataFrame, idCol: String, fingerprint: Column,
                  persist: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = batch.sparkSession
    val fpCol = "_reg_fp"
    require(!batch.columns.contains(fpCol),
      s"DedupRegistry: batch must not contain reserved column $fpCol")
    val withFp = batch.withColumn(fpCol, fingerprint)
    // in-batch winners: smallest id per fingerprint
    val inBatch = Dedup.exactDedup(withFp, idCol, col(fpCol)).select(col(idCol))
    val winners = withFp.join(inBatch, Seq(idCol), "left_semi")
    // registry probe: drop fingerprints seen in ANY earlier batch
    val fresh = winners.join(
      read(spark).withColumnRenamed("fp", fpCol),
      Seq(fpCol), "left_anti")
    // Materialize BEFORE appending: the survivors plan reads the
    // registry it is about to extend (same recache hazard as the
    // notification log, SURVEY.md §7 risk 6).
    val pinned = fresh.localCheckpoint(true)
    val out = pinned.drop(fpCol)
    persist(out)
    pinned.select(col(fpCol).as("fp"))
      .write.mode("append").parquet(path)
    out
  }
}
