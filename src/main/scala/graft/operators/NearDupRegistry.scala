package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CONTINUOUS-ingest NEAR-dup gate: a parquet-backed MinHash
  * signature registry persisted across runs — DedupRegistry's loop
  * for near-duplicates. Every new batch is near-dup-checked against
  * everything ever accepted WITHOUT the historical corpus: the
  * registry holds (id, sig) only, and signature agreement
  * (n_agree / numPerm, the q102/q132 estimator) stands in for exact
  * Jaccard.
  *
  * Probe plan shape (the q145 discipline, cross-run): batch
  * signatures band into LSH keys; band keys join the registry's band
  * index (derived here; at scale persist it bucketed by
  * (band, band_key) and this probe becomes a co-located join); only
  * band-key matches are verified, by an exact integer agreement
  * count over the two signatures. In-batch near-dups resolve FIRST
  * via connected components over the in-batch pair graph (keep the
  * min-id representative per cluster — near-dup similarity is not
  * transitive, so a pairwise greedy drop could orphan a chain).
  *
  * WRITE ORDER is the delivery guarantee, exactly as DedupRegistry:
  * survivors flow to the corpus sink BEFORE their signatures are
  * registered, so a crash between the two replays the batch as
  * at-least-once — and the replay self-matches its own registered
  * signatures, returning empty instead of duplicating (asserted by
  * spec).
  */
class NearDupRegistry(path: String, numPerm: Int, bands: Int,
                      rowsPerBand: Int, simThreshold: Double) {
  require(bands * rowsPerBand == numPerm,
    s"NearDupRegistry: bands($bands) * rowsPerBand($rowsPerBand) != numPerm($numPerm)")
  require(simThreshold > 0 && simThreshold <= 1,
    "NearDupRegistry: simThreshold must be in (0, 1]")

  /** Minimum agreeing permutations for a near-dup verdict (exact
    * integer compare — no double division in the hot predicate). */
  private val minAgree: Int = math.ceil(simThreshold * numPerm).toInt

  def read(spark: SparkSession): DataFrame = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, sig ARRAY<BIGINT>"))
    // Path-not-found is the ONLY silent-empty case (first run); a
    // registry that EXISTS with a wrong/missing column must fail
    // loudly, not forget the whole dedup history (ADVICE r4) — so
    // schema errors from the select below propagate.
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) empty
    else spark.read.parquet(path).select(col("id"),
      // a registry written with a different numPerm must fail
      // loudly, not silently estimate with mixed permutations
      // (the SketchRegistry merge-guard rule)
      when(size(col("sig")) === numPerm, col("sig"))
        .otherwise(raise_error(concat(
          lit(s"NearDupRegistry: signature length != numPerm=$numPerm for id "),
          col("id")))).as("sig"))
  }

  /** LSH band keys of a signature column: band b (0-based) hashes
    * elements b*rowsPerBand+1 .. (b+1)*rowsPerBand (1-based). */
  private def bandRows(sigs: DataFrame): DataFrame = {
    val keys = (0 until bands).map { b =>
      val cols = (b * rowsPerBand + 1 to (b + 1) * rowsPerBand)
        .map(j => element_at(col("sig"), j).cast("string"))
      md5(concat_ws(",", cols: _*))
    }
    sigs.select(col("id"), col("sig"), posexplode(array(keys: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
  }

  /** Exact integer count of agreeing permutations. */
  private def agreement(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), p => p))

  /** Near-dup-gate `batch` against the registry AND within itself,
    * hand the surviving rows (original schema) to `persist`, THEN
    * register their signatures, and return the survivors. */
  def dedupAppend(batch: DataFrame, idCol: String, textCol: String,
                  n: Int = 3,
                  persist: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = batch.sparkSession
    // one shingle pass; signatures feed in-batch pairs AND the
    // registry probe (multi-consumer rule)
    val sigs = Dedup.DefaultMaterialize(
      Dedup.minhashSignaturesFromShingles(
        Dedup.shingleSets(batch, idCol, textCol, n), numPerm))
    val batchBands = Dedup.DefaultMaterialize(bandRows(sigs))

    // in-batch: LSH candidates -> agreement verify -> connected
    // components -> min-id representative per near-dup cluster
    val inPairs = batchBands.as("a").join(batchBands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .filter(agreement(col("sig_a"), col("sig_b")) >= minAgree)
      .select("id_a", "id_b")
    val clusters = Dedup.connectedComponents(inPairs)
    val reps = sigs.join(clusters, Seq("id"), "left")
      .filter(col("cluster").isNull || col("cluster") === col("id"))
      .select("id", "sig")

    // registry probe: representatives matching ANY registered
    // signature on a band key with enough agreement are dropped
    val regBands = bandRows(read(spark))
      .select(col("id").as("reg_id"), col("band"), col("band_key"),
        col("sig").as("reg_sig"))
    val matched = bandRows(reps).join(regBands, Seq("band", "band_key"))
      .filter(agreement(col("sig"), col("reg_sig")) >= minAgree)
      .select("id").distinct()
    // pin BEFORE the append below: the survivors plan reads the
    // registry it is about to extend (the DedupRegistry recache rule)
    val fresh = reps.join(matched, Seq("id"), "left_anti")
      .localCheckpoint(true)

    val out = batch.join(fresh.select(col("id").as(idCol)), Seq(idCol), "left_semi")
    persist(out)
    fresh.write.mode("append").parquet(path)
    out
  }
}
