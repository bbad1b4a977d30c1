package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CONTINUOUS-ingest PARTIAL-OVERLAP gate: a winnowed-fingerprint
  * registry persisted across runs — the NearDupRegistry loop for
  * passage-level contamination (q174's decontamination made
  * incremental). The registry holds (id, h) SELECTED fingerprints
  * only — ~2/w of each accepted doc's grams, never the corpus — in a
  * bucketed-by-hash external table, so a batch probe is a join of
  * the (small, broadcast) batch fingerprints against a precomputed
  * index scan: the registry side is never re-fingerprinted and never
  * shuffled, and per-batch cost is proportional to the BATCH, not to
  * history (the Bucketing.scala write-once discipline).
  *
  * The winnowing guarantee carries across runs: any new doc sharing
  * a passage of >= w + n - 1 tokens with ANY accepted doc shares at
  * least one selected fingerprint; `minShared >= 2` requires two
  * independently selected windows (a longer or repeated overlap).
  * In-batch overlaps resolve FIRST via connected components over the
  * in-batch shared-fingerprint pair graph (min-id representative —
  * the NearDupRegistry chain-safety rule).
  *
  * Replay convergence: survivors' fingerprints are registered LAST,
  * so an at-least-once replay finds its own fingerprints in the
  * index, self-matches, and returns empty (spec-asserted).
  *
  * A registry's fingerprints are meaningless under different (n, w):
  * the parameters are pinned in a sidecar file at first use and
  * re-opening with different values fails loudly (the numPerm-guard
  * rule).
  */
class WinnowRegistry(path: String, n: Int, w: Int, minShared: Int,
                     nBuckets: Int = 8) {
  require(n >= 1 && w >= 1 && minShared >= 1,
    "WinnowRegistry: n, w, minShared must be positive")

  /** The persisted fingerprint index: a bucketed table with the
    * GenIndex generation lifecycle, giving compaction AND `forget`
    * a rewrite path with no forget-history crash window (the old
    * in-place INSERT OVERWRITE could lose the whole index to a
    * crash between delete and rewrite). */
  private[operators] val index = new GenIndex(
    GenIndex.tableBaseFor("graft_winnow_idx_", path),
    path + "_fp_idx", "id BIGINT, h BIGINT", Seq("h"), nBuckets)
  /** Where the bucketed fingerprint-index files currently live
    * (generation-aware; public so specs can assert the persistence). */
  def indexLocation(spark: SparkSession): String = index.activeLocation(spark)

  private def paramsPath = new org.apache.hadoop.fs.Path(path + "_params")

  /** Pin (n, w) at first use; fail loudly on mismatch later. */
  private def checkParams(spark: SparkSession): Unit = {
    val fs = paramsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val expect = s"n=$n,w=$w"
    if (fs.exists(paramsPath)) {
      val in = fs.open(paramsPath)
      val got = try scala.io.Source.fromInputStream(in).mkString.trim
      finally in.close()
      require(got == expect,
        s"WinnowRegistry at $path was written with ($got) but opened " +
          s"with ($expect) — fingerprints are not comparable across " +
          "gram/window widths")
    } else {
      val out = fs.create(paramsPath, true)
      try out.write(expect.getBytes("UTF-8")) finally out.close()
    }
  }

  private def ensureIndex(spark: SparkSession): Unit = index.ensure(spark)

  /** Maintenance: rewrite the fingerprint index into ~nBuckets files
    * when per-batch appends have fragmented it past `maxFiles`.
    * Probe results are unchanged (same rows, same bucket layout);
    * crash-safe by the GenIndex generation-swap contract. */
  def compactIndex(spark: SparkSession,
                   maxFiles: Int = 4 * nBuckets): Boolean = {
    checkParams(spark)
    index.compact(spark, maxFiles)
  }

  /** Gate a batch: drop docs sharing >= minShared selected
    * fingerprints with the registry (or with a surviving in-batch
    * peer), register the survivors' fingerprints, return the
    * surviving batch rows. */
  def dedupAppend(batch: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val spark = batch.sparkSession
    checkParams(spark)
    ensureIndex(spark)
    val fps = Winnow.fingerprints(batch, idCol, textCol, n, w)
      .select(col("id"), col("h")).distinct()
      .localCheckpoint(false)
    // 1. in-batch: CC over the shared-fingerprint pair graph, keep
    //    the min-id representative per component
    val pairs = Winnow.sharedPairs(fps, minShared)
      .select(col("id_a"), col("id_b"))
    val dropInBatch = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("cluster")).select("id")
    val inBatchKept = fps.join(dropInBatch, Seq("id"), "left_anti")
    // 2. cross-run: probe the bucketed index — count DISTINCT batch
    //    fingerprints present in the registry (any historical doc).
    //    A never-written index short-circuits to "no hits" without
    //    planning the scan (VERDICT r8 #6: the parquet read over an
    //    absent location logs a FileNotFoundException WARN stack per
    //    probe — listing noise that buries real warnings).
    val keptIds = (if (!RegistryIO.committedDataExists(spark,
        index.activeLocation(spark))) inBatchKept.select("id").distinct()
      else {
        val regHits = inBatchKept
          .join(index.df(spark).select(col("h")).distinct(), Seq("h"),
            "left_semi")
          .groupBy("id").agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= minShared).select("id")
        inBatchKept.select("id").distinct()
          .join(regHits, Seq("id"), "left_anti")
      }).localCheckpoint(true)
    // 3. register survivors' fingerprints LAST (replay self-matches)
    index.append(fps.join(keptIds, Seq("id"), "left_semi"))
    batch.join(keptIds.withColumnRenamed("id", idCol), Seq(idCol), "left_semi")
  }

  /** Right-to-be-forgotten: remove the given doc ids' fingerprints
    * from the index, so content equal or near-equal to a forgotten
    * doc is admissible again. The rewrite is a full filter pass over
    * the index — the honest cost of deletion in an append-optimized
    * layout — landed as a GenIndex generation swap, so a crash
    * leaves the pre-forget index fully active (the old in-place
    * overwrite could lose the whole index between delete and
    * rewrite). */
  def forget(spark: SparkSession, ids: Seq[Long]): Unit = {
    checkParams(spark)
    ensureIndex(spark)
    index.rewrite(spark, _.filter(!col("id").isin(ids: _*)))
  }
}
