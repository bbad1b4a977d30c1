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
  * Probe plan shape (the q145 discipline, cross-run): the registry's
  * LSH band index is PERSISTED — a bucketed-by-(band, band_key)
  * external table at `<path>_band_idx`, appended in the same call
  * that registers signatures — so a probe is a join of the (small,
  * broadcast) batch bands against a precomputed index scan: the
  * registry side is never re-banded and never shuffled, and per-batch
  * probe cost is proportional to the BATCH, not to history (VERDICT
  * r4 #1; the Bucketing.scala write-once-join-forever discipline).
  * When a batch is too big to broadcast, the bucketed layout still
  * holds: a sort-merge probe shuffles only the batch side, into the
  * index's bucketing. Only band-key matches are verified, by an exact
  * integer agreement count over the two signatures. In-batch
  * near-dups resolve FIRST via connected components over the in-batch
  * pair graph (keep the min-id representative per cluster — near-dup
  * similarity is not transitive, so a pairwise greedy drop could
  * orphan a chain).
  *
  * WRITE ORDER is the delivery guarantee, exactly as DedupRegistry:
  * survivors flow to the corpus sink BEFORE their signatures are
  * registered, and the band index — the table probes gate on — is
  * written LAST, so a crash anywhere in between replays the batch as
  * at-least-once: whatever the index saw self-matches and returns
  * empty (asserted by spec), whatever it missed is re-processed and
  * re-registered. A legacy or crash-windowed EMPTY index heals itself
  * from the signature registry (one re-band, paid once).
  */
class NearDupRegistry(path: String, numPerm: Int, bands: Int,
                      rowsPerBand: Int, simThreshold: Double,
                      nBuckets: Int = 8, sigMode: String = "minhash") {
  require(bands * rowsPerBand == numPerm,
    s"NearDupRegistry: bands($bands) * rowsPerBand($rowsPerBand) != numPerm($numPerm)")
  require(simThreshold > 0 && simThreshold <= 1,
    "NearDupRegistry: simThreshold must be in (0, 1]")
  // "media:*" modes are constructed ONLY by MediaDupRegistry (same
  // banded core, quantized-bucket signatures): the text entry points
  // below refuse them, and the sidecar pin keeps a media registry and
  // a text registry from ever being opened as each other
  require(sigMode == "minhash" || sigMode == "oph" ||
      sigMode.startsWith("media:"),
    s"NearDupRegistry: sigMode must be 'minhash', 'oph', or 'media:*' " +
      s"(MediaDupRegistry-constructed), got '$sigMode'")

  /** Signature scheme sidecar: "minhash" (k independent permutation
    * mins) and "oph" (one-permutation-hashing with rotation
    * densification, 32x cheaper to compute — q184/q185) produce
    * SAME-SHAPE but INCOMPATIBLE signatures: probing one with the
    * other silently under-counts agreement and forgets dup history.
    * The mode is pinned on first use and a mismatched open fails
    * loudly (the EmbedDedupRegistry centroid-fingerprint rule). A
    * registry with committed signatures but NO sidecar predates the
    * mode knob and is minhash by definition. */
  private val modePath = path + "_sig_mode"
  private var modeChecked = false
  private def ensureMode(spark: SparkSession): Unit = if (!modeChecked) {
    val conf = spark.sparkContext.hadoopConfiguration
    val mp = new org.apache.hadoop.fs.Path(modePath)
    val fs = mp.getFileSystem(conf)
    val stored: Option[String] =
      if (fs.exists(mp)) {
        val in = fs.open(mp)
        Some(try new String(in.readAllBytes(), "UTF-8").trim finally in.close())
      } else if (RegistryIO.committedDataExists(spark, path)) Some("minhash")
      else None
    stored match {
      case Some(m) =>
        require(m == sigMode,
          s"NearDupRegistry at $path was built with sigMode=$m; opening it " +
            s"with sigMode=$sigMode would silently miss near-dups — use the " +
            "original mode, or start a new registry path")
      case None =>
        // pin the mode BEFORE any signature lands: a crash after this
        // write but before the first append leaves a sidecar with no
        // data — harmless (the next run re-asserts the same mode).
        // Atomic via the RegistryIO.SwapStore seam.
        RegistryIO.atomicWriteLines(fs, modePath, Seq(sigMode))
    }
    modeChecked = true
  }

  /** The registry's signature function under the pinned mode — both
    * return (id, sig array<bigint> of length numPerm) over one
    * shingle pass; the band layout and the exact integer agreement
    * verdict downstream are scheme-agnostic (OPH slot collisions
    * estimate jaccard like permutation mins do — recall measured by
    * q185/q193, not assumed). */
  private def signatures(sh: DataFrame): DataFrame = sigMode match {
    case "oph" => Dedup.ophSignaturesFromShingles(sh, numPerm)
      .select("id", "sig")
    case m if m.startsWith("media:") => throw new IllegalArgumentException(
      s"NearDupRegistry at $path is a media-fingerprint registry " +
        "(use MediaDupRegistry's probe/dedupAppend, not the text entry points)")
    case _ => Dedup.minhashSignaturesFromShingles(sh, numPerm)
  }

  /** Minimum agreeing permutations for a near-dup verdict (exact
    * integer compare — no double division in the hot predicate). */
  private val minAgree: Int = math.ceil(simThreshold * numPerm).toInt

  /** The persisted band index: a bucketed table with the GenIndex
    * generation lifecycle (compaction without a forget-history crash
    * window). Catalog name derives from the registry path (the
    * catalog is global — two registries must not collide on one
    * table; the Bucketing.scala tag discipline). nBuckets is NOT
    * part of the identity: an existing index keeps its layout; size
    * it for the target cluster up front. */
  private[operators] val index = new GenIndex(
    GenIndex.tableBaseFor("graft_neardup_idx_", path),
    path + "_band_idx",
    "id BIGINT, sig ARRAY<BIGINT>, band INT, band_key STRING",
    Seq("band", "band_key"), nBuckets)
  /** Where the bucketed band-index files currently live (generation-
    * aware; public so operability specs/tools can assert the index is
    * really persisted). */
  def indexLocation(spark: SparkSession): String = index.activeLocation(spark)

  /** One-time-per-instance index bootstrap: re-register the external
    * table (an in-memory catalog forgets bucket metadata across JVMs;
    * the files keep it), then heal an empty index from the signature
    * registry — covers both a legacy registry written before the
    * index existed and a crash between the sig and index appends on
    * the FIRST batch (later crash windows converge via replay). */
  private var indexReady = false
  private def ensureIndex(spark: SparkSession): Unit = {
    index.ensure(spark)
    if (!indexReady) {
      // committedDataExists, not a scan-and-isEmpty (VERDICT r8 #6):
      // planning a parquet read over a never-written index location
      // logs a FileNotFoundException WARN stack per probe (HadoopFS
      // listing noise that buries real warnings); the cheap listing
      // check answers the same question silently. An index dir with
      // committed data is never "empty" in the heal sense.
      if (!RegistryIO.committedDataExists(spark, index.activeLocation(spark))) {
        val sigs = read(spark)
        if (!sigs.isEmpty) appendToIndex(sigs)
      }
      indexReady = true
    }
  }

  private def appendToIndex(sigs: DataFrame): Unit =
    index.append(bandRows(sigs).select("id", "sig", "band", "band_key"))

  /** Maintenance: rewrite the band index into ~nBuckets files when
    * per-batch appends have fragmented it past `maxFiles`. Probe
    * results are unchanged (same rows, same bucket layout) and a
    * crash leaves the old index fully active — the GenIndex
    * generation-swap contract. Returns whether a rewrite ran. */
  def compactIndex(spark: SparkSession,
                   maxFiles: Int = 4 * nBuckets): Boolean = {
    ensureIndex(spark)
    index.compact(spark, maxFiles)
  }

  def read(spark: SparkSession): DataFrame = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, sig ARRAY<BIGINT>"))
    // Never-committed is the ONLY silent-empty case (first run, or a
    // crashed first append's _temporary-only dir — the shared
    // RegistryIO policy); a registry with committed data but a
    // wrong/missing column must fail loudly, not forget the whole
    // dedup history (ADVICE r4) — so schema errors from the select
    // below propagate.
    if (!RegistryIO.committedDataExists(spark, path)) empty
    else spark.read.parquet(path).select(col("id"), guardedSig(col("sig")))
  }

  /** A registry/index written with a different numPerm must fail
    * loudly, not silently estimate with mixed permutations (the
    * SketchRegistry merge-guard rule). */
  private def guardedSig(sig: Column): Column =
    when(size(sig) === numPerm, sig)
      .otherwise(raise_error(concat(
        lit(s"NearDupRegistry: signature length != numPerm=$numPerm for id "),
        col("id")))).as("sig")

  /** LSH band keys of a signature column — the shared Dedup band
    * rule (one definition; the index layout depends on the key
    * staying byte-stable). */
  private def bandRows(sigs: DataFrame): DataFrame =
    Dedup.sigBandRows(sigs, bands, rowsPerBand)

  /** Exact integer count of agreeing permutations. */
  private def agreement(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), p => p))

  /** ids among `sigs` (id, sig) that near-match ANY registered
    * signature: batch bands BROADCAST (the batch is the small side by
    * contract) against the persisted index scan — zero Exchange and
    * zero banding work on the registry side. */
  private def matchedIds(spark: SparkSession, sigs: DataFrame): DataFrame = {
    ensureIndex(spark)
    // a probe against a still-unwritten index short-circuits to the
    // typed empty answer BEFORE planning the scan (VERDICT r8 #6):
    // the parquet read over an absent location is correct (zero rows)
    // but logs a FileNotFoundException WARN stack per probe. ensureIndex
    // just ran, so "no committed data" here really means empty history.
    // the empty answer derives its type from the REAL probe plan
    // (bandRows over this batch), not a hardcoded DDL literal — if a
    // family member ever produces non-long ids, the never-written-
    // index branch stays type-identical to the scan branch (ADVICE r9)
    if (!RegistryIO.committedDataExists(spark, index.activeLocation(spark)))
      bandRows(sigs).select(col("id")).limit(0)
    else {
      val reg = index.df(spark).select(
        col("band"), col("band_key"), guardedSig(col("sig")).as("reg_sig"))
      reg.join(broadcast(bandRows(sigs)), Seq("band", "band_key"))
        .filter(agreement(col("sig"), col("reg_sig")) >= minAgree)
        .select("id").distinct()
    }
  }

  /** Near-dup check WITHOUT admission: the ids in `batch` whose text
    * near-matches anything ever registered. Read-only — the probe a
    * serving layer runs before deciding anything. */
  def probe(batch: DataFrame, idCol: String, textCol: String,
            n: Int = 3): DataFrame = {
    ensureMode(batch.sparkSession)
    val sigs = signatures(Dedup.shingleSets(batch, idCol, textCol, n))
    probeFromSignatures(batch.sparkSession, sigs).select(col("id").as(idCol))
  }

  /** The probe over an already-built (id, sig) frame — the
    * signature-agnostic core (MediaDupRegistry routes its quantized
    * bucket fingerprints through here; the text probe above is the
    * shingle-signature instantiation). */
  private[operators] def probeFromSignatures(spark: SparkSession,
                                             sigs: DataFrame): DataFrame = {
    ensureMode(spark)
    matchedIds(spark, sigs)
  }

  /** Near-dup-gate `batch` against the registry AND within itself,
    * hand the surviving rows (original schema) to `persist`, THEN
    * register their signatures and extend the band index, and return
    * the survivors. */
  def dedupAppend(batch: DataFrame, idCol: String, textCol: String,
                  n: Int = 3,
                  persist: DataFrame => Unit = _ => ()): DataFrame =
    dedupAppendFromSignatures(batch, idCol,
      signatures(Dedup.shingleSets(batch, idCol, textCol, n)), persist)

  /** dedupAppend with the corpus sink made IDEMPOTENT PER BATCH — the
    * EmbedDedupRegistry.dedupAppendBatch contract on the lexical
    * member: survivors land at `sinkPath/batch_id=<batchId>/` by
    * dynamic-partition overwrite, so an at-least-once replay of the
    * SAME (batch, batchId) leaves exactly one copy of every surviving
    * row whether the crash hit before or after the signature append.
    * Replay before the append is deterministic (same registry state →
    * same in-batch CC representatives → same survivor set → same
    * partition, overwritten); replay after it self-matches COMPLETELY
    * (a registered signature agrees with itself on every permutation,
    * so agreement = numPerm >= minAgree with no zero-norm analogue),
    * the survivor set is empty, and an empty dynamic overwrite
    * touches no partitions — the first run's rows stand. `batchId` is
    * the caller's ingest sequence number (foreachBatch's id). */
  def dedupAppendBatch(batch: DataFrame, idCol: String, textCol: String,
                       sinkPath: String, batchId: Long,
                       n: Int = 3): DataFrame = {
    // batch_id is reserved (the EmbedDedupRegistry rule, case-
    // insensitive like Spark's resolution): the sink keys its
    // partitions on a batch_id column it adds, so a data column of
    // that name would be silently clobbered in the sink
    require(!batch.columns.exists(_.equalsIgnoreCase("batch_id")),
      "NearDupRegistry.dedupAppendBatch: batch must not contain a " +
        "batch_id column (the idempotent sink keys its partitions on it)")
    dedupAppend(batch, idCol, textCol, n,
      persist = out =>
        graft.streaming.IdempotentSink.parquetByBatch(sinkPath)(out, batchId))
  }

  /** dedupAppend over an already-built (id, sig) frame — the
    * signature-agnostic core shared with MediaDupRegistry. `sigs0`
    * must hold one length-numPerm signature per batch id. */
  private[operators] def dedupAppendFromSignatures(
      batch: DataFrame, idCol: String, sigs0: DataFrame,
      persist: DataFrame => Unit): DataFrame = {
    val spark = batch.sparkSession
    ensureMode(spark)
    // one signature pass; it feeds in-batch pairs AND the registry
    // probe (multi-consumer rule)
    val sigs = Dedup.DefaultMaterialize(sigs0)
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
    val matched = matchedIds(spark, reps)
    // pin BEFORE the appends below: the survivors plan reads the
    // index it is about to extend (the DedupRegistry recache rule)
    val fresh = reps.join(matched, Seq("id"), "left_anti")
      .localCheckpoint(true)

    val out = batch.join(fresh.select(col("id").as(idCol)), Seq(idCol), "left_semi")
    persist(out)
    fresh.write.mode("append").parquet(path)
    appendToIndex(fresh)
    out
  }
}
