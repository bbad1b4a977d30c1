package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CROSS-RUN SEMANTIC near-dup registry — the embedding analogue of
  * NearDupRegistry, completing the registry family (exact content:
  * DedupRegistry; lexical near-dup: NearDupRegistry; passage
  * overlap: WinnowRegistry; semantic: this). A parquet store of
  * every accepted vector's signature — (id, vq int8 vector, nq its
  * squared norm) PARTITIONED BY IVF cell — so a new batch dedups
  * against everything ever accepted at cluster-blocked cost:
  *
  *  1. in-batch semantic dups resolve FIRST (Similarity.semDedup,
  *     the SemDeDup keep rule) so one batch can never register two
  *     copies;
  *  2. survivors probe ONLY their own cells of the registry — the
  *     batch's cell set is a bounded literal IN list (<= |centroids|
  *     by contract, the ivfTopKPartitioned argument), so the scan is
  *     directory-pruned and history size enters through a columnar
  *     read of the probed cells only, never a shuffle of the
  *     registry;
  *  3. the eps decision is an exact integer cross-multiply over
  *     int8 dots — qdot >= 0 AND qdot^2 * 10^6 >= eps_pm^2 * nq_a *
  *     nq_b — no doubles, no rounding hazard (exact for dim <= ~180
  *     at int8: qdot^2*10^6 <= 2.6e14*dim^2 must stay under 2^63);
  *  4. fresh signatures append, partitioned by cell.
  *
  * The centroid set is part of the registry's IDENTITY (the numPerm
  * lesson, NearDupRegistry): probing with centroids other than the
  * ones the registry was built with silently misses cross-cell
  * neighbors. The first append pins a centroid fingerprint in a
  * sidecar; later appends refuse on mismatch with raise_error
  * semantics rather than degrading recall quietly.
  *
  * WRITE ORDER is the delivery guarantee (DedupRegistry's rule): the
  * corpus sink runs BEFORE the signature append, never the reverse —
  * so a crash can only ever duplicate, never silently lose. The
  * at-least-once window is ASYMMETRIC (ADVICE r5): a crash AFTER the
  * signature append replays with every row matched (the replay
  * self-dedups, zero duplicates), but a crash BETWEEN persist() and
  * the append replays with NO registry match — under a blind
  * append-mode persist the whole surviving batch double-lands in the
  * corpus sink. `dedupAppendBatch` CLOSES that window (VERDICT r6
  * #4): it routes the sink through the streaming/IdempotentSink
  * batch-id layout (overwrite `sinkPath/batch_id=<id>/`, dynamic
  * partition mode), so the replay — whose survivor set is
  * deterministic given the same batch and registry state — lands on
  * its own partition byte-identically and delivery is exactly-once.
  * The raw `persist` callback remains for sinks with their own
  * idempotence story.
  *
  * REFIT lifecycle: `refit(newCentroids)` migrates the registry to a
  * larger fitted centroid set as the corpus grows (the corpus-derived
  * cell-count discipline — a registry born at 12 cells must not pin
  * its whole lifetime to 12). Stored int8 signatures are re-assigned
  * to their nearest NEW centroid (dequantized at /127 — exact for
  * every representable signature; assignment can differ from the
  * original float's only within quantization distance of a cell
  * border, the same approximation the int8 eps test already accepts),
  * rewritten partitioned by new cell into a GENERATION directory, and
  * the fingerprint sidecar — now (fp, dataDir) — is swapped by an
  * atomic rename. A crash anywhere before the swap leaves the old
  * generation fully active; after it, the new one. The old data dir
  * is deleted only after the swap (best-effort; an orphaned
  * generation is garbage, never corruption).
  */
class EmbedDedupRegistry(path: String, epsPermille: Int) {
  require(epsPermille > 0 && epsPermille < 1000,
    "EmbedDedupRegistry: epsPermille must be in (0, 1000)")

  private val metaPath = path + "_centroid_fp"

  /** Sidecar state: centroid fingerprint + active data directory.
    * Legacy single-line sidecars (fp only) resolve to `path`. */
  private def readMeta(fs: org.apache.hadoop.fs.FileSystem): Option[(String, String)] = {
    val mp = new org.apache.hadoop.fs.Path(metaPath)
    if (!fs.exists(mp)) None
    else {
      val in = fs.open(mp)
      val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val lines = txt.split("\n", 2)
      Some((lines(0).trim, if (lines.length > 1 && lines(1).trim.nonEmpty) lines(1).trim else path))
    }
  }

  /** Atomic sidecar replace: write a tmp file, rename OVERWRITE onto
    * the live name — readers see the old pointer or the new one,
    * never a partial write. */
  private def writeMeta(spark: SparkSession, fp: String, dataDir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val mp = new org.apache.hadoop.fs.Path(metaPath)
    val fs = mp.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(
      metaPath + ".tmp-" + java.util.UUID.randomUUID().toString)
    val os = fs.create(tmp, false)
    try os.write(s"$fp\n$dataDir".getBytes("UTF-8")) finally os.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(tmp.toUri, conf)
    fc.rename(tmp, mp, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The active data directory (sidecar pointer, default `path`). */
  private def activeDir(fs: org.apache.hadoop.fs.FileSystem): String =
    readMeta(fs).map(_._2).getOrElse(path)

  /** Bounded collect (k rows by contract): a stable fingerprint of
    * the centroid set — ids and float-exact vector values, sorted —
    * plus the vector dimension (for the overflow guard). */
  private def centroidInfo(centroids: DataFrame,
                           idCol: String, vecCol: String): (String, Int) = {
    val rows = centroids
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .collect()
    require(rows.nonEmpty, "EmbedDedupRegistry: centroid set is empty")
    val keys = rows.map(r => s"${r.getLong(0)}:${r.getSeq[Float](1).mkString(",")}").sorted
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(keys.mkString(";").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (fp, rows.head.getSeq[Float](1).length)
  }

  /** Registry signatures, or empty before the first COMMITTED append
    * (the shared RegistryIO policy — a crashed first append's
    * _temporary-only dir is still "never written", and the
    * documented replay contract must be able to run). A registry
    * with committed data that cannot be read is corruption and
    * propagates (the fail-loudly rule: forgetting semantic history
    * re-admits every near-dup). */
  def read(spark: SparkSession): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = activeDir(fs)
    if (!RegistryIO.committedDataExists(spark, dir))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "id BIGINT, vq ARRAY<INT>, nq BIGINT, cell BIGINT"))
    else {
      val d = spark.read.parquet(dir)
      val missing = Seq("id", "vq", "nq", "cell").filterNot(d.columns.contains)
      require(missing.isEmpty,
        s"EmbedDedupRegistry at $dir exists but lacks ${missing.mkString(", ")} " +
          "— refusing to treat a corrupt registry as empty")
      // partition-column type inference may narrow cell to INT;
      // normalize so the empty and non-empty schemas agree
      d.select(col("id"), col("vq"), col("nq"), col("cell").cast("long"))
    }
  }

  /** Dedup `batch` against the registry AND within itself (SemDeDup
    * keep rule in-batch; history wins cross-run), persist survivors
    * via `persist`, THEN append their signatures. Returns the
    * surviving rows with the batch's original schema. */
  def dedupAppend(batch: DataFrame, centroids: DataFrame,
                  idCol: String, vecCol: String,
                  persist: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = batch.sparkSession
    // reserved columns (the DedupRegistry _reg_fp rule): a batch
    // carrying vq/nq/cell would be silently clobbered or fail with
    // an ambiguous-column error deep in the plan
    val reserved = Seq("vq", "nq", "cell").filter(batch.columns.contains)
    require(reserved.isEmpty,
      s"EmbedDedupRegistry: batch must not contain reserved column(s) ${reserved.mkString(", ")}")
    val (fp, dim) = centroidInfo(centroids, idCol, vecCol)
    // the eps test is exact only while qdot^2 * 10^6 < 2^63; at int8
    // qdot <= 16129*dim, so dim must stay under ~180 — enforce the
    // documented bound instead of wrapping negative silently
    require(dim <= 180,
      s"EmbedDedupRegistry: dim=$dim overflows the exact int64 eps test " +
        "(max ~180 at int8) — rescale or shard the comparison")
    val mp = new org.apache.hadoop.fs.Path(metaPath)
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    readMeta(fs).foreach { case (stored, _) =>
      require(stored == fp,
        s"EmbedDedupRegistry at $path was built with centroid set $stored; " +
          s"probing with $fp would silently miss cross-cell near-dups — " +
          "refit(newCentroids) to migrate, or pass the original centroids")
    }

    // 1. in-batch semantic dedup (cluster-blocked, SemDeDup keep rule)
    val sd = Similarity.semDedup(batch, centroids, idCol, vecCol,
      eps = epsPermille / 1000.0)
    val keptCells = sd.filter(col("kept"))
      .select(col("id"), col("cell"))
    // winners feeds three consumers (the cells collect, and both the
    // left side and the matched subtree of `fresh`) — materialize
    // once (lazy localCheckpoint: realized by the collect, no extra
    // job) or the semDedup-join + quantize pipeline runs per consumer
    val winners = Dedup.DefaultMaterialize(batch.join(
        keptCells.withColumnRenamed("id", idCol), Seq(idCol), "inner")
      .withColumn("vq", Similarity.quantize8(col(vecCol)))
      .withColumn("nq", Similarity.dotQ8(col("vq"), col("vq"))))

    // 2. probe ONLY the batch's cells of the registry (bounded
    // literal IN list -> directory-pruned scan; same contract as
    // ivfTopKPartitioned's probe-cell collect)
    val cells = winners.select("cell").distinct().collect().map(_.getLong(0))
    val reg = read(spark).filter(col("cell").isin(cells: _*))
      .select(col("vq").as("rvq"), col("nq").as("rnq"), col("cell"))
    val e2 = epsPermille.toLong * epsPermille
    val matched = winners
      .join(reg, Seq("cell"))
      .withColumn("qdot", Similarity.dotQ8(col("vq"), col("rvq")))
      // STRICT qdot > 0: a zero-norm signature (near-zero embedding
      // quantizes to all zeros, nq = 0) yields qdot = 0 against
      // everything, and `0 >= e2*nq*0` would mark every future
      // vector in its cell as a dup — one degenerate embedding must
      // not silently poison a cell. cos >= eps > 0 implies qdot > 0
      // for any real match, so nothing true is lost.
      .filter(col("qdot") > 0 &&
        col("qdot") * col("qdot") * 1000000L >= lit(e2) * col("nq") * col("rnq"))
      .select(col(idCol)).distinct()
    val fresh = winners.join(matched, Seq(idCol), "left_anti")

    // 3. pin BEFORE appending (the plan reads the registry it is
    // about to extend — the recache hazard), sink first, then append
    val pinned = fresh.localCheckpoint(true)
    val out = pinned.drop("vq", "nq", "cell")
    persist(out)
    if (readMeta(fs).isEmpty) writeMeta(spark, fp, path)
    pinned.select(col(idCol).as("id"), col("vq"), col("nq"), col("cell"))
      .write.mode("append").partitionBy("cell").parquet(activeDir(fs))
    out
  }

  /** ANN top-k served DIRECTLY from the registry's persisted int8
    * signature store — every vector ever accepted is probeable
    * without re-reading or re-quantizing the corpus (the
    * Similarity.ivfQuantizedTopKFromSignatures shape over read()).
    * The centroid set must be the registry's pinned identity — same
    * guard as dedupAppend: probing a cell layout with foreign
    * centroids silently misses cross-cell neighbors. q208 measures
    * this probe's recall across a refit. */
  def probeTopK(queries: DataFrame, centroids: DataFrame,
                idCol: String, vecCol: String, k: Int,
                nprobe: Int = 1): DataFrame = {
    val spark = queries.sparkSession
    val (fp, _) = centroidInfo(centroids, idCol, vecCol)
    val fs = new org.apache.hadoop.fs.Path(metaPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    readMeta(fs).foreach { case (stored, _) =>
      require(stored == fp,
        s"EmbedDedupRegistry at $path was built with centroid set $stored; " +
          s"probing with $fp would silently miss cross-cell neighbors")
    }
    Similarity.ivfQuantizedTopKFromSignatures(queries, read(spark),
      centroids, idCol, vecCol, k, nprobe)
  }

  /** dedupAppend with the corpus sink made IDEMPOTENT PER BATCH (the
    * class doc's closed crash window): survivors land at
    * `sinkPath/batch_id=<batchId>/` by dynamic-partition overwrite,
    * so an at-least-once replay of the SAME (batch, batchId) —
    * whether the crash hit before or after the signature append —
    * leaves exactly one copy of every surviving row in the sink.
    * A replay after the append survives too: its survivor set is
    * empty (everything self-matches), an empty dynamic overwrite
    * touches no partitions, and the first run's rows stand.
    * `batchId` is the caller's ingest sequence number — the same
    * contract as foreachBatch's batch id, which is exactly what to
    * pass when this runs inside the streaming curation loop. */
  def dedupAppendBatch(batch: DataFrame, centroids: DataFrame,
                       idCol: String, vecCol: String,
                       sinkPath: String, batchId: Long): DataFrame =
    dedupAppend(batch, centroids, idCol, vecCol,
      persist = out =>
        graft.streaming.IdempotentSink.parquetByBatch(sinkPath)(out, batchId))

  /** Migrate the registry to a NEW centroid set (see class doc):
    * re-assign every stored signature to its nearest new centroid,
    * rewrite into a fresh generation directory, atomically swap the
    * sidecar pointer, then clean up the old generation. Identity
    * refits (same fingerprint) are a no-op. After refit, dedupAppend
    * accepts ONLY the new centroid set — the fingerprint guard's
    * migration path, not a bypass.
    *
    * Ids are unique in a registry by construction (one signature per
    * accepted vector), so the assignment join-back cannot fan out. */
  def refit(spark: SparkSession, newCentroids: DataFrame,
            idCol: String, vecCol: String): Unit = {
    val (fp, dim) = centroidInfo(newCentroids, idCol, vecCol)
    require(dim <= 180,
      s"EmbedDedupRegistry: dim=$dim overflows the exact int64 eps test " +
        "(max ~180 at int8) — rescale or shard the comparison")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val current = readMeta(fs)
    require(current.nonEmpty,
      s"EmbedDedupRegistry at $path has never been appended to — " +
        "nothing to refit (the first dedupAppend pins its centroid set)")
    val (oldFp, oldDir) = current.get
    if (oldFp == fp) return // identity refit: same centroid identity
    val newDir = s"${path}_gen_$fp"
    val newDirPath = new org.apache.hadoop.fs.Path(newDir)
    // a stale dir from an abandoned earlier refit to this same set is
    // inactive garbage (the sidecar never pointed at it) — clear it
    if (fs.exists(newDirPath)) fs.delete(newDirPath, true)
    val cur = read(spark)
    // dequantize (exact: every int8 signature value is q/127 by
    // construction) and re-rank under the new centroids with
    // assignCells' (cs DESC, cid ASC) discipline — the same ranking
    // future float batches get, up to quantization distance
    val deq = cur.withColumn("v",
      transform(col("vq"), x => (x.cast("float") / lit(127.0f)).cast("float")))
    // spread = true: the refit is a full registry rewrite — repartition
    // by id so a few large cells don't serialize the re-ranking
    // (assignCells reads the same column names from both frames)
    val re = Similarity.assignCells(deq,
        newCentroids.select(col(idCol).as("id"), col(vecCol).as("v")),
        "id", "v", spread = true)
      .select(col("id"), col("cell"))
    cur.drop("cell").join(re, Seq("id"))
      .select(col("id"), col("vq"), col("nq"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(newDir)
    writeMeta(spark, fp, newDir) // the atomic cutover
    if (oldDir != newDir) { // old generation is now unreachable
      val op = new org.apache.hadoop.fs.Path(oldDir)
      if (fs.exists(op)) fs.delete(op, true)
    }
  }
}
