package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED product-quantization ANN serving store (VERDICT r9 #3):
  * the PQ stack q213–q215 runs in memory, re-expressed as the
  * registry shape the rest of the lifecycle family already proved —
  * because at 100 TB "serving" means scanning PERSISTED m-byte codes,
  * never re-encoding the corpus per probe (the q150/q208 argument,
  * applied to the memory-bound PQ layout of Jégou et al., TPAMI 2011).
  *
  * What persists, and where:
  *  - CODEBOOKS + IVF CENTROIDS: `<path>_cb_<n>/codebooks` (blk, cid,
  *    cq array<bigint>, cn2) and `<path>_cb_<n>/centroids` (cid,
  *    cv array<float>) — m*ksub + |cells| rows, broadcast-sized by
  *    construction, versioned by a monotonic counter like the
  *    EmbedDedupRegistry generation dirs.
  *  - CODES: (vid, cell, blk, code) rows CELL-KEYED at rest (the
  *    ProductQuantizer.cellKeyedCodes build join paid ONCE at ingest,
  *    so every probe is the shuffle-free ivfPqTopKFromCellCodes core)
  *    in a GenIndex bucketed table — generation lifecycle, accounting
  *    manifests, maintenance mutex, compaction all inherited.
  *  - META: `<path>_pq_meta` sidecar (atomic-rename swapped, the
  *    GenIndex sidecar idiom): geometry line `m,ksub,dim`, the active
  *    codebook-store fingerprint, the active codebook dir. The
  *    geometry is pinned per the RegistryIO.pinParams discipline —
  *    it changes only through `refit`, never silently.
  *
  * CODEBOOK–CODES CONSISTENCY (the PQ-specific hazard): codes are
  * meaningful ONLY under the codebooks that encoded them — probing
  * new codes with old codebooks (or mixing encodings in one table)
  * is silent corruption, the exact analogue of EmbedDedupRegistry's
  * foreign-fp rows. Every codes generation directory carries a
  * `_cbfp` marker (underscore-prefixed: invisible to the data-file
  * listing) stamped with the fingerprint of the codebooks its rows
  * were encoded under; every read path REQUIRES marker == meta
  * fingerprint before planning a scan. Any torn refit/compact crash
  * therefore aborts loudly with recovery instructions instead of
  * returning wrong neighbors.
  *
  * WRITER SERIALIZATION (a documented DEVIATION from the family's
  * lock-free-append contract): PQ codes are LOSSY — a straddling
  * append's rows cannot be re-derived from themselves after a
  * codebook refit, so the GenIndex absorption contract cannot hold.
  * `ingest`, `refit`, and `compact` all hold the registry-level lock
  * (`<path>_pq_lock`); probes stay lock-free. Lock order where both
  * are taken (refit/compact → GenIndex's internal maintenance lock)
  * is fixed, so no deadlock is possible.
  *
  * REFIT re-encodes from the CORPUS (the caller supplies the
  * authoritative vectors — codes cannot re-encode themselves): fit
  * new codebooks, rebuild the codes generation via GenIndex.rebuild,
  * stamp, swap meta. A crash anywhere mid-refit leaves either the
  * old store fully active or a loudly-detected torn state whose
  * recovery is "re-run refit" (idempotent: it rebuilds from the
  * corpus regardless of what the crash left).
  *
  * MODES: flat PQ (codes quantize x) or RESIDUAL — the full IVFADC,
  * codes quantize x - c(x) and probes score with the per-cell
  * full-term rule (ivfadcTopK). The mode is a STORED property pinned
  * at fit in the meta geometry line: residual codes under the flat
  * scoring rule (or vice versa) would be silent corruption, so every
  * probe/ingest/refit follows the meta, never a caller flag.
  */
class PQRegistry(path: String, nBuckets: Int = 8) {

  private val metaPath = path + "_pq_meta"
  private val lockPath = path + "_pq_lock"
  private[operators] val index = new GenIndex(
    GenIndex.tableBaseFor("graft_pqreg_", path), path + "_codes",
    "vid BIGINT, cell BIGINT, blk BIGINT, code BIGINT",
    Seq("cell"), nBuckets)
  /** TOMBSTONES (delete verb, VERDICT r11 #5): vids deleted but not
    * yet physically GC'd. Probes anti-join the code scan against this
    * set BEFORE scoring (broadcast — small by contract), so a deleted
    * vid neither appears in results nor burns an ADC pool slot;
    * compact() removes the code rows and clears the set. Cleared at
    * refit (the rebuild re-encodes from the caller's corpus —
    * deletions are the caller's to apply there). */
  private[operators] val tombs = new GenIndex(
    GenIndex.tableBaseFor("graft_pqreg_x_", path), path + "_tombs",
    "vid BIGINT", Seq("vid"), nBuckets)
  private def tombVids(spark: SparkSession): DataFrame =
    tombs.df(spark).select("vid").distinct()
  /** EMPTY-TOMBSTONE FAST PATH (VERDICT r12 #3): emptiness from the
    * active tombstone generation's committed-data-file count — a
    * driver FS listing, zero jobs, and exact (rows exist only in data
    * files; the clearing rebuild writes an empty generation = zero
    * files). Lock-free probes bind the set like any other read — a
    * racing delete() is visible from the next probe on. */
  private def tombsEmpty(spark: SparkSession): Boolean =
    tombs.dataFileCount(spark) == 0
  private def emptyVids(spark: SparkSession) = {
    import spark.implicits._
    Seq.empty[Long].toDF("vid")
  }

  private def fs(spark: SparkSession) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---- meta sidecar: (m, ksub, dim, residual, fp, cbDir), atomically
  // swapped. `residual` is a STORED property of the codes (IVFADC
  // mode: codes quantize x - c(x)), pinned at fit like the geometry —
  // probing residual codes with the flat scoring rule (or vice versa)
  // would be silent corruption, so the probe path follows the meta,
  // never a caller flag.
  private case class Meta(m: Int, ksub: Int, dim: Int, residual: Boolean,
                          fp: String, cbDir: String)
  private def readMeta(spark: SparkSession): Option[Meta] =
    RegistryIO.readLines(fs(spark), metaPath).map { ls =>
      val g = ls.head.split(",").map(_.toInt)
      Meta(g(0), g(1), g(2), g.length > 3 && g(3) == 1, ls(1), ls(2))
    }
  private def requireMeta(spark: SparkSession): Meta =
    readMeta(spark).getOrElse(throw new IllegalStateException(
      s"PQRegistry at $path: no codebooks fitted yet — call fit() first"))
  private def writeMeta(spark: SparkSession, m: Meta): Unit =
    // the GenIndex sidecar idiom (RegistryIO.SwapStore): atomic swap,
    // so readers see the old or the new meta, never a partial
    RegistryIO.atomicWriteLines(fs(spark), metaPath,
      Seq(s"${m.m},${m.ksub},${m.dim},${if (m.residual) 1 else 0}",
        m.fp, m.cbDir))

  // ---- codebook stores: <path>_cb_<counter>, monotonic like the
  // EmbedDedupRegistry generation dirs (collisions structurally
  // impossible; a crashed fit/refit's orphan dir is inert garbage —
  // meta never pointed at it — and is cleared on the next refit)
  private def cbCounter(dir: String): Int =
    dir.split("_cb_").last.toInt
  private def newCbDir(spark: SparkSession): String = {
    val prev = readMeta(spark).map(m => cbCounter(m.cbDir)).getOrElse(0)
    s"${path}_cb_${prev + 1}"
  }

  private def writeCbStore(spark: SparkSession, dir: String,
                           codebooks: DataFrame,
                           centroids: DataFrame): String = {
    // a crashed earlier attempt may have left junk at this counter —
    // overwrite reclaims it (meta never pointed here)
    codebooks.select(col("blk"), col("cid"), col("cq"), col("cn2"))
      .coalesce(1).write.mode("overwrite").parquet(dir + "/codebooks")
    centroids.select(col("cid").cast("long").as("cid"),
        col("cv").cast("array<float>").as("cv"))
      .coalesce(1).write.mode("overwrite").parquet(dir + "/centroids")
    storeFp(spark, dir)
  }
  private def readCodebooks(spark: SparkSession, m: Meta): DataFrame =
    spark.read.parquet(m.cbDir + "/codebooks")
  private def readCentroids(spark: SparkSession, m: Meta,
                            idCol: String, vecCol: String): DataFrame =
    spark.read.parquet(m.cbDir + "/centroids")
      .select(col("cid").as(idCol), col("cv").as(vecCol))

  /** Stable fingerprint of a codebook store: md5 over the sorted
    * canonical rows of both frames (the EmbedDedupRegistry
    * centroidInfo discipline). Bounded collect — m*ksub + |cells|
    * rows by contract. */
  private def storeFp(spark: SparkSession, dir: String): String = {
    val cb = spark.read.parquet(dir + "/codebooks")
      .select(col("blk"), col("cid"), col("cq")).collect()
      .map(r => s"${r.getLong(0)}:${r.getLong(1)}:${r.getSeq[Long](2).mkString(",")}")
      .sorted
    val ce = spark.read.parquet(dir + "/centroids")
      .select(col("cid"), col("cv")).collect()
      .map(r => s"${r.getLong(0)}:${r.getSeq[Float](1).mkString(",")}")
      .sorted
    java.security.MessageDigest.getInstance("MD5")
      .digest((cb.mkString(";") + "|" + ce.mkString(";")).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  // ---- the per-generation encoding marker (class doc: CONSISTENCY)
  private def cbfpPath(loc: String) = loc + "/_cbfp"
  /** Stamp `loc`'s codes as encoded under `fp` — ATOMICALLY (tmp +
    * rename-overwrite, the sidecar idiom): a truncate-then-write would
    * expose a blank marker to a concurrent lock-free probe, and a
    * crash mid-write would leave it blank forever (review r10).
    * Skips the write when the stamp already matches, so steady-state
    * ingests never re-truncate a marker probes are reading. */
  private def stampLoc(spark: SparkSession, loc: String, fp: String): Unit = {
    if (readStamp(spark, loc).contains(fp)) return
    RegistryIO.atomicWriteLines(fs(spark), cbfpPath(loc), Seq(fp))
  }
  private def readStamp(spark: SparkSession, loc: String): Option[String] =
    RegistryIO.readLines(fs(spark), cbfpPath(loc)).flatMap(_.headOption)

  /** The consistency-checked codes scan, BOUND ONCE (review r10): the
    * generation is resolved a single time and the returned frame reads
    * exactly that generation, so a refit completing mid-probe either
    * aborts here loudly (new generation, new stamp != this meta's fp)
    * or leaves the probe on a consistent RETAINED snapshot (old
    * generation + old codebooks — the GenIndex reader-vs-GC retention
    * contract; stale-but-correct, never mixed). A separate
    * check-then-rescan pair could resolve two different generations
    * and silently decode new codes with old codebooks. */
  private def boundCodes(spark: SparkSession, meta: Meta): DataFrame = {
    val (name, loc) = index.ensureBound(spark)
    if (RegistryIO.committedDataExists(spark, loc)) {
      val stamped = readStamp(spark, loc)
      require(stamped.contains(meta.fp),
        s"PQRegistry at $path: codes generation at $loc is stamped " +
          s"'${stamped.getOrElse("<missing>")}' but the active codebook " +
          s"store fingerprint is '${meta.fp}' — a refit or compaction " +
          "crashed between the codes swap and the meta/stamp write, or " +
          "completed while this read was binding. Probing would decode " +
          "codes with the wrong codebooks; re-run refit (it rebuilds " +
          "codes from the corpus and is idempotent) or retry the probe.")
    }
    spark.table(name)
  }
  private def requireConsistent(spark: SparkSession, meta: Meta): Unit = {
    boundCodes(spark, meta); ()
  }

  /** FIRST-TIME fit: codebooks from `corpus` (ProductQuantizer.pqFit,
    * exact-integer Lloyd), IVF `centroids` persisted alongside, meta
    * pinned. Fails loudly if the registry is already fitted — geometry
    * and codebooks change only through `refit`. */
  def fit(spark: SparkSession, corpus: DataFrame, centroids: DataFrame,
          idCol: String, vecCol: String, m: Int, ksub: Int, dim: Int,
          maxIter: Int, residual: Boolean = false): Unit =
    RegistryIO.withMaintenanceLock(fs(spark), lockPath,
      s"PQRegistry($path).fit") {
      require(readMeta(spark).isEmpty,
        s"PQRegistry at $path is already fitted — use refit() to change " +
          "codebooks (geometry is pinned; silent re-fit would orphan " +
          "every stored code)")
      val cb = fitCodebooks(spark, corpus, centroids, idCol, vecCol,
        m, ksub, dim, maxIter, residual)
      val dir = newCbDir(spark)
      val fp = writeCbStore(spark, dir,
        cb, centroids.select(col(idCol).as("cid"), col(vecCol).as("cv")))
      writeMeta(spark, Meta(m, ksub, dim, residual, fp, dir))
    }

  /** Codebooks under the stored mode: flat PQ fits the vectors,
    * residual mode (IVFADC) fits the exact-integer residuals against
    * the home-cell centroids. */
  private def fitCodebooks(spark: SparkSession, corpus: DataFrame,
                           centroids: DataFrame, idCol: String,
                           vecCol: String, m: Int, ksub: Int, dim: Int,
                           maxIter: Int, residual: Boolean): DataFrame =
    if (!residual)
      ProductQuantizer.pqFit(corpus, idCol, vecCol, m, ksub, maxIter, dim)
    else {
      val asg = Similarity.assignCells(corpus,
          centroids.select(col(idCol), col(vecCol)), idCol, vecCol,
          spread = false)
        .select(col("id").as("vid"), col("cell"))
      ProductQuantizer.pqFitE(
        ProductQuantizer.cellResiduals(corpus,
          centroids.select(col(idCol), col(vecCol)), asg, idCol, vecCol),
        "vid", "r", m, ksub, maxIter, dim)
    }

  /** Cell-keyed codes for `rows` under the stored mode. */
  private def encodeCells(meta: Meta, rows: DataFrame, cb: DataFrame,
                          cents: DataFrame, idCol: String,
                          vecCol: String): DataFrame = {
    val asg = Similarity.assignCells(rows, cents, idCol, vecCol,
        spread = false)
      .select(col("id").as("vid"), col("cell"))
    val enc =
      if (!meta.residual)
        ProductQuantizer.pqEncode(rows, cb, idCol, vecCol, meta.m, meta.dim)
      else ProductQuantizer.pqEncodeE(
        ProductQuantizer.cellResiduals(rows, cents, asg, idCol, vecCol),
        cb, "vid", "r", meta.m, meta.dim)
    ProductQuantizer.cellKeyedCodes(enc, asg)
  }

  /** Encode + admit `corpus` rows whose vid is NOT already indexed
    * (idempotent by vid — the dedupAppend discipline; re-ingesting a
    * batch is a no-op, and double-running a crashed ingest cannot
    * double a vid's m code rows, which would corrupt ADC sums).
    * INSERT-ONLY: an already-indexed vid arriving with a DIFFERENT
    * vector aborts loudly (detected by re-encoding the overlap and
    * comparing codes — see the detector comment in the body); the
    * supported update path for a re-embedded corpus is refit.
    * Holds the registry lock (class doc: WRITER SERIALIZATION).
    * Returns the number of vids admitted. */
  def ingest(corpus: DataFrame, idCol: String, vecCol: String): Long = {
    val spark = corpus.sparkSession
    RegistryIO.withMaintenanceLock(fs(spark), lockPath,
      s"PQRegistry($path).ingest") {
      val meta = requireMeta(spark)
      val codes = boundCodes(spark, meta)
      val cb = readCodebooks(spark, meta)
      val cents = readCentroids(spark, meta, idCol, vecCol)
      // exact-duplicate batch rows collapse silently (at-least-once
      // sources re-deliver); a vid carrying TWO DIFFERENT vectors in
      // one batch aborts loudly — pqEncode's per-(vid, blk) argmin
      // would otherwise blend both into a code matching neither
      // (review r10). The check runs on the WHOLE batch (fresh AND
      // already-indexed vids) so the store-vs-batch detector below
      // sees at most one vector per overlapping vid.
      val batch = corpus
        .select(col(idCol).cast("long").as("vid"), col(vecCol).as("v"))
        .distinct()
      val nb = batch.count()
      val nbv = batch.select(col("vid")).distinct().count()
      require(nbv == nb,
        s"PQRegistry at $path: the batch carries ${nb - nbv} vid(s) " +
          "with conflicting vectors — encoding would silently blend " +
          "them; de-conflict upstream (one vector per vid per batch)")
      // STORE-vs-BATCH re-embedding detector (review r10 ADVICE): a
      // vid already indexed but arriving with a DIFFERENT vector would
      // otherwise be silently dropped by the anti-join and keep
      // serving stale codes with no signal. The store holds no vectors
      // (codes are lossy), but encoding is DETERMINISTIC under one
      // codebook store: an identical vector re-encodes to identical
      // (cell, blk, code) rows, so ANY mismatched row proves the
      // vector changed. One-sided by construction — it never
      // false-alarms, and catches every re-embedding that moves any
      // subvector's nearest codeword (a re-embedding that collides
      // into the exact same m codes passes silently: within
      // quantization resolution the stored codes ARE its codes).
      // Ingest is INSERT-ONLY; the supported update path is refit.
      val overlap = batch.join(codes.select(col("vid")), Seq("vid"),
          "left_semi")
        .select(col("vid").as(idCol), col("v").as(vecCol))
      val conflictVids = encodeCells(meta, overlap, cb, cents, idCol, vecCol)
        .join(codes.select(col("vid"), col("cell").as("s_cell"),
          col("blk"), col("code").as("s_code")), Seq("vid", "blk"))
        .filter(col("cell") =!= col("s_cell") || col("code") =!= col("s_code"))
        .select(col("vid")).distinct().limit(5)
        .collect().map(_.getLong(0))
      require(conflictVids.isEmpty,
        s"PQRegistry at $path: batch vid(s) ${conflictVids.mkString(", ")} " +
          "are already indexed but arrived with DIFFERENT vectors (their " +
          "re-encoded codes disagree with the stored codes) — ingest is " +
          "insert-only and would silently keep serving the stale codes; " +
          "a re-embedded corpus requires refit (it re-encodes every code " +
          "from the corpus)")
      // a deleted vid stays deleted until compact() physically GCs
      // it — silently resurrecting (or silently dropping) it here
      // would contradict the takedown the caller already confirmed
      val tombHits = batch.join(tombVids(spark), Seq("vid"), "left_semi")
        .select(col("vid")).limit(5).collect().map(_.getLong(0))
      require(tombHits.isEmpty,
        s"PQRegistry at $path: batch vid(s) ${tombHits.mkString(", ")} " +
          "are TOMBSTONED — a deleted vid cannot be re-ingested until " +
          "compact() has physically removed it (run compact, then retry)")
      // left_anti needs no distinct right side — the former
      // .distinct() aggregated the whole code store per batch
      val fresh = batch.join(codes.select(col("vid")), Seq("vid"), "left_anti")
        .select(col("vid").as(idCol), col("v").as(vecCol))
      val n = fresh.count()
      if (n > 0) {
        // stamp BEFORE the append: a probe racing the FIRST append
        // must never see committed data without a marker (a stamp
        // with no data is inert — consistency checks skip empty
        // generations)
        stampLoc(spark, index.activeLocation(spark), meta.fp)
        index.append(encodeCells(meta, fresh, cb, cents, idCol, vecCol))
      }
      n
    }
  }

  /** The serving probe: route queries to their `nprobe` cells, ADC
    * over the PERSISTED cell-keyed codes — the shuffle-free
    * ivfPqTopKFromRouted core over a bucketed-table scan. Routing is
    * PINNED by the one-job collect (the round-9 serving discipline:
    * the probe join broadcasts this |Q| x nprobe frame anyway, so the
    * driver footprint is unchanged), and the collected cell ids push
    * an isin filter onto the codes scan — the bucketed layout
    * (CLUSTERED BY cell) bucket-prunes it, so a probe touches
    * ~nprobe/|cells| of the persisted code files, not all of them.
    * Read-only and lock-free; every read is consistency-checked
    * first. */
  def adcProbe(spark: SparkSession, queries: DataFrame, idCol: String,
               vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val meta = requireMeta(spark)
    val bound = boundCodes(spark, meta) // one generation, one check
    val cents = readCentroids(spark, meta, idCol, vecCol)
    val routedPlan = Similarity.routeQuantizedQueries(queries, cents,
        idCol, vecCol, nprobe)
      .select(col("query_id"), col("cell"))
    val routedRows = routedPlan.collect() // one job; the pin
    val qcells = spark.createDataFrame(
      java.util.Arrays.asList(routedRows: _*), routedPlan.schema)
    val cells = routedRows.map(_.getAs[Long]("cell")).distinct
    // tombstoned vids drop BEFORE scoring: they neither rank nor burn
    // an ADC pool slot (the delete contract); the anti-join (and its
    // scan jobs) is skipped entirely while the set is empty
    // (tombsEmpty — the steady-state serving path)
    val routedCodes = bound.filter(col("cell").isin(cells: _*))
    val codes =
      if (tombsEmpty(spark)) routedCodes
      else routedCodes.join(broadcast(tombVids(spark)), Seq("vid"), "left_anti")
    val cb = readCodebooks(spark, meta)
    if (!meta.residual)
      ProductQuantizer.ivfPqTopKFromRouted(qcells, queries, codes, cb,
        idCol, vecCol, k, meta.m, meta.dim)
    else ProductQuantizer.ivfadcTopKFromRouted(qcells, queries, codes, cb,
      cents, idCol, vecCol, k, meta.m, meta.dim)
  }

  /** CODEBOOK REFIT: new codebooks (possibly a new ksub) and new IVF
    * centroids fitted on `corpus`, every code RE-ENCODED from the
    * corpus (class doc: codes are lossy — the corpus is the only
    * source a refit can re-derive from), swapped in as a fresh codes
    * generation. m and dim stay pinned (changing them re-shapes the
    * subvector layout; that is a new registry, not a refit). */
  def refit(spark: SparkSession, corpus: DataFrame, centroids: DataFrame,
            idCol: String, vecCol: String, ksub: Int, maxIter: Int): Unit =
    RegistryIO.withMaintenanceLock(fs(spark), lockPath,
      s"PQRegistry($path).refit") {
      val meta = requireMeta(spark)
      val cb = fitCodebooks(spark, corpus, centroids, idCol, vecCol,
        meta.m, ksub, meta.dim, maxIter, meta.residual)
      val dir = newCbDir(spark)
      val fp = writeCbStore(spark, dir,
        cb, centroids.select(col(idCol).as("cid"), col(vecCol).as("cv")))
      val cents = centroids.select(col(idCol), col(vecCol))
      // generation swap: readers keep the old (still-consistent) codes
      // until the sidecar flips; the ingest lock we hold means no
      // append can straddle the rebuild (GenIndex.rebuild aborts
      // loudly if one somehow does)
      // the _cbfp stamp rides GenIndex's beforeSwap hook: it lands in
      // the new generation's directory BEFORE the sidecar flips, so a
      // lock-free probe never sees an active generation without its
      // marker (the post-swap stamp opened a spurious-abort window —
      // review r10)
      index.rebuild(spark,
        encodeCells(meta, corpus, cb, cents, idCol, vecCol),
        beforeSwap = loc => stampLoc(spark, loc, fp))
      // the rebuild re-encoded the caller's corpus wholesale, so any
      // standing tombstones are spent (deletions belong in the corpus
      // the caller supplied) and the ids become re-ingestable
      tombs.rebuild(spark, emptyVids(spark))
      writeMeta(spark, Meta(meta.m, ksub, meta.dim, meta.residual, fp, dir))
      // ONE-CYCLE RETENTION (review r10 ADVICE): the outgoing codebook
      // store is kept until the NEXT refit — mirroring GenIndex's
      // one-generation retention — because a lock-free adcProbe that
      // bound the outgoing generation may still hold lazily-planned
      // reads over the outgoing cbDir; deleting it here would fail
      // that probe mid-scan instead of letting it finish on the
      // retained stale-but-correct snapshot boundCodes documents.
      // Stores OLDER than the outgoing one (counter < outgoing) have
      // had their full cycle: best-effort delete (orphans are never
      // corruption).
      deleteCbStoresOlderThan(spark, cbCounter(meta.cbDir))
    }

  /** Best-effort GC of codebook stores whose monotonic counter is
    * strictly below `keepFrom` — i.e. everything older than the
    * outgoing store, which is retained one refit cycle for in-flight
    * lock-free probes (the GenIndex reader-vs-GC contract). */
  private def deleteCbStoresOlderThan(spark: SparkSession,
                                      keepFrom: Int): Unit = {
    val f = fs(spark)
    val glob = new org.apache.hadoop.fs.Path(path + "_cb_*")
    val stores = try f.globStatus(glob) catch {
      case _: java.io.IOException =>
        Array.empty[org.apache.hadoop.fs.FileStatus]
    }
    Option(stores).getOrElse(Array.empty).foreach { st =>
      val name = st.getPath.getName
      val counter = try Some(name.split("_cb_").last.toInt)
                    catch { case _: NumberFormatException => None }
      if (counter.exists(_ < keepFrom)) {
        try f.delete(st.getPath, true)
        catch { case _: java.io.IOException => () }
      }
    }
  }

  /** Fold the accreted append file groups into one bucketed
    * generation when past `maxFiles` (the GenIndex compaction
    * contract: identical rows, identical probe results) OR when
    * tombstones are waiting for GC — then the rewrite also drops the
    * tombstoned vids' code rows and clears the tombstone set (probe
    * results still identical: probes already excluded those vids).
    * Crash windows stay safe in either prefix order: codes gone +
    * set still standing = probes exclude vids that no longer have
    * rows (no-op); a crash before the swap leaves the old generation
    * fully active. Re-stamps the fresh generation with the unchanged
    * codebook fingerprint — a crash between swap and stamp is
    * detected by every read. */
  def compact(spark: SparkSession, maxFiles: Int): Boolean =
    RegistryIO.withMaintenanceLock(fs(spark), lockPath,
      s"PQRegistry($path).compact") {
      val meta = requireMeta(spark)
      requireConsistent(spark, meta)
      val tv = tombVids(spark).localCheckpoint(true)
      val nTomb = tv.count()
      if (nTomb == 0)
        index.compact(spark, maxFiles,
          beforeSwap = loc => stampLoc(spark, loc, meta.fp))
      else {
        index.rewrite(spark, rows =>
          rows.join(broadcast(tv), Seq("vid"), "left_anti"),
          beforeSwap = loc => stampLoc(spark, loc, meta.fp))
        tombs.rebuild(spark, emptyVids(spark))
        true
      }
    }

  /** DELETE (tombstone verb, VERDICT r11 #5): mark indexed vids
    * deleted. Takes effect immediately — the probe's code scan
    * anti-joins the set, so a deleted vid neither ranks nor burns an
    * ADC pool slot — and the code rows are physically removed at the
    * next compact(), which clears the set (the ids become
    * re-ingestable). Unknown vids are ignored (idempotent). Returns
    * the number of vids newly tombstoned. */
  def delete(vids: DataFrame, idCol: String): Long = {
    val spark = vids.sparkSession
    RegistryIO.withMaintenanceLock(fs(spark), lockPath,
      s"PQRegistry($path).delete") {
      val meta = requireMeta(spark)
      val codes = boundCodes(spark, meta)
      val fresh = vids.select(col(idCol).cast("long").as("vid")).distinct()
        .join(codes.select("vid"), Seq("vid"), "left_semi")
        .join(tombVids(spark), Seq("vid"), "left_anti")
        .localCheckpoint(true)
      val n = fresh.count()
      if (n > 0) tombs.append(fresh)
      n
    }
  }

  /** Committed data files in the active codes generation (specs). */
  def codesFileCount(spark: SparkSession): Int = index.dataFileCount(spark)

  /** The active generation's (vid, cell, blk, code) rows — read-only
    * operability surface (row-count invariants in specs, offline
    * inspection). Consistency-checked like every read. */
  def codes(spark: SparkSession): DataFrame =
    boundCodes(spark, requireMeta(spark))
}
