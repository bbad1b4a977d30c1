package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** A persisted BUCKETED index table with a GENERATION lifecycle —
  * the shared machinery behind NearDupRegistry's band index and
  * WinnowRegistry's fingerprint index (VERDICT r5 #8: registry
  * compaction parity with CmsRegistry).
  *
  * Why generations: the index is append-per-batch, so a long-lived
  * registry accretes one small file group per `dedupAppend` — at
  * 100 TB ingest cadence that is thousands of sub-MB files whose
  * open/footer cost eventually dominates the probe scan. The naive
  * fix (read + INSERT OVERWRITE in place) carries a crash window
  * where the delete has happened and the rewrite has not: for these
  * indexes that silently FORGETS dedup history — the exact failure
  * the RegistryIO fail-loud policy exists to prevent. So a rewrite
  * never touches the live generation: it builds generation N+1 in a
  * fresh sibling directory (its own catalog table, same bucketing),
  * then swaps a one-line sidecar by atomic rename — the
  * EmbedDedupRegistry refit discipline. A crash before the swap
  * leaves generation N fully active (the half-built N+1 is garbage,
  * cleared on the next attempt); after the swap, N+1 is active and
  * the old directories are deleted best-effort (an orphaned old
  * generation is garbage, never corruption).
  *
  * Layout: generation 0 lives at `rootLocation` itself (the legacy
  * layout — pre-generation registries resolve with no migration),
  * generation N>0 at `<rootLocation>_genN`; the sidecar
  * `<rootLocation>_gen` holds the active generation number. Catalog
  * names are per-generation (`<tableBase>` / `<tableBase>_gN`)
  * because a datasource table's location is fixed at CREATE time.
  *
  * CONCURRENCY CONTRACT (whole lifecycle family — this class,
  * EmbedDedupRegistry's refit/compactStaging, and every registry
  * built on them): maintenance (`rewrite`) requires an EXCLUSIVE
  * writer. An `append` racing a rewrite can land its file group in
  * the outgoing generation after the rewrite's source scan and
  * before its GC — those rows would be silently lost. This is the
  * same assumption Spark's own INSERT OVERWRITE makes; a deployment
  * that needs concurrent writers puts a commit protocol (a
  * transactional table format) in front, it does not get one from a
  * directory swap. Crash-safety (this class's generation contract)
  * and replay-safety (each registry's idempotent-append algebra) are
  * separate properties and DO hold without coordination. The one
  * family member that genuinely supports appends concurrent with its
  * compaction is AdditiveRegistry — by construction, not by luck:
  * its horizon-encoded base only ever absorbs batches BELOW an
  * explicit id, so concurrent appends land above the horizon and
  * survive (see its object doc).
  */
object GenIndex {
  /** Catalog table-base for a registry index at `path`: a stable
    * per-path suffix (md5 prefix — catalog names can't hold slashes)
    * under the registry family's prefix. One definition (review: the
    * idiom was copy-pasted into three registries; a naming-scheme
    * change applied to fewer than all of them would silently diverge
    * their catalog tables). */
  def tableBaseFor(prefix: String, path: String): String =
    prefix + java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
}

class GenIndex(tableBase: String, rootLocation: String,
               schemaDDL: String, bucketCols: Seq[String], nBuckets: Int) {
  require(bucketCols.nonEmpty && nBuckets > 0)

  private val genSidecar = rootLocation + "_gen"

  private def hadoopFs(spark: SparkSession) =
    new org.apache.hadoop.fs.Path(rootLocation)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def currentGen(spark: SparkSession): Int = {
    val fs = hadoopFs(spark)
    val p = new org.apache.hadoop.fs.Path(genSidecar)
    if (!fs.exists(p)) 0
    else {
      val in = fs.open(p)
      val txt = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
      txt.toInt
    }
  }

  private def location(gen: Int): String =
    if (gen == 0) rootLocation else s"${rootLocation}_gen$gen"

  private def tableName(gen: Int): String =
    if (gen == 0) tableBase else s"${tableBase}_g$gen"

  private def createTable(spark: SparkSession, gen: Int): Unit =
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS ${tableName(gen)}
         |($schemaDDL)
         |USING PARQUET
         |CLUSTERED BY (${bucketCols.mkString(", ")}) INTO $nBuckets BUCKETS
         |LOCATION '${location(gen)}'""".stripMargin)

  /** Register the ACTIVE generation's table (an in-memory catalog
    * forgets bucket metadata across JVMs; the files keep it) and
    * return its name. */
  def ensure(spark: SparkSession): String = {
    val gen = currentGen(spark)
    createTable(spark, gen)
    tableName(gen)
  }

  /** The active generation's rows (bucketed scan — joins on
    * `bucketCols` need no Exchange on this side). */
  def df(spark: SparkSession): DataFrame = spark.table(ensure(spark))

  def append(rows: DataFrame): Unit = {
    val spark = rows.sparkSession
    rows.write.mode("append").insertInto(ensure(spark))
  }

  /** Where the active generation's files live (for specs/tools). */
  def activeLocation(spark: SparkSession): String = location(currentGen(spark))

  /** Committed data files in the active generation. */
  def dataFileCount(spark: SparkSession): Int = {
    val fs = hadoopFs(spark)
    val p = new org.apache.hadoop.fs.Path(activeLocation(spark))
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Generation-swap rewrite: build gen N+1 from `transform` of the
    * active rows, atomically repoint the sidecar, GC old dirs. The
    * crash-window contract is the class doc's. */
  def rewrite(spark: SparkSession,
              transform: DataFrame => DataFrame = identity): Unit = {
    val fs = hadoopFs(spark)
    val gen = currentGen(spark)
    val next = gen + 1
    // a crashed prior attempt left inactive garbage here (the sidecar
    // never pointed at it) — clear before building
    val nextPath = new org.apache.hadoop.fs.Path(location(next))
    if (fs.exists(nextPath)) fs.delete(nextPath, true)
    spark.sql(s"DROP TABLE IF EXISTS ${tableName(next)}")
    createTable(spark, next)
    // one shuffle into the bucket layout so the new generation lands
    // as AT MOST nBuckets committed files, DETERMINISTICALLY:
    // repartition(nBuckets, bucketCols) assigns partition id with the
    // same Pmod(Murmur3Hash(cols), nBuckets) function the bucketed
    // write uses for bucket ids, so every writer task holds exactly
    // one bucket and the writer splits nothing further.
    //
    // The source is read as PLAIN PARQUET FILES, not via the bucketed
    // table (root cause of the WinnowRegistrySpec flake, VERDICT r6
    // #3, reproduced deterministically): a bucketed-table scan
    // advertises HashPartitioning(bucketCols, nBuckets), which lets
    // EnsureRequirements elide the repartition exchange — and with no
    // exchange left downstream, the auto-bucketed-scan rule then
    // downgrades the scan to arbitrary file-group partitions (nothing
    // remaining "interests" the distribution), so the bucketed write
    // splits every mixed partition per bucket: compaction output
    // ballooned to ~tasks x buckets files with the count depending on
    // how the listing coalesced into splits (53 files from a 95-file
    // generation in the repro; 11-12 in the spec, varying with host
    // load). A plain file scan claims no partitioning, the exchange
    // always materializes, and the file bound holds on any host.
    // Column order is pinned to the table schema (insertInto is
    // positional); the empty-generation case falls back to the table
    // scan (nothing to realign).
    val tableCols = spark.table(ensure(spark)).columns
    val src =
      if (dataFileCount(spark) == 0) spark.table(ensure(spark))
      else spark.read.parquet(activeLocation(spark))
        .select(tableCols.map(col): _*)
    transform(src)
      .repartition(nBuckets, bucketCols.map(col): _*)
      .write.mode("append").insertInto(tableName(next))
    // atomic activation: readers see gen or gen+1, never a partial
    val tmp = new org.apache.hadoop.fs.Path(
      genSidecar + ".tmp-" + java.util.UUID.randomUUID().toString)
    val os = fs.create(tmp, false)
    try os.write(next.toString.getBytes("UTF-8")) finally os.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      tmp.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, new org.apache.hadoop.fs.Path(genSidecar),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // VERIFY the swap before GC'ing anything: if the sidecar read
    // does not resolve to the generation just activated, deleting the
    // old generation below would destroy the live index. A silent
    // stale read here is also the one way a caller could keep
    // operating on the pre-rewrite files believing it compacted
    // (the WinnowRegistrySpec flake's suspected shape) — fail loudly
    // with both numbers instead.
    val seen = currentGen(spark)
    require(seen == next,
      s"GenIndex($rootLocation): sidecar swap to generation $next " +
        s"not visible (read back $seen) — aborting before old-" +
        "generation GC; the pre-rewrite index is still fully active")
    // best-effort GC of every stale generation (incl. orphans from
    // swaps that crashed before their own GC)
    (0 until next).foreach { g =>
      spark.sql(s"DROP TABLE IF EXISTS ${tableName(g)}")
      val p = new org.apache.hadoop.fs.Path(location(g))
      try { if (fs.exists(p)) fs.delete(p, true) } catch { case _: java.io.IOException => }
    }
  }

  /** Compact when the active generation holds more than `maxFiles`
    * committed data files; returns whether a rewrite ran. Probe
    * results are unchanged by construction (same rows, same bucket
    * layout) — spec-asserted per registry. */
  def compact(spark: SparkSession, maxFiles: Int): Boolean = {
    val n = dataFileCount(spark)
    if (n <= maxFiles) false
    else { rewrite(spark); true }
  }
}
