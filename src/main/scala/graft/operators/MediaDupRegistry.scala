package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CONTINUOUS-ingest MEDIA near-dup gate — the q210 funnel's banded
  * Hamming fingerprint as a persistent cross-run registry, completing
  * the dedup-registry family (exact: DedupRegistry; lexical:
  * NearDupRegistry; passage: WinnowRegistry; semantic:
  * EmbedDedupRegistry; media: this). Every new media batch is
  * near-dup-checked against everything ever accepted WITHOUT the
  * historical payloads: the registry holds (id, quantized feature
  * buckets) only.
  *
  * The whole probe/append/index/compaction machinery is the
  * NearDupRegistry core VERBATIM, because the media verdict is the
  * same exact-integer agreement test in disguise: the signature is
  * the per-dim floor-quantized feature vector (length dim), Hamming
  * distance <= radius over the buckets is agreement >= dim - radius,
  * and the pigeonhole band layout (radius+1 contiguous slices — a
  * pair within the radius leaves at least one slice untouched, the
  * q144/q210 argument) is exactly sigBandRows' contiguous-slice
  * banding. So the persisted bucketed band index, the broadcast
  * batch-side probe (per-batch cost tracks the BATCH, not history),
  * the in-batch CC -> min-id representative rule, the
  * sink-before-register crash ordering, and the GenIndex
  * generation-swap compaction all carry over with zero new code paths
  * to audit. 100 TB: payloads never enter the registry — only
  * dim-length long arrays — and the index stays bucketed on
  * (band, band_key).
  *
  * (dim, bucketWidth, radius) are the fingerprint's semantic
  * identity: buckets quantized under one width are meaningless under
  * another. The triple is pinned in the core's sig-mode sidecar on
  * first use, so opening an existing registry with different
  * parameters — or as a TEXT registry — fails loudly instead of
  * silently forgetting dup history.
  *
  * The decode/featurize kernel rides the Multimodal.MediaKernel seam
  * (q42-q44): StubMediaKernel in this sandbox, a real decoder in
  * production — the registry logic never changes. */
class MediaDupRegistry(path: String, dim: Int, bucketWidth: Double,
                       radius: Int, nBuckets: Int = 8,
                       kernel: MediaKernel = StubMediaKernel) {
  require(dim > 0 && radius >= 0 && bucketWidth > 0,
    "MediaDupRegistry: dim and bucketWidth must be positive, radius >= 0")
  require(radius < dim && dim % (radius + 1) == 0,
    s"MediaDupRegistry: radius+1 (${radius + 1}) must divide dim ($dim) " +
      "— the pigeonhole band slices must cover the dims evenly")

  // simThreshold is only a carrier for minAgree = ceil(t * numPerm);
  // (dim - radius - 0.5) / dim ceils to EXACTLY dim - radius under
  // any IEEE rounding of the division (the exact (dim-radius)/dim
  // quotient could round a hair above and ceil one too high)
  private val core = new NearDupRegistry(path, numPerm = dim,
    bands = radius + 1, rowsPerBand = dim / (radius + 1),
    simThreshold = (dim - radius - 0.5) / dim, nBuckets,
    sigMode = s"media:d=$dim:w=$bucketWidth:r=$radius")

  /** Where the bucketed band-index files currently live. */
  def indexLocation(spark: SparkSession): String = core.indexLocation(spark)

  /** The underlying GenIndex (operability specs assert the shared
    * lifecycle contract — racing-append absorption, retained
    * generation — against THIS family member too). */
  private[operators] def index: GenIndex = core.index

  /** Registered (id, sig) fingerprints. */
  def read(spark: SparkSession): DataFrame = core.read(spark)

  /** Maintenance: GenIndex generation-swap compaction of the band
    * index (see NearDupRegistry.compactIndex). */
  def compactIndex(spark: SparkSession, maxFiles: Int = 4 * nBuckets): Boolean =
    core.compactIndex(spark, maxFiles)

  /** (media_id, kind, payload) -> (id, sig): kernel features floor-
    * quantized per dim — the q210 fingerprint as a registry
    * signature. */
  private def sigsOf(batch: DataFrame): DataFrame =
    Multimodal.extractFeatures(batch, dim, kernel).toDF()
      .select(col("media_id").as("id"),
        transform(col("feature"),
          v => floor(v.cast("double") / lit(bucketWidth)).cast("long"))
          .as("sig"))

  /** Media near-dup check WITHOUT admission: ids in `batch` whose
    * fingerprint is within the Hamming radius of ANY registered
    * media. `batch` carries (media_id, kind, payload). */
  def probe(batch: DataFrame): DataFrame =
    core.probeFromSignatures(batch.sparkSession, sigsOf(batch))
      .select(col("id").as("media_id"))

  /** Near-dup-gate `batch` against the registry AND within itself
    * (in-batch CC, min-id representative), hand survivors (original
    * schema) to `persist`, THEN register their fingerprints and
    * extend the band index. Same write-order delivery guarantee as
    * the text registry: a crash between persist and register replays
    * as at-least-once and self-matches. */
  def dedupAppend(batch: DataFrame,
                  persist: DataFrame => Unit = _ => ()): DataFrame =
    core.dedupAppendFromSignatures(batch, "media_id", sigsOf(batch), persist)

  /** dedupAppend with the corpus sink made IDEMPOTENT PER BATCH (the
    * registry family's streaming wiring — survivors land at
    * `sinkPath/batch_id=<batchId>/` by dynamic-partition overwrite):
    * an at-least-once replay of the SAME (batch, batchId) leaves
    * exactly one copy of every surviving media row, whether the crash
    * hit before or after the fingerprint registration. Replay-after-
    * register self-matches completely — every fingerprint agrees with
    * itself on all dims, and the kernel is deterministic, so the
    * replayed batch re-derives the identical signatures. `batchId` is
    * foreachBatch's id when this runs inside the streaming curation
    * loop. */
  def dedupAppendBatch(batch: DataFrame, sinkPath: String,
                       batchId: Long): DataFrame = {
    require(!batch.columns.exists(_.equalsIgnoreCase("batch_id")),
      "MediaDupRegistry.dedupAppendBatch: batch must not contain a " +
        "batch_id column (the idempotent sink keys its partitions on it)")
    core.dedupAppendFromSignatures(batch, "media_id", sigsOf(batch),
      persist = out =>
        graft.streaming.IdempotentSink.parquetByBatch(sinkPath)(out, batchId))
  }

  /** PARAMETER MIGRATION (VERDICT r9 #6): (dim, bucketWidth, radius)
    * is the fingerprint's semantic identity and is PINNED — opening
    * this registry's path under a different triple aborts loudly on
    * first use (the sig-mode sidecar), because floor-quantized
    * buckets cannot be requantized from themselves. THIS is the
    * supported path: re-featurize and re-gate the ACCEPTED corpus'
    * payload rows — (media_id, kind, payload), exactly what the
    * streaming sink this gate populates holds — through a FRESH
    * registry pinned to the new triple at a NEW path. The in-batch
    * CC + min-id keep rule applies under the new geometry, so media
    * that only became near-dups under a coarser width/radius collapse
    * now instead of silently coexisting; this registry stays intact
    * for rollback, and the stream re-points to the returned registry
    * at a micro-batch boundary (the r7 refit-mid-stream convention).
    * 100 TB: one re-featurize pass over accepted payloads — the same
    * cost as having ingested under the new triple from the start;
    * there is no cheaper sound migration (lossy buckets). */
  def migrateTo(newPath: String, newDim: Int, newWidth: Double,
                newRadius: Int, accepted: DataFrame,
                newKernel: MediaKernel = kernel): MediaDupRegistry = {
    val next = new MediaDupRegistry(newPath, newDim, newWidth, newRadius,
      nBuckets, newKernel)
    next.dedupAppend(accepted.select(col("media_id"), col("kind"),
      col("payload")))
    next
  }
}
