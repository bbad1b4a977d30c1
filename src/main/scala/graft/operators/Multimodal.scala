package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** One media object: opaque payload bytes + routing metadata. The
  * payload column stays binary end-to-end — Spark shuffles/spills it
  * without interpretation, which is the point at 100 TB: only the
  * executor running the decode kernel ever looks inside. */
case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

/** Fixed-width feature vector extracted per media object. */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                         feature: Array[Float])

/** The injectable decode/featurize seam: productionizing means
  * SUPPLYING one of these (real header parse, real embedding model),
  * never editing the operators — `withMeta` and `extractFeatures`
  * take a kernel and default to the sandbox stub.
  *
  * `features` is iterator-in/iterator-out on purpose (the
  * mapInPandas shape): a real implementation loads its decoder/model
  * once per PARTITION before mapping rows, so per-object cost is
  * amortized across the batch. Must be Serializable — it ships to
  * executors inside the mapPartitions closure. */
trait MediaKernel extends Serializable {

  /** Image metadata (width/height/channels) as Column expressions
    * over the payload. A production kernel backs these with a real
    * header parse (custom Expression or a join against `features`
    * output); the stub derives them from the payload hash. */
  def imageMeta(payload: Column): Seq[(String, Column)]

  /** Per-partition feature extraction: decode + embed each payload.
    *
    * CONTRACT: exactly ONE MediaFeatures per input row, in input
    * order. The Iterator=>Iterator shape exists for amortization
    * (load the decoder/model once per partition), not for
    * filtering/batching — combinators like KindRoutedKernel dispatch
    * row-at-a-time and would misalign or throw on a kernel that
    * drops, duplicates, or reorders rows. A kernel that must reject
    * a row returns a sentinel MediaFeatures (e.g. empty features),
    * never skips it. */
  def features(rows: Iterator[MediaRow], dim: Int): Iterator[MediaFeatures]
}

/** The NO-DECODE kernel — metadata and features derive
  * deterministically from the payload bytes (hash-based dims,
  * bucketed byte-mean "embedding"), so the oracle queries stay
  * engine-checkable on arbitrary payloads. The Spark-side contracts —
  * schema, binary transport, partitioning, batch iteration shape —
  * are real and oracle-tested. For REAL image decode see
  * ImageIoKernel (JDK-only PNG/JPEG header parse + javax.imageio
  * pixel features); heavier codecs (video/audio) plug in the same
  * way. */
object StubMediaKernel extends MediaKernel {

  /** Metadata from the payload hash/length instead of a real header
    * parse. Pure Column exprs: codegen'd, no UDF. */
  override def imageMeta(payload: Column): Seq[(String, Column)] = {
    val h = Text.md5Long(payload, 4) // md5 of the bytes, 16 bits
    Seq(
      "width" -> (lit(64) + pmod(h, lit(8)) * 32).cast("int"),
      "height" -> (lit(64) + pmod(floor(h / 8).cast("long"), lit(8)) * 32).cast("int"),
      "channels" -> when(pmod(h, lit(4)) === 0, 1).otherwise(3).cast("int"))
  }

  /** STUB kernel: `dim` bucketed byte-mean statistics standing in for
    * a real embedding model. Deterministic. */
  override def features(rows: Iterator[MediaRow], dim: Int): Iterator[MediaFeatures] = {
    // per-partition setup would load the decoder/model ONCE here
    rows.map { r =>
      val bytes = r.payload
      val n = bytes.length
      val chunk = math.max(1, n / dim)
      val feat = Array.tabulate(dim) { i =>
        val lo = i * chunk
        val hi = math.min(lo + chunk, n)
        if (lo >= hi) 0f
        else {
          var s = 0; var j = lo
          while (j < hi) { s += bytes(j) & 0xff; j += 1 }
          // mean in double, then narrow: matches any engine that
          // computes the correctly-rounded double and casts to
          // float (bit-exact reproducibility across engines).
          (s.toDouble / (hi - lo)).toFloat
        }
      }
      MediaFeatures(r.media_id, r.kind, n, feat)
    }
  }
}

/** Kind-routing kernel combinator: image rows decode through `image`,
  * audio rows through `audio`, anything else through `fallback` — the
  * production shape where one ingest stream carries mixed media and
  * each kind needs its own real decoder (ImageIoKernel + WavKernel in
  * this sandbox). Dispatch is per ROW on the kind column the rows
  * already carry; a deployment whose kernels pay heavy per-partition
  * setup (a model load) would partition the stream by kind upstream —
  * the JDK decoders here are setup-free, so row dispatch costs
  * nothing. imageMeta delegates to the image kernel (pure Column
  * exprs are already kind-guarded by withMeta's `when(kind = ...)`). */
final class KindRoutedKernel(image: MediaKernel, audio: MediaKernel,
                             fallback: MediaKernel = StubMediaKernel)
    extends MediaKernel {
  override def imageMeta(payload: Column): Seq[(String, Column)] =
    image.imageMeta(payload)
  override def features(rows: Iterator[MediaRow], dim: Int): Iterator[MediaFeatures] =
    rows.map { r =>
      val (k, kn) = r.kind match {
        case "image" => (image, "image")
        case "audio" => (audio, "audio")
        case _ => (fallback, "fallback")
      }
      // enforce the 1:1 MediaKernel.features contract loudly — a
      // filtering kernel here would otherwise surface as a bare
      // NoSuchElementException with no hint which kernel dropped rows
      val out = k.features(Iterator(r), dim)
      if (!out.hasNext) throw new IllegalStateException(
        s"KindRoutedKernel: $kn kernel ${k.getClass.getName} emitted no " +
          s"MediaFeatures for media_id=${r.media_id} — MediaKernel.features " +
          "must be 1:1 (emit a sentinel for rejected rows, never drop them)")
      val f = out.next()
      // ... and the duplicating half of the same contract: silently
      // taking the first of several would misattribute a buffering
      // kernel's stale output to this row (review r10)
      if (out.hasNext) throw new IllegalStateException(
        s"KindRoutedKernel: $kn kernel ${k.getClass.getName} emitted " +
          s"MULTIPLE MediaFeatures for media_id=${r.media_id} — " +
          "MediaKernel.features must be 1:1")
      f
    }
}

/** Multimodal-column plumbing: images/audio/video as opaque `binary`
  * columns with typed metadata, decode/feature kernels as
  * mapPartitions over typed Datasets (the Scala-native analogue of
  * mapInPandas: one iterator per partition, kernel amortized across
  * the batch). Decode/featurize go through the MediaKernel seam
  * above; every operator here is kernel-agnostic.
  */
object Multimodal {

  /** Adapt the documents table into a media table: payload = utf8
    * bytes of the text (a stand-in for image/audio/video bytes),
    * kind assigned round-robin. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"))

  /** The sandbox default kernel's image metadata (kept as a named
    * entry point for the oracle queries; equals
    * StubMediaKernel.imageMeta). */
  def imageMetaStub(payload: Column): Seq[(String, Column)] =
    StubMediaKernel.imageMeta(payload)

  /** Typed per-media metadata: byte size for all kinds, kernel image
    * dims for images, stub duration for audio/video (duration_ms =
    * 8 * n_bytes — a fake constant "bitrate"). */
  def withMeta(media: DataFrame,
               kernel: MediaKernel = StubMediaKernel): DataFrame = {
    // Columns are looked up BY NAME (ADVICE r4): a kernel returning
    // the pairs in any order works, and a missing key fails loudly
    // instead of silently swapping width/height.
    val img = kernel.imageMeta(col("payload")).toMap
    val missing = Seq("width", "height", "channels").filterNot(img.contains)
    require(missing.isEmpty,
      s"MediaKernel.imageMeta must provide width/height/channels; missing: ${missing.mkString(", ")}")
    media
      .withColumn("n_bytes", length(col("payload")))
      .withColumn("width", when(col("kind") === "image", img("width")))
      .withColumn("height", when(col("kind") === "image", img("height")))
      .withColumn("channels", when(col("kind") === "image", img("channels")))
      .withColumn("duration_ms",
        when(col("kind") =!= "image", col("n_bytes").cast("long") * 8))
  }

  /** Frame-sampling plan for videos: one row per sampled frame
    * timestamp (every `stepMs`). Pure generator — the actual frame
    * decode would join this plan back to the payload per frame. */
  def frameSample(mediaWithMeta: DataFrame, stepMs: Long): DataFrame =
    mediaWithMeta
      .filter(col("kind") === "video")
      .select(col("media_id"), col("duration_ms"),
        posexplode(sequence(lit(0L), col("duration_ms"), lit(stepMs))))
      .select(col("media_id"), col("pos").cast("long").as("frame_no"),
        col("col").as("frame_ts_ms"))

  /** Feature extraction over typed partitions: the kernel sees one
    * iterator per partition (setup amortized), the operator only owns
    * transport and typing. */
  def extractFeatures(media: DataFrame, dim: Int,
                      kernel: MediaKernel = StubMediaKernel): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select("media_id", "kind", "payload").as[MediaRow]
      .mapPartitions(rows => kernel.features(rows, dim))
  }

  /** MEDIA NEAR-DUP FUNNEL, post-kernel half (VERDICT r7 #5 — the
    * multimodal analogue of the q195 text funnel): feature vectors →
    * per-dim quantized fingerprint (floor(value / bucketWidth)) →
    * BANDED candidates (radius+1 bands over the dims: by pigeonhole
    * a pair differing in <= radius dims leaves at least one band
    * untouched, so band-equality candidates are COMPLETE for the
    * radius, the q144 argument) → exact differing-dim verify →
    * connected components → min-id keeper. One row per media:
    * (media_id, kind, n_bytes, nd_cluster, kept).
    *
    * `maxBandDf` (the q31 inverted-index discipline): band keys
    * matching more than this many media are DROPPED before pair
    * generation — a boilerplate mode would otherwise generate
    * ~df²/2 candidates under one key; dropping hot keys bounds
    * per-key work at ~maxBandDf² and loses only pairs whose EVERY
    * shared band is hot (documented approximation, same trade as
    * the shingle maxDf guard). 100 TB: pair generation is blocked by
    * (band_no, band_key) equi-joins with hot keys capped, the verify
    * is candidate-bounded, CC is sparse by the radius — no all-pairs
    * stage.
    *
    * `features` is any (media_id, kind, n_bytes, feature) frame —
    * the kernel seam's output (nearDupFunnel) or a synthesized
    * feature table (the ScaleCheck 100x row). All post-quantization
    * arithmetic is exact integers, so the DuckDB oracle replays it
    * from the q44-hash-checked feature values. */
  def nearDupFunnelFromFeatures(features: DataFrame, dim: Int,
                                bucketWidth: Double, radius: Int,
                                maxBandDf: Int): DataFrame = {
    require(radius >= 0 && bucketWidth > 0 && maxBandDf > 0)
    val bands = radius + 1
    val w = (dim + bands - 1) / bands
    val fq = Dedup.DefaultMaterialize(features.select(
      col("media_id"), col("kind"), col("n_bytes"),
      transform(col("feature"),
        v => floor(v.cast("double") / lit(bucketWidth)).cast("long"))
        .as("buckets")))
    val banded = fq.select(col("media_id"), posexplode(
        array((0 until bands).map(b =>
          concat_ws(":", slice(col("buckets"), b * w + 1, w))): _*)))
      .select(col("media_id"), col("pos").as("band_no"),
        col("col").as("band_key"))
    // hot-key guard: per-(band, key) document frequency, keys over
    // the cap dropped on BOTH sides of the self-join
    val ok = banded.groupBy("band_no", "band_key")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxBandDf)
      .select("band_no", "band_key")
    val bandedOk = Dedup.DefaultMaterialize(
      banded.join(ok, Seq("band_no", "band_key")))
    val cand = bandedOk.as("a").join(bandedOk.as("b"),
        col("a.band_no") === col("b.band_no") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .distinct()
    val pairs = cand
      .join(fq.select(col("media_id").as("id_a"), col("buckets").as("ba")),
        Seq("id_a"))
      .join(fq.select(col("media_id").as("id_b"), col("buckets").as("bb")),
        Seq("id_b"))
      .withColumn("nd_diff", aggregate(
        zip_with(col("ba"), col("bb"),
          (x, y) => when(x === y, 0).otherwise(1)),
        lit(0), (acc, x) => acc + x))
      .filter(col("nd_diff") <= radius)
      .select("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
    val member = fq.select(col("media_id"), col("kind"), col("n_bytes"))
      .join(cc.withColumnRenamed("id", "media_id"), Seq("media_id"), "left")
    val keeper = member.filter(col("cluster").isNotNull)
      .groupBy("cluster").agg(min(col("media_id")).as("keep_id"))
    member.join(keeper, Seq("cluster"), "left")
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("cluster").as("nd_cluster"),
        (col("cluster").isNull || col("media_id") === col("keep_id"))
          .as("kept"))
  }

  /** The full media near-dup funnel: payload bytes through the
    * decode/featurize kernel seam, then the banded near-dup half —
    * media's q195, one composed plan. */
  def nearDupFunnel(media: DataFrame, dim: Int, bucketWidth: Double,
                    radius: Int, maxBandDf: Int,
                    kernel: MediaKernel = StubMediaKernel): DataFrame =
    nearDupFunnelFromFeatures(
      extractFeatures(media, dim, kernel).toDF(),
      dim, bucketWidth, radius, maxBandDf)
}
