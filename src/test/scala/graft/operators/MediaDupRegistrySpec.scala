package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-run MEDIA near-dup gating through the quantized-fingerprint
  * registry (the q210 funnel's verdict as a persistent gate, riding
  * the NearDupRegistry core): batch 2 must drop a within-radius
  * variant of a batch-1 media object without ever seeing batch 1's
  * payload, in-batch chains resolve to one representative via CC,
  * replays converge, and the (dim, width, radius) identity is pinned
  * against both parameter drift and text/media cross-opens. */
class MediaDupRegistrySpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 8
  private val Width = 4.0

  /** 64-byte payload: slice i (8 bytes) holds constant vals(i), so
    * the stub kernel's per-dim byte means ARE vals and the quantized
    * fingerprint is floor(vals(i) / 4) — Hamming distance between
    * two payloads is exactly the count of differing val buckets. */
  private def payload(vals: Int*): Array[Byte] = {
    require(vals.length == Dim)
    vals.flatMap(v => Array.fill(8)(v.toByte)).toArray
  }
  private def mediaDf(rows: Seq[(Long, Array[Byte])]) =
    rows.map { case (id, p) => (id, "image", p) }
      .toDF("media_id", "kind", "payload")

  private val base = payload(100, 100, 100, 100, 100, 100, 100, 100)
  // one bucket off (100 -> 110: bucket 25 -> 27) = Hamming 1
  private val ham1 = payload(110, 100, 100, 100, 100, 100, 100, 100)
  // two buckets off = Hamming 2 (beyond radius 1)
  private val ham2 = payload(110, 110, 100, 100, 100, 100, 100, 100)
  // Hamming 2 from base AND 3 from ham1 (no in-batch chain with it)
  private val ham2b = payload(100, 100, 110, 110, 100, 100, 100, 100)
  private val other = payload(200, 200, 200, 200, 200, 200, 200, 200)

  private def reg(dir: String, radius: Int = 1) =
    new MediaDupRegistry(dir, Dim, Width, radius)

  test("in-batch chain reps, cross-run drop AT the radius, keep past it, " +
    "replay converges") {
    val dir = java.nio.file.Files.createTempDirectory("media_reg").toString + "/reg"
    val r = reg(dir)

    // batch 1: base -- ham1 -- ham2 is a CHAIN (1~2 and 2~3 within
    // radius 1; 1~3 is Hamming 2): one component, min-id rep 1 — a
    // greedy pairwise drop would orphan 3 into a false survivor
    var persisted = Seq.empty[Long]
    val out1 = r.dedupAppend(
      mediaDf(Seq((1L, base), (2L, ham1), (3L, ham2), (4L, other))),
      persist = d => persisted = d.select("media_id").as[Long].collect().toSeq.sorted)
    assert(out1.select("media_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    assert(persisted == Seq(1L, 4L)) // sink saw survivors BEFORE registration

    // batch 2: 5 is within radius of REGISTERED 1 (payload never
    // re-read) -> dropped; 6 is Hamming 2 from every REGISTERED
    // fingerprint AND 3 from in-batch 5 (only survivors register —
    // batch 1's ham2 sig never did) -> kept. (5 and 6 must not chain
    // in-batch: a chain would collapse them onto rep 5 and drop the
    // whole cluster with it, the component-drop contract above.)
    val out2 = r.dedupAppend(mediaDf(Seq((5L, ham1), (6L, ham2b))))
    assert(out2.select("media_id").as[Long].collect().sorted.toSeq == Seq(6L))

    // at-least-once replay: batch 2's survivor self-matches now
    assert(r.dedupAppend(mediaDf(Seq((5L, ham1), (6L, ham2b)))).isEmpty)
    assert(r.read(spark).select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 4L, 6L))
  }

  test("radius 0: same buckets under different bytes is a dup, " +
    "one bucket off is not") {
    val dir = java.nio.file.Files.createTempDirectory("media_reg0").toString + "/reg"
    val r = reg(dir, radius = 0)
    r.dedupAppend(mediaDf(Seq((1L, base))))
    // 101 vs 100: different bytes, SAME bucket (floor(101/4) == 25) —
    // the quantization, not byte equality, is the verdict
    val sameBucket = payload(101, 101, 100, 103, 100, 100, 102, 100)
    val out = r.dedupAppend(mediaDf(Seq((2L, sameBucket), (3L, ham1))))
    assert(out.select("media_id").as[Long].collect().toSeq == Seq(3L))
  }

  test("probe is read-only; the persisted index gates a fresh instance") {
    val dir = java.nio.file.Files.createTempDirectory("media_reg2").toString + "/reg"
    val r = reg(dir)
    r.dedupAppend(mediaDf(Seq((1L, base), (4L, other))))
    assert(r.compactIndex(spark) || true) // maintenance must not change verdicts

    // restart: a FRESH instance over the same path probes the on-disk
    // index — near-match found with no payload history and no re-append
    val r2 = reg(dir)
    val hit = r2.probe(mediaDf(Seq((9L, ham1), (10L, ham2))))
    assert(hit.select("media_id").as[Long].collect().toSeq == Seq(9L))
    // probe registered nothing
    assert(r2.read(spark).select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 4L))
  }

  test("fingerprint identity is pinned: parameter drift and text/media " +
    "cross-opens fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("media_reg3").toString + "/reg"
    reg(dir).dedupAppend(mediaDf(Seq((1L, base))))

    // a different bucket width quantizes incompatibly — refused
    val drift = new MediaDupRegistry(dir, Dim, bucketWidth = 8.0, radius = 1)
    val e1 = intercept[IllegalArgumentException] {
      drift.probe(mediaDf(Seq((2L, base))))
    }
    assert(e1.getMessage.contains("sigMode"))

    // opening the media registry as a TEXT registry — refused
    val asText = new NearDupRegistry(dir, numPerm = Dim, bands = 2,
      rowsPerBand = 4, simThreshold = 0.5)
    val e2 = intercept[IllegalArgumentException] {
      asText.probe(Seq((2L, "some text")).toDF("doc_id", "text"), "doc_id", "text")
    }
    assert(e2.getMessage.contains("sigMode"))

    // opening a TEXT registry as a media registry — refused
    val tdir = java.nio.file.Files.createTempDirectory("media_reg4").toString + "/reg"
    new NearDupRegistry(tdir, numPerm = 32, bands = 8, rowsPerBand = 4,
      simThreshold = 0.5)
      .dedupAppend(Seq((1L, "alpha beta gamma delta eps zeta eta theta"))
        .toDF("doc_id", "text"), "doc_id", "text")
    val asMedia = new MediaDupRegistry(tdir, Dim, Width, radius = 1)
    val e3 = intercept[IllegalArgumentException] {
      asMedia.probe(mediaDf(Seq((2L, base))))
    }
    assert(e3.getMessage.contains("sigMode"))

    // band slices must cover the dims evenly — constructor refuses
    intercept[IllegalArgumentException] {
      new MediaDupRegistry(dir + "_x", dim = 8, bucketWidth = 4.0, radius = 2)
    }
  }
}
