package graft.operators

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KnnGraphRegistry lifecycle contracts: (a) the persisted probe
  * equals the in-memory beam search over the same build, (b) ingest
  * is idempotent by vid, insert-only across batch-vs-store (exact
  * vector compare), and makes new nodes REACHABLE from old queries,
  * (c) EDGES-FIRST crash debris (edges whose endpoint vector never
  * committed) is inert — never served, physically dropped at
  * maintain(), (d) maintain restores the per-src K invariant without
  * losing the attach edges that matter, (e) geometry is pinned. */
class KnnGraphRegistrySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val k = 4
  private val nOld = 60

  // modulus 101 (prime, > any id used): vectors are pairwise DISTINCT
  // across ids — a small modulus makes the corpus periodic duplicate
  // cliques whose K lists fill with dist-0 edges, disconnecting the
  // graph (found by this spec's own first run)
  private def vec(seed: Int): Array[Float] =
    Array.tabulate(dim)(j => ((seed * 37 + j * 11) % 101 - 50) / 50.0f)
  private def corpus(ids: Range): DataFrame =
    ids.map(id => (id.toLong, vec(id))).toDF("vec_id", "embedding")

  private def seeded(): (KnnGraphRegistry, String) = {
    val root = Files.createTempDirectory("graft_grreg_spec_").toString
    val reg = new KnnGraphRegistry(s"$root/reg")
    reg.fit(spark, corpus(0 until nOld), "vec_id", "embedding",
      k = k, iters = 2, seed = "spec")
    (reg, s"$root/reg")
  }

  private def probeRows(reg: KnnGraphRegistry, qs: DataFrame,
                        kk: Int = 3): Seq[(Long, Int, Long, Long)] =
    reg.probe(spark, qs, "vec_id", "embedding",
        k = kk, beam = 8, hops = 4, entries = 2)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))

  test("persisted probe equals the in-memory beam search it stores") {
    val (reg, _) = seeded()
    val c = corpus(0 until nOld)
    val qs = c.filter(col("vec_id") < 5)
    val g = KnnGraph.nnDescent(c, "vec_id", "embedding",
      k = k, iters = 2, seed = "spec")
    val mem = KnnGraph.beamSearch(g, c, qs, "vec_id", "embedding",
        k = 3, beam = 8, hops = 4, entries = 2, seed = "spec")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(mem.nonEmpty)
    assert(probeRows(reg, qs) === mem,
      "serving from the persisted stores must change no probe row")
  }

  test("ingest: idempotent by vid, insert-only on re-embedded vids, " +
    "and ingested near-duplicates become REACHABLE at distance 0") {
    val (reg, _) = seeded()
    // the batch duplicates vectors of existing nodes 3 and 7 under
    // new ids — the classic incremental near-dup arrival
    val batch = Seq((1003L, vec(3)), (1007L, vec(7)))
      .toDF("vec_id", "embedding")
    assert(reg.ingest(batch, "vec_id", "embedding") === 2L)
    val edgesAfter = reg.edgeRows(spark).count()
    assert(reg.ingest(batch, "vec_id", "embedding") === 0L,
      "re-ingesting an already-stored batch must attach nothing")
    assert(reg.edgeRows(spark).count() === edgesAfter,
      "a no-op ingest must append no edge rows")
    // a stored vid arriving re-embedded aborts loudly
    val err = intercept[IllegalArgumentException] {
      reg.ingest(Seq((1003L, vec(999))).toDF("vec_id", "embedding"),
        "vec_id", "embedding")
    }
    assert(err.getMessage.contains("insert-only"), err.getMessage)
    // probing with node 3's vector now finds its new duplicate at
    // distance 0, rank 1 (node 3 itself ranks behind only by id
    // tie-break... both are dist 0; 1003 > 3 so node 3 leads)
    val probe = probeRows(reg, corpus(3 to 3))
    assert(probe.exists { case (q, _, nbr, d) =>
      q == 3L && nbr == 1003L && d == 0L },
      s"the ingested duplicate must be reachable from its original: $probe")
  }

  test("EDGES-FIRST crash debris is inert: an edge whose endpoint " +
    "vector never committed is never served and maintain() drops it") {
    val (reg, _) = seeded()
    // simulate the crash window: edge rows landed, vector append died
    reg.edges.append(Seq((3L, 77777L, 0L), (77777L, 3L, 0L))
      .toDF("src", "dst", "dist"))
    val probe = probeRows(reg, corpus(3 to 3), kk = k)
    assert(!probe.exists(_._3 == 77777L),
      "an orphan edge endpoint (dist 0 — it would rank FIRST if " +
        s"scored) must never appear in a probe: $probe")
    assert(reg.maintain(spark, maxFiles = 0) === true)
    val orphans = reg.edgeRows(spark)
      .filter(col("src") === 77777L || col("dst") === 77777L).count()
    assert(orphans === 0L, "maintain must drop orphan-endpoint edges")
  }

  test("maintain restores the per-src K invariant and keeps the " +
    "attach edges that matter") {
    val (reg, _) = seeded()
    reg.ingest(Seq((1003L, vec(3))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    reg.ingest(Seq((1004L, vec(4))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    // reverse attach edges may push some src past k
    assert(reg.maintain(spark, maxFiles = 0) === true)
    val over = reg.edgeRows(spark).groupBy("src")
      .agg(count(lit(1)).as("n")).filter(col("n") > k).count()
    assert(over === 0L, "maintain must trim every src to <= k edges")
    val dup = reg.edgeRows(spark).groupBy("src", "dst")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    assert(dup === 0L, "maintain must collapse duplicate edges")
    // the dist-0 duplicate edge is rank 1 for its original — it
    // survives the trim, so the duplicate stays reachable
    val probe = probeRows(reg, corpus(3 to 3))
    assert(probe.exists { case (q, _, nbr, d) =>
      q == 3L && nbr == 1003L && d == 0L },
      s"the rank-1 attach edge must survive maintain: $probe")
  }

  test("cross-store lineage: a probe that binds edge and vector " +
    "generations from different builds aborts loudly; refit restores") {
    val (reg, _) = seeded()
    val qs = corpus(0 until 3)
    assert(probeRows(reg, qs).nonEmpty)
    // force the mixed-generation pair (the PQRegistrySpec torn-refit
    // convention): restamp ONE store's active generation as if a
    // different build produced it — what a probe would see if a refit
    // completed between its two sidecar binds
    val fs = new org.apache.hadoop.fs.Path(reg.vecs.activeLocation(spark))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    RegistryIO.writeLines(fs,
      reg.vecs.activeLocation(spark) + "/_lin", Seq("deadbeef"))
    val err = intercept[IllegalArgumentException] { probeRows(reg, qs) }
    assert(err.getMessage.contains("lineage"), err.getMessage)
    // maintenance verbs refuse the torn pair too
    intercept[IllegalArgumentException] {
      reg.ingest(corpus(200 until 205), "vec_id", "embedding")
    }
    intercept[IllegalArgumentException] { reg.stitch(spark) }
    intercept[IllegalArgumentException] { reg.maintain(spark, 0) }
    // the documented recovery — refit restamps both stores
    reg.refit(spark, corpus(0 until nOld), "vec_id", "embedding")
    assert(probeRows(reg, qs).nonEmpty)
  }

  test("pre-stamp store upgrade: a compaction-only maintain stamps " +
    "BOTH stores with one fresh lineage (ADVICE r13 — no torn pair)") {
    val (reg, _) = seeded()
    val qs = corpus(0 until 3)
    val fs = new org.apache.hadoop.fs.Path(reg.vecs.activeLocation(spark))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a store written before lineage stamps existed
    fs.delete(new org.apache.hadoop.fs.Path(
      reg.edges.activeLocation(spark) + "/_lin"), false)
    fs.delete(new org.apache.hadoop.fs.Path(
      reg.vecs.activeLocation(spark) + "/_lin"), false)
    assert(probeRows(reg, qs).nonEmpty,
      "a pre-stamp store (both stamps absent => equal) must serve")
    // the ADVICE r13 tear: nTomb == 0, so only the EDGE store is
    // rewritten — the minted upgrade lineage must still land on both
    assert(reg.maintain(spark, maxFiles = 0) === true)
    val le = RegistryIO.readLines(fs,
      reg.edges.activeLocation(spark) + "/_lin").flatMap(_.headOption)
    val lv = RegistryIO.readLines(fs,
      reg.vecs.activeLocation(spark) + "/_lin").flatMap(_.headOption)
    assert(le.nonEmpty && le === lv,
      s"upgrade must stamp both stores with one lineage: $le vs $lv")
    assert(probeRows(reg, qs).nonEmpty,
      "every subsequent probe must bind the upgraded pair cleanly")
    // and the next maintenance verb carries it forward, not aborts
    assert(reg.ingest(corpus(nOld until (nOld + 3)),
      "vec_id", "embedding") === 3L)
  }

  test("geometry is pinned: a second fit fails loudly; refit rebuilds " +
    "and the probe equals a fresh in-memory stack over the new corpus") {
    val (reg, _) = seeded()
    val err = intercept[IllegalArgumentException] {
      reg.fit(spark, corpus(0 until nOld), "vec_id", "embedding",
        k = k, iters = 2, seed = "spec")
    }
    assert(err.getMessage.contains("already fitted"), err.getMessage)
    val c2 = corpus(0 until (nOld + 10))
    reg.refit(spark, c2, "vec_id", "embedding")
    val qs = c2.filter(col("vec_id") < 5)
    val g2 = KnnGraph.nnDescent(c2, "vec_id", "embedding",
      k = k, iters = 2, seed = "spec")
    val mem = KnnGraph.beamSearch(g2, c2, qs, "vec_id", "embedding",
        k = 3, beam = 8, hops = 4, entries = 2, seed = "spec")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(probeRows(reg, qs) === mem,
      "post-refit serving must equal the in-memory stack on the " +
        "refit corpus")
  }

  test("delete: a tombstoned vid never probes (even as the nearest " +
    "match), re-ingest aborts until maintain GCs it, then re-ingest " +
    "serves it again") {
    import spark.implicits._
    val (reg, _) = seeded()
    // 1003 duplicates node 3's vector: rank-1 for query 3 — until
    // deleted
    reg.ingest(Seq((1003L, vec(3))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    assert(probeRows(reg, corpus(3 to 3)).exists(r =>
      r._3 == 1003L && r._4 == 0L))
    assert(reg.delete(Seq(1003L).toDF("vec_id"), "vec_id") === 1L)
    assert(reg.delete(Seq(1003L, 99999L).toDF("vec_id"), "vec_id") === 0L,
      "re-deleting and deleting unknown vids must be no-ops")
    val after = probeRows(reg, corpus(3 to 3))
    assert(!after.exists(_._3 == 1003L),
      s"a deleted vid must never rank (it was the dist-0 nearest): $after")
    assert(after.size === 3,
      "deletion must not shrink the served k while enough nodes live")
    val err = intercept[IllegalArgumentException] {
      reg.ingest(Seq((1003L, vec(3))).toDF("vec_id", "embedding"),
        "vec_id", "embedding")
    }
    assert(err.getMessage.contains("TOMBSTONED"), err.getMessage)
    // maintain GCs vector + incident edges and clears the tombstone
    assert(reg.maintain(spark, maxFiles = Int.MaxValue) === true,
      "standing tombstones must force the maintain rewrite")
    assert(reg.vecs.df(spark).filter(col("vid") === 1003L).count() === 0L)
    assert(reg.edgeRows(spark)
      .filter(col("src") === 1003L || col("dst") === 1003L).count() === 0L,
      "maintain must drop every edge incident to a GC'd vid")
    // re-ingestable and serving again
    assert(reg.ingest(Seq((1003L, vec(3))).toDF("vec_id", "embedding"),
      "vec_id", "embedding") === 1L)
    assert(probeRows(reg, corpus(3 to 3)).exists(r =>
      r._3 == 1003L && r._4 == 0L),
      "a re-ingested vid must serve again")
  }

  test("stitch: cross-batch near-duplicates get DIRECT edges (absent " +
    "before, both directions after), idempotently; refit clears the " +
    "ledger") {
    import spark.implicits._
    val (reg, _) = seeded()
    // two identical vectors arriving in DIFFERENT ingest batches.
    // The attach search CAN cross batches when its beam reaches the
    // earlier arrival (the vector store already holds it) — so this
    // spec deliberately cripples attach (hops = 0, entries = 1: the
    // beam never leaves the single entry node, deterministically node
    // 27 under seed "spec") to exhibit the blindness stitch exists
    // for: neither twin learns of the other at ingest.
    reg.ingest(Seq((200L, vec(200))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", beam = 8, hops = 0, entries = 1)
    reg.ingest(Seq((201L, vec(200))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", beam = 8, hops = 0, entries = 1)
    def direct() = reg.edgeRows(spark)
      .filter(col("src").isin(200L, 201L) && col("dst").isin(200L, 201L))
      .select("src", "dst").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(direct() === Set.empty,
      "pre-stitch, cross-batch ingests know each other only via the " +
        "old graph")
    assert(reg.stitch(spark) === 2L)
    assert(direct() === Set((200L, 201L), (201L, 200L)),
      "stitch must append the cross-batch edges both ways")
    // idempotent: a second stitch re-appends identical rows only
    assert(reg.stitch(spark) === 2L)
    assert(reg.maintain(spark, maxFiles = 0) === true)
    assert(direct() === Set((200L, 201L), (201L, 200L)))
    val dup = reg.edgeRows(spark).groupBy("src", "dst")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    assert(dup === 0L, "maintain must collapse stitch re-appends")
    // refit spends the ledger
    reg.refit(spark, corpus(0 until nOld), "vec_id", "embedding")
    assert(reg.stitch(spark) === 0L,
      "refit must clear the post-fit ingest ledger")
  }
}
