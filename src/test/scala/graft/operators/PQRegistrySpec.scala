package graft.operators

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PQRegistry lifecycle contracts (VERDICT r9 #3): the persisted
  * PQ serving store must (a) answer probes identically to the
  * in-memory ivfPqTopK stack it persists, (b) admit idempotently by
  * vid (double-ingest cannot double code rows — duplicated (vid, blk)
  * rows would corrupt ADC sums, not just waste space), (c) survive a
  * codebook refit with every code re-encoded and the generation
  * swapped, (d) detect every torn codebook/codes state loudly before
  * planning a scan, and (e) compact without changing one probe row. */
class PQRegistrySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val m = 4
  private val nVec = 40

  /** Deterministic corpus: contiguous ids (the pqFit seed rule),
    * components in [-1, 1]. */
  private def corpus: DataFrame =
    (0 until nVec).map { id =>
      (id.toLong, Array.tabulate(dim)(j => ((id * 31 + j * 7) % 13 - 6) / 6.0f))
    }.toDF("vec_id", "embedding")

  private def cents: DataFrame = corpus.filter(col("vec_id") < 3)
  private def queries: DataFrame =
    corpus.filter(col("vec_id") >= 5 && col("vec_id") < 10)

  private def seeded(ksub: Int = 4): (PQRegistry, String) = {
    val root = Files.createTempDirectory("graft_pqreg_spec_").toString
    val reg = new PQRegistry(s"$root/reg")
    reg.fit(spark, corpus, cents, "vec_id", "embedding",
      m = m, ksub = ksub, dim = dim, maxIter = 3)
    assert(reg.ingest(corpus, "vec_id", "embedding") === nVec.toLong)
    (reg, s"$root/reg")
  }

  private def probe(reg: PQRegistry, nprobe: Int = 2): Seq[(Long, Int, Long, Long)] =
    reg.adcProbe(spark, queries, "vec_id", "embedding", k = 3, nprobe = nprobe)
      .select("query_id", "rank", "neighbor_id", "adist")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))

  test("persisted probe equals the in-memory ivfPqTopK stack it stores") {
    val (reg, _) = seeded()
    val cb = ProductQuantizer.pqFit(corpus, "vec_id", "embedding",
      m = m, ksub = 4, maxIter = 3, dim = dim)
    val asg = Similarity.assignCells(corpus, cents, "vec_id", "embedding",
        spread = false)
      .select(col("id").as("vid"), col("cell"))
    val enc = ProductQuantizer.pqEncode(corpus, cb, "vec_id", "embedding",
      m, dim)
    val mem = ProductQuantizer.ivfPqTopK(queries, enc, asg, cb, cents,
        "vec_id", "embedding", k = 3, nprobe = 2, m = m, dim = dim)
      .select("query_id", "rank", "neighbor_id", "adist")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(mem.nonEmpty)
    assert(probe(reg) === mem,
      "serving from persisted codes must change no probe row")
  }

  test("ingest is idempotent by vid: a re-ingested batch admits zero " +
    "and code rows never double") {
    val (reg, _) = seeded()
    val before = reg.index.df(spark).count()
    assert(before === nVec.toLong * m)
    assert(reg.ingest(corpus, "vec_id", "embedding") === 0L,
      "re-ingesting an already-indexed batch must admit nothing")
    assert(reg.index.df(spark).count() === before,
      "double-ingest doubled code rows — ADC sums would corrupt")
    // partial overlap: only the genuinely new vids are admitted
    val extra = (nVec until nVec + 3).map { id =>
      (id.toLong, Array.tabulate(dim)(j => ((id * 31 + j * 7) % 13 - 6) / 6.0f))
    }.toDF("vec_id", "embedding")
    assert(reg.ingest(corpus.unionAll(extra), "vec_id", "embedding") === 3L)
    assert(reg.index.df(spark).count() === (nVec + 3).toLong * m)
  }

  test("ingest batch hygiene: exact duplicate rows collapse silently " +
    "(at-least-once sources); a vid carrying two DIFFERENT vectors " +
    "aborts loudly instead of blending codes") {
    val (reg, _) = seeded()
    def v(seed: Int): Array[Float] =
      Array.tabulate(dim)(j => ((seed * 31 + j * 7) % 13 - 6) / 6.0f)
    // same row twice: one vid admitted, exactly m code rows
    assert(reg.ingest(
      Seq((100L, v(100)), (100L, v(100))).toDF("vec_id", "embedding"),
      "vec_id", "embedding") === 1L)
    assert(reg.codes(spark).filter(col("vid") === 100L).count() === m.toLong)
    // conflicting vectors under one vid: loud abort, nothing admitted
    val err = intercept[IllegalArgumentException] {
      reg.ingest(
        Seq((101L, v(101)), (101L, v(999))).toDF("vec_id", "embedding"),
        "vec_id", "embedding")
    }
    assert(err.getMessage.contains("conflicting vectors"), err.getMessage)
    assert(reg.codes(spark).filter(col("vid") === 101L).count() === 0L)
  }

  test("ingest is insert-only across batch-vs-store: an already-indexed " +
    "vid arriving with a DIFFERENT vector aborts loudly instead of " +
    "silently serving stale codes (review r10 ADVICE)") {
    val (reg, _) = seeded()
    // vid 5 is indexed; re-deliver it re-embedded (constant-1 vector —
    // nowhere near its original, so at least one subvector's nearest
    // codeword moves and the code-level detector fires)
    val err = intercept[IllegalArgumentException] {
      reg.ingest(Seq((5L, Array.fill(dim)(1.0f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding")
    }
    assert(err.getMessage.contains("insert-only"), err.getMessage)
    assert(err.getMessage.contains("refit"), err.getMessage)
    // nothing admitted, stored codes untouched (still exactly m rows)
    assert(reg.codes(spark).filter(col("vid") === 5L).count() === m.toLong)
    // the IDENTICAL vector re-delivered is still a silent no-op (the
    // at-least-once redelivery path must not regress)
    assert(reg.ingest(corpus.filter(col("vec_id") === 5L),
      "vec_id", "embedding") === 0L)
  }

  test("refit retains the outgoing codebook store for one cycle " +
    "(in-flight lock-free probes keep a readable snapshot) and GCs it " +
    "on the NEXT refit (review r10 ADVICE)") {
    val (reg, root) = seeded()
    val cb1 = new java.io.File(root + "_cb_1")
    val cb2 = new java.io.File(root + "_cb_2")
    val cb3 = new java.io.File(root + "_cb_3")
    assert(cb1.exists, "fit must have written the first codebook store")
    reg.refit(spark, corpus, cents, "vec_id", "embedding",
      ksub = 8, maxIter = 3)
    assert(cb2.exists, "refit must have written the new codebook store")
    assert(cb1.exists,
      "the outgoing store must be RETAINED one refit cycle — a racing " +
        "lock-free probe may still hold lazily-planned reads over it")
    reg.refit(spark, corpus, cents, "vec_id", "embedding",
      ksub = 8, maxIter = 3)
    assert(cb3.exists)
    assert(cb2.exists, "second refit: outgoing store retained")
    assert(!cb1.exists,
      "stores older than the outgoing one have had their full cycle " +
        "and must be GC'd on the next refit")
  }

  test("refit re-encodes every code under the new codebooks and the " +
    "post-refit probe equals a fresh in-memory stack at the new ksub") {
    val (reg, _) = seeded()
    val pre = probe(reg)
    reg.refit(spark, corpus, cents, "vec_id", "embedding",
      ksub = 8, maxIter = 3)
    val cb8 = ProductQuantizer.pqFit(corpus, "vec_id", "embedding",
      m = m, ksub = 8, maxIter = 3, dim = dim)
    val asg = Similarity.assignCells(corpus, cents, "vec_id", "embedding",
        spread = false)
      .select(col("id").as("vid"), col("cell"))
    val enc8 = ProductQuantizer.pqEncode(corpus, cb8, "vec_id", "embedding",
      m, dim)
    val mem8 = ProductQuantizer.ivfPqTopK(queries, enc8, asg, cb8, cents,
        "vec_id", "embedding", k = 3, nprobe = 2, m = m, dim = dim)
      .select("query_id", "rank", "neighbor_id", "adist")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val post = probe(reg)
    assert(post === mem8,
      "post-refit serving must equal the in-memory stack at the new ksub")
    assert(post !== pre,
      "ksub 4 -> 8 must actually change ADC distances (else the refit " +
        "path was never exercised)")
    // the refit swapped generations: ingest still works against it
    assert(reg.ingest(corpus, "vec_id", "embedding") === 0L)
  }

  test("torn refit detection: a codes generation stamped under another " +
    "fingerprint aborts every read loudly instead of mis-decoding") {
    val (reg, path) = seeded()
    // simulate a crash between the codes swap and the meta/stamp write
    // by corrupting the generation's _cbfp marker
    val loc = reg.index.activeLocation(spark)
    val fs = new org.apache.hadoop.fs.Path(loc)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    RegistryIO.writeLines(fs, loc + "/_cbfp", Seq("deadbeef"))
    val err = intercept[IllegalArgumentException] {
      reg.adcProbe(spark, queries, "vec_id", "embedding", k = 3, nprobe = 1)
    }
    assert(err.getMessage.contains("wrong codebooks"), err.getMessage)
    // ingest takes the same gate
    intercept[IllegalArgumentException] {
      reg.ingest(corpus, "vec_id", "embedding")
    }
    // the documented recovery — re-run refit — restores service
    reg.refit(spark, corpus, cents, "vec_id", "embedding",
      ksub = 4, maxIter = 3)
    assert(probe(reg).nonEmpty)
  }

  test("compact folds append file groups without changing one probe row") {
    val root = Files.createTempDirectory("graft_pqreg_cpt_").toString
    val reg = new PQRegistry(s"$root/reg")
    reg.fit(spark, corpus, cents, "vec_id", "embedding",
      m = m, ksub = 4, dim = dim, maxIter = 3)
    // fragmented ingests: one file group per batch
    (0 until nVec by 5).foreach { lo =>
      reg.ingest(corpus.filter(col("vec_id") >= lo && col("vec_id") < lo + 5),
        "vec_id", "embedding")
    }
    val pre = probe(reg)
    assert(reg.codesFileCount(spark) > 8)
    assert(reg.compact(spark, maxFiles = 8))
    assert(reg.codesFileCount(spark) <= 8,
      "compaction must land the bucketed file bound")
    assert(probe(reg) === pre, "compaction changed probe rows")
    assert(!reg.compact(spark, maxFiles = 8), "already compact")
  }

  test("RESIDUAL mode (IVFADC): the stored mode drives fit/encode/probe — " +
    "the persisted probe equals the in-memory ivfadcTopK stack, and a " +
    "refit re-encodes residuals under the new codebooks") {
    val root = Files.createTempDirectory("graft_pqreg_res_").toString
    val reg = new PQRegistry(s"$root/reg")
    reg.fit(spark, corpus, cents, "vec_id", "embedding",
      m = m, ksub = 4, dim = dim, maxIter = 3, residual = true)
    assert(reg.ingest(corpus, "vec_id", "embedding") === nVec.toLong)
    def mem(ksub: Int): Seq[(Long, Int, Long, Long)] = {
      val asg = Similarity.assignCells(corpus, cents, "vec_id", "embedding",
          spread = false)
        .select(col("id").as("vid"), col("cell"))
      val resid = ProductQuantizer.cellResiduals(corpus, cents, asg,
        "vec_id", "embedding")
      val cb = ProductQuantizer.pqFitE(resid, "vid", "r",
        m = m, ksub = ksub, maxIter = 3, dim = dim)
      val enc = ProductQuantizer.pqEncodeE(resid, cb, "vid", "r", m, dim)
      ProductQuantizer.ivfadcTopK(queries,
          ProductQuantizer.cellKeyedCodes(enc, asg), cb, cents,
          "vec_id", "embedding", k = 3, nprobe = 2, m = m, dim = dim)
        .select("query_id", "rank", "neighbor_id", "adist")
        .collect().toSeq
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2))
    }
    assert(probe(reg) === mem(4),
      "residual-mode serving from persisted codes must equal the " +
        "in-memory IVFADC stack")
    // the residual mode SURVIVES a refit (stored property, not a flag)
    reg.refit(spark, corpus, cents, "vec_id", "embedding",
      ksub = 8, maxIter = 3)
    assert(probe(reg) === mem(8),
      "post-refit residual serving must equal the in-memory stack at " +
        "the new ksub")
    assert(reg.ingest(corpus, "vec_id", "embedding") === 0L)
  }

  test("geometry and codebooks are pinned: a second fit fails loudly; " +
    "an unfitted registry refuses probes with instructions") {
    val (reg, _) = seeded()
    val err = intercept[IllegalArgumentException] {
      reg.fit(spark, corpus, cents, "vec_id", "embedding",
        m = m, ksub = 4, dim = dim, maxIter = 3)
    }
    assert(err.getMessage.contains("already fitted"), err.getMessage)
    val fresh = new PQRegistry(
      Files.createTempDirectory("graft_pqreg_uf_").toString + "/reg")
    val err2 = intercept[IllegalStateException] {
      fresh.adcProbe(spark, queries, "vec_id", "embedding", k = 3, nprobe = 1)
    }
    assert(err2.getMessage.contains("fit() first"), err2.getMessage)
  }

  test("delete: a tombstoned vid never probes and burns no pool " +
    "slot, re-ingest aborts until compact GCs it, then re-ingest " +
    "serves it again") {
    val (reg, _) = seeded()
    val q7 = corpus.filter(col("vec_id") === 7L)
    def top(k: Int): Seq[Long] =
      reg.adcProbe(spark, q7, "vec_id", "embedding", k = k, nprobe = 2)
        .orderBy(col("rank")).select("neighbor_id")
        .collect().map(_.getLong(0)).toSeq
    // delete whatever ADC currently ranks FIRST for this query (ADC
    // is approximate — the exact self-match need not top the list,
    // so the spec pins the served ranking, not an assumption)
    val first = top(1).head
    assert(reg.delete(Seq(first).toDF("vec_id"), "vec_id") === 1L)
    assert(reg.delete(Seq(first, 99999L).toDF("vec_id"), "vec_id") === 0L,
      "re-deleting and deleting unknown vids must be no-ops")
    val after = top(3)
    assert(!after.contains(first),
      s"a deleted vid must never rank (it WAS rank 1): $after")
    assert(after.size === 3,
      "deletion must not burn pool slots — k alive results still serve")
    val err = intercept[IllegalArgumentException] {
      reg.ingest(corpus.filter(col("vec_id") === first),
        "vec_id", "embedding")
    }
    assert(err.getMessage.contains("TOMBSTONED"), err.getMessage)
    // compact GCs the code rows and clears the tombstone
    assert(reg.compact(spark, maxFiles = Int.MaxValue) === true)
    assert(reg.index.df(spark).filter(col("vid") === first).count() === 0L,
      "compact must physically remove tombstoned code rows")
    assert(!top(3).contains(first))
    // the vid is re-ingestable now and serves again at its old rank
    assert(reg.ingest(corpus.filter(col("vec_id") === first),
      "vec_id", "embedding") === 1L)
    assert(top(1) === Seq(first), "a re-ingested vid must serve again")
  }
}
