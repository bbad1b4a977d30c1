package graft.operators

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** LateInteractionRegistry lifecycle contracts: (a) the persisted
  * two-stage probe equals the in-memory two-stage (and, with pool =
  * whole corpus, brute MaxSim) row for row — storage must not change
  * ranking, (b) ingest is idempotent by doc_id, insert-only on
  * re-written docs (exact token-set compare), and fit+ingest
  * converges to the same stores as a full fit, (c) TOKENS-FIRST
  * crash debris (token rows whose pooled row never committed) is
  * invisible to probes and physically dropped at maintain(),
  * (d) the token budget is pinned. */
class LateInteractionRegistrySpec extends SparkSpec {
  private val li = LateInteraction
  private val Cap = 8

  private def mkDocs(rows: Seq[Row]): DataFrame =
    df("doc_id BIGINT, text STRING", rows)

  // 12 docs over a small vocabulary with shared tokens so pooled
  // scores discriminate; queries = docs 0..1
  private val corpus = mkDocs((0L until 12L).map { i =>
    Row(i, s"alpha w$i w${i % 5} shared beta${i % 3}")
  })

  private def qv(docs: DataFrame): DataFrame =
    li.withVec(
      li.docTokens(docs.filter(col("doc_id") < 2), "doc_id", "text", Cap)
        .withColumnRenamed("doc_id", "query_id")
        .withColumnRenamed("t", "qt"),
      "qt", "qc")

  private def dv(docs: DataFrame): DataFrame =
    li.withVec(li.docTokens(docs, "doc_id", "text", Cap), "t", "dc")

  private def rowsOf(d: DataFrame): Seq[(Long, Int, Long, Long)] =
    d.collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))

  private def seeded(docs: DataFrame = corpus): LateInteractionRegistry = {
    val root = Files.createTempDirectory("graft_lireg_spec_").toString
    val reg = new LateInteractionRegistry(s"$root/reg")
    reg.fit(spark, docs, "doc_id", "text", Cap)
    reg
  }

  test("persisted probe equals the in-memory two-stage, and with " +
    "pool = whole corpus equals brute MaxSim") {
    val reg = seeded()
    val q = qv(corpus)
    val d = dv(corpus)
    val mem = rowsOf(li.topK(li.prunedMaxSimScores(q, d,
      li.pooledTopC(q, d, 4).select("query_id", "doc_id")), 3))
    assert(mem.nonEmpty)
    assert(rowsOf(reg.probe(spark, q, k = 3, c = 4)) === mem,
      "serving from the persisted stores must change no probe row")
    val brute = rowsOf(li.topK(li.maxSimScores(q, d), 3))
    assert(rowsOf(reg.probe(spark, q, k = 3, c = 100)) === brute,
      "pool = whole corpus must reduce to brute MaxSim")
  }

  test("ingest: idempotent by doc_id, insert-only on re-written docs, " +
    "and fit + ingest converges to the full-fit stores") {
    val full = seeded()
    val part = seeded(corpus.filter(col("doc_id") < 9))
    val rest = corpus.filter(col("doc_id") >= 9)
    assert(part.ingest(rest, "doc_id", "text") === 3L)
    assert(part.ingest(rest, "doc_id", "text") === 0L,
      "re-ingesting an already-stored batch must index nothing")
    // stores converge exactly (token rows and pooled sums are per-doc)
    def canon(d: DataFrame): Seq[String] =
      d.collect().map(_.toString).toSeq.sorted
    assert(canon(part.tokenRows(spark)) === canon(full.tokenRows(spark)))
    assert(canon(part.pooledRows(spark)) === canon(full.pooledRows(spark)))
    val q = qv(corpus)
    assert(rowsOf(part.probe(spark, q, 3, 4)) ===
      rowsOf(full.probe(spark, q, 3, 4)),
      "incremental build must serve the identical two-stage result")
    // a stored doc arriving re-written aborts loudly
    val err = intercept[IllegalArgumentException] {
      part.ingest(mkDocs(Seq(Row(9L, "completely different text"))),
        "doc_id", "text")
    }
    assert(err.getMessage.contains("insert-only"), err.getMessage)
    // one doc_id with two texts in one batch aborts loudly
    val err2 = intercept[IllegalArgumentException] {
      part.ingest(mkDocs(Seq(Row(20L, "aa bb"), Row(20L, "cc dd"))),
        "doc_id", "text")
    }
    assert(err2.getMessage.contains("conflicting"), err2.getMessage)
  }

  test("zero-token docs index nothing and do not break idempotence") {
    val reg = seeded(corpus.filter(col("doc_id") < 10))
    val batch = mkDocs(Seq(Row(30L, ""), Row(31L, "alpha shared")))
    assert(reg.ingest(batch, "doc_id", "text") === 1L,
      "only the token-bearing doc counts as indexed")
    assert(reg.tokenRows(spark).filter(col("doc_id") === 30L).count() === 0L)
    assert(reg.pooledRows(spark).filter(col("doc_id") === 30L).count() === 0L)
  }

  test("TOKENS-FIRST crash debris is invisible: token rows with no " +
    "pooled row never probe and maintain() drops them") {
    val reg = seeded()
    // simulate the crash window: token rows landed, pooled append died.
    // give the orphan HUGE components — it would dominate stage 1 and
    // stage 2 if it were visible anywhere
    reg.tokens.append(df(
      ("doc_id BIGINT, t STRING, " +
        (0 until li.Dim).map(j => s"dc$j BIGINT").mkString(", ")),
      Seq(Row(777L, "alpha", 999L, 999L, 999L, 999L, 999L, 999L))))
    val q = qv(corpus)
    val probe = rowsOf(reg.probe(spark, q, 3, 100))
    assert(!probe.exists(_._3 == 777L),
      s"an orphan token doc must never appear in a probe: $probe")
    assert(reg.maintain(spark, maxFiles = 0) === true)
    assert(reg.tokenRows(spark).filter(col("doc_id") === 777L).count() === 0L,
      "maintain must drop orphan token rows")
  }

  test("a RETRIED crashed ingest succeeds over its own orphan token " +
    "rows (the class-doc crash-recovery contract)") {
    // the crash window the TOKENS-FIRST commit order leaves behind: a
    // doc's token rows committed, the pooled append died. The retry
    // must re-append duplicate token rows and commit the pooled row —
    // NOT abort as an insert-only conflict (the ADVICE r12 false
    // positive: the detector saw the orphans one-sided because the
    // doc was absent from the pooled store).
    val reg = seeded(corpus.filter(col("doc_id") < 10))
    val crashDoc = corpus.filter(col("doc_id") === 10L)
    // simulate the crashed first attempt: exactly the token rows the
    // ingest derivation would have written, no pooled row
    val orphan = li.withVec(
      li.docTokens(crashDoc, "doc_id", "text", Cap), "t", "dc")
    reg.tokens.append(orphan)
    assert(reg.pooledRows(spark).filter(col("doc_id") === 10L).count() === 0L)
    // the retry: must index the doc, not abort with "requires refit"
    assert(reg.ingest(crashDoc, "doc_id", "text") === 1L)
    // and the served state equals a registry that never crashed
    // (duplicate token rows collapse under MaxSim's max; the pooled
    // sums never re-derive from tokens)
    val clean = seeded(corpus.filter(col("doc_id") < 11))
    val q = qv(corpus)
    assert(rowsOf(reg.probe(spark, q, 3, 100)) ===
      rowsOf(clean.probe(spark, q, 3, 100)),
      "post-retry serving must equal the never-crashed registry")
    // maintain() physically removes the duplicate orphan rows
    assert(reg.maintain(spark, maxFiles = 0) === true)
    assert(canonTok(reg) === canonTok(clean),
      "post-maintain token stores must converge exactly")
  }

  test("a crashed ingest retried with DIFFERENT text aborts (orphan " +
    "guard, ADVICE r13); maintain() GCs the orphans, then the new " +
    "text ingests cleanly") {
    val reg = seeded(corpus.filter(col("doc_id") < 10))
    val oldDoc = mkDocs(Seq(Row(10L, "alpha old original")))
    val newDoc = mkDocs(Seq(Row(10L, "beta rewritten body")))
    // the crash window: the OLD text's token rows committed, the
    // pooled append died — then the document was edited upstream
    reg.tokens.append(li.withVec(
      li.docTokens(oldDoc, "doc_id", "text", Cap), "t", "dc"))
    // without the orphan guard this retry would silently append the
    // NEW derivation next to the OLD orphan rows; once the pooled row
    // commits, maintain's pooled semi-join keeps BOTH token sets and
    // the doc's MaxSim scores over the max of two texts forever
    val err = intercept[IllegalArgumentException] {
      reg.ingest(newDoc, "doc_id", "text")
    }
    assert(err.getMessage.contains("UNCOMMITTED"), err.getMessage)
    // the SAME text still retries fine next to its own orphans (the
    // class-doc crash-recovery contract is untouched)...
    // ...but first: the documented repair for the changed doc
    assert(reg.maintain(spark, maxFiles = 0) === true)
    assert(reg.tokenRows(spark).filter(col("doc_id") === 10L).count() === 0L,
      "maintain must GC the old-text orphan rows")
    assert(reg.ingest(newDoc, "doc_id", "text") === 1L)
    // served state equals a registry that never saw the old text
    val clean = seeded(corpus.filter(col("doc_id") < 10)
      .unionByName(newDoc))
    val q = qv(corpus)
    assert(rowsOf(reg.probe(spark, q, 3, 100)) ===
      rowsOf(clean.probe(spark, q, 3, 100)),
      "post-repair serving must equal the never-crashed registry")
  }

  private def canonTok(r: LateInteractionRegistry): Seq[String] =
    r.tokenRows(spark).collect().map(_.toString).toSeq.sorted

  test("delete: a tombstoned doc never serves and burns no pool slot, " +
    "re-ingest aborts until maintain GCs it, then re-ingest serves " +
    "it again") {
    val reg = seeded()
    val q = qv(corpus)
    // whatever currently serves at rank 1 for query 0 gets deleted
    val first = rowsOf(reg.probe(spark, q, 3, 4))
      .find(r => r._1 == 0L && r._2 == 1).get._3
    assert(reg.delete(df("doc_id BIGINT", Seq(Row(first))), "doc_id") === 1L)
    assert(reg.delete(df("doc_id BIGINT",
      Seq(Row(first), Row(99999L))), "doc_id") === 0L,
      "re-deleting and deleting unknown docs must be no-ops")
    val after = rowsOf(reg.probe(spark, q, 3, 4))
    assert(!after.exists(_._3 == first),
      s"a deleted doc must never serve (it WAS rank 1): $after")
    assert(after.count(_._1 == 0L) === 3,
      "deletion must not shrink the served k while enough docs live")
    val err = intercept[IllegalArgumentException] {
      reg.ingest(corpus.filter(col("doc_id") === first), "doc_id", "text")
    }
    assert(err.getMessage.contains("TOMBSTONED"), err.getMessage)
    assert(reg.maintain(spark, maxFiles = Int.MaxValue) === true,
      "standing tombstones must force the maintain rewrite")
    assert(reg.pooledRows(spark).filter(col("doc_id") === first)
      .count() === 0L)
    assert(reg.tokenRows(spark).filter(col("doc_id") === first)
      .count() === 0L, "maintain must GC the tombstoned token rows")
    assert(reg.ingest(corpus.filter(col("doc_id") === first),
      "doc_id", "text") === 1L)
    val back = rowsOf(reg.probe(spark, q, 3, 4))
    assert(back.exists(r => r._1 == 0L && r._2 == 1 && r._3 == first),
      "a re-ingested doc must serve again at its old rank")
  }

  test("cross-store lineage: a probe that binds pooled and token " +
    "generations from different builds aborts loudly; refit restores") {
    val reg = seeded()
    val q = qv(corpus)
    assert(rowsOf(reg.probe(spark, q, 3, 4)).nonEmpty)
    // force the mixed-generation pair (the PQRegistrySpec torn-refit
    // convention): restamp ONE store's active generation as if a
    // different build produced it — exactly what a probe would see if
    // a refit completed between its two sidecar binds
    val fs = new org.apache.hadoop.fs.Path(reg.pooled.activeLocation(spark))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    RegistryIO.writeLines(fs,
      reg.pooled.activeLocation(spark) + "/_lin", Seq("deadbeef"))
    val err = intercept[IllegalArgumentException] {
      reg.probe(spark, q, 3, 4)
    }
    assert(err.getMessage.contains("lineage"), err.getMessage)
    // maintenance verbs refuse to operate on (or append onto) the
    // torn pair too
    intercept[IllegalArgumentException] {
      reg.ingest(mkDocs(Seq(Row(50L, "alpha fresh"))), "doc_id", "text")
    }
    intercept[IllegalArgumentException] { reg.maintain(spark, 0) }
    // the documented recovery — refit restamps both stores
    reg.refit(spark, corpus, "doc_id", "text")
    assert(rowsOf(reg.probe(spark, q, 3, 4)).nonEmpty)
  }

  test("the token budget is pinned: a second fit fails loudly; refit " +
    "rebuilds and serves the new corpus") {
    val reg = seeded()
    val err = intercept[IllegalArgumentException] {
      reg.fit(spark, corpus, "doc_id", "text", Cap)
    }
    assert(err.getMessage.contains("already fitted"), err.getMessage)
    val c2 = mkDocs((0L until 14L).map { i =>
      Row(i, s"alpha v$i v${i % 4} shared2 beta${i % 3}")
    })
    reg.refit(spark, c2, "doc_id", "text")
    val q2 = qv(c2)
    val d2 = dv(c2)
    val mem = rowsOf(li.topK(li.prunedMaxSimScores(q2, d2,
      li.pooledTopC(q2, d2, 4).select("query_id", "doc_id")), 3))
    assert(rowsOf(reg.probe(spark, q2, 3, 4)) === mem,
      "post-refit serving must equal the in-memory stack on the " +
        "refit corpus")
  }
}
