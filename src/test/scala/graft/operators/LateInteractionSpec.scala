package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** LateInteraction (ColBERT-style MaxSim) unit properties: the
  * md5-window vector derivation against an independent JVM digest,
  * the MaxSim chain against a hand-computed reference, tie-break
  * determinism, and the two-stage identity (pool = whole corpus
  * implies two-stage == brute). */
class LateInteractionSpec extends SparkSpec {
  private val li = LateInteraction

  /** Independent reference: component j of token t via
    * java.security MessageDigest — the same digest Spark's md5() and
    * DuckDB's md5() compute (the MediaFixtures precedent). */
  private def refVec(t: String): Array[Long] = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"mv:$t".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    (0 until li.Dim).map { j =>
      java.lang.Long.parseLong(hex.substring(5 * j, 5 * j + 5), 16) % 17L - 8L
    }.toArray
  }

  private def refDot(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum

  private val docs = df("doc_id BIGINT, text STRING", Seq(
    Row(0L, "alpha beta gamma"),
    Row(1L, "beta delta"),
    Row(2L, "gamma gamma epsilon alpha"),
    Row(3L, "zeta")
  ))

  test("withVec components equal an independent MessageDigest derivation") {
    val v = li.withVec(
      li.docTokens(docs, "doc_id", "text", 24), "t", "dc").collect()
    assert(v.nonEmpty)
    v.foreach { r =>
      val expect = refVec(r.getAs[String]("t"))
      (0 until li.Dim).foreach { j =>
        assert(r.getAs[Long](s"dc$j") == expect(j),
          s"token ${r.getAs[String]("t")} comp $j")
      }
    }
  }

  test("docTokens dedups within the cap and keeps docs distinct") {
    val t = li.docTokens(docs, "doc_id", "text", 24)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t == Map(0L -> 3L, 1L -> 2L, 2L -> 3L, 3L -> 1L)) // doc 2: gamma deduped
  }

  test("maxSimScores REFUSES a query wider than the pivot bound " +
    "instead of truncating (the r14 fused-kernel guard)") {
    // 9 distinct query tokens > PivotW = 8: the guard must raise,
    // never silently drop the 9th token's contribution
    val wide = df("doc_id BIGINT, text STRING", Seq(
      Row(0L, "a1 b2 c3 d4 e5 f6 g7 h8 i9"),
      Row(1L, "a1 b2")))
    val dv = li.withVec(li.docTokens(wide, "doc_id", "text", 24), "t", "dc")
    val qv = li.withVec(
      li.docTokens(wide.filter(col("doc_id") < 1), "doc_id", "text", 24)
        .withColumnRenamed("doc_id", "query_id")
        .withColumnRenamed("t", "qt"), "qt", "qc")
    val e = intercept[Exception] { li.maxSimScores(qv, dv).collect() }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("pivot width")),
      s"expected the pivot-width refusal, got: ${chain(e).mkString(" | ")}")
  }

  test("weightedMaxSimScores REFUSES w < 1 (the slot fusion is exact " +
    "only for positive weights — ADVICE r14 guard)") {
    val dv = li.withVec(li.docTokens(docs, "doc_id", "text", 24), "t", "dc")
    val qw = li.withVec(
      li.docTokens(docs.filter(col("doc_id") < 1), "doc_id", "text", 24)
        .withColumnRenamed("doc_id", "query_id")
        .withColumnRenamed("t", "qt"), "qt", "qc")
      .withColumn("w", lit(0L))
    val e = intercept[Exception] {
      li.weightedMaxSimScores(qw, dv).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("w >= 1")),
      s"expected the w >= 1 refusal, got: ${chain(e).mkString(" | ")}")
  }

  test("maxSimScores REFUSES duplicate (query_id, qt) token rows " +
    "within the pivot bound (ADVICE r14 guard: the fused kernel " +
    "would double-count where the old groupBy-qt kernel deduped)") {
    val dv = li.withVec(li.docTokens(docs, "doc_id", "text", 24), "t", "dc")
    val q0 = li.withVec(
      li.docTokens(docs.filter(col("doc_id") < 1), "doc_id", "text", 24)
        .withColumnRenamed("doc_id", "query_id")
        .withColumnRenamed("t", "qt"), "qt", "qc")
    // 3 distinct tokens duplicated once = 6 slots: passes the width
    // check (6 <= 8), so only the distinctness guard can catch it
    val qv = q0.unionByName(q0)
    val e = intercept[Exception] { li.maxSimScores(qv, dv).collect() }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("duplicate (query_id, qt)")),
      s"expected the duplicate-qt refusal, got: ${chain(e).mkString(" | ")}")
  }

  test("maxSimScores equals the hand-computed sum-of-max reference") {
    val dv = li.withVec(li.docTokens(docs, "doc_id", "text", 24), "t", "dc")
    val qv = li.withVec(
      li.docTokens(docs.filter(col("doc_id") < 2), "doc_id", "text", 24)
        .withColumnRenamed("doc_id", "query_id")
        .withColumnRenamed("t", "qt"), "qt", "qc")
    val got = li.maxSimScores(qv, dv).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    val docToks = Map(
      0L -> Seq("alpha", "beta", "gamma"),
      1L -> Seq("beta", "delta"),
      2L -> Seq("gamma", "epsilon", "alpha"),
      3L -> Seq("zeta"))
    val expect = (for {
      q <- Seq(0L, 1L); d <- docToks.keys if d != q
    } yield (q, d) -> docToks(q).map { qt =>
      docToks(d).map(dt => refDot(refVec(qt), refVec(dt))).max
    }.sum).toMap
    assert(got == expect)
  }

  test("topK breaks score ties by doc_id ascending") {
    val scores = df("query_id BIGINT, doc_id BIGINT, score BIGINT", Seq(
      Row(1L, 9L, 10L), Row(1L, 3L, 10L), Row(1L, 5L, 10L), Row(1L, 7L, 2L)))
    val got = li.topK(scores, 2).orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id")))
    assert(got.toSeq == Seq((1, 3L), (2, 5L)))
  }

  test("pooled sums the token components per id") {
    val dv = li.withVec(li.docTokens(docs, "doc_id", "text", 24), "t", "dc")
    val p = li.pooled(dv, "doc_id", "dc", "ds").collect()
      .map(r => r.getLong(0) -> (0 until li.Dim).map(j => r.getAs[Long](s"ds$j")))
      .toMap
    val expect0 = (0 until li.Dim).map(j =>
      Seq("alpha", "beta", "gamma").map(t => refVec(t)(j)).sum)
    assert(p(0L) == expect0)
  }

  test("two-stage with pool = whole corpus equals brute MaxSim top-k") {
    val dv = li.withVec(li.docTokens(docs, "doc_id", "text", 24), "t", "dc")
    val qv = li.withVec(
      li.docTokens(docs.filter(col("doc_id") < 2), "doc_id", "text", 24)
        .withColumnRenamed("doc_id", "query_id")
        .withColumnRenamed("t", "qt"), "qt", "qc")
    val brute = li.topK(li.maxSimScores(qv, dv), 3).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("rank"), r.getLong(2), r.getLong(3))).toSet
    val cand = li.pooledTopC(qv, dv, c = 10).select("query_id", "doc_id")
    val two = li.topK(li.prunedMaxSimScores(qv, dv, cand), 3).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("rank"), r.getLong(2), r.getLong(3))).toSet
    assert(two == brute)
  }

  test("pooledTopC excludes self and respects C") {
    val dv = li.withVec(li.docTokens(docs, "doc_id", "text", 24), "t", "dc")
    val qv = li.withVec(
      li.docTokens(docs, "doc_id", "text", 24)
        .withColumnRenamed("doc_id", "query_id")
        .withColumnRenamed("t", "qt"), "qt", "qc")
    val c2 = li.pooledTopC(qv, dv, c = 2).collect()
    assert(c2.forall(r => r.getLong(0) != r.getLong(1)))
    val per = c2.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(per.values.forall(_ <= 2) && per.size == 4)
  }
}
