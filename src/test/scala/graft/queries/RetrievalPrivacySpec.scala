package graft.queries

import graft.SparkSpec
import java.sql.Timestamp

/** Golden tests for the round-5 retrieval/privacy/allocation queries
  * on PLANTED data (the oracle gate re-checks them against DuckDB at
  * sf0.01; these pin the mathematical invariants on cases small
  * enough to verify by hand). Each writes a tiny table and runs the
  * REAL SparkEntry query against it. */
class RetrievalPrivacySpec extends SparkSpec {
  import spark.implicits._

  private def plantDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_rp").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("q178: allocations sum EXACTLY to the budget and follow sqrt weights") {
    // t = 100 vs 400 per source: proportional would split 1:4,
    // alpha=0.5 splits by sqrt -> 1:2.
    val dir = plantDocs(Seq(
      (0L, "x", "en", "small", 100L),
      (1L, "x", "en", "big", 400L)))
    val out = graft.SparkEntry.queries("q178_alpha_allocation")(spark, dir)
      .select("source", "alloc").as[(String, Long)].collect().toMap
    assert(out.values.sum == 1000000L, "largest-remainder must hand out every unit")
    // sqrt(100)=10, sqrt(400)=20 -> exactly 1/3 and 2/3 of the budget
    assert(out("small") == 333333L || out("small") == 333334L)
    assert(out("big") + out("small") == 1000000L)
    assert(out("big") < 800000L, "alpha=0.5 must flatten the proportional 4/5 share")
  }

  test("q179: generalization ladder — coarser QI strictly reduces suppression here") {
    // 12 docs: level 0 groups by (lang, source, n_chars div 100) ->
    // six 2-doc groups, all risky (< 5). Level 1 groups by
    // (lang, n_chars div 500) -> two 6-doc groups, none risky.
    val dir = plantDocs((0 until 12).map { i =>
      (i.toLong, "x", if (i % 2 == 0) "en" else "de", s"s${i % 6}", (i % 3) * 100L)
    })
    val byLevel = graft.SparkEntry.queries("q179_k_anonymity")(spark, dir)
      .select("level", "risky_rows", "suppress_ppm")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byLevel(0) == ((12L, 1000000L)), "every level-0 group is below k")
    assert(byLevel(1) == ((0L, 0L)), "level-1 groups are all >= k")
  }

  test("q177: tf saturation and length normalization rank as BM25 must") {
    // Query doc 0: "alpha beta gamma delta". Candidates built so the
    // expected order is hand-derivable: doc 10 matches all 4 terms,
    // doc 11 matches 2, doc 12 matches 1 but repeated (tf saturates,
    // k1=1.2 caps the gain), doc 13 matches 1 in a LONG doc (length
    // penalty). filler tokens are unique per doc so df stays 1+1.
    def fill(id: Int, n: Int) = (0 until n).map(j => s"f$id$j").mkString(" ")
    val dir = plantDocs(Seq(
      (0L, "alpha beta gamma delta", "en", "q", 4L),
      (10L, s"alpha beta gamma delta ${fill(10, 4)}", "en", "c", 8L),
      (11L, s"alpha beta ${fill(11, 6)}", "en", "c", 8L),
      (12L, s"alpha alpha alpha alpha ${fill(12, 4)}", "en", "c", 8L),
      (13L, s"alpha ${fill(13, 15)}", "en", "c", 16L)))
    val out = graft.SparkEntry.queries("q177_bm25_topk")(spark, dir)
      .select("query_id", "doc_id", "score_micro", "rank")
      .as[(Long, Long, Long, Int)].collect()
    val q0 = out.filter(_._1 == 0L).sortBy(_._4)
    assert(q0.map(_._2).toSeq == Seq(10L, 11L, 12L, 13L),
      s"expected coverage > partial > saturated-tf > long-doc, got ${q0.toSeq}")
    // scores strictly decrease down the ranking (ties impossible here)
    assert(q0.map(_._3).sliding(2).forall { case Array(a, b) => a > b })
    // the query doc itself is never a candidate
    assert(out.forall(r => r._1 != r._2))
  }

  test("q180: repeated chunk collapses to first occurrence, order preserved") {
    val dir = plantDocs(Seq(
      // 8 tokens = two identical 4-token chunks -> keep one
      (0L, "a b c d a b c d", "en", "s", 15L),
      // no repetition -> cleaned == original tokens
      (1L, "p q r s t u v w", "en", "s", 15L),
      // 3 chunks, chunks 0 and 2 identical, middle differs: cleaned
      // keeps reading order "a b c d x y z w"
      (2L, "a b c d x y z w a b c d", "en", "s", 23L)))
    val out = graft.SparkEntry.queries("q180_selfrep_scrub")(spark, dir)
      .select("doc_id", "n_chunks", "n_kept", "rep_ppm", "cleaned")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(0L) == ((2L, 1L, 500000L, "a b c d")))
    assert(out(1L) == ((2L, 2L, 0L, "p q r s t u v w")))
    assert(out(2L) == ((3L, 2L, 333333L, "a b c d x y z w")))
  }

  test("q181: merged histogram locates every exact rank statistic") {
    val d = java.nio.file.Files.createTempDirectory("graft_rp_ev").toString
    // 100 events, value = 1.0 .. 100.0 over 4 event types; micro =
    // 1000..100000, bucket width 500 micro = 0.5 units.
    val rows = (1 to 100).map { i =>
      (i.toLong, Timestamp.valueOf("2026-01-01 00:00:00"), i.toLong % 7,
        s"t${i % 4}", i.toDouble, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val out = graft.SparkEntry.queries("q181_histogram_quantile")(spark, d)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))).toMap
    // p50 -> rank 50 -> value 50.0 -> micro 50000; p95 -> 95000; p99 -> 99000
    assert(out(50)._3 == 50000L && out(95)._3 == 95000L && out(99)._3 == 99000L)
    out.foreach { case (pct, (_, lo, exact, contained, midOk, mergeExact)) =>
      assert(contained && midOk && mergeExact, s"p$pct guarantees must hold")
      assert(lo <= exact && exact < lo + 500, s"p$pct bucket must bracket exact")
    }
  }
}
