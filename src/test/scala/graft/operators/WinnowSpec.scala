package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The winnowing guarantee on planted data: any shared passage of
  * >= w + k - 1 tokens must produce a shared SELECTED fingerprint;
  * unrelated docs share none; density bounds hold everywhere. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val passage = "quick brown fox jumps over lazy" // 6 = w+k-1 tokens
  private val docs = Seq(
    (1L, s"alpha beta gamma $passage delta epsilon zeta eta theta"),
    (2L, s"one two three four $passage five six seven eight nine"),
    (3L, "completely unrelated text with nothing shared at all here today")
  ).toDF("doc_id", "text")

  private def fps = Winnow.fingerprints(docs, "doc_id", "text", n = 3, w = 4)

  test("a shared w+k-1 passage guarantees a shared fingerprint") {
    val pairs = Winnow.sharedPairs(fps, minShared = 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "guaranteed match not found")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc must share nothing")
  }

  test("density bounds hold on every doc") {
    val prof = Winnow.profile(fps, docs, "doc_id", "text", n = 3, w = 4)
    val rows = prof.select("lb_ok", "ub_ok").collect()
    assert(rows.nonEmpty && rows.forall(r => r.getBoolean(0) && r.getBoolean(1)))
  }
}
