package graft.operators

import graft.SparkSpec
import java.nio.file.Files

/** The cross-run partial-overlap gate: a later batch's partial copy
  * of an accepted doc is dropped without re-reading the corpus,
  * in-batch overlaps resolve to the min-id representative, replaying
  * a batch self-matches to empty, and a (n, w) mismatch fails loudly. */
class WinnowRegistrySpec extends SparkSpec {
  import spark.implicits._

  private val passage = (1 to 20).map(i => s"pass$i").mkString(" ")

  test("cross-run drop, in-batch CC, replay converges, params guard") {
    val dir = Files.createTempDirectory("graft_winreg_").toString
    val reg = new WinnowRegistry(s"$dir/reg", n = 3, w = 4, minShared = 2)

    val b1 = Seq(
      (1L, s"alpha beta gamma $passage delta epsilon"),
      (2L, "totally different content about nothing shared here at all with anyone")
    ).toDF("doc_id", "text")
    val kept1 = reg.dedupAppend(b1, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept1 == Set(1L, 2L))

    // doc 3 embeds doc 1's passage -> cross-run drop; doc 4 is fresh
    // -> kept; docs 5 and 6 share a passage with EACH OTHER only ->
    // in-batch CC keeps the min id (5)
    val p2 = (1 to 20).map(i => s"other$i").mkString(" ")
    val b2 = Seq(
      (3L, s"one two three $passage four five six"),
      (4L, "fresh unrelated words that match nothing else in any batch today ok fine"),
      (5L, s"intro $p2 outro"),
      (6L, s"different intro $p2 different outro")
    ).toDF("doc_id", "text")
    val kept2 = reg.dedupAppend(b2, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == Set(4L, 5L))

    // at-least-once replay: survivors now self-match in the index
    val replay = reg.dedupAppend(b2, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(replay.isEmpty, s"replay must self-match to empty, got $replay")

    // right-to-be-forgotten: after forgetting doc 1, a copy of its
    // passage is admissible again
    reg.forget(spark, Seq(1L))
    val b3 = Seq((9L, s"re post $passage of the forgotten content"))
      .toDF("doc_id", "text")
    val kept3 = reg.dedupAppend(b3, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept3 == Set(9L), "forgotten content must be admissible again")

    // a registry is pinned to its (n, w)
    val bad = new WinnowRegistry(s"$dir/reg", n = 5, w = 4, minShared = 2)
    intercept[IllegalArgumentException] {
      bad.dedupAppend(b1, "doc_id", "text")
    }
  }
}
