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

  test("index compaction is invisible to the gate; forget still works after it") {
    // VERDICT r5 #8: the fingerprint index fragments one file group
    // per batch; compaction rewrites it generation-swap style (no
    // in-place overwrite crash window) with probe verdicts unchanged.
    val dir = Files.createTempDirectory("graft_winregc_").toString
    val reg = new WinnowRegistry(s"$dir/reg", n = 3, w = 4, minShared = 2)
    val pA = (1 to 20).map(i => s"aa$i").mkString(" ")
    val pB = (1 to 20).map(i => s"bb$i").mkString(" ")
    reg.dedupAppend(Seq((1L, s"start $pA end")).toDF("doc_id", "text"), "doc_id", "text")
    reg.dedupAppend(Seq((2L, s"open $pB close")).toDF("doc_id", "text"), "doc_id", "text")
    reg.dedupAppend(Seq((3L, "lone words sharing nothing with any other document at all today"))
      .toDF("doc_id", "text"), "doc_id", "text")
    def files(loc: String): Int =
      new java.io.File(loc).listFiles.count(f =>
        f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val locBefore = reg.indexLocation(spark)
    val before = files(locBefore)
    assert(before >= 3)

    assert(!reg.compactIndex(spark, maxFiles = 100)) // under threshold: no-op
    assert(reg.indexLocation(spark) === locBefore)   // no-op keeps the gen
    assert(reg.compactIndex(spark, maxFiles = 2))
    // DETERMINISTIC post-compaction contract (VERDICT r6 #3 — the
    // old `after < before` form flaked twice under the full parallel
    // suite): the generation pointer MOVED, and the rewrite landed at
    // most nBuckets committed files (GenIndex aligns its repartition
    // with the bucket-id hash, so the bound holds by construction on
    // any host/load; `before` is a property of how the three appends
    // happened to split, not of compaction).
    val locAfter = reg.indexLocation(spark)
    assert(locAfter !== locBefore, "compaction must swap generations")
    val after = files(locAfter)
    assert(after <= 8, s"compacted generation holds $after files (> nBuckets=8)")

    // gate verdicts unchanged, including from a FRESH instance
    // (sidecar resolution): a partial copy of doc 1 is still dropped,
    // fresh content still admitted
    val reg2 = new WinnowRegistry(s"$dir/reg", n = 3, w = 4, minShared = 2)
    val out = reg2.dedupAppend(Seq(
      (10L, s"requote $pA tail"),
      (11L, "brand new material overlapping nothing previously accepted in this registry ever")
    ).toDF("doc_id", "text"), "doc_id", "text")
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(11L))

    // forget rewrites the COMPACTED generation: doc 1's passage
    // becomes admissible again
    reg2.forget(spark, Seq(1L))
    val re = reg2.dedupAppend(
      Seq((12L, s"fresh frame $pA other side")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(re.select("doc_id").as[Long].collect().toSeq == Seq(12L))
  }
}
