package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SemDeDup on planted fixtures: duplicate groups are connected
  * components of the within-cell eps-cosine graph; each group keeps
  * its LOWEST-centroid-similarity member (the paper's
  * diversity-preserving rule); singletons are always kept; cross-cell
  * near-dups are invisible by construction (the documented
  * approximation of cluster blocking). */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two orthogonal centroids: cell 100 ~ x-axis, cell 200 ~ y-axis
  private def cents = Seq(
    (100L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (200L, Array(0.0f, 1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("dup group keeps the lowest-centroid-sim member; singletons kept") {
    // ids 1,2,3: a dup chain in cell 100 (1~2 and 2~3 above eps, 1~3
    // below it — the group is the CC, not the pairwise closure).
    // id 2 is closest to the centroid, id 3 farthest -> 3 is kept.
    // id 9: singleton in cell 200.
    val corpus = Seq(
      (1L, Array(0.995f, 0.0998f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(0.98f, -0.198f, 0.0f, 0.0f)),
      (9L, Array(0.1f, 0.99f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(corpus, cents, "vec_id", "embedding", eps = 0.98)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(3)).map(_.toString.toLong), r.getBoolean(4)))).toMap

    assert(out(1L)._1 == 100L && out(2L)._1 == 100L && out(3L)._1 == 100L)
    assert(out(9L)._1 == 200L)
    // one component {1,2,3} labeled by its min id
    assert(Seq(1L, 2L, 3L).map(out(_)._2) == Seq(Some(1L), Some(1L), Some(1L)))
    assert(out(9L)._2.isEmpty)
    // keep rule: farthest-from-centroid member of the group survives
    assert(out(3L)._3 && !out(1L)._3 && !out(2L)._3)
    assert(out(9L)._3)
  }

  test("cross-cell near-dups are not paired (cluster blocking)") {
    // two nearly-identical vectors on the 45-degree line land in
    // DIFFERENT cells (tie-break: cs equal-rounded -> smaller cid for
    // one, perturbation flips the other) — eps-close but never
    // compared, so both are kept
    val corpus = Seq(
      (1L, Array(1.0f, 0.999f, 0.0f, 0.0f)),
      (2L, Array(0.999f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(corpus, cents, "vec_id", "embedding", eps = 0.9)
      .select("id", "cell", "kept").as[(Long, Long, Boolean)].collect()
      .map { case (id, c, kept) => id -> ((c, kept)) }.toMap
    assert(out(1L)._1 != out(2L)._1)
    assert(out(1L)._2 && out(2L)._2)
  }
}
