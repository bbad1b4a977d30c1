package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The semDedup skew valve: cells over the cap salt into
  * md5-deterministic sub-cells, bounding worst-case per-block pair
  * work at ~cap^2 whatever the data distribution does. Under-cap
  * cells must be byte-identical to plain semDedup (nsub = 1 is not
  * an approximation), and in a salted giant cell each sub-cell still
  * dedups internally even though cross-sub pairs are (documentedly)
  * invisible. */
class SemDedupCappedSpec extends SparkSpec {
  import spark.implicits._

  private def cents = Seq(
    (100L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (200L, Array(0.0f, 1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cap above every cell population: output identical to semDedup") {
    val corpus = Seq(
      (1L, Array(0.995f, 0.0998f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(0.98f, -0.198f, 0.0f, 0.0f)),
      (9L, Array(0.1f, 0.99f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "cell", "sem_cluster", "kept")
        .collect().map(_.toSeq).toSet
    val plain = canon(Similarity.semDedup(corpus, cents,
      "vec_id", "embedding", eps = 0.98))
    val capped = canon(Similarity.semDedupCapped(corpus, cents,
      "vec_id", "embedding", eps = 0.98, cellCap = 100))
    assert(capped === plain)
  }

  test("giant cell salts: one keeper PER SUB-CELL, never zero, never all") {
    // 9 near-identical x-axis vectors -> one cell, all pairwise >= eps.
    // Plain semDedup keeps exactly 1; at cap 3 the cell splits into
    // ceil(9/3) = 3 md5 sub-cells, and each non-empty sub-cell keeps
    // exactly one member (cross-sub dups are the documented miss).
    val corpus = (1 to 9).map(i =>
      (i.toLong, Array(1.0f, 0.0001f * i, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val plainKept = Similarity.semDedup(corpus, cents,
        "vec_id", "embedding", eps = 0.99)
      .filter(col("kept")).count()
    assert(plainKept === 1L)
    val out = Similarity.semDedupCapped(corpus, cents,
      "vec_id", "embedding", eps = 0.99, cellCap = 3)
    assert(out.count() === 9L)
    val kept = out.filter(col("kept")).count()
    // expected keeper count = number of distinct NON-EMPTY sub-cells
    // under the same md5 salt (md5 may leave a sub empty)
    val expectedSubs = corpus
      .select(pmod(graft.functions.Text.md5Long(
        col("vec_id").cast("string"), 12), lit(3L)).as("sub"))
      .distinct().count()
    assert(kept === expectedSubs)
    assert(kept >= 1L && kept < 9L)
  }

  test("salting only changes blocking, never membership or schema") {
    val corpus = (1 to 9).map(i =>
      (i.toLong, Array(1.0f, 0.0001f * i, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.semDedupCapped(corpus, cents,
      "vec_id", "embedding", eps = 0.99, cellCap = 3)
    assert(out.columns.toSeq ===
      Seq("id", "cell", "centroid_sim", "sem_cluster", "kept"))
    // every vector still lands in its argmax cell (assignment is
    // untouched by the salt)
    assert(out.select("cell").distinct().collect().map(_.getLong(0)).toSeq
      === Seq(100L))
  }
}
