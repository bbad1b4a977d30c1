package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** The integer-exact PQ stack at unit level: fit finds the obvious
  * per-subspace clusters, encode is the brute argmin, ADC ranking
  * equals a hand-computed reference, and the exact-L2 baseline is
  * exact. All arithmetic is BIGINT micro-units, so expectations are
  * computed in plain Scala with the same integers. */
class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  // dim = 4, m = 2 (two 2-dim subspaces). Subspace clusters at
  // (~0.9, 0) / (0, ~0.9) in each half; ids 0/1 are the seeds.
  private val corpus = Seq(
    (0L, Array(0.9f, 0.0f, 0.0f, 0.9f)),
    (1L, Array(0.0f, 0.9f, 0.9f, 0.0f)),
    (2L, Array(0.8f, 0.1f, 0.1f, 0.8f)), // near 0 in both subspaces
    (3L, Array(0.1f, 0.8f, 0.8f, 0.1f)), // near 1 in both subspaces
    (4L, Array(0.9f, 0.1f, 0.8f, 0.0f))  // sub0 near 0, sub1 near 1
  ).toDF("vec_id", "embedding")

  private def micro(x: Float): Long =
    math.floor(x.toDouble * 1000000 + 0.5).toLong

  test("pqFit converges to the per-subspace cluster means in exact " +
    "micro-units; encode is the brute argmin") {
    val cb = ProductQuantizer.pqFit(corpus, "vec_id", "embedding",
      m = 2, ksub = 2, maxIter = 5, dim = 4)
    val cents = cb.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    // subspace 0, codeword 0: mean of rows {0,2,4}'s first halves —
    // half-away integer mean of micro units
    def m3(a: Long, b: Long, c: Long): Long = { val s = a + b + c
      if (s >= 0) (2 * s + 3) / 6 else -((2 * -s + 3) / 6) }
    assert(cents((0L, 0L)) ==
      Seq(m3(micro(0.9f), micro(0.8f), micro(0.9f)),
        m3(micro(0.0f), micro(0.1f), micro(0.1f))))
    // subspace 1, codeword 1: mean of rows {1,3,4}'s second halves
    assert(cents((1L, 1L)) ==
      Seq(m3(micro(0.9f), micro(0.8f), micro(0.8f)),
        m3(micro(0.0f), micro(0.1f), micro(0.0f))))
    val enc = ProductQuantizer.pqEncode(corpus, cb, "vec_id", "embedding",
        m = 2, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // row 4 splits: subspace 0 with codeword 0, subspace 1 with 1
    assert(enc((4L, 0L)) == 0L && enc((4L, 1L)) == 1L)
    assert(enc((2L, 0L)) == 0L && enc((2L, 1L)) == 0L)
    assert(enc((3L, 0L)) == 1L && enc((3L, 1L)) == 1L)
  }

  test("pqTopK ranking equals the hand-computed ADC over the fitted " +
    "codebooks; bruteL2TopK is the exact integer L2") {
    val cb = ProductQuantizer.pqFit(corpus, "vec_id", "embedding",
      m = 2, ksub = 2, maxIter = 5, dim = 4)
    val enc = ProductQuantizer.pqEncode(corpus, cb, "vec_id", "embedding",
      m = 2, dim = 4)
    val q = corpus.filter(col("vec_id") === 2L)
    val got = ProductQuantizer.pqTopK(q, enc, cb, "vec_id", "embedding",
        k = 4, m = 2, dim = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getLong(3))).toSeq
    // hand ADC: per candidate sum over blk of |c|^2 - 2 q_blk . c
    val cents = cb.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    val codes = enc.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val qe = Array(0.8f, 0.1f, 0.1f, 0.8f).map(micro)
    def dot(a: Seq[Long], b: Seq[Long]) = a.zip(b).map { case (x, y) => x * y }.sum
    val want = Seq(0L, 1L, 3L, 4L).map { vid =>
      vid -> (0 to 1).map { blk =>
        val c = cents((blk.toLong, codes((vid, blk.toLong))))
        val qb = qe.slice(blk * 2, blk * 2 + 2).toSeq
        dot(c, c) - 2 * dot(qb, c)
      }.sum
    }.sortBy { case (vid, d) => (d, vid) }
    assert(got == want, s"got $got want $want")
    // exact integer L2 reference: row 0 is row 2's true nearest
    val ex = ProductQuantizer.bruteL2TopK(q, corpus, "vec_id", "embedding",
        k = 1).collect().head
    assert(ex.getLong(2) == 0L)
    val d0 = Array(0.9f, 0.0f, 0.0f, 0.9f).map(micro)
      .zip(qe).map { case (a, b) => (a - b) * (a - b) }.sum
    assert(ex.getLong(3) == d0, "exact L2 must be the exact integer distance")
  }

  test("ivfPqTopK: candidates come only from routed cells; at nprobe = " +
    "|cells| the routed probe equals the flat ADC scan exactly") {
    val cb = ProductQuantizer.pqFit(corpus, "vec_id", "embedding",
      m = 2, ksub = 2, maxIter = 5, dim = 4)
    val enc = ProductQuantizer.pqEncode(corpus, cb, "vec_id", "embedding",
      m = 2, dim = 4)
    // two orthogonal-ish centroids split the corpus into two cells
    val cents = corpus.filter(col("vec_id") <= 1L)
    val asg = Similarity.assignCells(corpus, cents, "vec_id", "embedding",
      spread = false).select(col("id").as("vid"), col("cell"))
    val q = corpus.filter(col("vec_id") === 2L)
    // nprobe = 1: every returned neighbor shares the query's own cell
    val routed1 = ProductQuantizer.ivfPqTopK(q, enc, asg, cb, cents,
      "vec_id", "embedding", k = 4, nprobe = 1, m = 2, dim = 4)
    val cellOf = asg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val qCell = cellOf(2L)
    routed1.collect().foreach { r =>
      assert(cellOf(r.getLong(2)) == qCell,
        s"nprobe=1 must only score the query's own cell, got ${r.getLong(2)}")
    }
    // nprobe = |cells|: identical to the flat scan (same candidates,
    // same exact integer distances, same ranking)
    val routedAll = ProductQuantizer.ivfPqTopK(q, enc, asg, cb, cents,
        "vec_id", "embedding", k = 4, nprobe = 2, m = 2, dim = 4)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    val flat = ProductQuantizer.pqTopK(q, enc, cb,
        "vec_id", "embedding", k = 4, m = 2, dim = 4)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(routedAll == flat,
      s"full routing must equal the flat ADC scan: $routedAll vs $flat")
  }

  test("cellResiduals: a centroid's residual is the zero vector; every " +
    "residual is the exact micro-unit difference") {
    val cents = corpus.filter(col("vec_id") <= 1L)
    val asg = Similarity.assignCells(corpus, cents, "vec_id", "embedding",
      spread = false).select(col("id").as("vid"), col("cell"))
    val res = ProductQuantizer.cellResiduals(corpus, cents, asg,
      "vec_id", "embedding")
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getSeq[Long](2)))
    val cellOf = asg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecOf = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(micro)).toMap
    res.foreach { case (cell, vid, rv) =>
      assert(cell == cellOf(vid))
      val expect = vecOf(vid).zip(vecOf(cell)).map { case (x, c) => x - c }
      assert(rv == expect, s"vid=$vid residual mismatch")
      if (vid == cell) assert(rv.forall(_ == 0L),
        "a centroid's own residual must be exactly zero")
    }
  }

  test("ivfadcTopK with EXACT codes (ksub = n) at full routing equals " +
    "bruteL2TopK — the centroid cancels in |qr - (x - c)|^2, which also " +
    "proves the per-cell FULL scoring term (a dropped query norm would " +
    "break the cross-cell ranking this compares)") {
    val cents = corpus.filter(col("vec_id") <= 1L)
    val asg = Similarity.assignCells(corpus, cents, "vec_id", "embedding",
      spread = false).select(col("id").as("vid"), col("cell"))
    val resid = ProductQuantizer.cellResiduals(corpus, cents, asg,
      "vec_id", "embedding")
    // ksub = 5 = |corpus|: every residual subvector is its own seed,
    // Lloyd fixes immediately, encode has ZERO quantization error
    val cb = ProductQuantizer.pqFitE(resid, "vid", "r",
      m = 2, ksub = 5, maxIter = 2, dim = 4)
    val enc = ProductQuantizer.pqEncodeE(resid, cb, "vid", "r",
      m = 2, dim = 4)
    val codes = ProductQuantizer.cellKeyedCodes(enc, asg)
    val qs = corpus.filter(col("vec_id") >= 2L)
    val adc = ProductQuantizer.ivfadcTopK(qs, codes, cb, cents,
        "vec_id", "embedding", k = 3, nprobe = 2, m = 2, dim = 4)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val exact = ProductQuantizer.bruteL2TopK(qs, corpus,
        "vec_id", "embedding", k = 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(adc == exact,
      s"exact residual codes at full routing must reproduce the exact " +
        s"L2 ranking AND distances: $adc vs $exact")
  }
}
