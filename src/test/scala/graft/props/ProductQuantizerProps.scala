package graft.props

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions.col
import graft.TestSpark
import graft.operators.ProductQuantizer

/** PQ's integer algebra under random corpora: whatever the fitted
  * codebooks are, (1) encode must equal the brute-force per-subspace
  * argmin over the exact integer distances, and (2) the ADC ranking
  * must equal the hand-computed partial-term sums over those codes —
  * ties and all (distance ASC, id ASC). Values are drawn near
  * quantization boundaries (x*1e6 close to .5) so the micro-unit
  * rounding is exercised, not dodged. */
object ProductQuantizerProps extends Properties("productQuantizer") {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private val Dim = 8
  private val M = 2 // two 4-dim subspaces

  // components in [-1, 1] at 1e-7 granularity: many land within one
  // ulp of a micro-unit boundary
  private val vec: Gen[Array[Float]] =
    Gen.listOfN(Dim, Gen.choose(-10000000, 10000000)
      .map(i => (i / 10000000.0).toFloat)).map(_.toArray)

  private def micro(x: Float): Long =
    math.floor(x.toDouble * 1000000 + 0.5).toLong

  property("encode == brute per-subspace integer argmin; ADC ranking == " +
    "hand-computed partial sums") =
    forAll(Gen.choose(5, 12).flatMap(k => Gen.listOfN(k, vec))) { vecs =>
      val rows = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = rows.toDF("vec_id", "embedding")
      val cb = ProductQuantizer.pqFit(df, "vec_id", "embedding",
        m = M, ksub = 3, maxIter = 3, dim = Dim)
      val cents = cb.collect().map(r =>
        (r.getLong(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
      val enc = ProductQuantizer.pqEncode(df, cb, "vec_id", "embedding",
          m = M, dim = Dim)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val dsub = Dim / M
      def sub(v: Array[Float], blk: Int): Seq[Long] =
        v.slice(blk * dsub, (blk + 1) * dsub).map(micro).toSeq
      def d2(a: Seq[Long], b: Seq[Long]): Long =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      // (1) encode is the brute argmin (dist ASC, cid ASC)
      val encOk = rows.forall { case (id, v) =>
        (0 until M).forall { blk =>
          val want = cents.keys.filter(_._1 == blk).toSeq.sorted
            .map { case (_, cid) => (d2(sub(v, blk), cents((blk.toLong, cid))), cid) }
            .min._2
          enc((id, blk.toLong)) == want
        }
      }
      // (2) ADC top-k for query 0 equals the hand-computed ranking
      val q = df.filter(col("vec_id") === 0L)
      val got = ProductQuantizer.pqTopK(q, ProductQuantizer.pqEncode(
            df, cb, "vec_id", "embedding", m = M, dim = Dim),
          cb, "vec_id", "embedding", k = rows.size, m = M, dim = Dim)
        .orderBy("rank").collect()
        .map(r => (r.getLong(2), r.getLong(3))).toSeq
      def dot(a: Seq[Long], b: Seq[Long]): Long =
        a.zip(b).map { case (x, y) => x * y }.sum
      val qv = rows.head._2
      val want = rows.tail.map { case (id, _) =>
        id -> (0 until M).map { blk =>
          val c = cents((blk.toLong, enc((id, blk.toLong))))
          dot(c, c) - 2 * dot(sub(qv, blk), c)
        }.sum
      }.sortBy { case (id, d) => (d, id) }
      encOk && got == want
    }

  property("residual IVFADC with exact codes (ksub = n) at full routing " +
    "reproduces bruteL2TopK's ranking AND distances — the centroid " +
    "cancels in |qr - (x - c)|^2, which also pins the per-cell FULL " +
    "scoring term under random cell geometry") =
    forAll(Gen.choose(6, 12).flatMap(k => Gen.listOfN(k, vec))) { vecs =>
      val rows = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = rows.toDF("vec_id", "embedding")
      val nCells = 2
      val cents = df.filter(col("vec_id") < nCells)
      val asg = graft.operators.Similarity.assignCells(df, cents,
          "vec_id", "embedding", spread = false)
        .select(col("id").as("vid"), col("cell"))
      val resid = ProductQuantizer.cellResiduals(df, cents, asg,
        "vec_id", "embedding")
      // ksub = n: every residual subvector its own codeword — zero
      // quantization error, so residual ADC == exact L2 for ANY
      // random corpus/cell shape (cross-cell rank correctness is the
      // property under test: a dropped query norm would break it)
      val cb = ProductQuantizer.pqFitE(resid, "vid", "r",
        m = M, ksub = rows.size, maxIter = 2, dim = Dim)
      val enc = ProductQuantizer.pqEncodeE(resid, cb, "vid", "r",
        m = M, dim = Dim)
      val qs = df.filter(col("vec_id") >= nCells)
      val adc = ProductQuantizer.ivfadcTopK(qs,
          ProductQuantizer.cellKeyedCodes(enc, asg), cb, cents,
          "vec_id", "embedding", k = 3, nprobe = nCells, m = M, dim = Dim)
        .orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSeq
      val exact = ProductQuantizer.bruteL2TopK(qs, df,
          "vec_id", "embedding", k = 3)
        .orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSeq
      adc == exact
    }
}
