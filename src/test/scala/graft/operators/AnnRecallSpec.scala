package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Recall of the approximate ANN paths against the exact brute force,
  * on the real sf0.001 embeddings (500 x 64-dim, deterministic data
  * => deterministic recall). Documents the recall/cost trade:
  * LSH bits=4 scans ~1/16 of the corpus, IVF nprobe=1 scans ~1/12. */
class AnnRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val k = 10

  private lazy val emb = Tables.embeddings(spark, dir)
  private lazy val queries = emb.filter(col("vec_id") < 8)

  private def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH and IVF recall vs brute force is nonzero and bounded by 1") {
    val exact = topkSet(Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k))
    assert(exact.size == 8 * k)

    val lsh = topkSet(Similarity.lshTopK(queries, emb, "vec_id", "embedding",
      dim = 64, bits = 4, k = k))
    val lshRecall = (exact intersect lsh).size.toDouble / exact.size

    val ivf = topkSet(Similarity.ivfTopK(queries, emb,
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 112),
      "vec_id", "embedding", k))
    val ivfRecall = (exact intersect ivf).size.toDouble / exact.size

    info(f"recall@$k: lsh(bits=4)=$lshRecall%.2f ivf(12 cells)=$ivfRecall%.2f")
    // random unit vectors are a worst case for ANN (no cluster
    // structure); still, buckets must find SOME true neighbors and
    // never more than all of them.
    assert(lshRecall > 0.0 && lshRecall <= 1.0)
    assert(ivfRecall > 0.0 && ivfRecall <= 1.0)
    // every approximate result must be a genuinely scored pair (no
    // self-pairs, k at most)
    assert(!lsh.exists(p => p._1 == p._2) && !ivf.exists(p => p._1 == p._2))
  }
}
