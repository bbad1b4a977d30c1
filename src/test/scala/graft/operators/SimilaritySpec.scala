package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)), // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)), // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)) // opposite of 0
  ).toDF("vec_id", "embedding")

  test("cosine matches manual computation") {
    val two = vecs.filter(col("vec_id").isin(0, 1)).agg(
      collect_list(struct(col("vec_id"), col("embedding")))).as[Seq[(Long, Seq[Float])]]
    val m = two.collect().head.toMap
    val manual = {
      val (a, b) = (m(0L).map(_.toDouble), m(1L).map(_.toDouble))
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val fromCol = vecs.as("x").join(vecs.as("y"),
        col("x.vec_id") === 0 && col("y.vec_id") === 1)
      .select(Similarity.cosine(col("x.embedding"), col("y.embedding")))
    assert(math.abs(col1[Double](fromCol).head - manual) < 1e-12)
  }

  test("bruteForceTopK ranks near > orthogonal > opposite") {
    val out = Similarity.bruteForceTopK(
        vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding", k = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L, 3L))
  }

  test("lshBucket: identical vectors share a bucket; ranking within bucket is exact") {
    val dup = Seq((10L, Array(0.9f, 0.1f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val both = vecs.union(dup)
    val buckets = both.select(col("vec_id"),
        Similarity.lshBucket(col("embedding"), dim = 4, bits = 4).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(buckets(1L) == buckets(10L)) // identical vector, same bucket
    assert(buckets.values.forall(b => b >= 0 && b < 16))
    val ann = Similarity.lshTopK(both.filter(col("vec_id") === 1), both,
      "vec_id", "embedding", dim = 4, bits = 4, k = 1)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(ann == Seq(10L)) // its exact duplicate wins the bucket
  }

  test("cosinePairs exact (bits=0) finds the near pair above threshold") {
    val pairs = Similarity.cosinePairs(vecs, "vec_id", "embedding",
      dim = 4, threshold = 0.9, bits = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("NaN and zero-norm vectors never pollute top-k or pair output") {
    val poisoned = vecs.union(Seq(
      (90L, Array(Float.NaN, 1.0f, 0.0f, 0.0f)), // NaN element
      (91L, Array(0.0f, 0.0f, 0.0f, 0.0f)) // zero norm -> NULL cosine
    ).toDF("vec_id", "embedding"))
    val top = Similarity.bruteForceTopK(
      poisoned.filter(col("vec_id") === 0), poisoned,
      "vec_id", "embedding", k = 10)
      .select("neighbor_id").as[Long].collect().toSet
    // without the finite-score guard, 90 (NaN sorts above all doubles
    // in Spark) would take rank 1 and 91 would fill the under-k tail
    assert(!top.contains(90L) && !top.contains(91L) && top.nonEmpty)
    val pairs = Similarity.cosinePairs(poisoned, "vec_id", "embedding",
      dim = 4, threshold = 0.5, bits = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.forall { case (a, b) => a < 90 && b < 90 })
  }

  test("hardNegatives skips same-label neighbors however similar") {
    // anchor 0 (label A): vec 1 is nearly identical but shares the
    // label, so the top negative must be the orthogonal different-label
    // vec 2, then the opposite vec 3.
    val labeled = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), "A"),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f), "A"),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f), "B"),
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f), "B")
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(
        labeled.filter(col("vec_id") === 0), labeled,
        "vec_id", "embedding", "label", k = 2)
      .orderBy("rank")
      .select("neighbor_id", "neighbor_label").as[(Long, String)].collect().toSeq
    assert(out == Seq((2L, "B"), (3L, "B")))
  }

  test("rerankTopK: a (query, neighbor) pair proposed by TWO stages " +
    "occupies ONE rank (pooled proposals dedup before scoring)") {
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.7f, 0.3f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") === 0)
    // two "stages" both propose neighbor 1; neighbor 2 and 3 appear
    // once each — without dedup, 1 would take ranks 1 AND 2 and
    // displace 2 from the top-2
    val pooled = Seq((0L, 1L), (0L, 2L), (0L, 1L), (0L, 3L))
      .toDF("query_id", "neighbor_id")
    val out = Similarity.rerankTopK(pooled, q, corpus,
        "vec_id", "embedding", k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L),
      s"duplicate proposal must not occupy two ranks, got $out")
  }

  test("hardNegatives: unlabeled rows are excluded on both sides " +
    "(explicitly, not by join-null accident)") {
    val labeled = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), Some("A")),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f), Option.empty[String]), // unlabeled
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f), Some("B")),
      (7L, Array(0.5f, 0.5f, 0.0f, 0.0f), Option.empty[String])  // unlabeled anchor
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(
        labeled.filter(col("vec_id").isin(0L, 7L)), labeled,
        "vec_id", "embedding", "label", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // anchor 7 (unlabeled) produces nothing; anchor 0's only negative
    // is labeled B — the unlabeled corpus row 1 is never a candidate
    assert(out == Set((0L, 2L)), s"got $out")
  }

  test("ivfTopK nprobe=2 recovers the cell-border neighbor nprobe=1 misses") {
    // query 0's home cell is c100's (x-leaning), but its TRUE nearest
    // neighbor 1 lives just over the border in c101's cell (y-leaning);
    // neighbor 2 is the best same-cell candidate. nprobe=1 must return
    // 2 (never sees 1); nprobe=2 unions both cells and finds 1.
    val corpus = Seq(
      (0L, Array(0.75f, 0.70f, 0.0f, 0.0f)), // query: home cell c100
      (1L, Array(0.65f, 0.76f, 0.0f, 0.0f)), // true NN, home cell c101
      (2L, Array(0.90f, 0.10f, 0.0f, 0.0f)) // same-cell decoy
    ).toDF("vec_id", "embedding")
    val cents = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (101L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") === 0)
    def top1(p: Int): Seq[Long] =
      Similarity.ivfTopK(q, corpus, cents, "vec_id", "embedding",
        k = 1, nprobe = p).select("neighbor_id").as[Long].collect().toSeq
    assert(top1(1) == Seq(2L))
    assert(top1(2) == Seq(1L))
  }

  test("corpus-derived blocking width: exact integer derivation + clamps") {
    // ceilLog2: exact, no transcendentals
    assert(Similarity.ceilLog2(1) == 0)
    assert(Similarity.ceilLog2(2) == 1)
    assert(Similarity.ceilLog2(3) == 2)
    assert(Similarity.ceilLog2(16) == 4)
    assert(Similarity.ceilLog2(17) == 5)
    assert(Similarity.ceilLog2(1L << 40) == 40)
    // the catalog's corpora land where the q35/q183 comments claim
    assert(Similarity.derivedLshBits(500) == 2) // sf0.01
    assert(Similarity.derivedLshBits(2000) == 4) // sf0.1 (pre-change width)
    assert(Similarity.derivedLshBits(20000) == 8) // ScaleCheck 10x
    assert(Similarity.derivedLshBits(200000) == 11) // ScaleCheck 100x
    assert(Similarity.derivedLshBits(1) == 1) // floor clamp
    assert(Similarity.derivedLshBits(Long.MaxValue / 2) == 16) // cap
    assert(Similarity.derivedCells(500) == 8)
    assert(Similarity.derivedCells(2000) == 32)
    assert(Similarity.derivedCells(1) == 4) // floor clamp
    assert(Similarity.derivedCells(1L << 40) == 4096) // cap
  }

  test("cosinePairsAuto == cosinePairs at the derived width") {
    // 4 vectors -> derivedLshBits(4) = 1: same pairs as an explicit
    // bits=1 run, and a subset of the exact bits=0 pairs
    val auto = Similarity.cosinePairsAuto(vecs, "vec_id", "embedding",
      dim = 4, threshold = 0.3).collect().toSet
    val pinned = Similarity.cosinePairs(vecs, "vec_id", "embedding",
      dim = 4, threshold = 0.3, bits = 1).collect().toSet
    assert(auto == pinned)
    val exact = Similarity.cosinePairs(vecs, "vec_id", "embedding",
      dim = 4, threshold = 0.3, bits = 0).collect().toSet
    assert(auto.subsetOf(exact))
  }

  test("hyperplaneWeight strides by the actual dim (no shifted copies)") {
    // with a fixed stride of 64, weight(j, d+64, 128) would equal
    // weight(j+1, d, 128) for every d — adjacent hyperplanes sharing
    // half their stream; the dim-strided flattening breaks that
    val dim = 128
    val shiftedCopy = (0 until 64).forall(d =>
      Similarity.hyperplaneWeight(0, d + 64, dim) ==
        Similarity.hyperplaneWeight(1, d, dim))
    assert(!shiftedCopy)
    // dim=64 callers (the oracle-checked queries) are unchanged
    assert(Similarity.hyperplaneWeight(2, 3) ==
      ((2L * 64 + 3) * 2654435761L) % 97 - 48)
  }
}
