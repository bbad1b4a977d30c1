package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Two-level (coarse -> fine) quantizer on planted fixtures: the
  * blocked fine fit must converge to the planted cluster structure,
  * fine centroids never migrate across coarse blocks, the two-hop
  * assignment must agree with the flat argmin when clusters are well
  * separated, and the semDedup tail must behave identically to the
  * flat variant's contract (keep rule, singletons). The cross-engine
  * gate (q200/q201) verifies the same fit against the unrolled DuckDB
  * oracle at sf scale; this spec pins semantics on a hand-checkable
  * input. */
class HierarchicalQuantizerSpec extends SparkSpec {
  import spark.implicits._

  // four tight clusters, two per coarse half-space: A/B live in dims
  // (1,2), C/D in dims (3,4). Ids interleave mod 4 (0=A, 1=C, 2=B,
  // 3=D) so the deterministic seed rules pick: coarse seeds ids 0 (A)
  // and 1 (C); block-0 fine seeds ids 0 (A), 2 (B); block-1 fine
  // seeds ids 1 (C), 3 (D).
  private def proto(cluster: Int): Array[Float] = cluster match {
    case 0 => Array(1.0f, 0.2f, 0.0f, 0.0f) // A
    case 1 => Array(0.0f, 0.0f, 1.0f, 0.2f) // C
    case 2 => Array(0.2f, 1.0f, 0.0f, 0.0f) // B
    case _ => Array(0.0f, 0.0f, 0.2f, 1.0f) // D
  }

  private def corpus16 = (0 until 16).map { i =>
    val p = proto(i % 4)
    // small per-member perturbation on the cluster's minor dim keeps
    // members distinct but far inside their own cluster
    val v = p.clone()
    val minor = if (i % 4 == 0 || i % 4 == 2) 1 - (i % 4) / 2 else 3 - (i % 4 - 1) / 2
    v(minor) = v(minor) + 0.01f * (i / 4)
    (i.toLong, v.toSeq)
  }.toDF("vec_id", "embedding")

  test("ceilSqrt: exact integer ceil-sqrt") {
    assert(Similarity.ceilSqrt(1L) === 1)
    assert(Similarity.ceilSqrt(2L) === 2)
    assert(Similarity.ceilSqrt(4L) === 2)
    assert(Similarity.ceilSqrt(5L) === 3)
    assert(Similarity.ceilSqrt(4095L) === 64)
    assert(Similarity.ceilSqrt(4096L) === 64)
    assert(Similarity.ceilSqrt(4097L) === 65)
  }

  test("fit: 2 fine centroids per coarse block, blocks never migrate") {
    val (coarse, fine) = Similarity.hierarchicalQuantizerFit(
      corpus16, "vec_id", "embedding", k = 4, maxIter = 10)
    assert(coarse.count() === 2L)
    val f = fine.select("cid", "blk").as[(Long, Long)].collect().toMap
    assert(f.keySet === Set(0L, 1L, 2L, 3L))
    // seed rule: ids 0,2 seeded in block 0 (coarse seed 0's
    // half-space), ids 1,3 in block 1 — and the blocked fit must
    // keep them there
    assert(f(0L) === f(2L))
    assert(f(1L) === f(3L))
    assert(f(0L) !== f(1L))
  }

  test("two-hop assignment partitions the corpus by planted cluster " +
    "and agrees with the flat argmin") {
    val (coarse, fine) = Similarity.hierarchicalQuantizerFit(
      corpus16, "vec_id", "embedding", k = 4, maxIter = 10)
    val hier = Similarity.hierarchicalAssign(corpus16, coarse, fine,
      "vec_id", "embedding")
    val cells = hier.select("id", "cell").as[(Long, Long)].collect().toMap
    assert(cells.size === 16)
    // members of one planted cluster share a cell; 4 distinct cells
    (0 until 4).foreach { c =>
      val ids = (0 until 16).filter(_ % 4 == c).map(_.toLong)
      assert(ids.map(cells).toSet.size === 1, s"cluster $c split across cells")
    }
    assert(cells.values.toSet.size === 4)
    // flat argmin over ALL fine centroids picks the same cells here
    // (clusters are far from every coarse border)
    val flat = Similarity.assignCells(corpus16,
        fine.select(col("cid").as("vec_id"), col("cv").as("embedding")),
        "vec_id", "embedding")
      .select("id", "cell").as[(Long, Long)].collect().toMap
    assert(cells === flat)
    // widening the coarse probe must never change an assignment that
    // nprobe=1 already got right (it only ADDS candidate blocks)
    val np2 = Similarity.hierarchicalAssign(corpus16, coarse, fine,
        "vec_id", "embedding", nprobeCoarse = 2)
      .select("id", "cell").as[(Long, Long)].collect().toMap
    assert(np2 === flat)
  }

  test("maximin seeding: one seed per planted cluster, deterministic") {
    // three orthogonal clusters; ids interleave so the id-low rule
    // would pick 3 seeds from ONE cluster, while farthest-first must
    // cover all three: start = min id (cluster A), then the lowest-id
    // member of an uncovered orthogonal cluster, twice.
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // A
      (1L, Seq(0.99f, 0.1f, 0.0f, 0.0f)),  // A
      (2L, Seq(0.98f, 0.15f, 0.0f, 0.0f)), // A
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),   // B
      (4L, Seq(0.0f, 0.99f, 0.1f, 0.0f)),  // B
      (5L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),   // C
      (6L, Seq(0.0f, 0.0f, 0.98f, 0.1f))   // C
    ).toDF("vec_id", "embedding")
    val seeds = Similarity.maximinSeeds(vecs, "vec_id", "embedding", 3)
      .select("vec_id").as[Long].collect().toSet
    // 0 (min id, A), then B and C's lowest-max-cos members: 3 and 5
    // are exactly orthogonal to everything chosen before them
    assert(seeds === Set(0L, 3L, 5L))
    // deterministic: a second run returns the identical set
    val again = Similarity.maximinSeeds(vecs, "vec_id", "embedding", 3)
      .select("vec_id").as[Long].collect().toSet
    assert(again === seeds)
    // k > distinct finite candidates: stops at the corpus, no throw
    val tiny = vecs.filter(col("vec_id") < 2)
    assert(Similarity.maximinSeeds(tiny, "vec_id", "embedding", 5)
      .count() === 2L)
  }

  test("oversampledSeeds: farthest batches + count-weighted reduction, " +
    "deterministic") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // A
      (1L, Seq(0.99f, 0.1f, 0.0f, 0.0f)),  // A
      (2L, Seq(0.98f, 0.15f, 0.0f, 0.0f)), // A
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),   // B
      (4L, Seq(0.0f, 0.99f, 0.1f, 0.0f)),  // B
      (5L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),   // C
      (6L, Seq(0.0f, 0.0f, 0.98f, 0.1f))   // C
    ).toDF("vec_id", "embedding")
    // ell=1 degenerates to maximin: min id, then one farthest per
    // round — covers the three orthogonal clusters
    val m = Similarity.oversampledSeeds(vecs, "vec_id", "embedding",
      k = 3, ell = 1, rounds = 2).select("vec_id").as[Long].collect().toSet
    assert(m === Set(0L, 3L, 5L))
    // one wide round (ell=4): pool = {0} + the four mx=0 orthogonals
    // {3,4,5,6}; reduction counts A's 3 members onto pool id 0 and
    // each orthogonal onto itself, so top-3 by (count DESC, id ASC)
    // is {0} + the two lowest-id singletons {3, 4} — pins the
    // reduction's exact tie-break rule
    val w = Similarity.oversampledSeeds(vecs, "vec_id", "embedding",
      k = 3, ell = 4, rounds = 1).select("vec_id").as[Long].collect().toSet
    assert(w === Set(0L, 3L, 4L))
    // deterministic: identical set on a second run
    assert(Similarity.oversampledSeeds(vecs, "vec_id", "embedding",
      k = 3, ell = 4, rounds = 1).select("vec_id").as[Long].collect().toSet === w)
    // pool never exceeds the corpus; k > pool returns the whole pool
    assert(Similarity.oversampledSeeds(vecs.filter(col("vec_id") < 2),
      "vec_id", "embedding", k = 5, ell = 3, rounds = 4).count() === 2L)
  }

  test("oversampledSeeds: exactly k seeds even when zero-vote twins " +
    "sit in the pool") {
    // ids 4 and 5 are EXACT copies of id 0 — the dedup-shaped corpus
    // this seeding exists for. ell=5, rounds=1 pools all six vectors;
    // in the reduction 4's and 5's votes go to pool id 0 (cs ties at
    // 1.0 resolve to the smallest pid), so only FOUR pool members
    // have a count row at all. A top-k over the count table alone
    // returned k-1 seeds here (review); ranking every pool member by
    // (coalesce(cnt,0) DESC, id ASC) keeps the exactly-k contract:
    // {0,1,2,3} by count, then 4 (zero votes, lowest id) pads to 5.
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 0.0f, 1.0f)),
      (4L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (5L, Seq(1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val s = Similarity.oversampledSeeds(vecs, "vec_id", "embedding",
      k = 5, ell = 5, rounds = 1).select("vec_id").as[Long].collect().toSet
    assert(s === Set(0L, 1L, 2L, 3L, 4L))
  }

  test("semDedupAuto routes: flat below the cell threshold, " +
    "hierarchical above — both arms equal their explicit paths") {
    // corpus16 at targetCell=4 derives 4 cells: the default threshold
    // (256) keeps it on the flat path, a threshold of 1 forces the
    // hierarchical route — each must match its explicit sibling
    // column-for-column
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "cell", "centroid_sim", "sem_cluster", "kept")
      .collect().map(_.toSeq).toSet
    val routedFlat = Similarity.semDedupAuto(corpus16, "vec_id",
      "embedding", eps = 0.99, maxIter = 5, targetCell = 4L)
    assert(rows(routedFlat) === rows(Similarity.semDedupFlatAuto(
      corpus16, "vec_id", "embedding", eps = 0.99, maxIter = 5,
      targetCell = 4L)))
    val routedHier = Similarity.semDedupAuto(corpus16, "vec_id",
      "embedding", eps = 0.99, maxIter = 5, targetCell = 4L,
      hierAboveCells = 1)
    assert(rows(routedHier) === rows(Similarity.hierarchicalSemDedupAuto(
      corpus16, "vec_id", "embedding", eps = 0.99, maxIter = 5,
      targetCell = 4L)))
    assert(rows(routedHier).map(_.head) === rows(routedFlat).map(_.head))
  }

  test("routing boundary is pinned EXACTLY at HierRoutingCells: " +
    "256 derived cells stay flat, 257 go hierarchical") {
    // VERDICT r7 #7: the router is `cells > hierAboveCells` — this
    // test holds the exact edge so a future threshold edit (>= for >,
    // an off-by-one in derivedCells) cannot silently invert it. At
    // targetCell=4: n=1024 derives ceil(1024/4)=256 cells (== the
    // threshold -> flat arm), n=1025 derives 257 (> threshold ->
    // hier arm). First the pure derivation, then the routed output
    // against each explicit sibling arm on real corpora of exactly
    // those sizes.
    assert(Similarity.derivedCells(1024L, 4L) === 256)
    assert(Similarity.derivedCells(1025L, 4L) === 257)
    assert(Similarity.derivedCells(1024L, 4L) === Similarity.HierRoutingCells)

    // deterministic pseudo-random corpus, dim 4, nonzero norms
    // (murmur3 hash per (id, dim) — a modular form here collapsed to
    // 19 distinct vectors and degenerate duplicate centroids)
    def corpusN(n: Int) = spark.range(n).selectExpr(
      "id AS vec_id",
      "transform(sequence(0, 3), d -> CAST(pmod(hash(id, d), 19) + 1 AS FLOAT)) AS embedding")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "cell", "centroid_sim", "sem_cluster", "kept")
      .collect().map(_.toSeq).toSet
    val at = corpusN(1024); val above = corpusN(1025)
    val flatExplicit = rows(Similarity.semDedupFlatAuto(at, "vec_id",
      "embedding", eps = 0.999, maxIter = 1, targetCell = 4L))
    val hierExplicit = rows(Similarity.hierarchicalSemDedupAuto(above,
      "vec_id", "embedding", eps = 0.999, maxIter = 1, targetCell = 4L))
    // guard: the two arms genuinely disagree on this corpus (some
    // vector lands in a different fine cell under two-hop routing) —
    // otherwise the boundary assertions below could not distinguish
    // an inverted router. Deterministic fixture, checked once here.
    val hierAt = rows(Similarity.hierarchicalSemDedupAuto(at, "vec_id",
      "embedding", eps = 0.999, maxIter = 1, targetCell = 4L))
    assert(hierAt !== flatExplicit,
      "fixture must make the arms distinguishable at n=1024")
    // AT the threshold (cells == 256): routed == flat arm
    assert(rows(Similarity.semDedupAuto(at, "vec_id", "embedding",
      eps = 0.999, maxIter = 1, targetCell = 4L)) === flatExplicit)
    // ONE ABOVE (cells == 257): routed == hier arm
    assert(rows(Similarity.semDedupAuto(above, "vec_id", "embedding",
      eps = 0.999, maxIter = 1, targetCell = 4L)) === hierExplicit)
  }

  test("writeCellPartitionedAuto: both routes write probe-compatible " +
    "layouts and return the matching centroid set") {
    val root = java.nio.file.Files.createTempDirectory("graft_auto_layout")
    val queries = corpus16.filter(col("vec_id") < 4)
    def probe(path: String, cents: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopKPartitioned(queries, path, cents,
          "vec_id", "embedding", k = 3, nprobe = 1)
        .select("query_id", "rank", "neighbor_id")
        .collect().map(_.toSeq).toSet
    // flat route (default threshold): centroids = the flat kmeansFit,
    // layout = writeCellPartitioned's
    val cFlat = Similarity.writeCellPartitionedAuto(corpus16, "vec_id",
      "embedding", s"$root/flat", maxIter = 5, targetCell = 4L)
    assert(cFlat.count() === 4L)
    val manual = s"$root/manual"
    Similarity.writeCellPartitioned(corpus16,
      Similarity.kmeansFit(corpus16,
        corpus16.filter(col("vec_id") < 4), "vec_id", "embedding", 5),
      "vec_id", "embedding", manual)
    assert(probe(s"$root/flat", cFlat) === probe(manual, cFlat))
    // hier route (forced): returned centroids are the fine set; the
    // fixture is far from every coarse border, so probes against the
    // hier layout return the same top-k as the flat one
    val cHier = Similarity.writeCellPartitionedAuto(corpus16, "vec_id",
      "embedding", s"$root/hier", maxIter = 5, targetCell = 4L,
      hierAboveCells = 1)
    assert(cHier.count() === 4L)
    assert(probe(s"$root/hier", cHier).nonEmpty)
  }

  test("hier cell-partitioned layout is drop-in for the flat probes") {
    val (coarse, fine) = Similarity.hierarchicalQuantizerFit(
      corpus16, "vec_id", "embedding", k = 4, maxIter = 10)
    val fineFlat = fine.select(col("cid").as("vec_id"),
      col("cv").as("embedding"))
    val root = java.nio.file.Files.createTempDirectory("graft_hier_layout")
    val (pFlat, pHier) = (s"$root/flat", s"$root/hier")
    Similarity.writeCellPartitioned(corpus16, fineFlat,
      "vec_id", "embedding", pFlat)
    Similarity.writeCellPartitionedHier(corpus16, coarse, fine,
      "vec_id", "embedding", pHier)
    // same queries, same fine centroids, both layouts: identical
    // top-k (the fixture is far from every coarse border, so the
    // routing approximation is exact here)
    val queries = corpus16.filter(col("vec_id") < 4)
    def probe(path: String) = Similarity.ivfTopKPartitioned(
        queries, path, fineFlat, "vec_id", "embedding", k = 3, nprobe = 1)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(_.toSeq).toSet
    assert(probe(pHier) === probe(pFlat))
    assert(probe(pHier).nonEmpty)
  }

  test("the skew valve composes with the router: cap above every cell " +
    "is byte-identical to uncapped on both arms, and the capped flat " +
    "route equals explicit semDedupCapped") {
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "cell", "centroid_sim", "sem_cluster", "kept")
      .collect().map(_.toSeq).toSet
    // cap 100 >= every cell population (4): the salting is nsub = 1
    // everywhere, so both routed arms must equal their uncapped paths
    assert(rows(Similarity.semDedupAuto(corpus16, "vec_id", "embedding",
        eps = 0.99, maxIter = 5, targetCell = 4L, cellCap = 100)) ===
      rows(Similarity.semDedupFlatAuto(corpus16, "vec_id", "embedding",
        eps = 0.99, maxIter = 5, targetCell = 4L)))
    assert(rows(Similarity.semDedupAuto(corpus16, "vec_id", "embedding",
        eps = 0.99, maxIter = 5, targetCell = 4L, hierAboveCells = 1,
        cellCap = 100)) ===
      rows(Similarity.hierarchicalSemDedupAuto(corpus16, "vec_id",
        "embedding", eps = 0.99, maxIter = 5, targetCell = 4L)))
    // a binding cap (2 < pop 4): the routed flat arm must match the
    // explicit semDedupCapped over the same fitted centroids exactly
    val fitted = Similarity.kmeansFit(corpus16,
      corpus16.filter(col("vec_id") < 4), "vec_id", "embedding", 5)
    assert(rows(Similarity.semDedupAuto(corpus16, "vec_id", "embedding",
        eps = 0.99, maxIter = 5, targetCell = 4L, cellCap = 2)) ===
      rows(Similarity.semDedupCapped(corpus16, fitted, "vec_id",
        "embedding", eps = 0.99, cellCap = 2)))
    // and the capped hier arm still emits one verdict per vector
    assert(Similarity.hierarchicalSemDedupAuto(corpus16, "vec_id",
      "embedding", eps = 0.99, maxIter = 5, targetCell = 4L,
      cellCap = 2).count() === 16L)
  }

  test("semDedup tail under the hierarchy: planted dup pair resolves " +
    "by the keep rule, everything else survives") {
    // ids 0 and 4 are cluster-A members 0.0002 apart in one minor dim
    // -> cosine > 0.9999; every other within-cluster pair is farther
    val dup = corpus16.withColumn("embedding",
      when(col("vec_id") === 4L,
        typedLit(Seq(1.0f, 0.2002f, 0.0f, 0.0f))).otherwise(col("embedding")))
      .withColumn("embedding",
        when(col("vec_id") === 0L,
          typedLit(Seq(1.0f, 0.2f, 0.0f, 0.0f))).otherwise(col("embedding")))
    val out = Similarity.hierarchicalSemDedupAuto(dup, "vec_id",
        "embedding", eps = 0.99999, maxIter = 10, targetCell = 4L)
      .select("id", "kept").as[(Long, Boolean)].collect().toMap
    assert(out.size === 16)
    // exactly one of the planted pair dropped, all others kept
    assert(out(0L) ^ out(4L))
    assert(out.filterNot(kv => kv._1 == 0L || kv._1 == 4L).values.forall(identity))
  }
}
