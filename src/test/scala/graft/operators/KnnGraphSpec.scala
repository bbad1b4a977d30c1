package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NN-Descent K-NN graph contracts (KnnGraph.nnDescent, Dong et al.
  * WWW 2011): (a) with a single seed bucket the seed graph IS the
  * exact K-NN graph and iterations leave it fixed (the algorithm's
  * fixed point is the truth), (b) iterations only ever improve —
  * rank-for-rank distances are non-increasing and node degree never
  * drops (topK over a superset), (c) runs are bit-deterministic,
  * (d) measured recall vs brute force does not degrade with rounds,
  * (e) mutualEdges keeps exactly the bidirectional pairs. */
class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, dir)

  private def collectGraph(g: DataFrame): Seq[(Long, Int, Long, Long)] =
    g.select("vid", "rank", "neighbor_id", "dist").collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))

  test("single seed bucket: the seed graph equals exact brute-force " +
    "top-K and is a fixed point of the iteration") {
    // 12 vectors, k+1 > n forces B = 1 bucket -> all-pairs seeding
    val tiny = (0 until 12).map { id =>
      (id.toLong, Array.tabulate(8)(j => ((id * 17 + j * 5) % 11 - 5) / 5.0f))
    }.toDF("vec_id", "embedding")
    val k = 15
    val brute = ProductQuantizer.bruteL2TopK(tiny, tiny,
      "vec_id", "embedding", k)
      .select(col("query_id").as("vid"), col("rank"),
        col("neighbor_id"), col("dist"))
    val seed = KnnGraph.nnDescent(tiny, "vec_id", "embedding",
      k = k, iters = 0, seed = "spec")
    assert(collectGraph(seed) === collectGraph(brute),
      "all-pairs seeding must reproduce the exact K-NN graph")
    val iterated = KnnGraph.nnDescent(tiny, "vec_id", "embedding",
      k = k, iters = 2, seed = "spec")
    assert(collectGraph(iterated) === collectGraph(brute),
      "the exact graph must be a fixed point of the local join")
  }

  test("iterations only improve: rank-for-rank distance non-increasing, " +
    "degree non-decreasing, and runs are deterministic") {
    def run(iters: Int) = KnnGraph.nnDescent(emb, "vec_id", "embedding",
      k = 6, iters = iters, seed = "nnd")
    val g0 = run(0)
    val g1 = run(1)
    val g2 = run(2)
    def byRank(g: DataFrame) = g.select("vid", "rank", "dist")
    def worsened(prev: DataFrame, next: DataFrame): Long =
      byRank(prev).as("p")
        .join(byRank(next).as("n"),
          col("p.vid") === col("n.vid") && col("p.rank") === col("n.rank"))
        .filter(col("n.dist") > col("p.dist")).count()
    // topK over a superset: the r-th best of more candidates can
    // never be worse than the r-th best of fewer
    assert(worsened(g0, g1) === 0L, "iter 1 worsened a rank slot")
    assert(worsened(g1, g2) === 0L, "iter 2 worsened a rank slot")
    def degrees(g: DataFrame) = g.groupBy("vid").count()
    val degDropped = degrees(g0).as("p")
      .join(degrees(g2).as("n"), col("p.vid") === col("n.vid"))
      .filter(col("n.count") < col("p.count")).count()
    assert(degDropped === 0L, "a node lost edges across iterations")
    assert(collectGraph(g2) === collectGraph(run(2)),
      "same inputs must produce the bit-identical graph")
  }

  test("measured full-corpus containment of the exact top-6 climbs " +
    "with rounds and clears half after three (K=10 build)") {
    // uniform random 64-dim vectors are the WORST case for the local
    // join (no cluster structure to exploit); the catalog's K=10/T=3
    // configuration must still recover the majority of true top-6
    // neighbors across ALL 500 nodes
    val exact6 = ProductQuantizer.bruteL2TopK(emb, emb,
        "vec_id", "embedding", 6)
      .select(col("query_id").as("vid"), col("neighbor_id"))
    def contain6(iters: Int): Long =
      KnnGraph.nnDescent(emb, "vec_id", "embedding",
        k = 10, iters = iters, seed = "nnd")
        .select("vid", "neighbor_id")
        .join(exact6, Seq("vid", "neighbor_id"), "left_semi").count()
    val (c0, c3) = (contain6(0), contain6(3))
    info(s"containment of exact top-6 over 500 nodes: " +
      s"seed $c0/3000, after 3 rounds $c3/3000")
    assert(c3 > c0, "local-join rounds must improve containment")
    assert(c3 >= 1500, "three K=10 rounds should recover the majority " +
      "of true top-6 neighbors even on structureless random vectors")
  }

  test("beam search over the exact complete graph recovers the exact " +
    "top-k, and hops only improve the beam") {
    val tiny = (0 until 12).map { id =>
      (id.toLong, Array.tabulate(8)(j => ((id * 17 + j * 5) % 11 - 5) / 5.0f))
    }.toDF("vec_id", "embedding")
    // k = 15 > n: the graph is complete, so ONE hop from any entry
    // reaches every node and the beam (>= n) holds the whole corpus
    val g = KnnGraph.nnDescent(tiny, "vec_id", "embedding",
      k = 15, iters = 0, seed = "spec")
    val qs = tiny.filter(col("vec_id") < 3)
    val got = KnnGraph.beamSearch(g, tiny, qs, "vec_id", "embedding",
        k = 4, beam = 15, hops = 1, entries = 2, seed = "spec")
      .select(col("query_id").as("vid"), col("rank"),
        col("neighbor_id"), col("dist"))
    val brute = ProductQuantizer.bruteL2TopK(qs, tiny,
        "vec_id", "embedding", 4)
      .select(col("query_id").as("vid"), col("rank"),
        col("neighbor_id"), col("dist"))
    assert(collectGraph(got) === collectGraph(brute),
      "a complete graph + full-width beam must reproduce brute force")

    // real corpus: more hops can only help (the beam is monotone)
    val g500 = KnnGraph.nnDescent(emb, "vec_id", "embedding",
      k = 10, iters = 3, seed = "nnd")
    val qs8 = emb.filter(col("vec_id") < 8)
    val exact6 = ProductQuantizer.bruteL2TopK(qs8, emb,
        "vec_id", "embedding", 6)
      .select("query_id", "neighbor_id")
    def hits(hops: Int): Long =
      KnnGraph.beamSearch(g500, emb, qs8, "vec_id", "embedding",
        k = 6, beam = 10, hops = hops, entries = 4, seed = "nnd")
        .select("query_id", "neighbor_id")
        .join(exact6, Seq("query_id", "neighbor_id"), "left_semi").count()
    val (h0, h3) = (hits(0), hits(3))
    info(s"beam-search recall@6 over 8 queries: 0 hops $h0/48, 3 hops $h3/48")
    assert(h3 >= h0, "hops must not lose true neighbors")
    assert(h3 >= 24, "three hops from 4 entries should recover at " +
      "least half the true neighbors")
  }

  test("convergence trace: sum_dist non-increasing, n_improved " +
    "consistent with an independent rank-slot diff, round 0 improves " +
    "nothing") {
    val trace = KnnGraph.nnDescentTrace(emb, "vec_id", "embedding",
        k = 6, iters = 2, seed = "nnd")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(trace.map(_._1).toSeq === Seq(0, 1, 2))
    assert(trace.head._4 === 0L, "round 0 has no previous round")
    trace.sliding(2).foreach { case Array(p, n) =>
      assert(n._3 <= p._3, s"sum_dist rose between rounds ${p._1}->${n._1}")
      assert(n._2 >= p._2, s"edge count dropped ${p._1}->${n._1}")
    }
    // independent recomputation of round 2's improved slots from the
    // public nnDescent surface
    val g1 = KnnGraph.nnDescent(emb, "vec_id", "embedding",
      k = 6, iters = 1, seed = "nnd").select("vid", "rank", "dist")
    val g2 = KnnGraph.nnDescent(emb, "vec_id", "embedding",
      k = 6, iters = 2, seed = "nnd").select("vid", "rank", "dist")
    val improved = g2.as("n").join(g1.as("p"),
        col("n.vid") === col("p.vid") && col("n.rank") === col("p.rank"))
      .filter(col("n.dist") < col("p.dist")).count()
    assert(trace(2)._4 === improved,
      "trace n_improved must equal the independent rank-slot diff")
  }

  test("mutualEdges keeps exactly the bidirectional pairs, ordered") {
    val g = KnnGraph.nnDescent(emb, "vec_id", "embedding",
      k = 6, iters = 1, seed = "nnd")
    val edges = g.select(col("vid"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutual = KnnGraph.mutualEdges(g).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(mutual.nonEmpty, "a K-NN graph over 500 vectors must have " +
      "SOME bidirectional edges")
    mutual.foreach { case (a, b) =>
      assert(a < b, s"mutual pair ($a, $b) not ordered")
      assert(edges.contains((a, b)) && edges.contains((b, a)),
        s"mutual pair ($a, $b) lacks a direction in the graph")
    }
    val expected = edges.filter { case (a, b) =>
      a < b && edges.contains((b, a))
    }
    assert(mutual.toSet === expected,
      "mutualEdges must keep EVERY bidirectional pair, not a subset")
  }
}
