package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-NN GRAPH CONSTRUCTION via NN-Descent (Dong, Moses & Li,
  * "Efficient K-Nearest Neighbor Graph Construction for Generic
  * Similarity Measures", WWW 2011) — the graph-ANN *build* family the
  * catalog's bucket/tree stacks (LSH q37, IVF q45, PQ q213) don't
  * cover: every node converges toward its true K nearest neighbors by
  * repeatedly comparing each node's neighbors AGAINST EACH OTHER
  * ("a neighbor of a neighbor is probably a neighbor"). The converged
  * graph is the substrate graph-ANN serving indexes (HNSW et al.) and
  * graph-based dedup/clustering start from.
  *
  * The Spark shape — every stage an equi-join or a per-key window,
  * nothing global:
  *
  *  - SEEDING is hash-bucketed, not random — but across R INDEPENDENT
  *    partitions: bucket_r(v) = md5(seed:r:vid) mod B with B =
  *    n/(K+1), all pairs within a bucket, unioned over r = 1..R.
  *    One partition alone would be fatal: its cliques are CLOSED
  *    under the local join (every neighbor-of-a-neighbor stays in
  *    the seed bucket), so the iteration would fix-point at round 0
  *    without ever crossing buckets — measured, not hypothetical:
  *    the single-round variant scored recall 0/48 at every T. The
  *    union of R >= 2 independent clique-partitions is the
  *    deterministic stand-in for the paper's random seed graph: it
  *    is connected with overwhelming probability and mixes rapidly,
  *    so candidates reach across the whole corpus. Still
  *    deterministic (exact SQL replay, no rand()), free of any
  *    id-contiguity assumption (ids offset by 1e7 at ScaleCheck
  *    mults seed exactly the same way), and bucket populations are
  *    Poisson(K+1)-bounded per round, so the seed pair stage is
  *    O(n*K*R) with no hot key.
  *  - LOCAL JOIN, iterated: candidates(u) = N(u) union R(u) — the
  *    graph plus its REVERSE edges, the reverse side capped at K per
  *    node by (dist, id) rank (the paper's reverse sampling, made
  *    deterministic) so a popular node cannot quadratically blow up
  *    its candidate list. New candidate pairs are all (v, w) sharing
  *    a pivot u: a self-join of the candidate list on the pivot,
  *    <= C(2K, 2) pairs per node per iteration — O(n*K^2) TOTAL work
  *    per round, independent of corpus skew. Scored pairs merge with
  *    the current graph and each node keeps its best K.
  *  - DISTANCES are exact-integer squared L2 over micro-unit vectors
  *    (ProductQuantizer.microUnits / the codegen'd LongDotProduct):
  *    |a-b|^2 = |a|^2 - 2a.b + |b|^2 in BIGINT, so ranking ties are
  *    bit-stable across engines and every iteration is exactly
  *    replayable in the DuckDB oracle (fixed-iteration unroll).
  *  - Each round ends in an EAGER localCheckpoint: the plan would
  *    otherwise double every iteration (the connectedComponents
  *    discipline), and the previous round's blocks are freed as soon
  *    as the next is materialized.
  *
  * At 100 TB: per-round cost is O(n*K^2) comparisons + two shuffles
  * (the pivot self-join and the top-K window, both keyed by node id),
  * the vector table is joined by id (never broadcast, never collected)
  * and T is a small constant — empirically 4-7 rounds to ~0.9 recall
  * in the paper; the catalog entries pin T=2 so the oracle unroll
  * stays readable while still exercising two full local-join rounds.
  */
object KnnGraph {

  private def topK(edges: DataFrame, k: Int): DataFrame =
    edges
      .withColumn("rn", row_number().over(
        Window.partitionBy("src").orderBy(col("dist").asc, col("dst").asc)))
      .filter(col("rn") <= k)
      .select("src", "dst", "dist")

  /** The converged-so-far directed K-NN graph after `iters` local-join
    * rounds: (vid, rank, neighbor_id, dist) with rank 1..K per vid by
    * (dist asc, neighbor_id asc), dist = exact-integer squared L2 in
    * micro-units. `iters = 0` returns the hash-bucket seed graph —
    * the baseline the iteration invariants (and specs) measure
    * against. */
  def nnDescent(corpus: DataFrame, idCol: String, vecCol: String,
                k: Int, iters: Int, seed: String,
                seedRounds: Int = 3): DataFrame =
    nnDescentMicro(microFrame(corpus, idCol, vecCol), k, iters, seed,
      seedRounds)

  /** nnDescent over an ALREADY micro-unit (vid, e, n2) frame — the
    * KnnGraphRegistry ingest path, whose batch vectors live in stored
    * form (micro-izing twice would re-scale already-scaled values). */
  private[operators] def nnDescentMicro(m: DataFrame, k: Int, iters: Int,
                                        seed: String,
                                        seedRounds: Int): DataFrame = {
    val rounds = buildRounds(m, k, iters, seed, seedRounds,
      keepAll = false)
    rankGraph(rounds.last)
  }

  private def rankGraph(g: DataFrame): DataFrame =
    g.withColumn("rank", row_number().over(
        Window.partitionBy("src").orderBy(col("dist").asc, col("dst").asc)))
      .select(col("src").as("vid"), col("rank"),
        col("dst").as("neighbor_id"), col("dist"))

  /** Micro-unit (vid, e, n2) frame of a float-vector corpus. */
  private def microFrame(corpus: DataFrame, idCol: String,
                         vecCol: String): DataFrame =
    corpus.select(col(idCol).cast("long").as("vid"),
        ProductQuantizer.microUnits(col(vecCol)).as("e"))
      .withColumn("n2", ProductQuantizer.dotL(col("e"), col("e")))

  /** Per-round (src, dst, dist) graphs g0..g_iters, each eagerly
    * checkpointed. `keepAll = false` frees each round's blocks as
    * soon as the next materializes (the nnDescent loop discipline);
    * `true` retains them all — the convergence trace diffs
    * consecutive rounds, and T is a small constant so the held
    * footprint is (iters+1) * n * K edge rows. */
  private def buildRounds(mRaw: DataFrame,
                          k: Int, iters: Int, seed: String,
                          seedRounds: Int,
                          keepAll: Boolean): Seq[DataFrame] = {
    require(k >= 1 && iters >= 0 && seedRounds >= 1,
      "nnDescent: need k >= 1, iters >= 0, seedRounds >= 1")
    val m = mRaw.select(col("vid"), col("e"), col("n2"))
      .localCheckpoint(true)
    // bounded driver action by contract: one scalar count to size the
    // seed buckets (the q35 corpus-derived-width discipline)
    val n = m.count()
    val buckets = math.max(1L, n / (k + 1))

    /** Exact-integer squared L2 for a (src, dst) pair frame — two
      * id-keyed equi-joins against the checkpointed vector frame. */
    def score(pairs: DataFrame): DataFrame =
      pairs
        .join(m.select(col("vid").as("src"), col("e").as("se"),
          col("n2").as("sn2")), Seq("src"))
        .join(m.select(col("vid").as("dst"), col("e").as("de"),
          col("n2").as("dn2")), Seq("dst"))
        .select(col("src"), col("dst"),
          (col("sn2") - lit(2L) * ProductQuantizer.dotL(col("se"), col("de"))
            + col("dn2")).as("dist"))

    val bucketed = m
      .select(col("vid"),
        explode(array((1 to seedRounds).map(lit(_)): _*)).as("r"))
      .withColumn("bucket", pmod(graft.functions.Text.md5Long(
        concat_ws(":", lit(seed), col("r").cast("string"),
          col("vid").cast("string")), 12), lit(buckets)))
    val half = bucketed.as("a").join(bucketed.as("b"),
        col("a.r") === col("b.r") && col("a.bucket") === col("b.bucket") &&
          col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("src"), col("b.vid").as("dst")).distinct()
    val init = half.unionAll(
      half.select(col("dst").as("src"), col("src").as("dst")))
    var g = topK(score(init), k).localCheckpoint(true)
    val rounds = scala.collection.mutable.ArrayBuffer(g)

    for (_ <- 1 to iters) {
      // reverse edges, capped at K per (new) source — the paper's
      // reverse sampling made deterministic by (dist, id) rank
      val rev = g
        .withColumn("rn", row_number().over(
          Window.partitionBy("dst").orderBy(col("dist").asc, col("src").asc)))
        .filter(col("rn") <= k)
        .select(col("dst").as("src"), col("src").as("dst"), col("dist"))
      val cand = g.select("src", "dst")
        .unionAll(rev.select("src", "dst")).distinct()
      // the local join: all neighbor pairs sharing a pivot, strictly
      // ordered so each undirected pair scores once
      val pairsHalf = cand.as("a").join(cand.as("b"),
          col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
        .select(col("a.dst").as("src"), col("b.dst").as("dst")).distinct()
      val ne = score(pairsHalf)
      val neSym = ne.unionAll(
        ne.select(col("dst").as("src"), col("src").as("dst"), col("dist")))
      // dist is a pure function of (src, dst), so distinct() on all
      // three columns dedups by edge; per-node top-K can only improve
      // (old edges stay in the union)
      val next = topK(g.unionAll(neSym).distinct(), k).localCheckpoint(true)
      if (!keepAll)
        org.apache.spark.sql.graft.CheckpointUtils.unpersistCheckpoint(g)
      g = next
      rounds += g
    }
    rounds.toSeq
  }

  /** CONVERGENCE TRACE — the signal a production build monitors to
    * decide when to stop iterating (the loop-until-dry discipline):
    * one row per round with the edge count, the exact-integer total
    * distance, and the number of (node, rank) slots whose distance
    * strictly improved vs the previous round. n_improved falling
    * toward zero IS convergence; sum_dist is monotonically
    * non-increasing rank-for-rank by construction. */
  def nnDescentTrace(corpus: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int, seed: String,
                     seedRounds: Int = 3): DataFrame = {
    val rounds = buildRounds(microFrame(corpus, idCol, vecCol), k, iters,
      seed, seedRounds, keepAll = true)
    def ranked(g: DataFrame): DataFrame =
      g.withColumn("rn", row_number().over(
        Window.partitionBy("src").orderBy(col("dist").asc, col("dst").asc)))
    def summary(round: Int, g: DataFrame, improved: DataFrame): DataFrame =
      g.agg(count(lit(1)).as("n_edges"), sum(col("dist")).as("sum_dist"))
        .crossJoin(broadcast(improved))
        .select(lit(round).as("round"), col("n_edges"), col("sum_dist"),
          col("n_improved"))
    val zero = rounds.head.sparkSession.range(1)
      .select(lit(0L).as("n_improved"))
    val traces = summary(0, rounds.head, zero) +:
      rounds.zip(rounds.tail).zipWithIndex.map { case ((prev, next), i) =>
        val improved = ranked(next).as("n")
          .join(ranked(prev).as("p"),
            col("n.src") === col("p.src") && col("n.rn") === col("p.rn"))
          .filter(col("n.dist") < col("p.dist"))
          .agg(count(lit(1)).as("n_improved"))
        summary(i + 1, next, improved)
      }
    traces.reduce(_ unionAll _)
  }

  /** GRAPH-SEARCH ANN over a built K-NN graph — the serving half of
    * the graph-ANN story (the single-layer beam-search primitive
    * HNSW-family indexes are built around): start from `entries`
    * hash-chosen entry nodes, repeatedly expand the current beam's
    * graph edges, score candidates against the query in exact-integer
    * squared L2, and keep the best `beam` per query. The beam is
    * monotone (the union always contains the previous beam, so top-B
    * never worsens) and every hop is an id-keyed equi-join plus a
    * per-query window — PROBE COST IS INDEPENDENT OF CORPUS SIZE
    * (|Q| x beam x K scorings per hop), the property that makes a
    * graph index worth building at 100 TB where brute force scans n.
    *
    * Deterministic throughout: entry nodes are the `entries` smallest
    * md5(seed:e:vid) (no rand(); TakeOrderedAndProject, never a global
    * sort), ties break on ids, hops are a fixed constant — so the
    * DuckDB oracle unrolls the search bit for bit. A query that IS a
    * corpus member may route to itself mid-search (its own edges are
    * ideal candidates — kept in the beam) but is excluded from the
    * final ranking like every exact baseline (q36 shape). */
  def beamSearch(graph: DataFrame, corpus: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String, k: Int, beam: Int,
                 hops: Int, entries: Int, seed: String): DataFrame = {
    val m = corpus
      .select(col(idCol).cast("long").as("node"),
        ProductQuantizer.microUnits(col(vecCol)).as("ne"))
      .withColumn("nn2", ProductQuantizer.dotL(col("ne"), col("ne")))
      .localCheckpoint(true)
    val qm = queries
      .select(col(idCol).cast("long").as("query_id"),
        ProductQuantizer.microUnits(col(vecCol)).as("qe"))
      .withColumn("qn2", ProductQuantizer.dotL(col("qe"), col("qe")))
    val edges = graph.select(col("vid").as("node"),
      col("neighbor_id").as("nbr"))
    // in memory the expansion is a plain equi-join and scoring reads
    // the checkpointed vector frame directly — no per-hop driver
    // pins (those are the PERSISTED path's tool, where the collected
    // frontier buys bucket-pruned scans; here they'd only serialize
    // the hop loop on job latency)
    beamSearchCore(
      frontier => frontier.select("query_id", "node")
        .join(edges, Seq("node"))
        .select(col("query_id"), col("nbr").as("node")).distinct(),
      _ => m,
      entryNodes(m, entries, seed),
      qm, k, beam, hops)
  }

  /** The `entries` hash-smallest nodes of a (node, ...) frame — the
    * deterministic entry-point rule (TakeOrderedAndProject, never a
    * global sort). */
  private[operators] def entryNodes(nodes: DataFrame, entries: Int,
                                    seed: String): DataFrame =
    nodes.select(col("node"),
        graft.functions.Text.md5Long(
          concat_ws(":", lit(seed), lit("e"), col("node").cast("string")),
          12).as("h"))
      .orderBy(col("h").asc, col("node").asc).limit(entries)
      .select("node")

  /** The search loop behind beamSearch and the persisted
    * KnnGraphRegistry probe, parametrized by STRATEGY: `expand` maps
    * the current beam to its DISTINCT (query_id, node) candidate
    * pairs, and `vecsFor` supplies the (node, ne, nn2) slice scoring
    * joins against. In memory both are plain frames (equi-join
    * expansion, the checkpointed vector frame). The persisted
    * registry passes PINNED versions: each hop collects the bounded
    * frontier ids (|Q| x beam — the q216 one-job routing-pin
    * discipline) and isin-prunes the bucketed edge/vector scans, so
    * persisted probe cost is independent of corpus size. */
  /** `excludeFinal`, when set, is a (node) frame anti-joined out of
    * the FINAL ranking only — the tombstone contract: deleted nodes
    * stay traversable mid-search (their edges are routing waypoints
    * until maintain() GCs them, the HNSW deletion shape) but can
    * never appear in a served result. Broadcast — the set is small
    * by contract. */
  private[operators] def beamSearchCore(
      expand: DataFrame => DataFrame,
      vecsFor: DataFrame => DataFrame,
      entry: DataFrame, qm: DataFrame,
      k: Int, beam: Int, hops: Int,
      excludeFinal: Option[DataFrame] = None): DataFrame = {
    require(k >= 1 && beam >= k && hops >= 0,
      "beamSearch: need 1 <= k <= beam, hops >= 0")

    /** Exact-integer squared L2 of (query_id, node) pairs. */
    def score(pairs: DataFrame): DataFrame =
      pairs.join(vecsFor(pairs), Seq("node"))
        .join(qm, Seq("query_id"))
        .select(col("query_id"), col("node"),
          (col("qn2") - lit(2L) * ProductQuantizer.dotL(col("qe"), col("ne"))
            + col("nn2")).as("dist"))
    def topB(scored: DataFrame): DataFrame =
      scored.withColumn("rn", row_number().over(
          Window.partitionBy("query_id")
            .orderBy(col("dist").asc, col("node").asc)))
        .filter(col("rn") <= beam)
        .select("query_id", "node", "dist")

    var frontier = topB(score(
      qm.select("query_id").crossJoin(broadcast(entry))))
      .localCheckpoint(true)
    for (_ <- 1 to hops) {
      // a re-expanded beam member re-scores to the IDENTICAL row
      // (dist is a pure function of the pair), so the distinct()
      // collapses it instead of letting a duplicate eat a beam slot
      val next = topB(
        frontier.unionAll(score(expand(frontier))).distinct())
        .localCheckpoint(true)
      org.apache.spark.sql.graft.CheckpointUtils.unpersistCheckpoint(frontier)
      frontier = next
    }
    val alive = excludeFinal.fold(frontier)(ex =>
      frontier.join(broadcast(ex.select("node")), Seq("node"), "left_anti"))
    alive.filter(col("node") =!= col("query_id"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("dist").asc, col("node").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("node").as("neighbor_id"),
        col("dist"))
  }

  /** The PERSISTED-registry beam search — beamSearchCore's algebra
    * bit for bit, with the BOUNDED search state held on the driver
    * (VERDICT r12 #1/#2: the hop loop scheduled checkpoint + AQE
    * stage jobs per hop, ~60 scheduler-priced jobs per probe — the
    * production serving-latency floor even though every scan was
    * already pruned). The state was never distributed to begin with:
    * the frontier is |Q| x beam rows and the per-hop candidate set
    * |Q| x beam x K, both bounded by contract, and the old core
    * ALREADY collected the frontier's node ids every hop to isin-prune
    * the bucketed scans (the q216 routing-pin discipline). This core
    * collects the rows instead of just the ids, so a hop costs exactly
    * TWO jobs — the pruned edge fetch and the pruned vector fetch for
    * ids not yet seen — and the merge/rank runs as exact Long
    * arithmetic on the driver (identical to LongDotProduct and the
    * (dist asc, node asc) row_number ranking; the oracle SQL replays
    * both unchanged, and the q225/q228 parity rows pin the equality).
    * The corpus-sized stores are touched ONLY by the two pruned scans;
    * at any corpus size the driver holds O(|Q| x beam x K) longs.
    *
    * `edgesFor(ids)` returns the DISTINCT (node, nbr) edge rows with
    * node in ids; `vecsFor(ids)` the (node, ne, nn2) vector rows.
    * Candidates whose vector row is missing (EDGES-FIRST crash
    * orphans) drop exactly like the old core's inner scoring join.
    * `excludeFinal` nodes are dropped from the served ranking only —
    * the tombstone contract. */
  private[operators] def beamSearchPinned(
      edgesFor: Array[Long] => DataFrame,
      vecsFor: Array[Long] => DataFrame,
      entry: DataFrame, qm: DataFrame,
      k: Int, beam: Int, hops: Int,
      excludeFinal: Option[DataFrame] = None): DataFrame = {
    require(k >= 1 && beam >= k && hops >= 0,
      "beamSearch: need 1 <= k <= beam, hops >= 0")
    val spark = qm.sparkSession
    // the bounded collects: query vectors once, entry ids once
    val queries = qm.select("query_id", "qe", "qn2").collect().map { r =>
      (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2))
    }
    val entryIds = entry.select("node").collect().map(_.getLong(0))
    // vectors fetched so far — each hop fetches only ids not yet seen
    val vecCache =
      scala.collection.mutable.HashMap.empty[Long, (Array[Long], Long)]
    def fetchVecs(ids: Iterable[Long]): Unit = {
      val missing = ids.toArray.distinct.filterNot(vecCache.contains)
      if (missing.nonEmpty)
        vecsFor(missing).select("node", "ne", "nn2").collect().foreach { r =>
          vecCache.update(r.getLong(0),
            (r.getSeq[Long](1).toArray, r.getLong(2)))
        }
    }
    // exact-integer squared L2 — LongDotProduct's arithmetic verbatim
    def dist(qe: Array[Long], qn2: Long, node: Long): Long = {
      val (ne, nn2) = vecCache(node)
      var acc = 0L
      var i = 0
      while (i < qe.length) { acc += qe(i) * ne(i); i += 1 }
      qn2 - 2L * acc + nn2
    }
    // topB: the row_number((dist asc, node asc)) <= beam ranking
    def topB(cands: Iterable[(Long, Long)]): Array[(Long, Long)] =
      cands.toArray.sortBy { case (node, d) => (d, node) }.take(beam)

    fetchVecs(entryIds)
    // frontier(q) = the beam, sorted by (dist, node) — (node, dist)
    var frontier: Map[Long, Array[(Long, Long)]] = queries.map {
      case (qid, qe, qn2) =>
        qid -> topB(entryIds.toSeq
          .filter(vecCache.contains) // entry ids come from the store
          .map(n => n -> dist(qe, qn2, n)))
    }.toMap
    for (_ <- 1 to hops) {
      val fids = frontier.valuesIterator.flatMap(_.map(_._1))
        .toArray.distinct
      if (fids.nonEmpty) {
        // job 1: the pruned edge fetch for the whole frontier
        val adj = edgesFor(fids).select("node", "nbr").collect()
          .groupBy(_.getLong(0))
          .map { case (n, rows) => n -> rows.map(_.getLong(1)).distinct }
        // job 2: the pruned vector fetch for ids not yet seen
        fetchVecs(frontier.valuesIterator.flatMap(_.iterator).flatMap(p =>
          adj.getOrElse(p._1, Array.empty[Long])).toSeq)
        frontier = queries.map { case (qid, qe, qn2) =>
          val cur = frontier(qid)
          // candidates: DISTINCT neighbors of the beam; orphans (no
          // vector row) drop like the old core's inner scoring join;
          // a candidate already in the beam re-scores to the
          // identical (node, dist) row and the map-merge collapses it
          val merged = scala.collection.mutable.HashMap.empty[Long, Long]
          cur.foreach { case (n, d) => merged.update(n, d) }
          cur.iterator.flatMap(p => adj.getOrElse(p._1, Array.empty[Long]))
            .filter(n => !merged.contains(n) && vecCache.contains(n))
            .toArray.distinct
            .foreach(n => merged.update(n, dist(qe, qn2, n)))
          qid -> topB(merged)
        }.toMap
      }
    }
    val excluded: Set[Long] = excludeFinal
      .map(_.select("node").collect().map(_.getLong(0)).toSet)
      .getOrElse(Set.empty)
    val rows: Seq[org.apache.spark.sql.Row] = queries.toSeq.flatMap {
      case (qid, _, _) =>
        frontier(qid) // already (dist, node)-sorted
          .filter { case (n, _) => !excluded(n) && n != qid }
          .take(k).zipWithIndex
          .map { case ((n, d), i) =>
            org.apache.spark.sql.Row(qid, i + 1, n, d) }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("neighbor_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("dist",
        org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
  }

  /** Mutual-KNN edges of a directed graph in nnDescent's output
    * shape: (id_a, id_b) with id_a < id_b kept iff BOTH directions
    * are in the graph at rank <= maxRank — the classic sparsifier
    * that turns a K-NN graph into clusterable near-neighbor structure
    * (hub nodes lose their one-way spokes). The rank cutoff is the
    * density knob: at the full build degree a K-NN graph over
    * anything percolates into one giant component, while mutual-2NN
    * keeps only reciprocal closest pairs (measured on the sf0.01
    * corpus: cutoff 10 -> 1 component of 499, cutoff 2 -> 110
    * components of <= 11). */
  def mutualEdges(graph: DataFrame,
                  maxRank: Int = Int.MaxValue): DataFrame = {
    val e = graph.filter(col("rank") <= maxRank)
      .select(col("vid").as("id_a"), col("neighbor_id").as("id_b"))
    e.join(e.select(col("id_b").as("id_a"), col("id_a").as("id_b")),
        Seq("id_a", "id_b"), "left_semi")
      .filter(col("id_a") < col("id_b"))
  }
}
