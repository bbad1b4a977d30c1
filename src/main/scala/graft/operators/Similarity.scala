package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector-similarity operators over an embedding column
  * (array<float>): brute-force cosine top-k as the exact baseline and
  * a sign-random-projection LSH variant as the scale path.
  *
  * Determinism: dot products cast elements to double and fold
  * left-to-right (`aggregate`), matching DuckDB's `list_reduce` fold
  * bit-for-bit; scores are ranked on their 6-dp rounding with an id
  * tie-break, so rankings are engine-stable.
  *
  * Scale design: the query side of every join is broadcast (queries
  * << corpus); the LSH variant buckets the corpus once (one narrow
  * projection) and joins per bucket, turning O(|Q|·|C|) into
  * O(|Q|·|C|/2^bits) comparisons. For 100 TB, bucket the corpus table
  * by `bucket` at write time so probes are partition-pruned scans.
  */
object Similarity {

  /** Dot product of two float vectors, double accumulation in index
    * order — the codegen'd custom expression (same IEEE fold order as
    * `aggregate(zip_with(...))`, so oracle parity holds; ~10x faster
    * than the interpreted HOF chain in the pair loops). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.{FloatDotProduct, GraftBridge}
    GraftBridge.column(FloatDotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** Squared L2 norm (same fold). */
  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** Per-pair cosine ranking score: 6-dp rounding (engine-stable).
    * try_divide: a zero-norm vector yields NULL (excluded by the
    * topK/pairs guards) instead of an ANSI divide-by-zero ABORTING
    * the whole job — one degenerate embedding must not kill a run. */
  private def cosineScore(qv: Column, cv: Column, qn: Column, cn: Column): Column =
    round(try_divide(dot(qv, cv), sqrt(qn * cn)), 6)

  /** Shared ranking scaffold: per-query (score DESC, neighbor ASC)
    * row_number, keep k. Non-finite scores are excluded FIRST: Spark
    * orders NaN above every real double, so a corpus row with a NaN
    * element would otherwise take rank 1 for every query, and a
    * zero-norm vector's NULL score could fill underfull buckets. */
  private def topK(scored: DataFrame, scoreCol: String, k: Int,
                   extraCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col(scoreCol).desc, col("neighbor_id").asc)
    scored
      .filter(col(scoreCol).isNotNull && !isnan(col(scoreCol).cast("double")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select((Seq("query_id", "rank", "neighbor_id", scoreCol) ++ extraCols).map(col): _*)
  }

  /** Exact top-k neighbors by cosine for each query vector.
    * `queries` and `corpus` both expose (idCol, vecCol); self-pairs
    * are excluded by id. Ranking key: (round(cos,6) DESC, id ASC). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    // Norms are computed once per row on each side BEFORE the join —
    // the per-pair work is a single dot-product fold.
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", norm2(col("qv")))
    // repartition: a single-split corpus would otherwise score every
    // pair on one core (broadcast join preserves stream-side splits).
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .transform(Spread.byKey("neighbor_id"))
      .withColumn("cn", norm2(col("cv")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosineScore(col("qv"), col("cv"), col("qn"), col("cn")))
    topK(scored, "score", k)
  }

  /** Deterministic integer "hyperplane" weight for LSH bit j
    * (0-based) and dimension d (0-based): a fixed pseudo-random value
    * in [-48, 48] — identical in any engine, no RNG state. Flattened
    * index strides by the ACTUAL dim (a fixed stride would make
    * hyperplane j+1 a shifted copy of j whenever dim exceeded it). */
  def hyperplaneWeight(j: Int, d: Int, dim: Int = 64): Long =
    ((j.toLong * dim + d) * 2654435761L) % 97 - 48

  /** Sign-random-projection bucket id in [0, 2^bits): bit j is set
    * iff dot(v, hyperplane_j) >= 0. Weights are small integers, exact
    * as float, so the codegen'd float dot keeps the same products and
    * fold order as the HOF formulation (oracle-stable). */
  def lshBucket(vec: Column, dim: Int, bits: Int): Column = {
    require(bits >= 1, "lshBucket: bits must be >= 1 " +
      "(for the exact no-bucketing variant use cosinePairs(bits = 0) / bruteForceTopK)")
    val bitCols = (0 until bits).map { j =>
      val w = array((0 until dim).map(d => lit(hyperplaneWeight(j, d, dim).toFloat)): _*)
      val proj = dot(vec, w)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** HARD-NEGATIVE MINING for contrastive training: for each anchor,
    * the top-k most similar corpus vectors with a DIFFERENT label —
    * the near-misses a metric model learns most from. Same broadcast
    * shape as bruteForceTopK (anchors << corpus, the corpus never
    * shuffles); the different-label guard rides the join condition so
    * same-label pairs are never scored. At 100 TB swap the exact
    * scorer for the LSH/IVF probe with the same guard. */
  def hardNegatives(anchors: DataFrame, corpus: DataFrame,
                    idCol: String, vecCol: String, labelCol: String,
                    k: Int): DataFrame = {
    // Unlabeled rows are excluded EXPLICITLY on both sides (review):
    // they were already excluded implicitly — NULL =!= x is NULL, so
    // the join dropped every pair touching a NULL label — but
    // silently, so a partially-labeled corpus yielded anchors with
    // zero negatives and no signal why. An unknown label is not
    // evidence of a different class, so the exclusion is the right
    // semantics; the filters make it visible in the plan and in
    // .count() diffs instead of buried in join-null algebra.
    val q = anchors.filter(col(labelCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        col(labelCol).as("query_label"))
      .withColumn("qn", norm2(col("qv")))
    val c = corpus.filter(col(labelCol).isNotNull)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        col(labelCol).as("neighbor_label"))
      .transform(Spread.byKey("neighbor_id"))
      .withColumn("cn", norm2(col("cv")))
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") &&
          col("query_label") =!= col("neighbor_label"))
      .withColumn("score", cosineScore(col("qv"), col("cv"), col("qn"), col("cn")))
    topK(scored, "score", k, Seq("neighbor_label"))
  }

  /** Approximate top-k: candidates are corpus vectors in the query's
    * LSH bucket; ranked by exact cosine within the bucket. Trades
    * recall for a 2^bits reduction in comparisons. */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, dim: Int, bits: Int,
              k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), dim, bits))
      .withColumn("qn", norm2(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .transform(Spread.byKey("neighbor_id"))
      .withColumn("bucket", lshBucket(col("cv"), dim, bits))
      .withColumn("cn", norm2(col("cv")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosineScore(col("qv"), col("cv"), col("qn"), col("cn")))
    topK(scored, "score", k, Seq("bucket"))
  }

  /** IVF-style cell assignment: each vector joins the (broadcast)
    * centroid set and keeps its best-cosine centroid as its cell.
    * Deterministic: rank on (round(cos,6) DESC, centroid id ASC).
    * At 100 TB the corpus is written partitioned/bucketed by `cell`,
    * so probes become partition-pruned scans. */
  /** @param spread repartition the vector side first — right for the
    *   corpus (a single input split would assign every cell on one
    *   core), wasteful for a tiny query set that is immediately
    *   broadcast afterwards. */
  /** Per-vector centroid ranking: every (vector, centroid) pair is
    * scored and ranked per vector — rnk 1 is the home cell, rnk <= p
    * are the p closest cells (the probe set). Shared by assignCells
    * (corpus side, rnk = 1) and ivfTopK's query side (rnk <= nprobe). */
  private def rankedCells(vecs: DataFrame, centroids: DataFrame,
                          idCol: String, vecCol: String,
                          spread: Boolean): DataFrame = {
    val w = Window.partitionBy("id").orderBy(col("cs").desc, col("cid").asc)
    scoredCells(vecs, centroids, idCol, vecCol, spread)
      .withColumn("rnk", row_number().over(w))
  }

  /** The corpus-side argmax as a STRUCT-MAX AGGREGATE, not a window
    * (the lloydArgmax discipline, extended here in r7): ranking the
    * n x k scored join through row_number shuffles every scored row
    * WITH ITS VECTOR attached — at 200k vectors x 3125 derived
    * centroids that is a ~190 GB exchange, measured killing the
    * driver where the aggregate form runs in seconds: map-side
    * partial max collapses the k-fanout to ONE row per vector per
    * input partition before anything shuffles. Ordering semantics
    * are identical to the rnk=1 window row under Spark's total
    * order (struct compare: NaN greatest — exactly as NaN sorts
    * FIRST under the window's cs DESC — and a NULL field smallest,
    * matching desc-nulls-last, so an all-null vector still lands
    * deterministically on its smallest cid): max by
    * (cs, -cid) == first by (cs DESC, cid ASC); the (v, n2) payload
    * fields are never compared because cid is unique per vector. */
  private def argmaxCells(scored: DataFrame): DataFrame =
    scored.groupBy(col("id"))
      .agg(max(struct(col("cs"), (-col("cid")).as("neg_cid"),
        col("v").as("v"), col("n2").as("n2"))).as("best"))
      .select(col("id"), col("best.v").as("v"), col("best.n2").as("n2"),
        (-col("best.neg_cid")).as("cell"), col("best.cs").as("cs"))

  private def scoredCells(vecs: DataFrame, centroids: DataFrame,
                          idCol: String, vecCol: String,
                          spread: Boolean): DataFrame = {
    val base = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
    val v = (if (spread) base.transform(Spread.byKey("id")) else base)
      .withColumn("n2", norm2(col("v")))
    val c = centroids.select(col(idCol).as("cid"), col(vecCol).as("cv"))
      .withColumn("cn2", norm2(col("cv")))
    v.join(broadcast(c))
      .withColumn("cs", cosineScore(col("v"), col("cv"), col("n2"), col("cn2")))
  }

  def assignCells(vecs: DataFrame, centroids: DataFrame,
                  idCol: String, vecCol: String,
                  spread: Boolean = true): DataFrame =
    argmaxCells(scoredCells(vecs, centroids, idCol, vecCol, spread))
      .drop("cs")

  /** assignCells keeping the winning round-6 cosine score — the
    * per-vector quantization-quality signal (what semDedup ranks its
    * keep rule on, and what q204 aggregates into the fit-distortion
    * metric). */
  def assignCellsScored(vecs: DataFrame, centroids: DataFrame,
                        idCol: String, vecCol: String,
                        spread: Boolean = true): DataFrame =
    argmaxCells(scoredCells(vecs, centroids, idCol, vecCol, spread))

  /** IVF top-k: every corpus vector lives in its nearest centroid's
    * cell; a query scans the candidates in its `nprobe` closest cells
    * (nprobe=1: own cell only), ranked by exact cosine over the union.
    * Recall trades against a |centroids|/nprobe-fold reduction in
    * scanned vectors — nprobe is the knob that buys back the vectors
    * a single-cell probe loses at cell borders (measured by
    * q143_ivf_recall, which reports recall@5 at nprobe 1 vs 2).
    * Candidate pairs stay unique across probes because each corpus
    * vector has exactly ONE home cell. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nprobe: Int = 1): DataFrame =
    ivfTopKFromAssignment(queries,
      assignCells(corpus, centroids, idCol, vecCol), centroids,
      idCol, vecCol, k, nprobe)

  /** The IVF probe half decoupled from the corpus-assignment policy:
    * `corpusAsg` is any (id, v, n2, cell) assignment — flat argmin
    * (assignCells, = ivfTopK's behavior) or the two-hop hierarchical
    * route (hierarchicalAssign) — and the query ranking/scoring is
    * identical either way, so layouts differ ONLY by where each
    * corpus vector lives (q206 measures what that difference costs
    * in recall). */
  def ivfTopKFromAssignment(queries: DataFrame, corpusAsg: DataFrame,
                            centroids: DataFrame, idCol: String,
                            vecCol: String, k: Int,
                            nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, "ivfTopK: nprobe must be >= 1")
    val q = rankedCells(queries, centroids, idCol, vecCol, spread = false)
      .filter(col("rnk") <= nprobe)
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("n2").as("qn"), col("cid").as("cell"))
    val c = corpusAsg
      .select(col("id").as("neighbor_id"), col("v").as("cv"),
        col("n2").as("cn"), col("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosineScore(col("qv"), col("cv"), col("qn"), col("cn")))
    topK(scored, "score", k, Seq("cell"))
  }

  /** Write-time IVF layout: the corpus, cell-assigned and written
    * PARTITIONED BY cell (with its squared norm AND int8 quantization
    * precomputed), so probes become directory-pruned scans that never
    * touch the other |centroids|-1 cells — the storage half of the
    * ivfTopK story at 100 TB. One pass over the corpus at ingest;
    * every query after that reads only its nprobe cells, and a
    * quantized probe reads ONLY the 1/4-width `vq` column (parquet
    * column pruning — the float vectors stay on disk untouched). */
  def writeCellPartitioned(corpus: DataFrame, centroids: DataFrame,
                           idCol: String, vecCol: String,
                           path: String): Unit =
    writeAssigned(assignCells(corpus, centroids, idCol, vecCol), path)

  /** writeCellPartitioned's ingest under the TWO-LEVEL quantizer:
    * identical (id, v, n2, vq) PARTITIONED BY cell layout, but the
    * corpus-side assignment runs coarse -> fine (~2n*sqrt(k) instead
    * of n x k — the ingest-side half of the hierarchical story;
    * ScaleCheck: flat assignment 388x vs two-hop 8.1x at 100x data).
    * The layout is DROP-IN for ivfTopKPartitioned /
    * ivfQuantizedTopKPartitioned probes against the same fine
    * centroid set: cells are fine centroid ids either way, and the
    * only behavioral difference is the measured routing approximation
    * (q201: 93% / 98.6% agreement at nprobeCoarse 1 / 2). */
  def writeCellPartitionedHier(corpus: DataFrame, coarse: DataFrame,
                               fine: DataFrame, idCol: String,
                               vecCol: String, path: String,
                               nprobeCoarse: Int = 1): Unit =
    writeAssigned(hierarchicalAssign(corpus, coarse, fine, idCol, vecCol,
      nprobeCoarse).drop("cs"), path)

  /** The DEFAULT ingest entry (VERDICT r6 #1): derive the cell count
    * from the observed corpus size, fit the quantizer, write the
    * (id, v, n2, vq) PARTITIONED BY cell layout, and return the cell
    * centroid set as (idCol, vecCol) — the probe side's coarse
    * quantizer. Above `hierAboveCells` derived cells the fit AND the
    * corpus assignment run coarse->fine (the two-level path the
    * ScaleCheck table measures at ~sqrt(k) of the flat cost); flat
    * below. Either way the written layout is drop-in for
    * ivfTopKPartitioned / ivfQuantizedTopKPartitioned probes against
    * the RETURNED centroids — cells are that set's ids in both
    * routes, and the only behavioral difference is the hierarchy's
    * measured routing approximation (q201/q206). */
  def writeCellPartitionedAuto(corpus: DataFrame, idCol: String,
                               vecCol: String, path: String, maxIter: Int,
                               targetCell: Long = 64L,
                               hierAboveCells: Int = HierRoutingCells)
      : DataFrame = {
    val k = derivedCells(corpus.count(), targetCell)
    if (k > hierAboveCells) {
      val (_, fine, asgC) = fitWithBlocks(corpus, idCol, vecCol, k, maxIter)
      writeAssigned(
        hierarchicalAssignFromBlocks(asgC, fine).drop("cs"), path)
      fine.select(col("cid").as(idCol), col("cv").as(vecCol))
    } else {
      val fitted = kmeansFit(corpus, corpus.filter(col(idCol) < k),
        idCol, vecCol, maxIter)
      writeCellPartitioned(corpus, fitted, idCol, vecCol, path)
      fitted
    }
  }

  private def writeAssigned(assigned: DataFrame, path: String): Unit =
    assigned
      .select(col("id"), col("v"), col("n2"),
        quantize8(col("v")).as("vq"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** IVF top-k over a cell-partitioned corpus written by
    * writeCellPartitioned: the probe cells become a LITERAL partition
    * filter, so the scan prunes to nprobe directories per query set
    * (asserted by spec against the physical plan), and the corpus
    * norms come off disk instead of being recomputed. Ranking
    * semantics are identical to ivfTopK.
    *
    * The probe-cell collect() is driver-side ON PURPOSE: it is
    * bounded by |queries| x nprobe (the query side is the small side
    * by contract — same bounded-by-construction argument as the
    * Normalize header read), and a literal IN list prunes partitions
    * at PLANNING time, with no reliance on runtime DPP heuristics. */
  def ivfTopKPartitioned(queries: DataFrame, corpusPath: String,
                         centroids: DataFrame, idCol: String, vecCol: String,
                         k: Int, nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, "ivfTopKPartitioned: nprobe must be >= 1")
    // PINNED routing (the routeQuantizedQueries invariant, review):
    // the routed frame feeds BOTH the partition-filter collect and
    // the probe join — un-pinned, a nondeterministic queries plan
    // could route to cell A in the join while only cell B survived
    // the filter (silently zero candidates), and even a deterministic
    // one would pay the |Q| x |centroids| ranking twice. Pinned via
    // the ONE-JOB collect (the quantized sibling's shape, VERDICT r8
    // #3): the probe join broadcasts this frame anyway, so the
    // driver footprint is unchanged and the eager-checkpoint +
    // cell-collect pair of jobs collapses to one.
    val routedPlan = rankedCells(queries, centroids, idCol, vecCol,
        spread = false)
      .filter(col("rnk") <= nprobe)
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("n2").as("qn"), col("cid").as("cell"))
    val routedRows = routedPlan.collect() // one job; the pin
    val q = queries.sparkSession.createDataFrame(
      java.util.Arrays.asList(routedRows: _*), routedPlan.schema)
    val probeCells = routedRows.map(_.getAs[Long]("cell")).distinct
    val c = queries.sparkSession.read.parquet(corpusPath)
      .filter(col("cell").isin(probeCells: _*))
      // partition-column read-back infers INT for small cell ids;
      // cast restores the long the in-memory stack (and oracle) emits
      // — the same parity cast the quantized sibling applies
      .select(col("id").as("neighbor_id"), col("v").as("cv"),
        col("n2").as("cn"), col("cell").cast("long").as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosineScore(col("qv"), col("cv"), col("qn"), col("cn")))
    topK(scored, "score", k, Seq("cell"))
  }

  /** The full disk-backed production ANN stack: IVF directory pruning
    * x int8 scoring, both OFF DISK — probe cells become a literal
    * partition filter (the ivfTopKPartitioned contract) and the
    * candidate scan reads only the quantized `vq` column written by
    * writeCellPartitioned, so the dominant scan moves 1/4 the bytes
    * of the float layout on top of touching 1/|cells|*nprobe of the
    * directories. Ranking semantics are identical to the in-memory
    * ivfQuantizedTopK: quantize8 at write time is the same function
    * as quantize8 at query time (spec-asserted parity). */
  def ivfQuantizedTopKPartitioned(queries: DataFrame, corpusPath: String,
                                  centroids: DataFrame, idCol: String,
                                  vecCol: String, k: Int,
                                  nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, "ivfQuantizedTopKPartitioned: nprobe must be >= 1")
    // PINNED routing — same invariant as ivfTopKPartitioned's
    // (routing feeds the filter collect AND the join; evaluate it
    // exactly once), via the ONE-JOB pin probeTopK uses (VERDICT r8
    // #3 applied beyond q208: eager-checkpoint + collect costs two
    // scheduled jobs where serving latency at this batch size IS job
    // count; collecting the routed rows once and re-presenting them
    // as a local relation pins routing, yields the cell list with no
    // further job, and the probe join was broadcasting this frame
    // anyway — same driver footprint).
    val routedPlan = routeQuantizedQueries(queries, centroids, idCol,
      vecCol, nprobe)
    val routedRows = routedPlan.collect() // one job; the pin
    val q = queries.sparkSession.createDataFrame(
      java.util.Arrays.asList(routedRows: _*), routedPlan.schema)
    // bounded-by-contract driver-side cell list (|queries| x nprobe
    // literals), straight off the already-collected routing
    val probeCells = routedRows.map(_.getAs[Long]("cell")).distinct
    val c = queries.sparkSession.read.parquet(corpusPath)
      .filter(col("cell").isin(probeCells: _*))
      // partition-column read-back infers INT for small cell ids;
      // cast restores the long the in-memory stack (and oracle) emits
      .select(col("id").as("neighbor_id"), col("vq").as("cq"),
        col("cell").cast("long").as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("qdot", dotQ8(col("qq"), col("cq")))
    topK(scored, "qdot", k, Seq("cell"))
  }

  /** int8 IVF probe over a PRE-QUANTIZED signature store (id, vq,
    * cell) — the shape that serves ANN directly from a registry's
    * persisted int8 signatures (EmbedDedupRegistry.probeTopK) or any
    * cell-assigned quantized layout already in memory, without
    * re-reading or re-quantizing the float corpus. Query routing and
    * ranking are identical to ivfQuantizedTopK (rankedCells routing,
    * exact integer dot, (qdot DESC, id ASC) rank); only the
    * candidate-side representation differs. */
  def ivfQuantizedTopKFromSignatures(queries: DataFrame, sigs: DataFrame,
                                     centroids: DataFrame, idCol: String,
                                     vecCol: String, k: Int,
                                     nprobe: Int = 1): DataFrame =
    ivfQuantizedTopKFromRoutedQueries(
      routeQuantizedQueries(queries, centroids, idCol, vecCol, nprobe),
      sigs, k)

  /** The query-side ROUTING of a quantized signature probe on its
    * own: one (query_id, qq int8, cell) row per (query, probed
    * cell), rankedCells' (cs DESC, cid ASC) rule at rnk <= nprobe.
    * Callers that prune a signature store by the routed cells
    * materialize THIS frame once and pass it to both the cell
    * collect and the probe join (ivfQuantizedTopKFromRoutedQueries)
    * — a nondeterministic queries plan must not be allowed to route
    * one way and join another. */
  def routeQuantizedQueries(queries: DataFrame, centroids: DataFrame,
                            idCol: String, vecCol: String,
                            nprobe: Int): DataFrame = {
    require(nprobe >= 1, "routeQuantizedQueries: nprobe must be >= 1")
    rankedCells(queries, centroids, idCol, vecCol, spread = false)
      .filter(col("rnk") <= nprobe)
      .select(col("id").as("query_id"), quantize8(col("v")).as("qq"),
        col("cid").as("cell"))
  }

  /** The probe half over a pre-routed query frame (see
    * routeQuantizedQueries): exact integer dot over the store's int8
    * signatures, (qdot DESC, id ASC) rank — identical scoring to
    * ivfQuantizedTopK, with the routing factored out so it is
    * evaluated exactly once however the store is read. */
  def ivfQuantizedTopKFromRoutedQueries(routed: DataFrame, sigs: DataFrame,
                                        k: Int): DataFrame = {
    val c = sigs.select(col("id").as("neighbor_id"), col("vq").as("cq"),
      col("cell"))
    val scored = c.join(broadcast(routed), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("qdot", dotQ8(col("qq"), col("cq")))
    topK(scored, "qdot", k, Seq("cell"))
  }

  /** int8 scalar quantization: clip(round(x * 127)) per element — 4x
    * memory/bandwidth reduction for corpus-scale ANN; scoring becomes
    * exact integer arithmetic (engine-deterministic by construction). */
  def quantize8(vec: Column): Column =
    transform(vec, x =>
      greatest(lit(-127), least(lit(127), round(x.cast("double") * 127))).cast("int"))

  /** Integer dot product over quantized vectors (exact, order-free).
    * Runs through the codegen'd FloatDotProduct: int8 values and
    * their products (|p| <= 16129) are exact as float, and the double
    * accumulation is exact far beyond any real dim — so the result
    * IS the integer dot, at codegen speed instead of the interpreted
    * per-element lambda chain (this is the O(|Q|*|C|) hot path). */
  def dotQ8(a: Column, b: Column): Column =
    dot(transform(a, x => x.cast("float")),
      transform(b, x => x.cast("float"))).cast("long")

  /** Top-k by quantized dot product — the memory-bound scale path:
    * rank on the int score with an id tie-break. */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame,
                    idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      quantize8(col(vecCol)).as("qq"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .transform(Spread.byKey("neighbor_id"))
      .withColumn("cq", quantize8(col("cv"))).drop("cv")
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("qdot", dotQ8(col("qq"), col("cq")))
    topK(scored, "qdot", k)
  }

  /** The production ANN composition: IVF cell pruning x int8
    * scoring — probe the query's nprobe closest cells (coarse
    * quantizer stays full-precision, as usual), rank candidates by
    * the exact integer quantized dot product (q70's memory-bound
    * path). At 100 TB: corpus cell-partitioned at write time
    * (writeCellPartitioned) with the int8 vectors stored, queries
    * broadcast — scans touch nprobe directories of 1/4-width
    * vectors. */
  def ivfQuantizedTopK(queries: DataFrame, corpus: DataFrame,
                       centroids: DataFrame, idCol: String, vecCol: String,
                       k: Int, nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, "ivfQuantizedTopK: nprobe must be >= 1")
    val q = rankedCells(queries, centroids, idCol, vecCol, spread = false)
      .filter(col("rnk") <= nprobe)
      .select(col("id").as("query_id"), quantize8(col("v")).as("qq"),
        col("cid").as("cell"))
    val c = assignCells(corpus, centroids, idCol, vecCol)
      .select(col("id").as("neighbor_id"), quantize8(col("v")).as("cq"),
        col("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("qdot", dotQ8(col("qq"), col("cq")))
    topK(scored, "qdot", k, Seq("cell"))
  }

  /** One k-means (Lloyd) iteration over an embedding corpus: assign
    * each vector to its nearest seed centroid by cosine (6-dp score,
    * ties -> smaller seed id), then recompute element-wise centroids
    * decimal-exactly (the q82 shape). Returns
    * (cluster_id, dim_no, n, centroid).
    *
    * Scale shape: seeds broadcast (k rows); the argmax is a
    * struct-max AGGREGATE, not a join-back or a window — map-side
    * partial aggregation reduces the k-fanout to one row per vector
    * before anything shuffles, then the centroid sums shuffle only
    * (k x dim) cells. Vectors with a NULL/NaN score against every
    * seed (zero-norm) are dropped.
    *
    * INPUT CONTRACT (ADVICE r6): embedding components are expected in
    * [-1, 1] (normalized or near-normalized vectors — every q-entry
    * corpus satisfies this). The exact-integer centroid mean's
    * overflow guard is calibrated to that contract: at |component|
    * <= c the int64 micro-unit sum is safe to ~4e8/c members per
    * cluster, so feeding vectors with components of magnitude ~10
    * shrinks the safe cluster bound 10x below where the guard fires.
    * Rescale such corpora before fitting. */
  def kmeansIteration(corpus: DataFrame, seeds: DataFrame,
                      idCol: String, vecCol: String): DataFrame =
    kmeansIterationPrepped(
      prepLloydCorpus(corpus, idCol, vecCol), seeds, idCol, vecCol)

  /** The corpus side of a Lloyd round — spread by vector id and
    * pre-normed. Factored out so the fit LOOP can derive it once and
    * pin it across rounds (each round re-deriving it was a full
    * re-scan + re-shuffle of the corpus per round — guide §2.4/§5). */
  private def prepLloydCorpus(corpus: DataFrame, idCol: String,
                              vecCol: String): DataFrame =
    corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
      .transform(Spread.byKey("vec_id"))
      .withColumn("cn", norm2(col("cv")))

  /** One Lloyd round over an already-prepped (vec_id, cv, cn)
    * corpus — kmeansIteration minus the corpus prep. */
  private def kmeansIterationPrepped(c: DataFrame, seeds: DataFrame,
                                     idCol: String, vecCol: String): DataFrame = {
    val s = seeds.select(col(idCol).as("seed_id"), col(vecCol).as("sv"))
      .withColumn("sn", norm2(col("sv")))
    exactCentroidMean(lloydArgmax(c.join(broadcast(s), lit(true))))
  }

  /** The Lloyd argmax over a scored (vec_id, cv, cn, seed_id, sv, sn)
    * join: score by cosine, drop non-finite, keep each vector's best
    * (score DESC, smaller seed id) assignment. Struct max is
    * lexicographic: best score, then SMALLER seed id (negated so max
    * picks it); cv rides along, never compared (neg_seed is unique
    * within a vec_id group). Shared by the flat (cross-join) and
    * blocked (coarse-cell equi-join) iterations — the argmax rule
    * must not drift between them. */
  private def lloydArgmax(joined: DataFrame): DataFrame =
    joined
      .withColumn("score", cosineScore(col("sv"), col("cv"), col("sn"), col("cn")))
      .filter(col("score").isNotNull && !isnan(col("score").cast("double")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("score"), (-col("seed_id")).as("neg_seed"),
        col("cv").as("cv"))).as("best"))
      .select((-col("best.neg_seed")).as("cluster_id"), col("best.cv").as("cv"))

  /** Per-cluster element-wise mean of float vectors, exact-integer
    * arithmetic (see the comment below) — input (cluster_id, cv),
    * output (cluster_id, dim_no, n, centroid). */
  private def exactCentroidMean(assigned: DataFrame): DataFrame = {
    // Centroid mean in EXACT integer micro-units, not decimal casts:
    // DuckDB's REAL->DECIMAL cast scales in FLOAT arithmetic (its
    // 0.019056067f becomes 0.0190560672) while Spark's goes through
    // the shortest string repr (0.0190560670) — per-element 1e-9
    // discrepancies that occasionally cross a 6-dp rounding boundary
    // once cell counts grow (observed: 20 rows, one cell, sf0.1 at 32
    // cells). floor(x*1e10 + 0.5) over the float's double value is
    // bitwise identical in both engines; the half-away-from-zero
    // division to 6-dp units is exact bigint DIV (DuckDB BIGINT //
    // matches — both truncate, operands kept non-negative); the final
    // /1e6 double division is one IEEE op. Parity holds while the
    // int64 sum has headroom: |ssum| stays under 2^62 for clusters of
    // up to ~4e8 members at |component| <= 1 (review: the previous
    // "ANY cell count" claim overstated it — a multi-billion-vector
    // corpus under the 4096-cell clamp CAN put ~5e8 vectors in one
    // cell, where a silent non-ANSI wraparound would produce a
    // garbage centroid; DuckDB's int128 sum would not, so parity
    // breaks exactly there). The guard below fails LOUDLY at the
    // bound instead — shard the cell or raise targetCell past it.
    // The guard is folded INTO the `centroid` expression (not a
    // separate guarded `n` column): the fit loops select only
    // (cluster_id, dim_no, centroid), so a guard riding the `n`
    // column would be REMOVED by column pruning exactly where the
    // overflow matters (ADVICE r6) — every consumer that can see a
    // wrapped sum reads `centroid`, so this placement is un-prunable.
    // The 4e8 bound assumes |component| <= 1 (the documented input
    // contract on kmeansFit / kmeansIteration): at |component| <= c
    // the safe bound is ~4e8/c members.
    assigned.select(col("cluster_id"), posexplode(col("cv")))
      .groupBy(col("cluster_id"), col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("col").cast("double") * lit(1e10) + lit(0.5))).as("ssum"))
      .select(col("cluster_id"), col("pos").as("dim_no"), col("n"),
        when(col("n") > lit(400000000L), raise_error(concat(
          lit("exactCentroidMean: cluster "), col("cluster_id").cast("string"),
          lit(" has > 4e8 members — int64 micro-unit sum may wrap; "
            + "shard the cell or raise the cell count"))).cast("double"))
          .otherwise(expr("""CASE WHEN ssum >= 0
                 THEN (2 * ssum + n * 10000) DIV (2 * n * 10000)
                 ELSE -((2 * -ssum + n * 10000) DIV (2 * n * 10000)) END""")
            .cast("double") / lit(1e6)).as("centroid"))
  }

  /** Lloyd's algorithm to CONVERGENCE: iterate kmeansIteration until
    * the recomputed centroids reach a fixpoint (assignments stable =>
    * centroids bit-stable on their 6-dp rounding) or maxIter rounds,
    * whichever first. One Spark job per round — the round's bounded
    * (k x dim) stats collect IS the job (this operator owes the next
    * round a broadcast seed set anyway), and the convergence signal
    * is computed driver-side from the same rows: no second action per
    * round (the Dedup.scala star-loop discipline).
    *
    * Early stop is an OPTIMIZATION only: Lloyd is idempotent at a
    * fixpoint, so a run that stops at round m < maxIter returns
    * exactly what running all maxIter rounds would — which is what
    * lets a fixed-round unrolled SQL oracle certify a
    * convergence-stopped fit (q151). Empty clusters carry their
    * previous centroid forward. Returns (idCol, vecCol) float
    * vectors — k rows, broadcast-sized by contract. Input contract:
    * components in [-1, 1] (kmeansIteration's overflow-guard
    * calibration). */
  def kmeansFit(corpus: DataFrame, seeds: DataFrame,
                idCol: String, vecCol: String, maxIter: Int): DataFrame =
    kmeansFitWithRounds(corpus, seeds, idCol, vecCol, maxIter)._1

  /** kmeansFit + the number of rounds actually run (maxIter when the
    * cap hit first; < maxIter means round `n` confirmed round n-1's
    * fixpoint) — the operability number a scheduled re-fit monitors. */
  def kmeansFitWithRounds(corpus: DataFrame, seeds: DataFrame,
                          idCol: String, vecCol: String,
                          maxIter: Int): (DataFrame, Int) = {
    require(maxIter >= 1, "kmeansFit: maxIter must be >= 1")
    val spark = corpus.sparkSession
    def toDf(cs: Seq[(Long, Seq[Float])]): DataFrame = {
      import spark.implicits._
      cs.toDF(idCol, vecCol)
    }
    // seed centroids: one bounded collect (k rows by contract)
    var cents: Seq[(Long, Seq[Float])] = seeds
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq.sortBy(_._1)
    // pin the prepped corpus ONCE for the whole loop (lazy local
    // checkpoint — materialized by round 1's job, reused by rounds
    // 2..n): without it every round's collect re-ran the corpus scan,
    // projection and spread exchange from scratch (guide §2.4 "remove
    // shuffles outright", §5 reuse). maxIter == 1 runs one round and
    // would pay the pin for nothing — skip it there.
    val prepped =
      if (maxIter > 1) prepLloydCorpus(corpus, idCol, vecCol).localCheckpoint(false)
      else prepLloydCorpus(corpus, idCol, vecCol)
    var round = 0
    var converged = false
    while (round < maxIter && !converged) {
      val stats = kmeansIterationPrepped(prepped, toDf(cents), idCol, vecCol)
        .select(col("cluster_id").cast("long"), col("dim_no"), col("centroid"))
        .collect()
      val computed = stats.groupBy(_.getLong(0)).map { case (cid, rows) =>
        // float narrowing matches the oracle's ::REAL — the next
        // round's seeds are identical in both engines
        cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat).toSeq
      }
      val next = cents.map { case (cid, v) => (cid, computed.getOrElse(cid, v)) }
      converged = next == cents
      cents = next
      round += 1
    }
    (toDf(cents), round)
  }

  /** Deterministic MAXIMIN (farthest-first / Gonzalez 1985) seeding —
    * the quality-aware alternative to the id-low seed rule (k-means++
    * without the randomness, so both engines replicate it exactly):
    * start from the smallest id, then repeatedly add the vector whose
    * MAXIMUM round-6 cosine to the current seed set is LOWEST (the
    * farthest point; ties to the smaller id). Zero-norm vectors are
    * never picked by the maximin rule (their cosine is non-finite
    * against everything) — but the START seed is the min id
    * regardless of norm; a degenerate zero-norm start leaves every
    * candidate scoreless and the result is that single seed (the
    * caller's dense-meaningful-id contract, same as kmeansFit's).
    *
    * Scale shape: k-1 bounded driver rounds (the kmeansFit loop
    * discipline — seeds are broadcast-sized by contract), each a
    * broadcast score + TakeOrdered(1); the corpus never shuffles.
    * q207's predecessor (retired q205) measured what it buys in fit
    * quality; `oversampledSeeds` below is the default-seeding shape
    * at scale (rounds+2 passes instead of k-1). */
  def maximinSeeds(corpus: DataFrame, idCol: String, vecCol: String,
                   k: Int): DataFrame = {
    require(k >= 1, "maximinSeeds: k must be >= 1")
    val spark = corpus.sparkSession
    import spark.implicits._
    // k-1 driver rounds each read this twice (scoring pass + the
    // picked row's v read-back) — materialize once, the
    // Perceptron/BpeTrain base discipline
    val base = Dedup.DefaultMaterialize(corpus
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("v"))
      .withColumn("n2", norm2(col("v"))))
    var seeds: Seq[(Long, Seq[Float])] = base.orderBy(col("id").asc).limit(1)
      .select("id", "v").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    var exhausted = seeds.isEmpty
    while (seeds.length < k && !exhausted) {
      val sdf = seeds.toDF("sid", "sv").withColumn("sn", norm2(col("sv")))
      val picked = base
        .filter(!col("id").isin(seeds.map(_._1): _*))
        .join(broadcast(sdf), lit(true))
        .withColumn("cs", cosineScore(col("v"), col("sv"), col("n2"), col("sn")))
        .filter(col("cs").isNotNull && !isnan(col("cs").cast("double")))
        .groupBy(col("id")).agg(max(col("cs")).as("mx"))
        .orderBy(col("mx").asc, col("id").asc).limit(1)
        .join(base, Seq("id"))
        .select("id", "v").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1)))
      if (picked.isEmpty) exhausted = true else seeds ++= picked
    }
    seeds.toDF(idCol, vecCol)
  }

  /** Deterministic OVERSAMPLED seeding — the k-means‖ idea (Bahmani
    * et al. 2012, "Scalable k-means++") with every random draw
    * replaced by an exact total order, so both engines replicate it
    * bit-for-bit (VERDICT r6 #2, the round-count fix for maximin):
    *
    *  1. pool starts at the min-id vector (maximinSeeds' start rule);
    *  2. each of `rounds` rounds adds the `ell` candidates whose MAX
    *     round-6 cosine to the current pool is lowest (the farthest
    *     BATCH — ties to the smaller id; non-finite scores dropped
    *     per pair, the Lloyd filter rule), where maximin adds ONE;
    *  3. the pool (<= 1 + rounds*ell rows, broadcast-sized) is
    *     reduced to k seeds by DATA WEIGHT: assign every corpus
    *     vector to its nearest pool member (rankedCells' exact
    *     (cs DESC, id ASC) rule, non-finite assignments excluded)
    *     and keep the k most-populated members (count DESC, id ASC)
    *     — the deterministic analogue of k-means‖'s weighted
    *     reduction, which favors candidates that actually represent
    *     mass over the lone outliers farthest-first chases.
    *
    * Scale shape: `rounds` + 2 bounded driver rounds TOTAL (each one
    * broadcast score + TakeOrdered(ell) / one count aggregate)
    * versus maximin's k-1 sequential corpus passes — the fixed
    * per-job scheduling latency that dominates a k-pass Gonzalez
    * loop at any scale shrinks by ~k/(rounds+2), and each remaining
    * pass is the same corpus-never-shuffles broadcast shape. q207
    * measures what the seeding buys in fit quality. */
  def oversampledSeeds(corpus: DataFrame, idCol: String, vecCol: String,
                       k: Int, ell: Int = 0, rounds: Int = 2): DataFrame = {
    require(k >= 1, "oversampledSeeds: k must be >= 1")
    require(rounds >= 1, "oversampledSeeds: rounds must be >= 1")
    val l = if (ell > 0) ell else 2 * k
    // the pool is capped at 1 + rounds*l rows by construction; if the
    // PARAMETERS cannot reach k the caller gets a silently degraded
    // quantizer (fewer-than-k seeds on an arbitrarily large corpus) —
    // fail loudly instead. A pool short of k because the CORPUS ran
    // out (exhausted) remains the legitimate maximinSeeds contract.
    require(1L + rounds.toLong * l >= k,
      s"oversampledSeeds: 1 + rounds*ell = ${1L + rounds.toLong * l} can " +
        s"never reach k=$k — raise ell or rounds")
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = Dedup.DefaultMaterialize(corpus
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("v"))
      .withColumn("n2", norm2(col("v"))))
    var pool: Seq[(Long, Seq[Float])] = base.orderBy(col("id").asc).limit(1)
      .select("id", "v").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    var round = 0
    var exhausted = pool.isEmpty
    while (round < rounds && !exhausted) {
      val sdf = pool.toDF("sid", "sv").withColumn("sn", norm2(col("sv")))
      val picked = base
        .filter(!col("id").isin(pool.map(_._1): _*))
        .join(broadcast(sdf), lit(true))
        .withColumn("cs", cosineScore(col("v"), col("sv"), col("n2"), col("sn")))
        .filter(col("cs").isNotNull && !isnan(col("cs").cast("double")))
        .groupBy(col("id")).agg(max(col("cs")).as("mx"))
        .orderBy(col("mx").asc, col("id").asc).limit(l)
        .join(base, Seq("id"))
        .select("id", "v").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1)))
      if (picked.isEmpty) exhausted = true
      else pool ++= picked.sortBy(_._1)
      round += 1
    }
    if (pool.length <= k) pool.toDF(idCol, vecCol)
    else {
      val poolDf = pool.toDF(idCol, vecCol)
      // one bounded job: per-pool-member data weight, top-k members —
      // the assignment argmax is the struct-max AGGREGATE
      // (argmaxCells), so only one row per corpus vector shuffles.
      // The count collect is bounded by the pool size (<= 1+rounds*l).
      val cntMap = assignCellsScored(base.select(col("id").as(idCol),
          col("v").as(vecCol)), poolDf, idCol, vecCol, spread = true)
        .filter(col("cs").isNotNull && !isnan(col("cs").cast("double")))
        .groupBy(col("cell")).agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // rank EVERY pool member, zero-vote members included (review:
      // a pool member whose votes all go to a lower-id twin — exact
      // duplicates in a dedup-shaped corpus — has no count row at
      // all, and a top-k over the count table alone would silently
      // return FEWER than k seeds; ranking by (coalesce(cnt,0) DESC,
      // id ASC) keeps the exactly-k contract maximinSeeds has)
      val keep = pool.map(_._1)
        .sortBy(id => (-cntMap.getOrElse(id, 0L), id)).take(k).toSet
      pool.filter(p => keep.contains(p._1)).toDF(idCol, vecCol)
    }
  }

  /** Smallest c with c*c >= k (k >= 1): exact integer ceil-sqrt by
    * upward scan from the floor estimate — no floating-point sqrt in
    * the derivation the oracle must replicate (DuckDB mirrors it with
    * a bounded generate_series min-scan). */
  def ceilSqrt(k: Long): Int = {
    require(k >= 1, s"ceilSqrt: k must be >= 1, got $k")
    var c = math.max(1L, math.sqrt(k.toDouble).toLong - 2)
    while (c * c < k) c += 1
    c.toInt
  }

  /** One BLOCKED Lloyd iteration: identical argmax + exact-mean rules
    * to kmeansIteration, but each vector competes only among the fine
    * centroids of its own coarse block — the n x k cross join becomes
    * an equi-join on `blk` against a broadcast seed set, n x (k/c)
    * comparisons. Input: corpus (vec_id, cv, blk) pre-assigned to
    * coarse blocks; seeds (seed_id, sv, blk). Fine centroids never
    * migrate across blocks (the hierarchy is fixed by the coarse
    * assignment), which is what makes the blocked fit both cheap and
    * oracle-expressible as an equi-join CTE. */
  /** One blocked Lloyd round over an already-prepped (vec_id, cv,
    * blk, cn) corpus — the fit loop pins that prep once per fit
    * (the unprepped per-round wrapper was deleted with the pin: one
    * prep implementation, in the loop). */
  private def kmeansIterationBlockedPrepped(c: DataFrame,
                                            seeds: DataFrame): DataFrame = {
    val s = seeds.select(col("seed_id"), col("sv"), col("blk"))
      .withColumn("sn", norm2(col("sv")))
    exactCentroidMean(lloydArgmax(c.join(broadcast(s), Seq("blk"))))
  }

  /** Blocked Lloyd to convergence — the kmeansFitWithRounds driver
    * loop with (cid, blk, vector) centroid state. Same
    * one-job-per-round / bounded (k x dim) collect / empty-cluster
    * carry-forward / fixpoint-idempotence contract, so a fixed-round
    * unrolled SQL oracle certifies a convergence-stopped fit here
    * too. `assigned` is (vec_id, cv, blk); `seeds` is (seed_id, sv,
    * blk), k rows, broadcast-sized by contract. Returns ((seed_id,
    * sv, blk), roundsRun). */
  def blockedKmeansFitWithRounds(assigned: DataFrame, seeds: DataFrame,
                                 maxIter: Int): (DataFrame, Int) = {
    require(maxIter >= 1, "blockedKmeansFit: maxIter must be >= 1")
    val spark = assigned.sparkSession
    def toDf(cs: Seq[(Long, Long, Seq[Float])]): DataFrame = {
      import spark.implicits._
      cs.toDF("seed_id", "blk", "sv").select("seed_id", "sv", "blk")
    }
    var cents: Seq[(Long, Long, Seq[Float])] = seeds
      .select(col("seed_id").cast("long"), col("blk").cast("long"),
        col("sv").cast("array<float>"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2)))
      .toSeq.sortBy(_._1)
    // same loop-wide corpus pin as kmeansFitWithRounds (the flat fit):
    // prep once, lazily checkpoint, every round reuses the blocks
    val prepBase = assigned.select(col("vec_id"), col("cv"), col("blk"))
      .withColumn("cn", norm2(col("cv")))
    val prepped =
      if (maxIter > 1) prepBase.localCheckpoint(false) else prepBase
    var round = 0
    var converged = false
    while (round < maxIter && !converged) {
      val stats = kmeansIterationBlockedPrepped(prepped, toDf(cents))
        .select(col("cluster_id").cast("long"), col("dim_no"), col("centroid"))
        .collect()
      val computed = stats.groupBy(_.getLong(0)).map { case (cid, rows) =>
        cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat).toSeq
      }
      val next = cents.map { case (cid, blk, v) =>
        (cid, blk, computed.getOrElse(cid, v))
      }
      converged = next == cents
      cents = next
      round += 1
    }
    (toDf(cents), round)
  }

  /** TWO-LEVEL (coarse -> fine) quantizer fit — the
    * hierarchical-coarse-quantizer fix for the n x k assignment cross
    * join (SCALE.md's named residual cliff: corpus-derived cells keep
    * within-cell pair cost flat, but assignment against k ~ n/target
    * centroids is ~n²/target). Fit c = ceilSqrt(k) coarse centroids
    * on the full corpus (n x c per round), assign each vector to its
    * coarse block, then fit ceil(k/c) fine centroids WITHIN each
    * block (an equi-join: n x k/c per round). Total per-round cost
    * ~2 n sqrt(k) instead of n k — at k = 4096 a 32x reduction, and
    * the shape a real IVF build uses at billion-vector scale.
    *
    * Seeds are deterministic: coarse from ids < c (the kmeansFit
    * dense-id contract), fine from each block's lowest-id members
    * (row_number per block), so the DuckDB oracle replicates the
    * whole fit bit-for-bit. Returns (coarseCentroids (idCol, vecCol),
    * fineCentroids (cid, cv, blk)); fine cids are the seed vectors'
    * corpus ids — globally unique. */
  def hierarchicalQuantizerFit(corpus: DataFrame, idCol: String,
                               vecCol: String, k: Int, maxIter: Int)
      : (DataFrame, DataFrame) = {
    val (coarse, fine, _) = fitWithBlocks(corpus, idCol, vecCol, k, maxIter)
    (coarse, fine)
  }

  /** The fit body, also returning the coarse-block assignment it
    * already computed — hierarchicalSemDedupAuto's final assignment
    * reuses it instead of re-scoring the coarse hop (found by
    * review: the assign's first hop is bitwise identical to the
    * fit's). asgC feeds maxIter blocked Lloyd rounds + the fine
    * seeding + that final assignment, so it is materialized once
    * (the multi-consumer rule; DefaultMaterialize's cluster caveat
    * applies — pass-through recompute was the previous behavior). */
  private def fitWithBlocks(corpus: DataFrame, idCol: String,
                            vecCol: String, k: Int, maxIter: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val c = ceilSqrt(k)
    val finePer = (k + c - 1) / c
    val coarse = kmeansFit(corpus, corpus.filter(col(idCol) < c),
      idCol, vecCol, maxIter)
    val asgC = Dedup.DefaultMaterialize(
      assignCells(corpus, coarse, idCol, vecCol)
        .withColumnRenamed("cell", "blk"))
    val w = Window.partitionBy("blk").orderBy(col("id").asc)
    val seeds = asgC.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= finePer)
      .select(col("id").as("seed_id"), col("v").as("sv"), col("blk"))
    val (fine, _) = blockedKmeansFitWithRounds(
      asgC.select(col("id").as("vec_id"), col("v").as("cv"), col("blk")),
      seeds, maxIter)
    (coarse, fine.select(col("seed_id").as("cid"), col("sv").as("cv"),
      col("blk")), asgC)
  }

  /** All pairs (id_a < id_b) with cosine >= threshold — embedding
    * near-dup detection. Blocked by LSH bucket when `bits` > 0 (pairs
    * in different buckets are skipped: approximate but scalable);
    * bits = 0 is the exact quadratic variant. */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
                  dim: Int, threshold: Double, bits: Int = 0): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .transform(Spread.byKey("id"))
      .withColumn("n2", norm2(col("v")))
    // bits = 0 (exact variant) joins on id inequality ONLY — an
    // explicit non-equi join, not an equi-join on a constant bucket
    // column, whose parallelism would hinge on FoldablePropagation
    // rewriting the condition (one shuffle partition if it doesn't).
    val joined = (if (bits > 0) {
      val withB = base.withColumn("bucket", lshBucket(col("v"), dim, bits))
      withB.as("a").join(withB.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
    } else {
      base.as("a").join(base.as("b"), col("a.id") < col("b.id"))
    })
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosineScore(col("a.v"), col("b.v"), col("a.n2"), col("b.n2")).as("cos_sim"))
    // !isnan: Spark SQL orders AND compares NaN above every double,
    // so a NaN similarity would pass the threshold; NULL (zero-norm
    // vector) already fails the comparison.
    joined.filter(!isnan(col("cos_sim")) && col("cos_sim") >= threshold)
  }

  /** Smallest b with 2^b >= m (m >= 1): exact integer ceil-log2, no
    * transcendentals — the DuckDB oracles replicate it bit-for-bit
    * with a bounded generate_series scan. */
  def ceilLog2(m: Long): Int =
    if (m <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)

  /** Corpus-derived LSH width: enough bits that the EXPECTED bucket
    * population is ~targetBucket (2^bits >= ceil(n/targetBucket)),
    * clamped to [1, 16]. Fixed-width blocking is the measured 100 TB
    * cliff (SCALE.md: within-bucket pairs grow ~n²/2^bits, 19.6x time
    * at 10x data for fixed bits=4); deriving bits from an observed
    * corpus count keeps the per-bucket pair cost FLAT as data grows.
    * Cap 16: 65k buckets bounds the bucket-id arithmetic; recall loss
    * per added bit is the sign-LSH collision probability, unchanged. */
  def derivedLshBits(n: Long, targetBucket: Long = 128L): Int =
    math.min(16, math.max(1, ceilLog2((n + targetBucket - 1) / targetBucket)))

  /** Corpus-derived quantizer cell count: ceil(n/targetCell) clamped
    * to [4, 4096] — the SemDeDup knob (fixed 12 cells measured 8.9x
    * at 10x data). 4096 x dim floats bounds kmeansFit's driver state
    * at any corpus size. */
  def derivedCells(n: Long, targetCell: Long = 64L): Int =
    math.min(4096L, math.max(4L, (n + targetCell - 1) / targetCell)).toInt

  /** cosinePairs with CORPUS-DERIVED bucket width: one count() job
    * observes n (a single driver-side long), then blocks at
    * 2^derivedLshBits(n, targetBucket) sign-LSH buckets. The explicit
    * `bits` override (cosinePairs) remains for callers that pin
    * width; this is the default path a growing corpus should use. */
  def cosinePairsAuto(df: DataFrame, idCol: String, vecCol: String,
                      dim: Int, threshold: Double,
                      targetBucket: Long = 128L): DataFrame =
    cosinePairs(df, idCol, vecCol, dim, threshold,
      bits = derivedLshBits(df.count(), targetBucket))

  /** Routing threshold for the default semantic-dedup / IVF-ingest
    * paths (VERDICT r6 #1): above this many derived cells the flat
    * n x k assignment is the measured scale cliff (k ~ n/targetCell
    * makes it ~n²/targetCell — ScaleCheck: assignFlat 362x time at
    * 100x input, flat semDedupAuto 589.8 s where the two-level path
    * does the same job in 35.8 s), so `semDedupAuto` and
    * `writeCellPartitionedAuto` switch to the coarse->fine quantizer
    * there. Below it the flat fit is cheaper in absolute terms (no
    * second Lloyd chain) and exactly matches the q183 oracle. At
    * targetCell=64 the switch point is ~16k vectors. */
  val HierRoutingCells = 256

  /** Default skew-valve cap for the routed semantic-dedup paths
    * (VERDICT r7 #2): `cellCap = DerivedCellCap` (the default) arms
    * semDedupCapped's salting at 16 x targetCell. Why this is safe
    * as a DEFAULT: cells at or under the cap run nsub = 1 — byte-
    * identical output to the uncapped tail (q202's spec'd contract) —
    * so on any corpus whose cells stay within 16x of the target
    * population nothing changes; on a skewed corpus (one dominant
    * language/domain concentrating a cell) the per-block pair cost is
    * bounded at ~cap² instead of ~pop². 16x is deliberately loose:
    * k-means cells on real data routinely run a few x over target,
    * and the valve should only bind where the uncapped path is
    * headed for a quadratic cliff, not trim ordinary imbalance.
    * `cellCap = 0` keeps the exact uncapped tail for callers that
    * want unconditional semDedup parity at any skew. */
  val DerivedCellCap = -1
  private val DerivedCellCapMultiplier = 16L
  private def resolveCellCap(cellCap: Int, targetCell: Long): Int =
    if (cellCap != DerivedCellCap) cellCap
    else math.min(Int.MaxValue.toLong,
      DerivedCellCapMultiplier * math.max(1L, targetCell)).toInt

  /** semDedup with a CORPUS-DERIVED cell count: observes n, derives
    * k = derivedCells(n, targetCell) (dense-ish id space assumed —
    * the explicit-seed semDedup + kmeansFit path remains for
    * arbitrary id spaces), then runs the cluster-blocked dedup. Cell
    * population stays ~targetCell as the corpus grows, so the
    * within-cell pair cost stays flat — and the FIT+ASSIGNMENT cost
    * is kept off the n x k cliff by routing: above `hierAboveCells`
    * derived cells the fit and assignment run coarse->fine
    * (~2n*sqrt(k) per round, hierarchicalSemDedupAuto's exact path),
    * flat below. The routed paths differ only by the hierarchy's
    * measured routing approximation (q201: 93-98.6% cell agreement;
    * q203: dedup-decision delta) — callers that need the flat
    * reference behavior at ANY size use semDedupFlatAuto. */
  def semDedupAuto(corpus: DataFrame, idCol: String, vecCol: String,
                   eps: Double, maxIter: Int,
                   targetCell: Long = 64L,
                   hierAboveCells: Int = HierRoutingCells,
                   cellCap: Int = DerivedCellCap): DataFrame = {
    // cellCap > 0 arms the skew valve (semDedupCapped's salting) on
    // WHICHEVER assignment the router picks — a skewed corpus
    // concentrates one cell regardless of how the cell was chosen.
    // The DEFAULT is the derived cap (16 x targetCell, DerivedCellCap
    // doc): byte-identical to uncapped wherever no cell exceeds it,
    // bounded ~cap² per block where one does. cellCap = 0 keeps the
    // unconditionally-uncapped tail. Both arms are THE shared helpers
    // (review: an inlined copy here would silently drift from the
    // explicit-sibling parity the routing spec and the q183/q200
    // oracles assume).
    val cap = resolveCellCap(cellCap, targetCell)
    val cells = derivedCells(corpus.count(), targetCell)
    if (cells > hierAboveCells)
      hierArm(corpus, idCol, vecCol, eps, maxIter, cells, cap)
    else flatArm(corpus, idCol, vecCol, eps, maxIter, cells, cap)
  }

  /** The flat route at a KNOWN cell count: id-low-seed fit, flat
    * struct-max assignment, (optionally capped) blocked tail —
    * shared verbatim by semDedupAuto's below-threshold arm and
    * semDedupFlatAuto. */
  private def flatArm(corpus: DataFrame, idCol: String, vecCol: String,
                      eps: Double, maxIter: Int, cells: Int,
                      cellCap: Int): DataFrame = {
    val asg = assignCellsScored(corpus,
      kmeansFit(corpus, corpus.filter(col(idCol) < cells), idCol, vecCol,
        maxIter), idCol, vecCol)
    if (cellCap > 0) cappedTail(asg, eps, cellCap)
    else semDedupTail(asg, eps)
  }

  /** The two-level route at a KNOWN cell count — shared verbatim by
    * semDedupAuto's above-threshold arm and hierarchicalSemDedupAuto. */
  private def hierArm(corpus: DataFrame, idCol: String, vecCol: String,
                      eps: Double, maxIter: Int, k: Int,
                      cellCap: Int): DataFrame = {
    val (_, fine, asgC) = fitWithBlocks(corpus, idCol, vecCol, k, maxIter)
    val asg = hierarchicalAssignFromBlocks(asgC, fine)
    if (cellCap > 0) cappedTail(asg, eps, cellCap)
    else semDedupTail(asg, eps)
  }

  /** The FLAT reference implementation at any corpus size — the
    * explicit comparison arm (q203) and the path small-k callers
    * keep. The default entry point (`semDedupAuto`) routes away from
    * this above HierRoutingCells derived cells. */
  def semDedupFlatAuto(corpus: DataFrame, idCol: String, vecCol: String,
                       eps: Double, maxIter: Int,
                       targetCell: Long = 64L): DataFrame =
    flatArm(corpus, idCol, vecCol, eps, maxIter,
      derivedCells(corpus.count(), targetCell), cellCap = 0)

  /** TWO-STAGE retrieval: a cheap coarse scorer proposes candidates,
    * the exact float cosine re-ranks them and keeps k — the
    * production ANN serving pattern (cheap recall at the bottom,
    * exact precision at the top; quantization error never decides
    * the final order, only membership in the pool). `candidates` is
    * any (query_id, neighbor_id) proposal set — quantizedTopK,
    * ivfTopK, lshTopK — so stages compose freely. The rerank join
    * broadcasts (candidates x query vectors), bounded by
    * |queries| x poolSize; the corpus never shuffles. */
  def rerankTopK(candidates: DataFrame, queries: DataFrame, corpus: DataFrame,
                 idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", norm2(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .transform(Spread.byKey("neighbor_id"))
      .withColumn("cn", norm2(col("cv")))
    // distinct BEFORE scoring: "stages compose freely" includes a
    // caller pooling proposals from two stages — a (query, neighbor)
    // pair proposed by both would otherwise be scored twice and
    // occupy TWO ranks in the final top-k, displacing the true k-th
    // neighbor (review)
    val probe = candidates.select("query_id", "neighbor_id").distinct()
      .join(q, "query_id")
    val scored = c.join(broadcast(probe), Seq("neighbor_id"))
      .withColumn("score", cosineScore(col("qv"), col("cv"), col("qn"), col("cn")))
    topK(scored, "score", k)
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication"): semantic dedup at
    * CLUSTER-BLOCKED cost. Every vector joins its nearest-centroid
    * cell (assignCells' ranking), candidate pairs generate WITHIN a
    * cell only — O(Σ n_c²) comparisons instead of O(n²), which is
    * the whole reason the paper runs k-means first — and duplicate
    * groups are the connected components of the ≥eps cosine graph.
    * The keep rule is the paper's: within each group keep the member
    * with the LOWEST similarity to its own centroid (the most
    * atypical copy preserves the most diversity), ties to the
    * smallest id.
    *
    * Returns one row per input id: (id, cell, centroid_sim,
    * sem_cluster, kept) — sem_cluster NULL when the vector has no
    * eps-duplicate (always kept). Cross-cell near-dups are invisible
    * by construction (the paper's documented approximation; better
    * centroids — kmeansFit — tighten it, never the join shape).
    *
    * 100 TB: the only all-to-all stages are the cell equi-join
    * (blocked, centroids broadcast) and the CC rounds over the dup
    * graph, which is sparse by the eps threshold; the keeper argmin
    * windows over components, whose size near-dup structure bounds. */
  def semDedup(corpus: DataFrame, centroids: DataFrame,
               idCol: String, vecCol: String, eps: Double): DataFrame = {
    // the assignment feeds three consumers, but NO materialization:
    // unlike the shingle table (where column pruning rewrites each
    // consumer's subtree differently and kills ReuseExchange), every
    // consumer here needs the same (id, v, n2, cell, cs) projection,
    // so ReuseExchange already shares the ranked-cells window —
    // A/B-measured at sf0.1: 2.41 s both ways (TimeQuery, min-of-3)
    semDedupTail(assignCellsScored(corpus, centroids, idCol, vecCol), eps)
  }

  /** semDedup with a HARD per-block population cap — the skew valve.
    * Cluster blocking bounds within-cell pair cost only if no cell is
    * huge; real corpora concentrate (one dominant language/domain can
    * put a large fraction of vectors in one cell), and a cell of m
    * vectors costs m²/2 comparisons no matter how the rest of the
    * corpus is shaped. Here any cell whose population exceeds
    * `cellCap` is SALTED into ceil(pop/cellCap) deterministic
    * sub-cells (md5 of the id — the cross-engine hash primitive — mod
    * the sub-cell count), and pairs generate within (cell, sub) only:
    * worst-case per-block work is ~cellCap² regardless of data skew,
    * the same bound salting gives a skewed shuffle join.
    *
    * Approximation, stated plainly: eps-pairs straddling two
    * sub-cells of one giant cell are invisible (each survivor is
    * still deduped against ~cellCap of its cell-mates); cells at or
    * under the cap are NOT salted (nsub = 1), so the un-skewed
    * corpus is byte-identical to semDedup's output. The per-cell
    * count observation is one aggregation over k cells, broadcast
    * back. */
  def semDedupCapped(corpus: DataFrame, centroids: DataFrame,
                     idCol: String, vecCol: String, eps: Double,
                     cellCap: Int): DataFrame =
    cappedTail(assignCellsScored(corpus, centroids, idCol, vecCol),
      eps, cellCap)

  /** The skew valve applied to ANY (id, v, n2, cell, cs) assignment —
    * flat or hierarchical (the salting never looks at how `cell` was
    * chosen): count cells, salt over-cap cells into deterministic
    * sub-cells, run the blocked tail on (cell, sub). Factored out so
    * the ROUTED default path keeps the valve (review preemption: the
    * hierarchy fixed the assignment cliff, but a skewed corpus
    * concentrates one fine cell just the same). */
  private def cappedTail(asg: DataFrame, eps: Double,
                         cellCap: Int): DataFrame = {
    require(cellCap >= 1, "semDedupCapped: cellCap must be >= 1")
    val counts = asg.groupBy("cell").agg(count(lit(1)).as("cnt"))
    val salted = asg.join(broadcast(counts), Seq("cell"))
      .withColumn("nsub", expr(s"(cnt + ${cellCap - 1}) div $cellCap"))
      .withColumn("sub", pmod(
        graft.functions.Text.md5Long(col("id").cast("string"), 12),
        col("nsub")))
    semDedupTail(salted, eps, blockCols = Seq("cell", "sub"))
  }

  /** The cell-blocked dedup tail shared by semDedup (flat assignment)
    * and hierarchicalSemDedupAuto (two-level assignment): within-cell
    * >= eps pairs, connected components, the lowest-centroid-sim keep
    * rule. `asg` is (id, v, n2, cell, cs). */
  private def semDedupTail(asg: DataFrame, eps: Double,
                           blockCols: Seq[String] = Seq("cell")): DataFrame = {
    val pairs = asg.select((Seq(col("id").as("id_a"), col("v").as("va"),
        col("n2").as("na")) ++ blockCols.map(col)): _*)
      .join(asg.select((Seq(col("id").as("id_b"), col("v").as("vb"),
        col("n2").as("nb")) ++ blockCols.map(col)): _*), blockCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosineScore(col("va"), col("vb"), col("na"), col("nb")))
      // NaN guard as in cosinePairs; NULL (zero-norm) fails >= on its own
      .filter(!isnan(col("cos_sim")) && col("cos_sim") >= eps)
      .select("id_a", "id_b")
    val member = asg.select(col("id"), col("cell"), col("cs"))
      .join(Dedup.connectedComponents(pairs), Seq("id"), "left")
    // keeper per component: explicit (cs ASC NULLS LAST, id ASC)
    // row_number — NOT min(struct): Spark sorts a NULL struct field
    // first while the DuckDB oracle's ASC default is NULLS LAST, so
    // a zero-norm member would silently become the keeper in one
    // engine only. Window partitions are single components (bounded
    // by dup-cluster size, never corpus size).
    val w = Window.partitionBy("cluster")
      .orderBy(col("cs").asc_nulls_last, col("id").asc)
    val keeper = member.filter(col("cluster").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("id").as("keep_id"))
    member.join(keeper, Seq("cluster"), "left")
      .select(col("id"), col("cell"), col("cs").as("centroid_sim"),
        col("cluster").as("sem_cluster"),
        (col("cluster").isNull || col("id") === col("keep_id")).as("kept"))
  }

  /** SemDeDup under the TWO-LEVEL quantizer: derive k from the
    * observed corpus count (the semDedupAuto contract), fit the
    * hierarchical quantizer, assign each vector coarse -> fine (two
    * broadcast equi-join hops, ~2 n sqrt(k) comparisons instead of
    * n k), then run the same cell-blocked dedup tail. Cells are the
    * FINE centroids, so within-cell pair cost matches semDedupAuto's;
    * only the assignment/fit cost changes shape. The fine argmax uses
    * rankedCells' exact rule (round-6 score DESC, cid ASC, no NaN
    * filter) restricted to the vector's own coarse block — the
    * hierarchy's documented approximation (a vector near a coarse
    * border may land in a different fine cell than the flat argmin
    * would pick; q201 measures the agreement rate). */
  def hierarchicalSemDedupAuto(corpus: DataFrame, idCol: String,
                               vecCol: String, eps: Double, maxIter: Int,
                               targetCell: Long = 64L,
                               cellCap: Int = DerivedCellCap): DataFrame =
    hierArm(corpus, idCol, vecCol, eps, maxIter,
      derivedCells(corpus.count(), targetCell),
      resolveCellCap(cellCap, targetCell))

  /** Two-hop assignment under a fitted hierarchical quantizer: route
    * each vector to its `nprobeCoarse` closest coarse blocks
    * (broadcast, n x c), then argmax over ONLY those blocks' fine
    * centroids (broadcast equi-join, n x nprobe x k/c) —
    * rankedCells' exact rule (round-6 score DESC, cid ASC, no NaN
    * filter) at both hops. nprobeCoarse is the routing-recall knob:
    * 1 is the cheapest route; 2 re-examines the runner-up block,
    * buying back vectors near a coarse border for 2x the (still
    * ~sqrt(k)-bounded) probe cost — q201 measures the agreement gain.
    * Candidates stay unique across probes (each fine centroid lives
    * in exactly one block). Returns (id, v, n2, cell, cs) with cell
    * the fine centroid id. */
  def hierarchicalAssign(corpus: DataFrame, coarse: DataFrame,
                         fine: DataFrame, idCol: String, vecCol: String,
                         nprobeCoarse: Int = 1): DataFrame = {
    require(nprobeCoarse >= 1, "hierarchicalAssign: nprobeCoarse must be >= 1")
    hierarchicalAssignFromBlocks(
      rankedCells(corpus, coarse, idCol, vecCol, spread = true)
        .filter(col("rnk") <= nprobeCoarse)
        .select(col("id"), col("v"), col("n2"), col("cid").as("blk")),
      fine)
  }

  /** The fine-argmax hop over a PRECOMPUTED (id, v, n2, blk) coarse
    * routing — multiple blk rows per id (a widened probe) are fine,
    * the per-id window picks the best across all probed blocks. */
  def hierarchicalAssignFromBlocks(blocks: DataFrame,
                                   fine: DataFrame): DataFrame =
    // struct-max aggregate, not a window (the argmaxCells shuffle
    // argument): the per-id best across all probed blocks' fine
    // candidates, same (cs DESC, cid ASC) rule
    argmaxCells(
      blocks.join(broadcast(fine.withColumn("cn2", norm2(col("cv")))),
          Seq("blk"))
        .withColumn("cs",
          cosineScore(col("v"), col("cv"), col("n2"), col("cn2"))))
}
