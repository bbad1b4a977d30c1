package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** PRODUCT QUANTIZATION (Jégou, Douze, Schmid: "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) — the missing member of
  * the ANN family next to IVF, int8, sign-LSH, and JL: split each
  * d-dim vector into `m` contiguous subvectors, k-means each subspace
  * independently (codebook of `ksub` codewords per subspace), and
  * store each vector as its m codeword ids — m BYTES per vector at
  * ksub <= 256 where the raw vector is 4d bytes (32x at d=64, m=8).
  * Queries score candidates by ASYMMETRIC DISTANCE COMPUTATION (ADC):
  * the query precomputes its m x ksub table of partial terms once,
  * and every candidate's approximate distance is m table lookups —
  * the memory-bound serving shape at billion-vector scale.
  *
  * EXACT-INTEGER discipline (this engine's transcendental-free rule,
  * applied end to end): inputs quantize per element to fixed-point
  * micro-units e(x) = floor(x * 1e6 + 0.5) as BIGINT, and EVERYTHING
  * downstream — subvector dots, L2 distances, Lloyd means
  * (half-away-from-zero rounded division), encode argmins, ADC sums,
  * rankings — is exact 64-bit integer arithmetic: no doubles, no
  * summation-order hazard, bitwise-identical in any engine (the
  * DuckDB oracle replays fit, encode, and probe verbatim). Overflow
  * headroom: |e| <= 1e6 (components in [-1, 1], the kmeansFit
  * calibration), so a dsub-dim squared distance <= dsub * 4e12 —
  * safe to dsub ~ 1e6, far past any real configuration.
  *
  * Scale shape: the fit is the kmeansFit driver-loop discipline (one
  * Spark job per Lloyd round; the collected state is m * ksub * dsub
  * longs — bounded by contract, ~8 KB here); encode is one broadcast
  * join pass over the corpus (codebooks are broadcast-sized by
  * construction); the ADC probe broadcasts the query tables and the
  * encoded corpus is NEVER shuffled — per-probe cost is one
  * columnar scan of the m-byte codes, the point of PQ. */
object ProductQuantizer {

  /** Per-element fixed-point micro-units: floor(x * 1e6 + 0.5) —
    * identical to DuckDB's floor(x::DOUBLE * 1000000 + 0.5). */
  def microUnits(v: Column): Column =
    transform(v, x => floor(x.cast("double") * lit(1000000d) + lit(0.5)).cast("long"))

  /** Exact integer dot of two BIGINT arrays (order-free: integer
    * addition is associative-exact) — the codegen'd LongDotProduct
    * expression (the interpreted HOF chain measured ~5x the whole
    * fit's runtime at 8M candidate pairs; this is the hot inner loop
    * of every stage). */
  def dotL(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftBridge.column(
      org.apache.spark.sql.graft.LongDotProduct(
        org.apache.spark.sql.graft.GraftBridge.expression(a),
        org.apache.spark.sql.graft.GraftBridge.expression(b)))

  /** The exploded subvector frame: (vid, blk, sq) with sq the blk-th
    * dsub-wide micro-unit slice. dim must divide evenly by m —
    * uneven splits would silently score shorter tails. */
  private def subvectors(corpus: DataFrame, idCol: String, vecCol: String,
                         m: Int, dsub: Int): DataFrame =
    subvectorsE(corpus.select(col(idCol).cast("long").as("vid"),
      microUnits(col(vecCol)).as("e")), "vid", "e", m, dsub)

  /** The subvector frame over an ALREADY micro-unit (array<bigint>)
    * column — the residual stack's entry point: residuals are exact
    * integer differences of micro vectors, and re-quantizing them
    * would be both lossy and wrong. */
  private def subvectorsE(micro: DataFrame, idCol: String, eCol: String,
                          m: Int, dsub: Int): DataFrame =
    micro.select(col(idCol).cast("long").as("vid"), col(eCol).as("e"))
      .select(col("vid"), explode(sequence(lit(0), lit(m - 1))).as("blk"),
        col("e"))
      .select(col("vid"), col("blk").cast("long").as("blk"),
        slice(col("e"), col("blk").cast("int") * dsub + 1, lit(dsub)).as("sq"))

  /** The ARGMIN-sufficient distance term against a codeword with a
    * precomputed squared norm: |c|^2 - 2 x.c. The row's own |x|^2 is
    * constant within its (vid, blk) ranking partition, so dropping it
    * changes no argmin and no tie (ties on the full distance are ties
    * on this term) — and the hot path pays ONE dot per candidate
    * instead of three. The DuckDB oracle ranks by the full distance;
    * the assignments are identical by the constant-shift argument. */
  private def distTerm(sq: Column, cn2: Column, cq: Column): Column =
    cn2 - lit(2L) * dotL(sq, cq)

  /** Fit the m per-subspace codebooks: Lloyd in exact integers,
    * seeded per subspace with the subvectors of the `ksub` id-lowest
    * vectors (the id-low seed rule — deterministic, oracle-
    * replayable), assignment by (sqdist ASC, cid ASC), centroid
    * update by per-dim half-away-from-zero rounded integer mean,
    * empty codewords carrying forward, early stop at the fixpoint
    * (idempotent, so a fixed-round unrolled oracle certifies a
    * convergence-stopped fit — the kmeansFit argument verbatim).
    * Returns (blk, cid, cq array<bigint>, cn2 = |cq|^2) — m * ksub
    * rows, broadcast-sized by contract (cn2 rides along so the
    * encode/probe joins pay one dot per candidate). One Spark job per
    * round. */
  def pqFit(corpus: DataFrame, idCol: String, vecCol: String,
            m: Int, ksub: Int, maxIter: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"pqFit: m=$m must divide dim=$dim evenly")
    fitCore(subvectors(corpus, idCol, vecCol, m, dim / m), m, ksub, maxIter)
  }

  /** pqFit over an already micro-unit (array<bigint>) vector column —
    * the residual stack's fit (see ivfadcTopK). Same Lloyd rules,
    * same id-low seed contract. */
  def pqFitE(micro: DataFrame, idCol: String, eCol: String,
             m: Int, ksub: Int, maxIter: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"pqFitE: m=$m must divide dim=$dim evenly")
    fitCore(subvectorsE(micro, idCol, eCol, m, dim / m), m, ksub, maxIter)
  }

  private def fitCore(subFrame: DataFrame, m: Int, ksub: Int,
                      maxIter: Int): DataFrame = {
    require(m >= 1 && ksub >= 2 && maxIter >= 1, "pqFit: bad parameters")
    val spark = subFrame.sparkSession
    val sub = Dedup.DefaultMaterialize(subFrame)
    // dims exploded ONCE outside the loop: the per-round mean then
    // joins the (vid, blk) winners against this narrow frame instead
    // of carrying the subvector ARRAY through the argmin aggregate
    // (array copies in the min(struct(...)) comparator measured ~25%
    // of the round)
    val subd = Dedup.DefaultMaterialize(
      sub.select(col("vid"), col("blk"), posexplode(col("sq"))))
    def toDf(cs: Seq[(Long, Long, Seq[Long])]): DataFrame = {
      import spark.implicits._
      // |c|^2 precomputed driver-side: the assignment join then pays
      // exactly one dot per candidate pair
      cs.map { case (blk, cid, cq) =>
        (blk, cid, cq, cq.map(x => x * x).sum)
      }.toDF("blk", "cid", "cq", "cn2")
    }
    // seeds: one bounded collect (m * ksub rows by contract)
    var cents: Seq[(Long, Long, Seq[Long])] = sub
      .filter(col("vid") < ksub)
      .select(col("blk"), col("vid").as("cid"), col("sq"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSeq
      .sortBy(c => (c._1, c._2))
    // the vid < ksub seed rule presumes contiguous zero-based ids; a
    // corpus with sparse or offset ids would silently seed a smaller
    // (possibly empty) codebook and return empty encodes/probes —
    // fail loudly instead (ADVICE r9)
    require(cents.size == m * ksub,
      s"pqFit: seed rule (vid < ksub) found ${cents.size} seed subvectors, " +
        s"expected m*ksub = ${m * ksub} — ids must be contiguous from 0 " +
        s"(re-key the corpus, e.g. row_number() - 1, before fitting)")
    var round = 0
    var converged = false
    while (round < maxIter && !converged) {
      // assignment argmin rides a struct-min (dist ASC, cid ASC; cid
      // unique within a blk so sq is never compared), then per-dim
      // integer sums — ONE job, collecting m * ksub * dsub longs
      val asg = sub.join(broadcast(toDf(cents)), Seq("blk"))
        .withColumn("dist", distTerm(col("sq"), col("cn2"), col("cq")))
        .groupBy(col("vid"), col("blk"))
        .agg(min(struct(col("dist"), col("cid"))).as("best"))
        .select(col("vid"), col("blk"), col("best.cid").as("cid"))
        .join(subd, Seq("vid", "blk"))
        .groupBy(col("blk"), col("cid"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .collect()
      val computed = asg.groupBy(r => (r.getLong(0), r.getLong(1)))
        .map { case (key, rows) =>
          key -> rows.sortBy(_.getInt(2)).map { r =>
            val s = r.getLong(3); val n = r.getLong(4)
            // half-away-from-zero rounded integer mean — the repo's
            // exact-mean pattern (both engines truncate BIGINT div
            // on non-negative operands)
            if (s >= 0) (2 * s + n) / (2 * n) else -((2 * -s + n) / (2 * n))
          }.toSeq
        }
      val next = cents.map { case (blk, cid, cq) =>
        (blk, cid, computed.getOrElse((blk, cid), cq))
      }
      converged = next == cents
      cents = next
      round += 1
    }
    toDf(cents)
  }

  /** Encode the corpus: each (vector, subspace) to its nearest
    * codeword — (vid, blk, code). One broadcast-join pass; at rest
    * this is the m-bytes-per-vector representation (the codes table
    * is what a deployment persists; payloads/floats stay cold). */
  def pqEncode(corpus: DataFrame, codebooks: DataFrame, idCol: String,
               vecCol: String, m: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"pqEncode: m=$m must divide dim=$dim evenly")
    encodeCore(subvectors(corpus, idCol, vecCol, m, dim / m), codebooks)
  }

  /** pqEncode over an already micro-unit vector column (the residual
    * stack's encode — see ivfadcTopK). */
  def pqEncodeE(micro: DataFrame, codebooks: DataFrame, idCol: String,
                eCol: String, m: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"pqEncodeE: m=$m must divide dim=$dim evenly")
    encodeCore(subvectorsE(micro, idCol, eCol, m, dim / m), codebooks)
  }

  private def encodeCore(subFrame: DataFrame,
                         codebooks: DataFrame): DataFrame = {
    val cb = withCn2(codebooks)
    subFrame
      .join(broadcast(cb), Seq("blk"))
      .withColumn("dist", distTerm(col("sq"), col("cn2"), col("cq")))
      .groupBy(col("vid"), col("blk"))
      .agg(min(struct(col("dist"), col("cid"))).as("best"))
      .select(col("vid"), col("blk"), col("best.cid").as("code"))
  }

  private def withCn2(codebooks: DataFrame): DataFrame =
    if (codebooks.columns.contains("cn2")) codebooks
    else codebooks.withColumn("cn2", dotL(col("cq"), col("cq")))

  /** ADC top-k: approximate squared L2 of query q to candidate x,
    * SUM over subspaces of (|c|^2 - 2 q_blk . c) with c = x's
    * codeword — |q|^2 is constant per query and dropped from the
    * ranking (rank-invariant). The query-side table (m * ksub
    * partial terms per query) is built once and BROADCAST; the
    * encoded corpus joins on (blk, code) and aggregates m exact
    * integer partials per (query, candidate) — no floats anywhere,
    * ranking ties broken by neighbor id. Self-matches excluded. */
  /** The query-side ADC table: (query_id, blk, code, pterm) with
    * pterm = |c|^2 - 2 q_blk . c — m * ksub exact partial terms per
    * query, broadcast-sized by construction. Shared by the flat probe
    * and the IVF-routed probe (one scoring rule, two pruning
    * strategies). */
  private def adcTable(queries: DataFrame, codebooks: DataFrame,
                       idCol: String, vecCol: String, m: Int,
                       dim: Int): DataFrame = {
    val cb = withCn2(codebooks)
    subvectors(queries, idCol, vecCol, m, dim / m)
      .select(col("vid").as("query_id"), col("blk"), col("sq"))
      .join(broadcast(cb), Seq("blk"))
      .select(col("query_id"), col("blk"), col("cid").as("code"),
        distTerm(col("sq"), col("cn2"), col("cq")).as("pterm"))
  }

  /** The shared ranking tail: sum the m partials per (query,
    * candidate), rank (adist ASC, id ASC), keep k. */
  private def rankAdc(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("vid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vid").as("neighbor_id"),
        col("adist"))
  }

  def pqTopK(queries: DataFrame, encoded: DataFrame, codebooks: DataFrame,
             idCol: String, vecCol: String, k: Int, m: Int,
             dim: Int): DataFrame = {
    require(dim % m == 0, s"pqTopK: m=$m must divide dim=$dim evenly")
    val qtab = adcTable(queries, codebooks, idCol, vecCol, m, dim)
    rankAdc(encoded
      .join(broadcast(qtab), Seq("blk", "code"))
      .filter(col("query_id") =!= col("vid"))
      .groupBy(col("query_id"), col("vid"))
      // a candidate missing a (blk, code) row is impossible by
      // construction (encode emits all m blocks), so the sum is
      // always over exactly m partials
      .agg(sum(col("pterm")).as("adist")), k)
  }

  /** IVF-PQ: the two pruning axes COMPOSED — the billion-scale
    * serving stack (IVF directory pruning x PQ memory compression,
    * the Jégou et al. IVFADC shape without residual encoding; cells
    * and codes here quantize the same raw vectors, so the stack is
    * exactly "ivfTopK whose candidate scan reads m-byte codes").
    * `cellAssign` is the corpus's (vid, cell) IVF assignment
    * (Similarity.assignCells over the same centroid set the queries
    * route with — the registry fp-pinning discipline applies to a
    * persisted deployment); queries route to their `nprobe` best
    * cells by the rankedCells rule, and ADC scoring runs ONLY inside
    * routed cells against a broadcast query table of
    * |Q| x nprobe x m x ksub partials.
    *
    * PLAN SHAPE, honestly (ADVICE r9): attaching cells to codes —
    * `encoded JOIN cellAssign ON vid` — is an equi-join of two
    * corpus-sized frames and SHUFFLES both unless cellAssign is
    * broadcastable. That join belongs at BUILD time, once: a
    * persisted deployment stores codes cell-keyed (cellKeyedCodes ->
    * write, the PQRegistry layout) and every probe is then the
    * shuffle-free ivfPqTopKFromCellCodes core — one columnar scan of
    * the m-byte codes touching nprobe/|cells| of the rows. This
    * convenience overload pays the build join inline (fine for a
    * one-shot probe over a fresh encode; wrong shape for serving). */
  def ivfPqTopK(queries: DataFrame, encoded: DataFrame,
                cellAssign: DataFrame, codebooks: DataFrame,
                centroids: DataFrame, idCol: String, vecCol: String,
                k: Int, nprobe: Int, m: Int, dim: Int): DataFrame =
    ivfPqTopKFromCellCodes(queries, cellKeyedCodes(encoded, cellAssign),
      codebooks, centroids, idCol, vecCol, k, nprobe, m, dim)

  /** The one-time BUILD join: (vid, cell, blk, code) — the at-rest
    * layout a deployment persists (cell-keyed, so probes prune by
    * cell without ever re-joining the assignment). Corpus-sized x
    * corpus-sized on vid: this shuffles, by design, ONCE at build. */
  def cellKeyedCodes(encoded: DataFrame, cellAssign: DataFrame): DataFrame =
    encoded.join(cellAssign.select(col("vid"), col("cell")), Seq("vid"))
      .select(col("vid"), col("cell"), col("blk"), col("code"))

  /** The serving-path probe core: `cellCodes` is the pre-joined
    * (vid, cell, blk, code) frame (cellKeyedCodes, or a PQRegistry
    * scan). No corpus-side shuffle anywhere: the query table (already
    * |Q| x nprobe x m x ksub, broadcast-sized) joins on
    * (cell, blk, code) and the per-candidate sum groups on vid within
    * scan partitions. */
  def ivfPqTopKFromCellCodes(queries: DataFrame, cellCodes: DataFrame,
                             codebooks: DataFrame, centroids: DataFrame,
                             idCol: String, vecCol: String, k: Int,
                             nprobe: Int, m: Int, dim: Int): DataFrame = {
    require(nprobe >= 1, "ivfPqTopK: nprobe must be >= 1")
    // query -> routed cells, the rankedCells (cs DESC, cid ASC) rule
    // (routeQuantizedQueries' routing half; its int8 signature is
    // unused here — the ADC table below carries the query side)
    ivfPqTopKFromRouted(
      Similarity.routeQuantizedQueries(queries, centroids, idCol, vecCol,
        nprobe).select(col("query_id"), col("cell")),
      queries, cellCodes, codebooks, idCol, vecCol, k, m, dim)
  }

  /** The probe core below the routing: `qcells` is the (query_id,
    * cell) routed assignment, however the caller pinned it (a plan,
    * or the one-job collected local relation a serving layer uses so
    * the cell list can ALSO prune the codes scan — PQRegistry's
    * shape). */
  def ivfPqTopKFromRouted(qcells: DataFrame, queries: DataFrame,
                          cellCodes: DataFrame, codebooks: DataFrame,
                          idCol: String, vecCol: String, k: Int,
                          m: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"ivfPqTopK: m=$m must divide dim=$dim evenly")
    val qtab = adcTable(queries, codebooks, idCol, vecCol, m, dim)
      .join(qcells, Seq("query_id"))
    rankAdc(cellCodes
      .join(broadcast(qtab), Seq("cell", "blk", "code"))
      .filter(col("query_id") =!= col("vid"))
      .groupBy(col("query_id"), col("vid"))
      .agg(sum(col("pterm")).as("adist")), k)
  }

  /** Exact integer residuals: each corpus vector's micro-unit vector
    * minus its HOME cell centroid's micro-unit vector — (vid, cell,
    * r array<bigint>). `cellAssign` is (vid, cell) with cell = the
    * centroid's id (assignCells' contract); centroids broadcast. The
    * residual stack's build primitive (see ivfadcTopK). */
  def cellResiduals(corpus: DataFrame, centroids: DataFrame,
                    cellAssign: DataFrame, idCol: String,
                    vecCol: String): DataFrame = {
    val eM = corpus.select(col(idCol).cast("long").as("vid"),
      microUnits(col(vecCol)).as("e"))
    val cM = centroids.select(col(idCol).cast("long").as("cell"),
      microUnits(col(vecCol)).as("ce"))
    eM.join(cellAssign.select(col("vid"), col("cell")), Seq("vid"))
      .join(broadcast(cM), Seq("cell"))
      .select(col("vid"), col("cell"),
        zip_with(col("e"), col("ce"), (x, c) => x - c).as("r"))
  }

  /** RESIDUAL IVF-PQ — the full IVFADC of Jégou et al. (TPAMI 2011
    * §III-C, the shape q215 composes WITHOUT residual encoding):
    * codes quantize the RESIDUAL x - c(x) of each vector against its
    * home centroid instead of x itself. Residuals concentrate around
    * zero (the coarse quantizer has already absorbed the between-cell
    * variance), so the same m x ksub code budget spends its codewords
    * on a tighter distribution — recall at equal memory improves,
    * which is the paper's reason IVFADC beats IVF x flat-PQ. Exact
    * integers end to end: residuals are BIGINT differences of
    * micro-unit vectors, the Lloyd fit/encode are pqFitE/pqEncodeE
    * over them, and the oracle replays everything.
    *
    * Probe: a query routed to a cell scores against that cell's codes
    * using ITS OWN residual qr = e(q) - e(c_cell) — so the query-side
    * table is per (query, cell): |Q| x nprobe x m x ksub partials,
    * still broadcast-sized. One scoring subtlety the flat probes
    * don't have: the per-block term must be the FULL
    * |qr_blk|^2 - 2 qr.cw + |cw|^2 — dropping the query norm (the
    * flat rank-invariance trick) is NOT safe here because |qr|^2
    * differs per routed cell for one query, and candidates from
    * different cells compete in one ranking. `cellCodes` is the
    * residual-encoded (vid, cell, blk, code) frame
    * (cellKeyedCodes over pqEncodeE(cellResiduals(...))). */
  def ivfadcTopK(queries: DataFrame, cellCodes: DataFrame,
                 codebooks: DataFrame, centroids: DataFrame,
                 idCol: String, vecCol: String, k: Int, nprobe: Int,
                 m: Int, dim: Int): DataFrame = {
    require(nprobe >= 1, "ivfadcTopK: nprobe must be >= 1")
    ivfadcTopKFromRouted(
      Similarity.routeQuantizedQueries(queries, centroids, idCol, vecCol,
        nprobe).select(col("query_id"), col("cell")),
      queries, cellCodes, codebooks, centroids, idCol, vecCol, k, m, dim)
  }

  /** The residual probe core below the routing (the
    * ivfPqTopKFromRouted split applied to IVFADC): `qcells` is the
    * (query_id, cell) routed assignment however the caller pinned it;
    * `centroids` still rides along — the query-side residuals derive
    * from the routed cells' centroid vectors (broadcast-sized). */
  def ivfadcTopKFromRouted(qcells: DataFrame, queries: DataFrame,
                           cellCodes: DataFrame, codebooks: DataFrame,
                           centroids: DataFrame, idCol: String,
                           vecCol: String, k: Int, m: Int,
                           dim: Int): DataFrame = {
    require(dim % m == 0, s"ivfadcTopK: m=$m must divide dim=$dim evenly")
    val dsub = dim / m
    val qM = queries.select(col(idCol).cast("long").as("query_id"),
      microUnits(col(vecCol)).as("qe"))
    val cM = centroids.select(col(idCol).cast("long").as("cell"),
      microUnits(col(vecCol)).as("ce"))
    val qr = qcells.join(qM, Seq("query_id")).join(broadcast(cM), Seq("cell"))
      .select(col("query_id"), col("cell"),
        zip_with(col("qe"), col("ce"), (x, c) => x - c).as("qr"))
    val qrsub = qr
      .select(col("query_id"), col("cell"),
        explode(sequence(lit(0), lit(m - 1))).as("blk"), col("qr"))
      .select(col("query_id"), col("cell"),
        col("blk").cast("long").as("blk"),
        slice(col("qr"), col("blk").cast("int") * dsub + 1, lit(dsub)).as("sq"))
    val qtab = qrsub.join(broadcast(withCn2(codebooks)), Seq("blk"))
      .select(col("query_id"), col("cell"), col("blk"),
        col("cid").as("code"),
        (dotL(col("sq"), col("sq")) - lit(2L) * dotL(col("sq"), col("cq")) +
          col("cn2")).as("pterm"))
    rankAdc(cellCodes
      .join(broadcast(qtab), Seq("cell", "blk", "code"))
      .filter(col("query_id") =!= col("vid"))
      .groupBy(col("query_id"), col("vid"))
      .agg(sum(col("pterm")).as("adist")), k)
  }

  /** EXACT integer L2 top-k over the micro-unit vectors — the
    * ground-truth arm PQ recall is measured against (and an exact
    * brute-force L2 search in its own right; ranking and distances
    * are exact BIGINTs, so cross-engine parity is trivial). */
  def bruteL2TopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                  vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      microUnits(col(vecCol)).as("qe"))
    val c = corpus.select(col(idCol).cast("long").as("vid"),
      microUnits(col(vecCol)).as("ce"))
    // |q - c|^2 = |q|^2 - 2 q.c + |c|^2, exact in integers — three
    // codegen'd dots, two of them per-side constants
    val scored = c.withColumn("cn2", dotL(col("ce"), col("ce")))
      .join(broadcast(q.withColumn("qn2", dotL(col("qe"), col("qe")))),
        lit(true))
      .filter(col("query_id") =!= col("vid"))
      .withColumn("dist",
        col("qn2") - lit(2L) * dotL(col("qe"), col("ce")) + col("cn2"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dist").asc, col("vid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vid").as("neighbor_id"),
        col("dist"))
  }
}
