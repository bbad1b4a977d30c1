package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Empirical scale check (VERDICT r4 #5, extended to ~100x by VERDICT
  * r5 #5): measure the dedup stack at 1x vs 10x (vs 100x) corpus size
  * and commit the table (SCALE.md) — the 100 TB stance measured
  * instead of argued.
  *
  * The Nx corpus is sf0.1 documents unioned with N-1 id-offset copies
  * whose every token is prefixed with the copy number: shingle sets
  * are DISJOINT across copies, so Nx the rows means Nx distinct
  * content (the full-pipeline cost must scale ~linearly in input, not
  * in answer size — near-dup answer size is a property of the data,
  * not the engine). Expectations, by construction of the plans:
  *
  *  - q31/q33/q100 (whole-corpus pair finding / clustering /
  *    materialization): ~linear in corpus size — every pairwise stage
  *    is blocked (shingle / band bucket) with hot keys bounded.
  *  - q145 (incremental probe, batch = 10% of corpus): ~linear too —
  *    the BATCH grows with the corpus here.
  *  - NearDupRegistry.dedupAppend of a FIXED 500-doc batch against a
  *    1x vs 10x registry: ~flat — the probe is a broadcast of the
  *    batch bands against the persisted band index; history size only
  *    enters through the (columnar, pruned) index scan.
  *  - embedding-side rows with CORPUS-DERIVED width (the round-6
  *    default): within-block pair cost flat; the r6 residual cliff —
  *    centroid ASSIGNMENT — was removed in r7 (the window's n x k
  *    vector-carrying shuffle became a struct-max aggregate), and
  *    the remaining fit-flop asymmetry is owned by the routed
  *    two-level default (semDedupAuto/writeCellPartitionedAuto).
  *
  * runMain graft.ScaleCheck [sfDir] [mults] [rowFilter] — mults is a
  * comma-separated multiplier list, default "1,10"; pass "1,10,100"
  * for the full three-column table. rowFilter is an optional
  * comma-separated list of row-name substrings (case-insensitive):
  * only matching rows run, so a subset can be re-measured without
  * paying for the whole table. Prints a markdown table plus one
  * machine-readable JSON line (null = capped/failed cell, positions
  * align with "mults").
  */
object ScaleCheck {

  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = (if (args.length > 1) args(1) else "1,10")
      .split(",").map(_.trim.toInt).toSeq.sorted
    require(mults.nonEmpty && mults.head >= 1)
    // optional arg 3: comma-separated substrings — only rows whose
    // name contains one of them run (re-measure a subset without
    // paying for the whole table; empty = all rows)
    val rowFilter = (if (args.length > 2) args(2) else "")
      .split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSeq
    val spark = GraftSession.fromEnv()
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup
    val base = Tables.documents(spark, sf)
    val root = java.nio.file.Files.createTempDirectory("graft_scale").toString

    /** Copy c of the corpus: ids offset, every token prefixed "c<c>"
      * so shingles are disjoint from every other copy. */
    def copy(c: Int): DataFrame =
      if (c == 0) base
      else base
        .withColumn("doc_id", col("doc_id") + lit(c * 10000000L))
        .withColumn("text",
          regexp_replace(col("text"), "([a-z0-9]+)", s"c$c$$1"))

    /** Copy c of the embeddings: ids offset, a hashed per-(copy, dim)
      * sign pattern flips ~half the dims between any two copies.
      * Cross-copy cosine of the same base vector is ~0 only IN
      * EXPECTATION (ADVICE r5): at dim=64 its std is ~1/sqrt(64) =
      * 0.125 (more when component mass is uneven), so over many
      * (base, copy-pair) draws the TAIL can cross a 0.35 near-dup
      * threshold and let answer size drift with copy count. The drift
      * is therefore MEASURED at synth time (embDrift below) and
      * printed next to the timing rows rather than assumed zero —
      * ratios stay meaningful as long as the above-threshold count is
      * small against the 1x answer. Copy 0 is the original. */
    val embBase = Tables.embeddings(spark, sf)
    // splitmix64 finalizer: the r6 run measured the previous LINEAR
    // hash ((c*A + d*B) >>> 13) producing IDENTICAL sign patterns for
    // ~600 of the 4950 copy pairs at 100x (bit 13 of a linear form is
    // periodic in c) — max cross-copy cosine exactly 1.0. Avalanche
    // mixing makes patterns iid across copies; full-pattern collision
    // probability drops to 2^-64.
    def signPattern(c: Int): IndexedSeq[Float] = (0 until 64).map { d =>
      var z = c.toLong * 64L + d + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      if (c != 0 && (z & 1L) == 1L) -1.0f else 1.0f
    }
    def copyEmb(c: Int): DataFrame = {
      val flipCol = array(signPattern(c).map(lit): _*)
      if (c == 0) embBase
      else embBase
        .withColumn("vec_id", col("vec_id") + lit(c * 10000000L))
        .withColumn("embedding",
          zip_with(col("embedding"), flipCol, (x, s) => (x * s).cast("float")))
    }

    /** EXACT cross-copy contamination count (ADVICE r5): cosine
      * between copies a,b of the same base vector v is
      * sum_d(vhat_d^2 * s_a(d) * s_b(d)) with vhat the normalized
      * base — so it is computable from the base corpus and the
      * mult*(mult-1)/2 product sign patterns alone, one bounded
      * (pairs x n_base) cross join, no synthesized corpus self-join.
      * Returns (count of same-base cross-copy pairs with cosine >=
      * threshold, max such cosine). */
    def embDrift(mult: Int, threshold: Double): (Long, Double) = {
      if (mult < 2) return (0L, 0.0)
      import spark.implicits._
      val pats = for {
        a <- 0 until mult; b <- (a + 1) until mult
      } yield {
        val sa = signPattern(a); val sb = signPattern(b)
        (0 until 64).map(d => sa(d) * sb(d))
      }
      val patDf = pats.map(p => Tuple1(p)).toDF("pattern")
      val w = embBase.select(
        transform(col("embedding"), x => (x * x).cast("double")).as("sq"))
        .select(aggregate(col("sq"), lit(0.0d), (acc, x) => acc + x).as("ss"),
          col("sq"))
        // zero-norm guard: ss = 0 would make every weight NaN, and
        // Spark's total order counts NaN >= threshold as TRUE — a
        // zero vector would inflate the drift count by every copy
        // pair it appears in (latent today; the rest of the codebase
        // guards this case explicitly)
        .filter(col("ss") > 0)
        .select(transform(col("sq"), x => x / col("ss")).as("w"))
      val cos = w.join(broadcast(patDf), lit(true))
        .select(aggregate(zip_with(col("w"), col("pattern"),
          (wi, si) => wi * si), lit(0.0d), (acc, x) => acc + x).as("cos"))
      val r = cos.agg(
        sum(when(col("cos") >= threshold, 1L).otherwise(0L)).as("n"),
        max(col("cos")).as("mx")).head()
      (r.getLong(0), r.getDouble(1))
    }

    def synth(mult: Int): String = {
      val dir = s"$root/x$mult"
      (0 until mult).map(copy).reduce(_ unionAll _)
        .coalesce(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      (0 until mult).map(copyEmb).reduce(_ unionAll _)
        .coalesce(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    /** min-of-two, the Bench noise-floor discipline. */
    def time2(f: => Unit): Double = math.min(time(f), time(f))

    val dirs = mults.map(m => m -> synth(m)).toMap
    // JSON cells keep POSITION: a failed/capped middle cell emits
    // `null`, never silently shifting later timings against the
    // "mults" list (found by review — flatten misattributed a 100x
    // timing as the 10x one whenever a middle cell was missing)
    val json = scala.collection.mutable.LinkedHashMap[String, Seq[Option[Double]]]()
    def fmtRow(name: String, jsonKey: String, times: Seq[Option[Double]]): Unit = {
      val cells = times.map(_.map(t => f"$t%.2f").getOrElse("—"))
      // ratio between the FIRST and LAST defined cells, labeled with
      // the mult it reaches (a capped row still reports its 10x ratio)
      val defined = mults.zip(times).collect { case (m, Some(t)) => (m, t) }
      val ratio =
        if (defined.size >= 2 && defined.head._2 > 0)
          f"${defined.last._2 / defined.head._2}%.1fx@${defined.last._1}x"
        else "—"
      println(s"| $name | ${cells.mkString(" | ")} | $ratio |")
      json(jsonKey) = times
    }
    /** Does the row filter select a row with this name? (The NAME
      * must contain a filter token — one direction only; review
      * caught the registry blocks testing the inverse.) */
    def wantRow(name: String): Boolean =
      rowFilter.isEmpty || rowFilter.exists(name.toLowerCase.contains)
    /** Measure `f(mult)` at each requested mult <= cap; a failed cell
      * prints as err without killing the run. */
    def row(name: String, cap: Int = Int.MaxValue)(f: Int => Unit): Unit = {
      if (!wantRow(name)) return
      fmtRow(name, name.takeWhile(_ != ' ').toLowerCase, mults.map { m =>
        if (m > cap) None
        else try Some(time2(f(m))) catch {
          case e: Exception =>
            System.err.println(s"[scalecheck] $name x$m: ${e.getMessage}")
            None
        }
      })
    }

    println(s"| component | ${mults.map(m => s"${m}x (s)").mkString(" | ")} | ratio |")
    println(s"|---|${mults.map(_ => "---").mkString("|")}|---|")

    // the dedup funnel stack (VERDICT r5 #5 set at every mult; the
    // two longer-tail pair miners and the fixed-width penalty rows
    // stay capped at 10x — the penalty is established, re-measuring
    // it quadratically at 100x buys nothing)
    def q(name: String)(mult: Int): Unit =
      SparkEntry.queries(name)(spark, dirs(mult)).count(): Unit
    row("q31_jaccard_pairs")(q("q31_jaccard_pairs"))
    row("q33_minhash_lsh_pairs")(q("q33_minhash_lsh_pairs"))
    row("q100_dedup_materialize")(q("q100_dedup_materialize"))
    row("q145_incremental_lsh", cap = 10)(q("q145_incremental_lsh"))
    row("q169_prefix_filter_pairs")(q("q169_prefix_filter_pairs"))
    row("q172_winnowing_pairs", cap = 10)(q("q172_winnowing_pairs"))
    row("q184_oph_minhash")(q("q184_oph_minhash"))
    // the whole lexical funnel end-to-end (exact -> near-dup ->
    // substring spans): the single number for "would the full
    // pipeline run at 100x", not just its stages
    row("q195_dedup_funnel")(q("q195_dedup_funnel"))
    // the MEDIA near-dup funnel end-to-end (VERDICT r7 #5): payloads
    // are the synthesized documents' bytes (the q210 adapter), so
    // the kernel features ride the same Nx corpus; the banded
    // candidate stage is bounded by the maxBandDf hot-key guard, so
    // the row must stay in the lexical band
    row("q210_media_neardup")(q("q210_media_neardup"))
    // PRODUCT QUANTIZATION end-to-end (round 9): per-subspace integer
    // Lloyd fit + full-corpus encode + ADC probe, all over the Nx
    // embeddings. Every stage is linear in the corpus by construction
    // (fit candidates n*ksub per round, encode n*ksub, probe scans
    // the n*m code rows against a broadcast query table) — the row
    // verifies no hidden super-linear stage snuck in.
    row("q213_pq_ann")(q("q213_pq_ann"))
    // ... and the clustered-fixture recall re-row (round 14): the
    // same chain over cembSql-shaped embeddings derived per copy —
    // still corpus-linear; the row certifies the q247 measurement
    // itself scales, not just the isotropic chain
    row("q247_pq_clustered_recall")(q("q247_pq_clustered_recall"))
    // the RESIDUAL stack end-to-end (round 10): adds the assignment
    // and residual joins to q213's chain — still corpus-linear by
    // construction (residuals are one broadcast-centroid join pass;
    // the per-(query, cell) ADC table stays |Q| x nprobe x m x ksub)
    row("q218_ivfadc_ann")(q("q218_ivfadc_ann"))
    // NN-Descent K-NN graph build (round 11): per-round work is
    // O(n*K^2) candidate scorings regardless of skew (seed buckets
    // Poisson-bounded, reverse edges K-capped, the pivot self-join
    // <= C(2K,2) pairs per node) — the row verifies corpus-linear
    // build cost end to end
    row("q222_knn_graph")(q("q222_knn_graph"))
    // Late-interaction MaxSim (round 11): queries stay the fixed 8
    // docs while the corpus token table grows Nx — brute is the
    // linear-scan baseline (one pass, partial-agg max/sum); the
    // two-stage's pooled first pass is also Nx-linear but over a
    // DocCap-times-smaller table, and its exact-MaxSim stage-2 is
    // constant (PoolC x query tokens x DocCap) regardless of N
    row("q230_maxsim_topk")(q("q230_maxsim_topk"))
    row("q231_maxsim_pruned")(q("q231_maxsim_pruned"))
    // genuinely FIXED-width penalty rows: direct operator calls with
    // the width pinned (the catalog q35/q183 queries moved to
    // corpus-derived width in round 6, so invoking them here would
    // re-measure the derived path under a "FIXED" label — found by
    // review; these call cosinePairs(bits=4) / semDedup(12 fitted
    // cells) explicitly so the fixed-vs-derived comparison is real)
    row("cosinePairs FIXED bits=4 (16 buckets)", cap = 10) { m =>
      operators.Similarity.cosinePairs(Tables.embeddings(spark, dirs(m)),
        "vec_id", "embedding", dim = 64, threshold = 0.35, bits = 4)
        .count(): Unit
    }
    row("semDedup FIXED 12 cells", cap = 10) { m =>
      val emb = Tables.embeddings(spark, dirs(m))
      operators.Similarity.semDedup(emb,
        operators.Similarity.kmeansFit(emb, emb.filter(col("vec_id") < 12),
          "vec_id", "embedding", maxIter = 2),
        "vec_id", "embedding", eps = 0.05).count(): Unit
    }

    // corpus-DERIVED width (the round-6 default path): bits/cells
    // from an observed count, so within-block pair cost stays flat.
    // PAIR rows are capped at 10x: the r6 100x run measured 3.2M
    // contaminated same-base cross-copy pairs >= 0.35 (sphere
    // packing: at dim=64 a random pair has P(cos >= 0.35) =
    // Phi(-2.8) ~ 0.3%, so ANY 500k-vector synthetic corpus holds
    // ~10^8 above-threshold pairs — answer size goes quadratic as a
    // property of the GEOMETRY, not the engine). The 100x columns
    // therefore measure the pair-free stages below (assignment +
    // fit), where engine cost is the thing being tested.
    row("cosinePairsAuto (derived bits)", cap = 10) { m =>
      operators.Similarity.cosinePairsAuto(
        Tables.embeddings(spark, dirs(m)), "vec_id", "embedding",
        dim = 64, threshold = 0.35).count(): Unit
    }
    // the DEFAULT call, uncapped (VERDICT r6 #1): semDedupAuto now
    // ROUTES — flat fit+assignment below 256 derived cells (1x: 8
    // cells; 10x: 79), the two-level coarse->fine path above (100x:
    // 782 cells) — so this row's 100x cell measures what a caller of
    // the default gets where the flat path measured 589.8 s (r6).
    // Expected ~the semDedupHier row's 100x (same routed plan); the
    // pair-stage contamination caveat above applies to its answer
    // size, not the engine cost under test.
    row("semDedupAuto (derived cells, routed, maxIter=2)") { m =>
      operators.Similarity.semDedupAuto(
        Tables.embeddings(spark, dirs(m)), "vec_id", "embedding",
        eps = 0.05, maxIter = 2).count(): Unit
    }
    // the routed default with a TIGHT explicit valve (q209's
    // configuration, cellCap=64 ~ targetCell — 16x tighter than the
    // r8 armed default): on this near-uniform synthetic corpus even
    // this cap barely binds, so the honest claim this row carries is
    // "arming the valve costs ~nothing when the data is not skewed" —
    // the worst-case ~cap^2 bound under real skew is MEASURED on the
    // skewed rows below.
    // one-word name prefix differs from the uncapped row's: row()'s
    // json key is the first word, and identical keys silently
    // overwrite each other in the machine-readable line
    row("semDedupAutoCapped (routed + skew valve, cellCap=64)") { m =>
      operators.Similarity.semDedupAuto(
        Tables.embeddings(spark, dirs(m)), "vec_id", "embedding",
        eps = 0.05, maxIter = 2, cellCap = 64).count(): Unit
    }
    // DELIBERATELY SKEWED corpus (VERDICT r7 #2's done-criterion):
    // ~30% of vectors (within-copy ids >= 1400, every copy — the
    // overwrite ignores the copy sign flips, so the hot mass is ONE
    // mode across the whole Nx corpus) are replaced by a SINGLE
    // identical vector — the boilerplate-duplicate mode every real
    // corpus carries. Hot ids sit above the id-low seed ranges, so
    // no initial seed is hot (the realistic failure: a mode
    // unrepresented in the seed sample); Lloyd drags one centroid
    // onto the mode and, because identical points score identically
    // against every centroid (ties break cid ASC), the fit CANNOT
    // split it even when the coarse drag purifies a block and hands
    // the fine fit hot seeds — measured: one cell holds all ~30% at
    // 10x under the routed default. (A hot mode with per-row noise
    // DOES get split by the fine fit — measured ~6 cells — which is
    // the hierarchy mitigating mild skew by itself; the valve exists
    // for the mode the fit cannot separate.) At eps=0.95 the
    // identical rows are all mutual dups, so the uncapped hot cell
    // pays ~pop^2/2 pair rows AND a pop-clique CC, all under one
    // block key = one task. The ARMED DEFAULT (derived cap = 1024)
    // salts the cell: pairs bounded at ~pop x cap (linear in corpus
    // size at every mult, whatever the router/fit did), components
    // bounded by the sub-cell — its row must stay in the lexical
    // band. The UNCAPPED arm is capped at 10x (18M pair rows in one
    // task there already make the point; 100x would be 1.8G).
    def skewEmb(m: Int): DataFrame =
      Tables.embeddings(spark, dirs(m)).withColumn("embedding",
        when(pmod(col("vec_id"), lit(10000000L)) >= 1400,
          expr("transform(sequence(0, 63), d -> CAST(" +
            "CASE WHEN d = 0 THEN 4.0 ELSE 0.0 END AS FLOAT))"))
          .otherwise(col("embedding")))
    row("skewSemDedupDefault (armed derived cap, 30% hot cell)") { m =>
      operators.Similarity.semDedupAuto(skewEmb(m), "vec_id", "embedding",
        eps = 0.95, maxIter = 2).count(): Unit
    }
    row("skewSemDedupUncapped (cellCap=0, 30% hot cell)", cap = 10) { m =>
      operators.Similarity.semDedupAuto(skewEmb(m), "vec_id", "embedding",
        eps = 0.95, maxIter = 2, cellCap = 0).count(): Unit
    }
    // the EXPLICIT flat arm, uncapped — after the argmax-aggregate
    // fix (r7: the 362x assignFlat cliff was the window's
    // vector-carrying n x k shuffle, not the scoring flops) this
    // measures what the flat fit+assignment costs end-to-end, so the
    // flat-vs-routed comparison stays honest in the harness's range;
    // past the 4096-cell clamp the flat path still pays ~k/(2*sqrt(k))
    // = 32x the score flops of the two-level route at the clamp, which
    // is the regime the routing default exists for
    row("semDedupFlat (explicit flat arm, maxIter=2)") { m =>
      operators.Similarity.semDedupFlatAuto(
        Tables.embeddings(spark, dirs(m)), "vec_id", "embedding",
        eps = 0.05, maxIter = 2).count(): Unit
    }
    // the hierarchical-quantizer answer to the n x k residual (q200):
    // coarse->fine fit + two-hop assignment costs ~2n*sqrt(k) per
    // round instead of n*k. Same dedup tail as the flat row (same
    // pair contamination), so the 10x comparison is apples-to-apples
    // and the flat row's measured 100x point (589.8 s, r6 run) is the
    // reference this row's 100x cell should beat by ~sqrt(k)/2.
    row("semDedupHier (two-level, maxIter=2)") { m =>
      operators.Similarity.hierarchicalSemDedupAuto(
        Tables.embeddings(spark, dirs(m)), "vec_id", "embedding",
        eps = 0.05, maxIter = 2).count(): Unit
    }
    // PAIR-FREE assignment rows (answer size exactly n at any mult —
    // immune to the geometric contamination): the flat n x k argmin
    // vs the two-hop coarse route, centroids taken unfitted from the
    // id-low corpus rows (assignment cost does not care whether the
    // centroids converged)
    row("assignFlat (n x k argmin)") { m =>
      val emb = Tables.embeddings(spark, dirs(m))
      val k = operators.Similarity.derivedCells(emb.count())
      operators.Similarity.assignCells(emb,
        emb.filter(col("vec_id") < k), "vec_id", "embedding")
        .count(): Unit
    }
    row("assignHier (coarse->fine two-hop)") { m =>
      val emb = Tables.embeddings(spark, dirs(m))
      val k = operators.Similarity.derivedCells(emb.count())
      val c = operators.Similarity.ceilSqrt(k)
      val coarse = emb.filter(col("vec_id") < c)
      val fine = operators.Similarity.assignCells(
          emb.filter(col("vec_id") < k), coarse, "vec_id", "embedding",
          spread = false)
        .select(col("id").as("cid"), col("v").as("cv"),
          col("cell").as("blk"))
      operators.Similarity.hierarchicalAssign(emb, coarse, fine,
        "vec_id", "embedding").count(): Unit
    }

    // fixed 500-doc probe batch (disjoint content and ids: copy 999).
    // Each measurement PAIR (seed + probe share one registry, so they
    // run together) is gated on its own rows, and each fmtRow on its
    // own row — a filter naming only the OPH rows no longer runs (or
    // prints) the minhash pair (ADVICE r6).
    val wantMinhashPair = wantRow("registry seed (full corpus)") ||
      wantRow("registry dedupappend (fixed 500-doc batch)")
    val wantOphPair = wantRow("registry seed oph mode (full corpus)") ||
      wantRow("registry dedupappend oph mode (fixed batch)")
    lazy val batch = copy(999).filter(pmod(col("doc_id"), lit(10)) === 3)
      .limit(500).localCheckpoint(true)
    if (wantMinhashPair) {
      val regs = mults.map { m =>
        val reg = new operators.NearDupRegistry(s"$root/reg$m/r",
          numPerm = 32, bands = 8, rowsPerBand = 4, simThreshold = 0.5)
        val seedSecs = time(
          reg.dedupAppend(Tables.documents(spark, dirs(m)), "doc_id", "text").count())
        val probeSecs = time(reg.dedupAppend(batch, "doc_id", "text").count())
        (Some(seedSecs), Some(probeSecs))
      }
      if (wantRow("registry seed (full corpus)"))
        fmtRow("registry seed (full corpus)", "registry_seed", regs.map(_._1))
      if (wantRow("registry dedupappend (fixed 500-doc batch)"))
        fmtRow("registry dedupAppend (fixed 500-doc batch)", "registry_probe",
          regs.map(_._2))
    }
    // the same registry under the OPH signature mode: one hash
    // evaluation per shingle instead of 32 — the hash-compute term
    // of the seed should drop while the band/index shuffle stays
    // identical (the q184 story, landed in the cross-run gate)
    if (wantOphPair) {
      val regsOph = mults.map { m =>
        val reg = new operators.NearDupRegistry(s"$root/regoph$m/r",
          numPerm = 32, bands = 8, rowsPerBand = 4, simThreshold = 0.5,
          sigMode = "oph")
        val seedSecs = time(
          reg.dedupAppend(Tables.documents(spark, dirs(m)), "doc_id", "text").count())
        val probeSecs = time(reg.dedupAppend(batch, "doc_id", "text").count())
        (Some(seedSecs), Some(probeSecs))
      }
      if (wantRow("registry seed oph mode (full corpus)"))
        fmtRow("registry seed OPH mode (full corpus)", "registry_seed_oph",
          regsOph.map(_._1))
      if (wantRow("registry dedupappend oph mode (fixed batch)"))
        fmtRow("registry dedupAppend OPH mode (fixed batch)",
          "registry_probe_oph", regsOph.map(_._2))
    }

    // the COMPOSED steady-state ingest probe (VERDICT r6 #8): one
    // fixed batch through BOTH cross-run gates in sequence — the
    // OPH-mode lexical registry, then the semantic registry that has
    // LIVED THROUGH A REFIT (seeded under corpus-derived cells,
    // refit to 2x that) — against 1x/10x/100x history. Seeding and
    // the refit are setup (untimed); the timed number is the
    // steady-state per-batch cost a production ingest loop pays,
    // which must stay ~flat as history grows.
    // the ANN-serving row shares this block's seeded registries (the
    // wantMinhashPair pattern: setup runs when EITHER row is wanted,
    // each measurement and fmtRow gates individually). probeTopK is
    // read-only, so it is timed BEFORE the mutating steady append —
    // a fixed 8-query batch against 1x/10x/100x history must stay
    // ~flat now that the probe prunes the store to its routed cells
    // (the review fix this row exists to measure).
    val wantSteady =
      wantRow("registry steady-state probe (oph lexical + refit semantic)")
    val wantAnn = wantRow("registry ann probe (probetopk, fixed 8 queries)")
    if (wantSteady || wantAnn) {
      val embBatch = copyEmb(999).localCheckpoint(true)
      val qs8 = copyEmb(0)
        .filter(col("vec_id") >= 12 && col("vec_id") < 20)
        .localCheckpoint(true)
      val pairs = mults.map { m =>
        try {
          // the lexical seed costs a full Nx-corpus signature pass
          // and ONLY the steady row consumes it — an ANN-only
          // rowFilter must not pay it (the per-row gating discipline
          // the measurements below follow)
          val lexOpt = if (!wantSteady) None else {
            val lex = new operators.NearDupRegistry(s"$root/sslex$m/r",
              numPerm = 32, bands = 8, rowsPerBand = 4, simThreshold = 0.5,
              sigMode = "oph")
            lex.dedupAppend(Tables.documents(spark, dirs(m)), "doc_id",
              "text").count()
            Some(lex)
          }
          val embM = Tables.embeddings(spark, dirs(m))
          val k1 = operators.Similarity.derivedCells(embM.count())
          // seed/refit centroid sets by SORTED-id prefix, not an id
          // predicate: synthesized copies offset ids by 1e7, so
          // `vec_id < k` stops finding rows past the base corpus and
          // a large mult would silently make c1 == c2 (the refit an
          // identity no-op — found measuring the first r7 run)
          val c1 = embM.orderBy(col("vec_id")).limit(k1)
            .localCheckpoint(true)
          val c2 = embM.orderBy(col("vec_id")).limit(2 * k1)
            .localCheckpoint(true)
          val sem = new operators.EmbedDedupRegistry(s"$root/sssem$m/reg",
            epsPermille = 450)
          sem.dedupAppend(embM, c1, "vec_id", "embedding").count()
          sem.refit(spark, c2, "vec_id", "embedding")
          // exercise the LSM fold for real (review: a refit's output
          // is ALREADY compacted with no staging tier, so a bare
          // compactStaging right after it is a guaranteed no-op): one
          // untimed warm append lands a staged file on the refit
          // generation, and the fold is REQUIRED to run — the timed
          // probe below then hits a store that has lived the full
          // maintenance cadence (seed -> refit -> append -> fold),
          // plus whatever staging the probe batch itself adds.
          sem.dedupAppend(copyEmb(998).localCheckpoint(true), c2,
            "vec_id", "embedding").count()
          require(sem.compactStaging(spark),
            "steady-state setup: compactStaging must fold the staged append")
          // each measurement fails ALONE (review: one shared catch
          // threw away a completed ANN timing when the later steady
          // append OOM'd — exactly the 100x cell that matters most)
          def guard(tag: String)(f: => Double): Option[Double] =
            try Some(f) catch {
              case e: Exception =>
                System.err.println(s"[scalecheck] $tag x$m: ${e.getMessage}")
                None
            }
          // read-only, so min-of-two; must run before the steady
          // append mutates the store
          val tAnn = if (!wantAnn) None else guard("ann-probe")(time2(
            sem.probeTopK(qs8, c2, "vec_id", "embedding", k = 5).count()))
          // time() once, not time2: a second pass would measure the
          // replay (everything self-matches, nothing appends) — a
          // different, cheaper operation than the steady-state probe
          val tSteady = if (!wantSteady) None else guard("steady-state")(time {
            lexOpt.get.dedupAppend(batch, "doc_id", "text").count()
            sem.dedupAppend(embBatch, c2, "vec_id", "embedding").count()
          })
          (tSteady, tAnn)
        } catch {
          case e: Exception => // shared SETUP failed — nothing measured
            System.err.println(s"[scalecheck] steady-state x$m: ${e.getMessage}")
            (None, None)
        }
      }
      if (wantSteady)
        fmtRow("registry steady-state probe (OPH lexical + refit semantic)",
          "registry_probe_steady", pairs.map(_._1))
      if (wantAnn)
        fmtRow("registry ANN probe (probeTopK, fixed 8 queries)",
          "registry_ann_probe", pairs.map(_._2))
    }

    // PQRegistry persisted ADC probe (round 10): fixed 8-query batch
    // against a 1x/10x/100x PERSISTED codes store. Seeding (fit +
    // full-corpus encode/ingest) is untimed setup; the timed number
    // is the serving probe — routing pinned by the one-job collect,
    // codes scan isin-filtered to the routed cells (bucket-pruned),
    // query table broadcast. Cost model: one columnar scan of the
    // routed slice of n*m BIGINT code rows — linear in the slice with
    // a tiny constant (the q150 shape over a bucketed store).
    if (wantRow("pqregistry adc probe (fixed 8 queries)")) {
      val qs8 = copyEmb(0)
        .filter(col("vec_id") >= 12 && col("vec_id") < 20)
        .localCheckpoint(true)
      fmtRow("PQRegistry ADC probe (fixed 8 queries)", "pqreg_probe",
        mults.map { m =>
          try {
            val embM = Tables.embeddings(spark, dirs(m))
            // centroids/seeds from the SORTED-id prefix (the steady-
            // state block's convention: copies offset ids by 1e7, so
            // an id predicate would under-select at large mults;
            // pqFit's seed rule additionally needs contiguous 0-based
            // ids, which the base-corpus prefix provides)
            val cents = embM.filter(col("vec_id") < 12)
              .localCheckpoint(true)
            val reg = new operators.PQRegistry(s"$root/pqreg$m/r")
            reg.fit(spark, embM, cents, "vec_id", "embedding",
              m = 8, ksub = 64, dim = 64, maxIter = 2)
            reg.ingest(embM, "vec_id", "embedding")
            Some(time2(reg.adcProbe(spark, qs8, "vec_id", "embedding",
              k = 5, nprobe = 2).count()))
          } catch {
            case e: Exception =>
              System.err.println(s"[scalecheck] pqreg-probe x$m: ${e.getMessage}")
              None
          }
        })
    }

    // KnnGraphRegistry persisted beam probe (round 11): fixed 8-query
    // batch against a 1x/10x/100x PERSISTED graph store. The build
    // (NN-Descent fit) is untimed setup; the timed number is the
    // serving search — each hop collects the bounded frontier
    // (|Q| x beam ids) and isin-prunes the bucketed edge and vector
    // scans, so probe work is |Q| x beam x K scorings per hop,
    // corpus-independent by construction (expected ~flat, the q150/
    // pqreg shape over a bucketed store).
    if (wantRow("knngraphregistry beam probe (fixed 8 queries)")) {
      val qs8g = copyEmb(0).filter(col("vec_id") < 8)
        .localCheckpoint(true)
      fmtRow("KnnGraphRegistry beam probe (fixed 8 queries)",
        "graphreg_probe",
        mults.map { m =>
          try {
            val embM = Tables.embeddings(spark, dirs(m))
            val reg = new operators.KnnGraphRegistry(s"$root/grreg$m/r")
            reg.fit(spark, embM, "vec_id", "embedding",
              k = 10, iters = 3, seed = "nnd")
            Some(time2(reg.probe(spark, qs8g, "vec_id", "embedding",
              k = 6, beam = 10, hops = 3, entries = 4).count()))
          } catch {
            case e: Exception =>
              System.err.println(
                s"[scalecheck] graphreg-probe x$m: ${e.getMessage}")
              None
          }
        })
    }

    // LateInteractionRegistry persisted two-stage probe (round 12):
    // fixed 8-query token sets against a 1x/10x/100x PERSISTED
    // token + pooled store. Seeding (fit: token derivation + exact
    // pooling) is untimed setup; the timed number is the serving
    // probe — stage 1 scans the stored POOLED table (one narrow row
    // per doc, DocCap x smaller than the token table the brute rows
    // above scan), stage 2 fetches only the |Q| x C candidates'
    // token rows through the isin-pruned bucketed scan. Expected:
    // sublinear vs the q230 brute row — stage 1 grows with N at a
    // DocCap-smaller constant, stage 2 is corpus-independent.
    if (wantRow("lateinteractionregistry two-stage probe (fixed 8 queries)")) {
      val li = operators.LateInteraction
      val qv8 = li.withVec(
        li.docTokens(copy(0).filter(col("doc_id") < 8), "doc_id", "text", 6)
          .withColumnRenamed("doc_id", "query_id")
          .withColumnRenamed("t", "qt"),
        "qt", "qc").localCheckpoint(true)
      fmtRow("LateInteractionRegistry two-stage probe (fixed 8 queries)",
        "lireg_probe",
        mults.map { m =>
          try {
            val docsM = Tables.documents(spark, dirs(m))
            val reg = new operators.LateInteractionRegistry(
              s"$root/lireg$m/r")
            reg.fit(spark, docsM, "doc_id", "text", 24)
            Some(time2(reg.probe(spark, qv8, k = 5, c = 100).count()))
          } catch {
            case e: Exception =>
              System.err.println(
                s"[scalecheck] lireg-probe x$m: ${e.getMessage}")
              None
          }
        })
    }

    // ROUTED lireg stage-1 vs the full pooled scan (round 13, the
    // q245 claim at scale): both rows serve the SAME persisted
    // clustered store (fit + fitted m=1 Lloyd router + cell-keyed
    // pooled table, all untimed build — Retrieval.liRegCluStore).
    // The routed chain's stage 1 reads only the nprobe/NClu routed
    // cells' partitions (partition pruning), the unrouted chain's
    // stage 1 scans every pooled row; stage 2 is candidate-bounded
    // in both. Expected: both grow with N (stage 1 is linear), the
    // routed row at ~nprobe/NClu the slope — the scan-fraction win
    // the 100 TB deployment buys from the fitted router.
    if (wantRow("lireg routed stage-1 (clustered store)")) {
      fmtRow("lireg ROUTED stage-1 probe (fixed 8 queries, clustered store)",
        "lireg_routed",
        mults.map { m =>
          try {
            val root = queries.Retrieval.liRegCluStore(spark, dirs(m))
            val qv = queries.Retrieval.cluQueryVecs(spark, dirs(m))
              .localCheckpoint(true)
            Some(time2(
              queries.Retrieval.routedServe(spark, root, qv)._1.count()))
          } catch {
            case e: Exception =>
              System.err.println(
                s"[scalecheck] lireg-routed x$m: ${e.getMessage}")
              None
          }
        })
      fmtRow("lireg UNROUTED two-stage probe (same clustered store)",
        "lireg_unrouted",
        mults.map { m =>
          try {
            val root = queries.Retrieval.liRegCluStore(spark, dirs(m))
            val qv = queries.Retrieval.cluQueryVecs(spark, dirs(m))
              .localCheckpoint(true)
            val reg = new operators.LateInteractionRegistry(s"$root/reg")
            Some(time2(reg.probe(spark, qv, k = 5, c = 100).count()))
          } catch {
            case e: Exception =>
              System.err.println(
                s"[scalecheck] lireg-unrouted x$m: ${e.getMessage}")
              None
          }
        })
    }

    // ... and STAGE 1 ISOLATED (the scan itself, the term the router
    // actually shrinks — end-to-end both chains carry the identical
    // constant stage-2, which dilutes the ratio at small stores):
    // routed = route (bounded collect) + partition-pruned scan of the
    // routed cells + score; unrouted = the full pooled-table scan +
    // score through the same top-C machinery.
    if (wantRow("lireg stage-1 only (clustered store)")) {
      val liOp = operators.LateInteraction
      fmtRow("lireg stage-1 only ROUTED (clustered store)",
        "lireg_s1_routed",
        mults.map { m =>
          try {
            val root = queries.Retrieval.liRegCluStore(spark, dirs(m))
            val qv = queries.Retrieval.cluQueryVecs(spark, dirs(m))
              .localCheckpoint(true)
            val qp = liOp.pooled(qv, "query_id", "qc", "qs")
              .localCheckpoint(true)
            // the SAME route + partition-pruned scan q245 serves —
            // one definition, no duplicated NProbe literal (ADVICE
            // r13); the router table is pinned per JVM
            Some(time2(
              queries.Retrieval.routedStage1(spark, root, qp)
                .count(): Unit))
          } catch {
            case e: Exception =>
              System.err.println(
                s"[scalecheck] lireg-s1-routed x$m: ${e.getMessage}")
              None
          }
        })
      fmtRow("lireg stage-1 only UNROUTED full pooled scan (same store)",
        "lireg_s1_unrouted",
        mults.map { m =>
          try {
            val root = queries.Retrieval.liRegCluStore(spark, dirs(m))
            val qv = queries.Retrieval.cluQueryVecs(spark, dirs(m))
              .localCheckpoint(true)
            val qp = liOp.pooled(qv, "query_id", "qc", "qs")
              .localCheckpoint(true)
            val reg = new operators.LateInteractionRegistry(s"$root/reg")
            Some(time2(
              liOp.pooledTopCOf(qp, reg.pooledRows(spark), 100).count()))
          } catch {
            case e: Exception =>
              System.err.println(
                s"[scalecheck] lireg-s1-unrouted x$m: ${e.getMessage}")
              None
          }
        })
    }

    // incremental CC: fold a FIXED 300-edge batch into the standing
    // labeling — the contracted fixpoint is bounded by the batch, so
    // history size enters only through the rep-lookup/remap
    // equi-joins (expected ~flat, like the registry probe). Standing
    // labelings are seeded untimed; capped at 10x (the seeding cost
    // is q31+CC again and the probe's flatness is the claim).
    if (wantRow("incremental cc fold (fixed 300-edge batch)")) {
      val ccBatch = {
        import spark.implicits._
        (0 until 300).map { i =>
          (i.toLong * 7 % 5000, 900000000L + i) // existing id <- new id
        }.toDF("id_a", "id_b").localCheckpoint(true)
      }
      fmtRow("incremental CC fold (fixed 300-edge batch)",
        "incremental_cc_fold", mults.map { m =>
        if (m > 10) None
        else {
          val standing = operators.Dedup.connectedComponents(
            operators.Dedup.jaccardPairs(Tables.documents(spark, dirs(m)),
              "doc_id", "text", n = 3, threshold = 0.5, maxDf = 100))
            .localCheckpoint(true)
          Some(time2(operators.Dedup
            .connectedComponentsIncremental(standing, ccBatch).count()))
        }
      })
    }

    // measured embedding-synthesis contamination at the largest mult
    // (ADVICE r5): exact count of same-base cross-copy pairs above
    // the 0.35 threshold the pair rows use. Non-zero is expected at
    // large mults (tail of a ~N(0, 0.125) per-pair cosine, fatter
    // when component mass is uneven) — this is the geometric limit
    // that caps the PAIR rows at 10x; the 0.6 line shows the tail
    // collapsing once the threshold clears the dim=64 noise floor.
    val (driftN, driftMax) = embDrift(mults.max, 0.35)
    println(f"| cross-copy emb pairs >= 0.35 at ${mults.max}x (measured drift) | n=$driftN | max=$driftMax%.3f | — |")
    val (driftN6, _) = embDrift(mults.max, 0.6)
    println(s"| cross-copy emb pairs >= 0.60 at ${mults.max}x | n=$driftN6 | — | — |")

    val qjson = json.map { case (key, ts) =>
      s""""$key":[${ts.map(_.map(t => f"$t%.3f").getOrElse("null")).mkString(",")}]"""
    }.mkString(",")
    println(s"""{"scalecheck":{$qjson,""" +
      s""""emb_drift":{"mult":${mults.max},"n":$driftN,"max":${f"$driftMax%.4f"}},""" +
      s""""mults":[${mults.mkString(",")}],"sf":"$sf"}}""")
    spark.stop()
  }
}
