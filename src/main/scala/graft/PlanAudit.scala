package graft

import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{Exchange, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Whole-catalog physical-plan audit: walks every query's pre-AQE
  * physical plan and flags the anti-patterns that break at 100 TB:
  *
  *  - CartesianProductExec — never acceptable;
  *  - BroadcastNestedLoopJoinExec — acceptable ONLY where the
  *    broadcast side is bounded by construction (allow-listed below
  *    with the justification);
  *  - WindowExec fed by a SinglePartition shuffle — a GLOBAL window:
  *    the whole relation flows through one task (a 1-row global
  *    aggregate's SinglePartition exchange is fine and not flagged).
  *
  * runMain graft.PlanAudit [sfDir]; exit 1 if anything unexpected.
  */
object PlanAudit {

  /** BNLJ allow-list: the broadcast side is bounded by construction. */
  private val bnljOk: Map[String, String] = Map(
    "q36_ann_topk" -> "exact brute-force baseline; 8-query side broadcast",
    "q70_ann_int8" -> "int8 brute-force scoring; 8-query side broadcast",
    "q45_ann_ivf" -> "cell assignment vs 12 broadcast centroids",
    "q53_tfidf_keywords" -> "1-row corpus-size broadcast cross join",
    "q86_histogram" -> "1-row global min/max broadcast cross join",
    "q94_kmeans_iter" -> "8 seed centroids broadcast; argmax is a partial-agg struct max",
    "q103_knn_classify" -> "exact kNN baseline; 8-query side broadcast (q36 shape)",
    "q128_hard_negatives" -> "exact hard-negative baseline; 8-anchor side broadcast (q36 shape)",
    "q139_ann_recall" -> "recall eval needs the exact top-5 baseline; 8-query side broadcast (q36 shape)",
    "q143_ivf_recall" -> "recall eval: exact top-5 baseline (8-query broadcast, q36 shape) + 12 broadcast centroids for cell ranking (q45 shape)",
    "q104_bigram_lift" -> "1-row total-bigram-count broadcast cross join (q53 shape)",
    "q108_vocab_coverage" -> "4-row threshold table + 1-row total broadcast; non-equi coverage test",
    "q110_lsh_recall" -> "three 1-row count aggregates cross-joined (bounded by construction)",
    "q116_token_waterfill" -> "1-row total/cap aggregates broadcast onto the per-source table (q53 shape)",
    "q146_hll_merge" -> "three 1-row sketch/count aggregates cross-joined (q110 shape, bounded by construction)",
    "q147_ivf_int8" -> "12 broadcast centroids for cell ranking (q45 shape); candidate scoring is an equi-join on cell",
    "q150_ivf_int8_disk" -> "12 broadcast centroids for query-cell ranking (q45 shape); candidate scoring is an equi-join on cell over the partition-pruned layout",
    "q151_ivf_fitted" -> "recall eval: exact top-5 baseline (8-query broadcast, q36 shape) + 12 broadcast centroids (seed and Lloyd-fitted) for cell ranking (q143 shape)",
    "q148_simhash_recall" -> "three 1-row count aggregates cross-joined (q110 shape, bounded by construction)",
    "q152_kmv_bottomk" -> "1-row merged-sketch aggregate broadcast onto the 1-row direct-sketch row for the merge-law equality (q146 shape, bounded by construction)",
    "q155_jl_projection" -> "recall+distortion eval: exact and projected brute-force baselines (8-query broadcast, q36 shape)",
    "q156_mmr_topk" -> "1-query broadcast pool scan (q36 shape) + the 20-row materialized pool's pairwise self-join — bounded by the pool contract",
    "q160_triangle_count" -> "three 1-row count aggregates cross-joined (q110 shape, bounded by construction)",
    "q161_cms_heavy_hitters" -> "1-row merge-law aggregate broadcast onto the 10-row probe result (q152 shape, bounded by construction)",
    "q163_bloom_semi_join" -> "1-row 8 KB bloom bitmap broadcast cross join - the operator's whole point (map-side prefilter before the exact semi join)",
    "q164_event_funnel" -> "three 1-row stage-summary aggregates cross-joined (q110 shape, bounded by construction)",
    "q167_token_drift" -> "1-row corpus-total aggregate broadcast cross join (q53 shape)",
    "q170_rendezvous_sharding" -> "1-row churn-audit aggregate broadcast onto the <=72-row shard matrix (q53 shape, bounded by construction)",
    "q173_decayed_engagement" -> "1-row as-of-timestamp aggregate broadcast cross join (q86 shape)",
    "q177_bm25_topk" -> "1-row corpus-stats (N, total_dl) broadcast cross join (q53 shape); query-term table is a bounded broadcast equi-join",
    "q181_histogram_quantile" -> "two 1-row aggregates (total count, merge-law mismatch count) broadcast cross-joined (q110 shape, bounded by construction)",
    "q183_semdedup" -> "12 broadcast centroids for cell assignment (q45 shape); the eps pair join and keeper window are cell/component-keyed equi ops",
    "q186_importance_selection" -> "two 1-row feature-total aggregates broadcast cross-joined (q110 shape); feature joins are equi on the hashed feature id",
    "q187_pagerank_centrality" -> "1-row node-count aggregate broadcast cross-joined per power iteration (q110 shape); contribution joins are equi on src/dst",
    "q189_ann_rerank" -> "coarse stage is the int8 brute-force scorer (8-query side broadcast, q70 shape); the rerank join is equi on neighbor_id with a bounded |queries| x pool broadcast",
    "q193_dedup_scorecard" -> "three 1-row count aggregates cross-joined per method row (q110 shape, bounded by construction); the simhash method's own pair join is q144's banded/verified plan",
    "q195_dedup_funnel" -> "four 1-row stage-count aggregates cross-joined into the stack (q110 shape, bounded by construction); every stage's own joins are keyed",
    "q200_hier_semdedup" -> "broadcast centroid sets bounded by construction: ceil-sqrt(k) coarse (<=64) in the coarse fit/route, <=k fine seeds per blocked Lloyd round (q94/q183 shape); the fine argmax and eps pair joins are blk/cell-keyed equi ops",
    "q201_hier_assign_agree" -> "same bounded centroid broadcasts as q200 plus the flat-argmin baseline the agreement is measured AGAINST (k<=4096 fine centroids broadcast, q45 shape); the per-width agreement rows are 1-row aggregates cross-joined (q110 shape)",
    "q202_capped_semdedup" -> "12 broadcast centroids for cell assignment (q45/q183 shape); the per-cell count table (k rows) is broadcast back for the salt; pair join is (cell, sub)-keyed equi",
    "q203_hier_dedup_delta" -> "both quantizers' bounded centroid broadcasts (q200 + q183 shapes); decision join is vec_id-keyed equi; the agreement row is a single aggregate",
    "q204_hier_fit_quality" -> "same bounded centroid broadcasts as q203 (flat k<=4096 + coarse/fine chains); quality rows are single aggregates unioned",
    "q207_oversampled_seeding" -> "oversample rounds broadcast the <=49-row running pool (kmeansFit loop discipline); the weight reduction is one broadcast argmin + count; both Lloyd fits are the q94 bounded-seed shape; quality rows are single aggregates unioned",
    "q206_hier_ivf_recall" -> "recall eval: exact top-5 baseline (8-query broadcast, q36/q143 shape) + the fitted fine/coarse centroid broadcasts (q200 shape); both IVF probes are cell-keyed equi joins",
    "q208_registry_refit_recall" -> "recall eval: exact top-5 baseline over the survivors (8-query broadcast, q36 shape) + 12/24 broadcast centroids for cell routing (q45 shape); every signature probe is a cell-keyed equi join; in-registry dedup is q183's cell-blocked shape",
    "q214_pq_recall" -> "recall eval: exact integer-L2 top-5 baseline (8-query broadcast, q36 shape); the PQ arm itself is all (blk)/(blk, code) equi joins against broadcast codebooks/query tables",
    "q247_pq_clustered_recall" -> "q214's shape over the clustered fixture: exact integer-L2 top-5 baseline (8-query broadcast) + the PQ chain's (blk)/(blk, code) equi joins against broadcast codebooks/query tables",
    "q215_ivfpq_ann" -> "12 broadcast centroids for corpus assignment + query routing (q45 shape); the ADC scan itself is a (cell, blk, code) equi join against a broadcast |Q| x nprobe x m x ksub query table",
    "q217_pqreg_refit_recall" -> "recall eval across the PQRegistry refit: exact integer-L2 top-5 baseline (8-query broadcast, q36/q214 shape); both persisted ADC arms are (cell, blk, code) equi joins against broadcast query tables over the isin-pruned codes scans",
    "q218_ivfadc_ann" -> "12 broadcast centroids for corpus assignment + query routing (q45/q215 shape); residuals and the ADC scan are (cell)/(cell, blk, code) equi joins against broadcast centroid/query tables",
    "q219_ivfadc_recall" -> "recall eval: exact integer-L2 top-5 baseline (8-query broadcast, q36/q214 shape) + the q218 routing/assignment broadcasts",
    "q223_knn_graph_recall" -> "recall eval: exact integer-L2 top-K baseline (8-query broadcast, q36/q214 shape); the graph build itself is checkpointed id-keyed equi-joins",
    "q225_graph_search_ann" -> "hop-0 seeding: 8 queries x 4 broadcast entry nodes (both bounded by construction); every hop after is an id-keyed equi-join",
    "q226_graph_search_recall" -> "the q225 seeding cross + the exact integer-L2 baseline (8-query broadcast, q36/q214 shape)",
    "q227_knn_graph_convergence" -> "per-round summary assembly: 1-row aggregate crossed with a 1-row broadcast improved-count (bounded by construction, q181 shape); the graph rounds themselves are checkpointed equi-joins",
    "q229_graphreg_ingest_recall" -> "the q225/q226 seeding cross (8 queries x 4 broadcast entry nodes) + the exact integer-L2 baseline (8-query broadcast, q36/q214 shape); the persisted probe's hops are isin-pruned bucketed scans",
    "q243_graphreg_stitch_recall" -> "THREE persisted probes (before/stitch/refit), each with the q225 seeding cross (8 queries x 4 broadcast entry nodes) + the exact integer-L2 baseline (8-query broadcast, q36/q214 shape); every hop is an isin-pruned bucketed scan",
    "q246_graphclu_stitch_recall" -> "q243's three-arm shape over the clustered fixture: three persisted probes (8 queries x 16 broadcast entry nodes — CluServeEntries coverage for the cluster-disconnected graph) + the exact integer-L2 baseline (8-query broadcast, q36/q214 shape); every hop is an isin-pruned bucketed scan",
    "q230_maxsim_topk" -> "exact late-interaction baseline: bounded query-token set (8 queries x <=6 tokens) broadcast over the corpus token scan (q36 shape generalized to multi-vector)",
    "q231_maxsim_pruned" -> "stage-1 pooled pass: 8 pooled query vectors broadcast over the pooled-doc table (q36 shape); stage-2 MaxSim is doc_id/query_id-keyed equi joins over the bounded candidate set",
    "q232_maxsim_recall" -> "recall eval needs the exact MaxSim baseline (q230's bounded query-token broadcast) plus q231's pooled stage-1 broadcast; stage-2 arms are keyed equi joins",
    "q233_maxsim_weighted" -> "weighted exact MaxSim baseline (q230's bounded query-token broadcast) + 1-row corpus-size aggregate broadcast for the IDF weight (q53 shape)",
    "q236_retrieval_metrics" -> "eval needs both arms: the exact MaxSim truth (q230's bounded query-token broadcast) and q231's pooled stage-1 broadcast; the metric joins are query_id/doc_id-keyed equi",
    "q237_filtered_maxsim" -> "q231's pooled stage-1 broadcast over the lang-pruned corpus (q36 shape); stage-2 MaxSim is keyed equi joins",
    "q238_filtered_recall" -> "eval needs the exact en-only MaxSim truth (q230's bounded query-token broadcast) plus BOTH pooled stage-1 arms (filtered and unfiltered, q231 shape); all stage-2/count joins are keyed equi",
    "q239_prf_maxsim" -> "q231's pooled stage-1 broadcast (feedback-doc selection) + the expanded exact MaxSim scan (q230 shape, bounded 8 x <=8 expanded query tokens broadcast)",
    "q241_lireg_probe" -> "q231's stage-1 shape served from the PERSISTED pooled store: 8 pooled query vectors broadcast over the stored pooled table; stage-2 MaxSim is keyed equi joins over the isin-pruned token fetch",
    "q242_lireg_ingest_probe" -> "q241's persisted two-stage shape over the incrementally-built (fit + ingest) stores — same bounded pooled-query broadcast",
    "q244_lireg_ivf_stage1" -> "cell assignment: 12 broadcast pooled centroids against the stored pooled table (q45/q215 shape); query routing: 8 pooled queries x 12 centroids, both bounded; the routed stage-1 join broadcasts the |Q| x nprobe pairs and stage 2 is keyed equi joins; recall arm = q230's bounded query-token broadcast",
    "q245_lireg_routed_stage1" -> "query routing: 8 pooled queries x 8 FITTED centroids (both bounded, q244 shape); the routed stage-1 reads only the routed cells' partitions and broadcasts the |Q| x nprobe pairs + pooled query table; stage 2 is keyed equi joins over the isin-pruned token fetch; comparison arms = the exact MaxSim truth (q230's bounded query-token broadcast) + the unrouted two-stage (q231's pooled broadcast)",
    "q240_prf_drift" -> "both exact MaxSim arms (plain + expanded, q230 shape) + the pooled feedback selection broadcast; drift joins are keyed equi"
  )

  /** Global-window allow-list: the windowed relation is bounded by
    * construction (never the raw fact table). */
  private val globalWindowOk: Map[String, String] = Map(
    "q108_vocab_coverage" ->
      "rank/cumsum over the AGGREGATED vocab relation (|distinct terms|, Heaps-law bounded) — the corpus never passes through the single partition",
    "q116_token_waterfill" ->
      "prefix-sum over the AGGREGATED per-source relation (|domains|, not |documents|) — at larger source cardinality this becomes a range-partitioned two-pass prefix sum",
    "q154_systematic_pps" ->
      "offset/total windows over the 8-row BUCKET-TOTALS aggregate only — the corpus prefix sum itself is bucket-partitioned (this query IS the two-pass prefix sum q116's note promises)",
    "q159_epoch_interleave" ->
      "src_rank/n_sources windows over the per-source AGGREGATE (|sources| rows) — the corpus itself only sees the per-source window and a narrow map",
    "q178_alpha_allocation" ->
      "weight-total/leftover/remainder-rank windows over the per-source AGGREGATE (|sources| rows, q116 shape) — the corpus only pays the one groupBy(source)",
    "q181_histogram_quantile" ->
      "cumsum windows over the AGGREGATED histogram relations — bounded by value range / bucket width (<= 1M cells), never by |events|"
  )

  private def globalWindow(root: SparkPlan): Boolean =
    root.collect { case w: WindowExec => w }.exists { w =>
      w.collectFirst { case e: ShuffleExchangeExec => e }
        .exists(_.outputPartitioning == SinglePartition)
    }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.fromEnv()
    // AQE off for the audit: executedPlan is then the fully-prepared
    // physical plan (EnsureRequirements has inserted the exchanges)
    // without the adaptive wrapper hiding the tree. (sparkPlan would
    // compile but runs BEFORE preparations — zero exchanges, and the
    // global-window check silently passes on everything.)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    var flagged = List.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val cart = plan.collect { case c: CartesianProductExec => c }.nonEmpty
        val bnlj = plan.collect { case b: BroadcastNestedLoopJoinExec => b }.nonEmpty
        val gw = globalWindow(plan)
        val nExchange = plan.collect { case e: Exchange => e }.size
        val notes = List(
          if (cart) Some("CARTESIAN") else None,
          if (bnlj && !bnljOk.contains(name)) Some("BNLJ") else None,
          if (bnlj && bnljOk.contains(name)) Some("bnlj-ok") else None,
          if (gw && !globalWindowOk.contains(name)) Some("GLOBAL-WINDOW") else None,
          if (gw && globalWindowOk.contains(name)) Some("gw-ok") else None
        ).flatten
        val bad = notes.exists(n => n == "CARTESIAN" || n == "BNLJ" || n == "GLOBAL-WINDOW")
        if (bad) flagged ::= s"$name: ${notes.mkString(",")}"
        println(f"[audit] $name%-28s exchanges=$nExchange%-3d ${notes.mkString(",")}")
      } catch {
        case e: Throwable =>
          flagged ::= s"$name: ERROR ${e.getMessage}"
          println(s"[audit] $name ERROR: ${e.getMessage}")
      }
    }
    if (flagged.nonEmpty) {
      println("[audit] FLAGGED:")
      flagged.reverse.foreach(f => println(s"[audit]   $f"))
    } else println("[audit] clean: no cartesian/BNLJ/global-window flags")
    spark.stop()
    if (flagged.nonEmpty) sys.exit(1)
  }
}
