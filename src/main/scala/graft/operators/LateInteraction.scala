package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** ColBERT-style late-interaction (multi-vector MaxSim) retrieval
  * (Khattab & Zaharia, SIGIR 2020; PLAID, CIKM 2022): a document is a
  * SET of token vectors, not one pooled vector, and
  *
  *   score(q, d) = sum over query tokens qt of
  *                   max over doc tokens dt of  dot(v(qt), v(dt))
  *
  * — the "MaxSim" operator. The max-pooling is what single-vector
  * ANN (q36/q213 family) cannot express: a doc matches if EACH query
  * token finds SOME good doc token, wherever it sits in the doc.
  *
  * Token vectors here are md5-derived exact integers (the q211 media
  * discipline): component j of token t is a disjoint 5-hex window of
  * ONE md5 digest of "mv:t", mod 17, shifted to [-8, 8]. One digest
  * per distinct token feeds all Dim components in both engines, so
  * dot products and MaxSim sums are BIGINT-exact and the DuckDB
  * oracle replays the whole chain verbatim.
  *
  * Scale shape (100 TB): the corpus token table is a narrow
  * projection of the documents scan (explode of a capped slice — no
  * shuffle); the query-token side is bounded by contract (|Q| x
  * per-query token cap) and broadcast. Brute MaxSim is the linear
  * scan baseline (one pass over corpus tokens, partial-agg max/sum
  * map-side, one shuffle on (query, doc) groups). The pruned path is
  * the deployed two-stage shape (the q189 rerank pattern generalized
  * to multi-vector): stage 1 scores ONE sum-pooled vector per doc —
  * a corpus-token-budget-times-smaller table that composes with the
  * whole single-vector ANN stack (IVF cells, PQ codes, the
  * registries) — and keeps top-C candidates per query; stage 2 runs
  * exact MaxSim only on candidates (C x |q| x doc-budget work,
  * independent of N). Recall is MEASURED (q143/q214 discipline),
  * never assumed.
  *
  * (A PLAID-style token-cell inverted index was measured on this
  * corpus and rejected: the synthetic vocabulary is ~300 tokens each
  * appearing in ~half the docs, so ANY lexical/cell routing admits
  * ~99% of the corpus — the pooled first stage prunes 10x where
  * token-identity routing cannot prune at all.)
  */
object LateInteraction {

  /** Token-vector dimensionality: 6 disjoint 5-hex md5 windows. */
  val Dim = 6

  /** Component modulus: values land in [-8, 8] (17 residues). */
  val CompMod = 17L

  /** Adds integer vector components `<p>0 .. <p>{Dim-1}` derived from
    * ONE md5 digest of "mv:<token>" — window j is hex chars
    * [1+5j, 6+5j), mod 17, minus 8. The digest column is computed
    * once and dropped. */
  def withVec(df: DataFrame, tCol: String, p: String): DataFrame = {
    val withH = df.withColumn("mv_h", md5(concat(lit("mv:"), col(tCol))))
    (0 until Dim).foldLeft(withH) { (d, j) =>
      d.withColumn(s"$p$j",
        conv(substring(col("mv_h"), 1 + 5 * j, 5), 16, 10).cast("long")
          % CompMod - 8L)
    }.drop("mv_h")
  }

  /** (id, t): DISTINCT tokens among the first `cap` tokens of
    * `textCol` — the per-document token budget. Zero-token documents
    * emit no rows. Narrow (explode only, no shuffle). */
  def docTokens(docs: DataFrame, idCol: String, textCol: String,
                cap: Int): DataFrame =
    docs.select(col(idCol),
        array_distinct(slice(Text.tokens(col(textCol)), 1, cap)).as("ts"))
      .select(col(idCol), explode(col("ts")).as("t"))

  /** Sum-pooled vector per id: component-wise sum of the id's token
    * vectors — the single-vector proxy the two-stage's first pass
    * scores. One shuffle on the id (partial-agg map-side); the
    * result is corpus-token-budget-times smaller than the token
    * table and is exactly the shape the IVF/PQ serving stack indexes. */
  def pooled(v: DataFrame, idCol: String, p: String, out: String): DataFrame = {
    val sums = (0 until Dim).map(j => sum(col(s"$p$j")).as(s"$out$j"))
    v.groupBy(idCol).agg(sums.head, sums.tail: _*)
  }

  /** Bounded pivot width for the fused MaxSim kernel below: every
    * caller's per-query DISTINCT token count is <= 8 by construction
    * (QCap = 6, CluQCap = 8, PRF expansion = QCap + 2). The pivot
    * REFUSES (raise_error) rather than truncates if a query ever
    * exceeds it, so the bound is load-bearing, not assumed. */
  private val PivotW = 8

  /** One bounded-width row per query: the query's token vectors
    * (and optional extra per-token columns, e.g. the q233 weight)
    * collected into a deterministically ordered array (sorted by the
    * distinct token string — first struct field). |Q| rows total;
    * this is the broadcast side of every MaxSim kernel. */
  private def pivotQueries(qv: DataFrame, extra: Seq[String]): DataFrame = {
    // weighted-kernel contract guard (ADVICE r14): the slot fusion is
    // exact only for w >= 1 (max(w*dp) = w*max(dp) needs positive w) —
    // refuse a non-positive weight loudly instead of silently
    // mis-scoring. Runs on the <= 48 query-token rows: free.
    val q0 =
      if (extra.contains("w"))
        qv.withColumn("w",
          when(col("w") >= 1, col("w")).otherwise(raise_error(concat(
            lit("maxSim weighted kernel requires w >= 1, got w="),
            coalesce(col("w").cast("string"), lit("NULL")),
            lit(" for query_id="),
            col("query_id").cast("string")))))
      else qv
    val fields = (Seq("qt") ++ extra ++ (0 until Dim).map(j => s"qc$j")).map(col)
    q0.groupBy("query_id")
      .agg(array_sort(collect_list(struct(fields: _*))).as("qarr"))
      .select(col("query_id"),
        when(size(col("qarr")) > PivotW, raise_error(concat(
            lit(s"maxSim pivot width $PivotW exceeded for query_id="),
            col("query_id").cast("string"))))
          // distinct-(query_id, qt) contract guard (ADVICE r14): a
          // duplicate token row would be double-counted by the fused
          // kernel where the old groupBy-qt kernel deduped it, and a
          // duplicate that keeps the array within PivotW slots passed
          // the width check silently. |Q| rows: free.
          .when(size(col("qarr")) =!=
              size(array_distinct(col("qarr").getField("qt"))),
            raise_error(concat(
              lit("maxSim pivot: duplicate (query_id, qt) rows for query_id="),
              col("query_id").cast("string"))))
          .otherwise(col("qarr")).as("qarr"))
  }

  /** Per-pivot-slot dot products of one corpus token row against all
    * of a query's token vectors: slot i beyond the query's token
    * count is NULL (try_element_at) and drops out of max/coalesce.
    * When weighted, the slot's positive weight multiplies the dot —
    * exact because w >= 1 by contract, so max(w*dp) = w*max(dp). */
  private def pivotDots(weighted: Boolean): Seq[Column] =
    (0 until PivotW).map { i =>
      val e = try_element_at(col("qarr"), lit(i + 1))
      val d = (0 until Dim).map(j =>
        e.getField(s"qc$j") * col(s"dc$j")).reduce(_ + _)
      (if (weighted) e.getField("w") * d else d).as(s"dp$i")
    }

  /** ONE hash aggregate per (query, doc): component-wise max over
    * the pivot slots, then the score is the sum of the non-NULL slot
    * maxes — algebraically identical to the max-per-(query,doc,qt)
    * then sum-over-qt two-aggregate chain (integer max/sum commute
    * and slot order is fixed per query), but the pair stream it
    * aggregates is |corpus tokens| x |Q| rows instead of
    * |corpus tokens| x |query tokens| (the r14 kernel fusion: ~6x
    * fewer rows, long group keys instead of a string token key, and
    * one agg pass instead of two). */
  private def pivotAgg(rows: DataFrame): DataFrame = {
    val maxes = (0 until PivotW).map(i => max(col(s"dp$i")).as(s"m$i"))
    rows.groupBy("query_id", "doc_id").agg(maxes.head, maxes.tail: _*)
      .select(col("query_id"), col("doc_id"),
        (0 until PivotW).map(i => coalesce(col(s"m$i"), lit(0L)))
          .reduce(_ + _).as("score"))
  }

  /** Exact MaxSim scores for every (query, doc) pair: the pivoted
    * query table (|Q| rows) broadcast against the corpus token
    * table, self-pairs excluded. Fused single-aggregate kernel — see
    * pivotAgg; scores are BIGINT-identical to the two-level
    * max-then-sum definition in the class doc.
    *
    * dv must arrive SPREAD (hash-partitioned by doc_id, or a
    * naturally multi-split scan): the kernel no longer repartitions
    * (r14) — the Retrieval derivations spread the DOCS scan before
    * tokenization instead, so the md5/tokenize work parallelizes AND
    * hash(doc_id) propagates through the narrow derivation and the
    * broadcast join, keeping the (query, doc) aggregate
    * exchange-free; a repartition here would shuffle the 10x-larger
    * derived token table a second time. */
  def maxSimScores(qv: DataFrame, dv: DataFrame): DataFrame =
    pivotAgg(dv
      .join(broadcast(pivotQueries(qv, Nil)),
        col("doc_id") =!= col("query_id"))
      .select(Seq(col("query_id"), col("doc_id")) ++ pivotDots(false): _*))

  /** Weighted MaxSim: qw must carry an integer weight column `w` >= 1
    * per query token (q233's w = N - df + 1 >= 1); score = sum over
    * qt of w(qt) * max dot. Same fused kernel as maxSimScores with
    * the weight multiplied into each slot's dot before the max —
    * exact for positive weights. */
  def weightedMaxSimScores(qw: DataFrame, dv: DataFrame): DataFrame =
    pivotAgg(dv
      .join(broadcast(pivotQueries(qw, Seq("w"))),
        col("doc_id") =!= col("query_id"))
      .select(Seq(col("query_id"), col("doc_id")) ++ pivotDots(true): _*))

  /** Top-k prefix of a (query_id, doc_id, score) frame; ties broken
    * by doc_id ascending (the pqTop5 determinism rule). ONE window
    * partitioned by query_id (r14): the row_number-filter pair
    * compiles to a Partial WindowGroupLimit that keeps <= k rows per
    * query per upstream partition BEFORE the exchange (Spark 3.5+
    * rank-limit pushdown, visible as WindowGroupLimit Partial/Final
    * in the plan), so the per-query sort sees <= k x upstream
    * partitions rows at any corpus size — exactly the bound the old
    * explicit hash(doc_id)-shard pre-window bought, minus that
    * window's extra sort + exchange per call. */
  def topK(scores: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    scores.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }

  /** Stage-1 candidates: top-C docs per query under the sum-pooled
    * dot — the cheap single-vector pass (N pooled rows, not N x
    * token-budget token rows). Pooled queries are |Q| rows,
    * broadcast; ties break doc_id ascending. Returns
    * (query_id, doc_id, prank). */
  def pooledTopC(qv: DataFrame, dv: DataFrame, c: Int): DataFrame =
    pooledTopCOf(pooled(qv, "query_id", "qc", "qs"),
      pooled(dv, "doc_id", "dc", "ds"), c)

  /** Stage-1 candidates from ALREADY-POOLED frames: qp (query_id,
    * qs0..) — |Q| rows, broadcast — and dp (doc_id, ds0..). The
    * persisted-serving entry point: LateInteractionRegistry's probe
    * scores its STORED pooled table here instead of re-pooling the
    * corpus token scan per query. */
  def pooledTopCOf(qp: DataFrame, dp: DataFrame, c: Int): DataFrame = {
    val pdot = (0 until Dim).map(j => col(s"qs$j") * col(s"ds$j")).reduce(_ + _)
    val w = Window.partitionBy("query_id")
      .orderBy(col("pscore").desc, col("doc_id").asc)
    // one per-query window: the row_number-filter pair compiles to a
    // Partial WindowGroupLimit before the exchange (see topK)
    dp.join(broadcast(qp), col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"), pdot.as("pscore"))
      .withColumn("prank", row_number().over(w))
      .filter(col("prank") <= c)
      .select("query_id", "doc_id", "prank")
  }

  /** Exact MaxSim restricted to candidate pairs: candidates equi-join
    * the corpus token table on doc_id, then each query's pivoted
    * token row re-scores only those docs — the PLAID two-stage
    * shape, on the same fused single-aggregate kernel. */
  def prunedMaxSimScores(qv: DataFrame, dv: DataFrame,
                         cand: DataFrame): DataFrame =
    pivotAgg(cand.join(dv, "doc_id")
      .join(broadcast(pivotQueries(qv, Nil)), "query_id")
      .select(Seq(col("query_id"), col("doc_id")) ++ pivotDots(false): _*))
}
