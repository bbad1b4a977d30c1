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

  /** Integer dot of the two component families. */
  private def dot(qp: String, dp: String): Column =
    (0 until Dim).map(j => col(s"$qp$j") * col(s"$dp$j")).reduce(_ + _)

  /** Sum-pooled vector per id: component-wise sum of the id's token
    * vectors — the single-vector proxy the two-stage's first pass
    * scores. One shuffle on the id (partial-agg map-side); the
    * result is corpus-token-budget-times smaller than the token
    * table and is exactly the shape the IVF/PQ serving stack indexes. */
  def pooled(v: DataFrame, idCol: String, p: String, out: String): DataFrame = {
    val sums = (0 until Dim).map(j => sum(col(s"$p$j")).as(s"$out$j"))
    v.groupBy(idCol).agg(sums.head, sums.tail: _*)
  }

  /** Exact MaxSim scores for every (query, doc) pair: qv broadcast
    * (bounded by contract: |Q| x query-token cap rows) against the
    * corpus token table, self-pairs excluded. Two-level aggregation:
    * max dot per (query, doc, query-token), then sum over query
    * tokens — both partial-agg friendly. */
  def maxSimScores(qv: DataFrame, dv: DataFrame): DataFrame =
    spreadByDoc(dv)
      .join(broadcast(qv), col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"), col("qt"),
        dot("qc", "dc").as("dp"))
      .groupBy("query_id", "doc_id", "qt").agg(max("dp").as("best"))
      .groupBy("query_id", "doc_id").agg(sum("best").as("score"))

  /** Spread the corpus token table across the cluster on doc_id.
    * At toy SF the documents table is ONE parquet split, which would
    * serialize the whole |corpus tokens| x |query tokens| scoring
    * pipeline onto a single task (measured: 9.3 s -> 1.3 s at sf0.1);
    * at real SF the scan arrives pre-split and this is a cheap
    * narrow-row shuffle. Not gratuitous: hash(doc_id) propagates
    * through the broadcast join and satisfies BOTH downstream
    * aggregation keys ((query, doc, qt) and (query, doc)), so the
    * exchange it inserts is the ONLY one in the scoring chain —
    * both aggs run shuffle-free on top of it. */
  private def spreadByDoc(dv: DataFrame): DataFrame =
    dv.repartition(col("doc_id"))

  /** Weighted MaxSim: qv must carry an integer weight column `w` per
    * query token; score = sum over qt of w(qt) * max dot. Same plan
    * shape as maxSimScores (w rides the first group key — constant
    * within it by construction). */
  def weightedMaxSimScores(qw: DataFrame, dv: DataFrame): DataFrame =
    spreadByDoc(dv)
      .join(broadcast(qw), col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"), col("qt"), col("w"),
        dot("qc", "dc").as("dp"))
      .groupBy("query_id", "doc_id", "qt", "w").agg(max("dp").as("best"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("w") * col("best")).as("score"))

  /** Shard count for the partial pre-rank below: bounds the final
    * per-query window's input at Shards x k rows per query. */
  private val RankShards = 64

  /** Partial per-(query, shard) top-k BEFORE a per-query window —
    * the TakeOrderedAndProject discipline applied to a keyed window:
    * a window partitioned only by query_id funnels ALL N scored rows
    * per query into |Q| single-task sorts at real SF (|Q| = 8 here),
    * a bottleneck the per-plan SinglePartition audit cannot see.
    * Sharding on hash(doc_id) first reduces each query's rows to
    * <= RankShards x k in parallel; exact, because every global
    * top-k row is a fortiori in its shard's top-k under the same
    * (score desc, doc_id asc) order. */
  private def shardPruneTopK(scored: DataFrame, k: Int): DataFrame = {
    val pre = Window
      .partitionBy(col("query_id"), pmod(hash(col("doc_id")), lit(RankShards)))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("srn", row_number().over(pre))
      .filter(col("srn") <= k)
      .drop("srn")
  }

  /** Top-k prefix of a (query_id, doc_id, score) frame; ties broken
    * by doc_id ascending (the pqTop5 determinism rule). Pre-reduced
    * per shard (shardPruneTopK) so the per-query sort sees a bounded
    * relation at any corpus size. */
  def topK(scores: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    shardPruneTopK(scores, k).withColumn("rank", row_number().over(w))
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
    val scored = dp.join(broadcast(qp), col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"), pdot.as("score"))
    // shard-prune on the pooled score, then restore the prank naming
    shardPruneTopK(scored, c)
      .withColumnRenamed("score", "pscore")
      .withColumn("prank", row_number().over(w))
      .filter(col("prank") <= c)
      .select("query_id", "doc_id", "prank")
  }

  /** Exact MaxSim restricted to candidate pairs: candidates equi-join
    * the corpus token table on doc_id, then each query's token set
    * re-scores only those docs — the PLAID two-stage shape. */
  def prunedMaxSimScores(qv: DataFrame, dv: DataFrame,
                         cand: DataFrame): DataFrame =
    cand.join(dv, "doc_id")
      .join(broadcast(qv), "query_id")
      .select(col("query_id"), col("doc_id"), col("qt"),
        dot("qc", "dc").as("dp"))
      .groupBy("query_id", "doc_id", "qt").agg(max("dp").as("best"))
      .groupBy("query_id", "doc_id").agg(sum("best").as("score"))
}
