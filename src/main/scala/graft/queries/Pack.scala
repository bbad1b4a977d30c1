package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryGroup, Tables}
import graft.functions.Text
import graft.operators.Packing

/** Round-11 whole-document sequence packing (no-split bin packing) —
  * the complement of q81's concat-and-split packing for training
  * shapes where a document must not cross sequence boundaries (SFT,
  * contrastive pairs). Harmonic class packing (Lee & Lee, JACM 1985)
  * makes the assignment window-expressible: class f = floor(L/n)
  * docs per pack, feasible by construction (f docs of n <= L/f sum
  * to <= L), zero cross-row pack state. Budget L = 256 here so the
  * sf0.01 corpus produces non-trivial multi-class packing; the plan
  * is budget-independent (production uses 2048-8192 identically).
  */
object Pack extends QueryGroup {

  private val Budget = 256

  private def packed(s: SparkSession, dir: String): DataFrame =
    Packing.harmonicPack(
      Tables.documents(s, dir).select(col("doc_id"), col("lang"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens")),
      "doc_id", "n_tokens", Budget, Seq("lang"))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Per-doc pack assignment: one window rank per (lang, class) —
    // the whole algorithm. Every pack feasible by construction;
    // oversized docs isolated one-per-pack and flagged.
    "q234_pack_harmonic" -> ((s, dir) =>
      packed(s, dir).select("doc_id", "lang", "n_tokens", "fclass",
        "pack_key", "is_overflow")),

    // ... and the MEASURED packing quality per lang: packs used vs
    // the ceil(total/L) lower bound and realized fill (ppm, exact
    // integer) — the waste a training-batch builder actually pays.
    "q235_pack_stats" -> ((s, dir) =>
      Packing.packStats(packed(s, dir), "n_tokens", Budget, Seq("lang")))
  )

  // ---------------------------------------------------------------
  // oracles
  // ---------------------------------------------------------------

  private val packCtes =
    s"""tok AS (SELECT doc_id, lang,
           len(regexp_extract_all(text, '([a-z0-9]+)', 1))::BIGINT AS n_tokens
         FROM documents),
       t AS (SELECT * FROM tok WHERE n_tokens > 0),
       c AS (SELECT *, ($Budget // n_tokens)::BIGINT AS fclass FROM t),
       r AS (SELECT *, row_number() OVER (
           PARTITION BY lang, fclass ORDER BY doc_id ASC) AS rn FROM c),
       p AS (SELECT doc_id, lang, n_tokens, fclass,
           length(lang)::VARCHAR || ':' || lang || '-' || fclass::VARCHAR
             || '-' || ((rn - 1) // greatest(fclass, 1))::VARCHAR AS pack_key,
           n_tokens > $Budget AS is_overflow
         FROM r)"""

  override val oracles: Map[String, String] = Map(

    "q234_pack_harmonic" ->
      s"""WITH $packCtes
         SELECT doc_id, lang, n_tokens, fclass, pack_key, is_overflow FROM p""",

    "q235_pack_stats" ->
      s"""WITH $packCtes,
         pk AS (SELECT lang, pack_key, sum(n_tokens)::BIGINT AS pack_tokens
           FROM p WHERE NOT is_overflow GROUP BY 1, 2)
         SELECT lang, count(*)::BIGINT AS n_packs,
           sum(pack_tokens)::BIGINT AS total_tokens,
           max(pack_tokens)::BIGINT AS max_pack_tokens,
           ((sum(pack_tokens) + ${Budget - 1}) // $Budget)::BIGINT AS lower_bound,
           ((sum(pack_tokens) * 1000000) // (count(*) * $Budget))::BIGINT AS fill_ppm
         FROM pk GROUP BY 1"""
  )
}
