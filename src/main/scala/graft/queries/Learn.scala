package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryGroup, Tables}
import graft.functions.Text
import graft.operators.{BpeTrain, Perceptron}

/** Round-6 trainable-model queries: the two iterative fitters a
  * curation pipeline runs ON the corpus (as opposed to the fixed
  * scoring rules it runs OVER the corpus) — a batch-perceptron
  * quality classifier and BPE merge learning. Both follow the q151
  * Lloyd discipline: driver-side state bounded by contract, one
  * distributed aggregation per round, and a DuckDB oracle that
  * UNROLLS the same rounds in exact integer arithmetic so the whole
  * trajectory (not just the final state) is machine-verified.
  */
object Learn extends QueryGroup {

  private val Rounds = 4 // perceptron + BPE fit rounds both oracles unroll

  /** Integer quality features shared by the Spark plan and the
    * oracle: token count, stopword count ('a'/'the' — the corpus's
    * function words), long-token count (len >= 6), s-prefix count.
    * The label is a linear rule of the same features, so the data is
    * (near-)separable and the error trajectory is meaningful. */
  private def features(docs: DataFrame): DataFrame = {
    val toks = Text.tokens(col("text"))
    docs.select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n_toks"),
        size(filter(col("toks"), t => t === "a" || t === "the")).as("n_stop"),
        size(filter(col("toks"), t => length(t) >= 6)).as("n_long"),
        size(filter(col("toks"), t => t.startsWith("s"))).as("n_s"))
      .withColumn("y",
        when(lit(5) * col("n_stop") + lit(2) * col("n_long") >= col("n_toks"), 1)
          .otherwise(-1))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Batch-perceptron quality-classifier fit: Rounds rounds, one
    // row each — misclassified count under the incoming weights and
    // the integer weight vector after the round's update. The whole
    // trajectory is the output, so the oracle certifies every round,
    // not just the fixpoint.
    "q198_perceptron_fit" -> ((s, dir) => {
      Perceptron.fit(features(Tables.documents(s, dir)),
        Seq("n_toks", "n_stop", "n_long", "n_s"), "y", Rounds)
    }),

    // BPE merge learning over the corpus word-frequency table:
    // Rounds merges, one row each — the learned pair and its
    // weighted adjacent-pair count at selection time.
    "q199_bpe_train" -> ((s, dir) => {
      BpeTrain.fit(BpeTrain.wordFreq(Tables.documents(s, dir), "text"), Rounds)
        .select(col("round"), col("left").as("merge_l"),
          col("right").as("merge_r"), col("cnt"))
    })
  )

  // ---------------------------------------------------------------
  // oracles
  // ---------------------------------------------------------------

  private val dToks = "regexp_extract_all(text, '([a-z0-9]+)', 1)"

  /** q198 oracle: feature CTE + Rounds unrolled perceptron rounds.
    * Weight CTEs are single rows; each round's update CTE computes
    * the misclassified count and the integer deltas in one
    * aggregation over f x w_{i-1} — mirroring Perceptron.fit's one
    * job per round. HUGEINT sums are narrowed ::BIGINT (the group
    * determinism rule). */
  private lazy val perceptronSql: String = {
    val margin = "y * (wb + wt * n_toks + ws * n_stop + wl * n_long + wp * n_s)"
    val rounds = (1 to Rounds).map { i =>
      s"""u$i AS (SELECT
           count(*) FILTER (WHERE $margin <= 0)::BIGINT AS n_mis,
           coalesce(sum(CASE WHEN $margin <= 0 THEN y END), 0)::BIGINT AS db,
           coalesce(sum(CASE WHEN $margin <= 0 THEN y * n_toks END), 0)::BIGINT AS dt,
           coalesce(sum(CASE WHEN $margin <= 0 THEN y * n_stop END), 0)::BIGINT AS ds,
           coalesce(sum(CASE WHEN $margin <= 0 THEN y * n_long END), 0)::BIGINT AS dl,
           coalesce(sum(CASE WHEN $margin <= 0 THEN y * n_s END), 0)::BIGINT AS dp
         FROM f CROSS JOIN w${i - 1}),
       w$i AS (SELECT wb + db AS wb, wt + dt AS wt, ws + ds AS ws,
           wl + dl AS wl, wp + dp AS wp
         FROM w${i - 1} CROSS JOIN u$i)"""
    }.mkString(",\n       ")
    val out = (1 to Rounds).map { i =>
      s"""SELECT $i::BIGINT AS round, n_mis, wb AS w_bias, wt AS w_n_toks,
           ws AS w_n_stop, wl AS w_n_long, wp AS w_n_s
         FROM u$i CROSS JOIN w$i"""
    }.mkString("\n       UNION ALL ")
    s"""WITH tk AS (SELECT doc_id, $dToks AS toks FROM documents),
       f AS (SELECT doc_id,
           len(toks)::BIGINT AS n_toks,
           len(list_filter(toks, t -> t = 'a' OR t = 'the'))::BIGINT AS n_stop,
           len(list_filter(toks, t -> len(t) >= 6))::BIGINT AS n_long,
           len(list_filter(toks, t -> t LIKE 's%'))::BIGINT AS n_s,
           CASE WHEN 5 * len(list_filter(toks, t -> t = 'a' OR t = 'the'))
                     + 2 * len(list_filter(toks, t -> len(t) >= 6))
                    >= len(toks) THEN 1 ELSE -1 END AS y
         FROM tk),
       w0 AS (SELECT 0::BIGINT AS wb, 0::BIGINT AS wt, 0::BIGINT AS ws,
           0::BIGINT AS wl, 0::BIGINT AS wp),
       $rounds
       $out"""
  }

  /** q199 oracle: word-frequency CTE, char-exploded symbol table,
    * then Rounds unrolled merge rounds. Pair counts use the
    * overlapping-zip convention (lead over pos); the merge applies
    * greedily left-to-right non-overlapping, encoded positionally:
    * candidate positions (sym=l, next=r), runs of consecutive
    * candidates found gaps-and-islands style (only possible when
    * l = r), odd ranks within a run selected — exactly the fold
    * semantics of BpeTrain.applyMerge. Selected positions take the
    * merged symbol; the consumed right-half positions drop; the
    * surviving symbols are then RENUMBERED dense per word (without
    * this, chained merges break: the round-2 "next symbol" of a
    * round-1 merge site sits at pos+2 in raw positions, so the
    * pos+1 dead-join would silently keep the consumed half and the
    * run-grouping would treat overlapping candidates as separate
    * runs — found by review, fixed by the renumber). */
  private lazy val bpeSql: String = {
    def round(i: Int): String = {
      val prev = s"s${i - 1}"
      s"""p$i AS (SELECT l, r, sum(freq)::BIGINT AS cnt FROM (
           SELECT word, freq, sym AS l,
             lead(sym) OVER (PARTITION BY word ORDER BY pos) AS r
           FROM $prev) WHERE r IS NOT NULL GROUP BY l, r),
       best$i AS (SELECT l, r, cnt FROM p$i
         ORDER BY cnt DESC, l, r LIMIT 1),
       cand$i AS (SELECT t.word, t.pos FROM (
           SELECT word, pos, sym,
             lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
           FROM $prev) t CROSS JOIN best$i b
         WHERE t.sym = b.l AND t.nxt = b.r),
       sel$i AS (SELECT word, pos FROM (
           SELECT word, pos, row_number() OVER (PARTITION BY word, grp ORDER BY pos) AS rn
           FROM (SELECT word, pos,
               pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp
             FROM cand$i))
         WHERE rn % 2 = 1),
       s$i AS (SELECT word, freq,
           row_number() OVER (PARTITION BY word ORDER BY pos) AS pos, sym
         FROM (SELECT t.word, t.freq, t.pos,
             CASE WHEN sel.pos IS NOT NULL THEN b.l || b.r ELSE t.sym END AS sym
           FROM $prev t CROSS JOIN best$i b
           LEFT JOIN sel$i sel ON t.word = sel.word AND t.pos = sel.pos
           LEFT JOIN sel$i dead ON t.word = dead.word AND t.pos = dead.pos + 1
           WHERE dead.pos IS NULL))"""
    }
    val out = (1 to Rounds).map { i =>
      s"SELECT $i::BIGINT AS round, l AS merge_l, r AS merge_r, cnt FROM best$i"
    }.mkString("\n       UNION ALL ")
    s"""WITH w AS (SELECT word, count(*)::BIGINT AS freq FROM (
           SELECT unnest($dToks) AS word FROM documents) GROUP BY word),
       s0 AS (SELECT word, freq, i AS pos, substr(word, i, 1) AS sym FROM (
           SELECT word, freq, unnest(generate_series(1, len(word))) AS i FROM w)),
       ${(1 to Rounds).map(round).mkString(",\n       ")}
       $out"""
  }

  override val oracles: Map[String, String] = Map(
    "q198_perceptron_fit" -> perceptronSql,
    "q199_bpe_train" -> bpeSql
  )
}
