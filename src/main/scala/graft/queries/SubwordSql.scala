package graft.queries

/** DuckDB oracle fragments for the greedy subword tokenizer
  * (operators/Subword.scala): the SAME jump-table construction as
  * pure SQL, with the sequential position-chase as a RECURSIVE CTE —
  * no fixed unroll, so the oracle is valid for any word length.
  * Callers prepend `WITH RECURSIVE` and append their own CTEs.
  *
  * Emitted CTEs: swtok (doc_id, term), swvocab (term, token_id),
  * swwords (word), swpos, swcand, swjumps (word, pos, step, tid),
  * swenc (word, pos, spos), swtokens (word, spos, subword_id),
  * swcounts (word, n_subwords). Trailing comma included. */
private[queries] object SubwordSql {

  /** Vocabulary size shared by every subword-rebased query: small
    * enough that real decomposition happens (full-word matches AND
    * mid-word vocabulary hits AND char fallbacks all occur on the
    * test corpus), large enough to cover the head. */
  val K = 16

  def ctes(k: Int = K): String = {
    val dToks = TrainingData.dToks
    s"""swtok AS (SELECT doc_id, unnest($dToks) AS term FROM documents),
       swvocab AS (SELECT term, row_number() OVER (ORDER BY df DESC, tf DESC, term) AS token_id
         FROM (SELECT term, count(DISTINCT doc_id) AS df, count(*) AS tf
               FROM swtok GROUP BY 1
               ORDER BY df DESC, tf DESC, term LIMIT $k)),
       swwords AS (SELECT DISTINCT term AS word FROM swtok),
       swpos AS (SELECT word, unnest(generate_series(1, len(word))) AS pos FROM swwords),
       -- argmax by match length: two distinct vocab terms cannot match
       -- one (word, pos) at the SAME length, so the (len, token_id)
       -- packing decodes unambiguously
       swcand AS (SELECT p.word, p.pos,
           max(len(v.term))::BIGINT AS step,
           (max(len(v.term)::BIGINT * 1000000 + v.token_id) % 1000000)::BIGINT AS tid
         FROM swpos p JOIN swvocab v ON substr(p.word, p.pos, len(v.term)) = v.term
         GROUP BY 1, 2),
       swjumps AS (SELECT p.word, p.pos,
           coalesce(c.step, 1) AS step,
           coalesce(c.tid, -ord(substr(p.word, p.pos, 1))) AS tid
         FROM swpos p LEFT JOIN swcand c USING (word, pos)),
       swenc AS (
         SELECT word, 1 AS pos, 0::BIGINT AS spos FROM swwords
         UNION ALL
         SELECT e.word, e.pos + j.step, e.spos + 1
         FROM swenc e JOIN swjumps j ON j.word = e.word AND j.pos = e.pos
         WHERE e.pos + j.step <= len(e.word)),
       swtokens AS (SELECT e.word, e.spos, j.tid AS subword_id
         FROM swenc e JOIN swjumps j ON j.word = e.word AND j.pos = e.pos),
       swcounts AS (SELECT word, count(*) AS n_subwords FROM swtokens GROUP BY 1)"""
  }
}
