package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Document chunking and budget truncation for training/RAG corpora:
  * fixed-size token windows with overlap, and greedy whole-token
  * truncation to a character budget. Pure codegen'd Column
  * combinators over the token array — no UDFs, no shuffle beyond the
  * generator's own explode, so both scale as a narrow map at 100 TB.
  */
object Chunking {

  /** (id, chunk_no, n_chunk_tokens, chunk_text): sliding token
    * windows of `chunkSize` with `overlap` tokens shared between
    * consecutive chunks (stride = chunkSize - overlap). Chunk starts
    * are 0, stride, 2*stride, ... while start <= n - overlap - 1
    * (so a final window shorter than the overlap is not emitted as
    * its own chunk — it is already covered by the previous one).
    * Documents with zero tokens produce no chunks.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize,
      "Chunking.chunk: need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    df.select(col(idCol), Text.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol), col("toks"),
        posexplode(sequence(lit(0),
          greatest(size(col("toks")) - overlap - 1, lit(0)),
          lit(stride))).as(Seq("chunk_no", "start")))
      .select(col(idCol), col("chunk_no"),
        size(slice(col("toks"), col("start") + 1, lit(chunkSize))).as("n_chunk_tokens"),
        concat_ws(" ", slice(col("toks"), col("start") + 1, lit(chunkSize))).as("chunk_text"))
  }

  /** Greedy whole-token prefix under a character budget (tokens
    * joined by single spaces): the number of leading tokens whose
    * joined length stays <= budget. A fold over token LENGTHS with
    * the accumulator packing (joined_len, n_kept) as
    * len * 1e6 + n; once the budget is exceeded the length is
    * poisoned to budget+1 so no later (shorter) token can sneak in —
    * prefix semantics, not knapsack. Exact integer arithmetic, same
    * fold order as DuckDB's list_reduce.
    */
  def keptTokens(toks: Column, budget: Int): Column = {
    val enc = 1000000L
    // packing bound (review): n_kept rides the low enc-digits, and
    // since every kept token adds >= 2 chars (itself + separator)
    // past the first, n_kept <= (budget+1)/2 — requiring budget below
    // 2*enc-1 guarantees the count can never carry into the length
    // field (which would silently corrupt n_kept). Winnow guards its
    // 23-bit packing the same way.
    require(budget > 0 && budget.toLong < 2 * enc - 1,
      s"Chunking.keptTokens: budget must be in (0, ${2 * enc - 2}] — " +
        "the (len, n) accumulator packs the kept count into the low " +
        s"$enc digits")
    val folded = aggregate(
      transform(toks, t => length(t).cast("long")),
      lit(0L),
      (acc, tokLen) => {
        val curLen = floor(acc / enc).cast("long")
        val n = pmod(acc, lit(enc))
        val newLen = curLen + tokLen + when(n > 0, 1L).otherwise(0L)
        when(newLen <= budget, newLen * enc + n + 1L)
          .otherwise(lit(budget + 1L) * enc + n)
      })
    pmod(folded, lit(enc)).cast("int")
  }

  /** (id, n_tokens, n_kept, kept_chars, truncated, text_trunc):
    * truncate each document to the `budget`-char greedy token prefix.
    */
  def truncateToCharBudget(df: DataFrame, idCol: String, textCol: String,
                           budget: Int): DataFrame = {
    val kept = keptTokens(col("toks"), budget)
    df.select(col(idCol), Text.tokens(col(textCol)).as("toks"))
      .select(col(idCol), col("toks"), kept.as("n_kept"))
      .select(col(idCol),
        size(col("toks")).as("n_tokens"),
        col("n_kept"),
        (aggregate(transform(slice(col("toks"), lit(1), col("n_kept")),
            t => length(t).cast("long")), lit(0L), (a, x) => a + x)
          + greatest(col("n_kept") - 1, lit(0)).cast("long")).as("kept_chars"),
        (col("n_kept") < size(col("toks"))).as("truncated"),
        concat_ws(" ", slice(col("toks"), lit(1), col("n_kept"))).as("text_trunc"))
  }
}
