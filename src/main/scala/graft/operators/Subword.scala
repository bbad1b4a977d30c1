package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** GREEDY LONGEST-MATCH subword tokenizer (the WordPiece/unigram
  * serving shape): encode every word as the greedy sequence of
  * longest vocabulary prefixes, falling back to single characters
  * (negative codepoint ids) where no vocabulary term matches — the
  * step every token-budget, packing and fertility statistic should
  * run on REAL token ids instead of word-count proxies.
  *
  * Scale design (reference: dan-verheul/banksy has no tokenizer; this
  * is the training-data-pipeline extension surface):
  *  - the corpus NEVER tokenizes per occurrence: distinct words
  *    encode once (Heaps' law: vocabulary grows ~sqrt of corpus), and
  *    occurrences pick up their encoding through one hash join;
  *  - the per-word encode is relational, not a UDF: a JUMP TABLE
  *    (word, pos) -> (step, token_id) computed by pure equi-joins —
  *    positions explode by the vocabulary's distinct term LENGTHS
  *    (bounded driver-side list), substring keys hash-join the
  *    broadcast vocabulary, argmax-by-length picks the greedy step;
  *  - the sequential part of greedy matching (position chasing) is a
  *    driver loop of cheap equi-joins on the jump table, one round
  *    per emitted subword, rounds <= max word length. The DuckDB
  *    oracle replicates it as a recursive CTE over the same jump
  *    table — no fixed unroll, any word length.
  */
object Subword {

  /** Subword vocabulary: top-k corpus terms by (df DESC, tf DESC,
    * term) — q84's build — with token_id = rank 1..k. The window runs
    * over the k survivors of TakeOrderedAndProject, bounded by
    * contract (never the unbounded term table). */
  def vocabulary(df: DataFrame, idCol: String, textCol: String,
                 k: Int): DataFrame = {
    val top = df.select(col(idCol).as("id"),
        explode(Text.tokens(col(textCol))).as("term"))
      .groupBy("term")
      .agg(countDistinct(col("id")).as("df"), count(lit(1)).as("tf"))
      .orderBy(col("df").desc, col("tf").desc, col("term"))
      .limit(k)
    top.withColumn("token_id", row_number()
        .over(Window.orderBy(col("df").desc, col("tf").desc, col("term")))
        .cast("long"))
      .select("term", "token_id")
  }

  /** Per-position longest-match jump table over DISTINCT words:
    * (word, pos 1-based) -> (step, tid). Vocabulary match: tid > 0,
    * step = term length; fallback: step 1, tid = -codepoint of the
    * character. Two different vocab terms cannot match one (word,
    * pos) at the same length, so argmax by length is unambiguous. */
  def jumpTable(words: DataFrame, vocab: DataFrame): DataFrame = {
    // bounded collect by contract: distinct term LENGTHS (<= max
    // term length values, ~15 for any real vocab)
    val lens = vocab.select(length(col("term")).cast("int").as("l"))
      .distinct().collect().map(_.getInt(0)).sorted
    val pos = words.select(col("word"),
      explode(sequence(lit(1), length(col("word")))).as("pos"))
    val best = pos.withColumn("l", explode(array(lens.map(lit(_)): _*)))
      .filter(col("pos") + col("l") - 1 <= length(col("word")))
      .withColumn("piece", expr("substring(word, pos, l)"))
      .join(broadcast(vocab), col("piece") === col("term"))
      .groupBy("word", "pos")
      .agg(max(struct(col("l"), col("token_id"))).as("m"))
      .select(col("word"), col("pos"),
        col("m.l").as("step"), col("m.token_id").as("tid"))
    pos.join(best, Seq("word", "pos"), "left")
      .select(col("word"), col("pos"),
        coalesce(col("step"), lit(1)).as("step"),
        coalesce(col("tid"),
          -ascii(expr("substring(word, pos, 1)")).cast("long")).as("tid"))
  }

  /** Greedy encode of distinct words in LONG form: (word, spos
    * 0-based, subword_id). Path-follows the jump table from pos 1 —
    * one driver round per emitted subword position, each a keyed
    * equi-join; the active set only shrinks, and every round
    * materializes (the connected-components loop discipline). */
  def encodeWords(words: DataFrame, vocab: DataFrame): DataFrame = {
    val jumps = Dedup.DefaultMaterialize(jumpTable(words, vocab))
    var state = Dedup.DefaultMaterialize(words
      .select(col("word"), lit(1).as("pos"), lit(0L).as("spos")))
    val rounds = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var active = state.count()
    while (active > 0) {
      val step = Dedup.DefaultMaterialize(
        state.join(jumps, Seq("word", "pos"))
          .select(col("word"), col("pos"), col("spos"),
            col("step"), col("tid")))
      rounds += step.select(col("word"), col("spos"),
        col("tid").as("subword_id"))
      state = Dedup.DefaultMaterialize(
        step.select(col("word"), (col("pos") + col("step")).as("pos"),
            (col("spos") + 1L).as("spos"))
          .filter(col("pos") <= length(col("word"))))
      active = state.count()
    }
    // empty word set -> empty encoding with the right schema, never a
    // throw (the EmptyInputSpec rule — a corpus whose documents
    // tokenize to nothing is a degenerate input, not an error)
    if (rounds.isEmpty)
      words.sparkSession.createDataFrame(
        words.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "word STRING, spos BIGINT, subword_id BIGINT"))
    else rounds.reduce(_ unionByName _)
  }

  /** Corpus encode in LONG form: (id, wpos 0-based, spos, subword_id).
    * Tokenize once, encode DISTINCT words, join occurrences back. */
  def encodeCorpus(df: DataFrame, idCol: String, textCol: String,
                   vocab: DataFrame): DataFrame = {
    val toks = df.select(col(idCol).as("id"), col(textCol).as("doc_text"))
      .transform(Spread.byKey("id"))
      .select(col("id"), posexplode(Text.tokens(col("doc_text"))))
      .select(col("id"), col("pos").as("wpos"), col("col").as("word"))
    val words = Dedup.DefaultMaterialize(toks.select("word").distinct())
    val enc = encodeWords(words, vocab)
    toks.join(enc, Seq("word"))
      .select(col("id"), col("wpos"), col("spos"), col("subword_id"))
  }

  /** (word, n_subwords) per distinct word — the cheap basis for
    * corpus token-count statistics (packing, budgets, fertility):
    * counts join occurrences by word, no per-occurrence encode. */
  def wordCounts(words: DataFrame, vocab: DataFrame): DataFrame =
    encodeWords(words, vocab)
      .groupBy("word").agg(count(lit(1)).as("n_subwords"))

  /** Per-document REAL token counts (id, n_words, n_subwords):
    * occurrences join the per-distinct-word counts — docs with zero
    * words are absent (callers left-join + coalesce 0). */
  def docCounts(df: DataFrame, idCol: String, textCol: String,
                vocab: DataFrame): DataFrame = {
    val toks = df.select(col(idCol).as("id"), col(textCol).as("doc_text"))
      .transform(Spread.byKey("id"))
      .select(col("id"), explode(Text.tokens(col("doc_text"))).as("word"))
    val words = Dedup.DefaultMaterialize(toks.select("word").distinct())
    toks.join(wordCounts(words, vocab), Seq("word"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"), sum("n_subwords").as("n_subwords"))
  }
}
