package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge LEARNING (Sennrich et al., "Neural Machine Translation
  * of Rare Words with Subword Units") — the training half of the
  * subword stack whose ENCODING half is operators/Subword.scala
  * (q197). Learns the top-R merge rules over a corpus's word
  * frequency table; the learned pairs are what a production
  * tokenizer's merges.txt contains.
  *
  * Scale design (the kmeansFit / Perceptron discipline): state that
  * iterates lives driver-side and is bounded by contract — ONE
  * (left, right, count) row per round. Each round is (a) one
  * distributed pair-count aggregation over the word table — adjacent
  * pairs via slice+zip, exploded, summed with map-side combine —
  * with the argmax taken by a 1-row TakeOrderedAndProject (count
  * DESC, left, right: a total order, never a global sort), and (b) a
  * NARROW merge application: a per-row left fold over the symbol
  * array (functions.aggregate — no shuffle, no UDF). The corpus
  * enters only through the word-frequency table, which is tiny
  * relative to the corpus at any scale (vocabulary growth is
  * sublinear); the plan chains R rounds of narrow folds on top of
  * one materialized word table.
  *
  * Greedy non-overlapping merge via fold: appending symbol x to
  * accumulator `acc` merges iff last(acc) == left && x == right.
  * This IS left-to-right non-overlapping replacement: a merge
  * rewrites last(acc) to left||right, and left||right != left (both
  * symbols non-empty), so a just-merged slot can never serve as the
  * left half of an overlapping second merge within the round — the
  * "a a a" -> "(aa) a" case falls out with no flag state. Pair
  * COUNTS use the overlapping zip convention (the reference BPE
  * implementation counts `zip(word, word[1:])`), so a run of k
  * identical symbols contributes k-1 to its pair — the oracle
  * mirrors both conventions exactly.
  */
object BpeTrain {

  /** Word-frequency table of a corpus: (word, freq), one row per
    * distinct token. The only corpus-sized aggregation in the fit. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(graft.functions.Text.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Split a word into its initial symbol sequence (single chars). */
  private def charSyms(word: Column): Column =
    filter(split(word, ""), s => length(s) > 0)

  /** One greedy non-overlapping merge pass of (left, right) over a
    * symbol array — pure fold, narrow, codegen-friendly. */
  def applyMerge(syms: Column, left: String, right: String): Column =
    aggregate(
      slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
      slice(syms, 1, 1),
      (acc, x) =>
        when(element_at(acc, -1) === lit(left) && x === lit(right),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
          .otherwise(concat(acc, array(x))))

  /** Learn `rounds` merge rules from a word-frequency table.
    * Returns one row per round: (round, left, right, cnt) — the
    * merged pair and its weighted adjacent-pair count at selection
    * time. Ties break (cnt DESC, left ASC, right ASC). */
  def fit(words: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "BpeTrain.fit: rounds must be >= 1")
    val spark = words.sparkSession
    import spark.implicits._
    // R rounds of narrow folds chain on top of this one materialized
    // table; each round's count() re-executes only the fold chain
    val base = Dedup.DefaultMaterialize(
      words.select(col("word"), col("freq").cast("long").as("freq"))
        .withColumn("syms", charSyms(col("word"))))

    var cur = base
    val learned = (1 to rounds).iterator.map { r =>
      // 1-row argmax: TakeOrderedAndProject, never a global sort.
      // collect (not head) so a corpus that runs OUT of adjacent
      // pairs before `rounds` (every word fully merged or
      // single-symbol) ends the trajectory early instead of
      // throwing on an empty iterator — the EmptyInputSpec rule.
      // greatest(..., 0) guard as in applyMerge (ADVICE r6): fit is
      // public and takes ANY (word, freq) table, and an empty-string
      // word has zero symbols — slice with a negative length is a
      // runtime error, where "no adjacent pairs" is the correct
      // reading
      val pairs = cur
        .select(col("freq"), explode(arrays_zip(
          slice(col("syms"), lit(1),
            greatest(size(col("syms")) - 1, lit(0))).as("l"),
          slice(col("syms"), lit(2),
            greatest(size(col("syms")) - 1, lit(0))).as("r"))).as("p"))
        .groupBy(col("p.l").as("left"), col("p.r").as("right"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(1)
        .collect()
      pairs.headOption.map { p =>
        val (l, rr, c) = (p.getString(0), p.getString(1), p.getLong(2))
        cur = cur.withColumn("syms", applyMerge(col("syms"), l, rr))
        (r, l, rr, c)
      }
    }.takeWhile(_.isDefined).flatten.toSeq
    learned.toDF("round", "left", "right", "cnt")
      .select(col("round").cast("long"), col("left"), col("right"), col("cnt"))
  }
}
