package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Hand-computed trajectories for the two round-6 trainers. The
  * cross-engine gate (q198/q199) verifies them against the unrolled
  * DuckDB oracles at sf scale; these specs pin the semantics on
  * inputs small enough to verify by hand. */
class LearnSpec extends SparkSpec {

  test("perceptron: separable 1-D data converges and trajectory is exact") {
    val feats = df("x BIGINT, y INT", Seq(
      Row(1L, 1), Row(3L, 1), Row(-2L, -1)))
    val out = Perceptron.fit(feats, Seq("x"), "y", rounds = 4)
      .orderBy("round").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // round 1: w=(0,0) -> every margin 0 -> all 3 misclassified;
    // update = (sum y, sum y*x) = (1, 6). Rounds 2-4: zero error,
    // weights frozen.
    assert(out === Seq((1L, 3L, 1L, 6L), (2L, 0L, 1L, 6L),
      (3L, 0L, 1L, 6L), (4L, 0L, 1L, 6L)))
  }

  test("perceptron: boundary rows (margin exactly 0) count as misclassified") {
    // single point at the origin of feature space never classifies:
    // margin is w_bias * y; with y=-1 the bias walks negative until
    // the margin is positive
    val feats = df("x BIGINT, y INT", Seq(Row(0L, -1)))
    val out = Perceptron.fit(feats, Seq("x"), "y", rounds = 3)
      .orderBy("round").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // r1: w=0, margin 0 -> mis, bias -> -1; r2: margin=(-1)(-1)=1 ok
    assert(out === Seq((1L, 1L, -1L), (2L, 0L, -1L), (3L, 0L, -1L)))
  }

  test("bpe: learns the classic hug/pug/un/bun merge sequence") {
    val words = df("word STRING, freq BIGINT", Seq(
      Row("hug", 5L), Row("pug", 2L), Row("un", 6L), Row("bun", 4L)))
    val out = BpeTrain.fit(words, rounds = 4)
      .orderBy("round").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out === Seq((1L, "u", "n", 10L), (2L, "u", "g", 7L),
      (3L, "h", "ug", 5L), (4L, "b", "un", 4L)))
  }

  test("bpe: empty-string and single-symbol words contribute no pairs " +
    "instead of erroring") {
    // fit is public and takes ANY (word, freq) table (ADVICE r6): an
    // empty word has zero symbols — the pair slice must read as "no
    // adjacent pairs", not a negative-length runtime error
    val words = df("word STRING, freq BIGINT", Seq(
      Row("", 9L), Row("x", 9L), Row("un", 6L)))
    val out = BpeTrain.fit(words, rounds = 3)
      .orderBy("round").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // only "un" holds a pair; the trajectory ends after absorbing it
    assert(out === Seq((1L, "u", "n", 6L)))
  }

  test("bpe: identical-symbol runs count overlapping pairs but merge greedily") {
    // "aaaa": round 1 counts (a,a)=3 (overlapping zip), merges to
    // [aa, aa] (greedy non-overlap); round 2 merges (aa,aa)=1.
    val words = df("word STRING, freq BIGINT", Seq(Row("aaaa", 1L)))
    val out = BpeTrain.fit(words, rounds = 2)
      .orderBy("round").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out === Seq((1L, "a", "a", 3L), (2L, "aa", "aa", 1L)))
  }

  test("bpe applyMerge: greedy left-to-right non-overlap on odd runs") {
    val d = df("word STRING", Seq(Row("aaa"), Row("aabaa"), Row("ba")))
      .select(filter(split(col("word"), ""), s => length(s) > 0).as("syms"))
      .select(BpeTrain.applyMerge(col("syms"), "a", "a").as("m"))
    val got = d.collect().toSeq.map(_.getSeq[String](0).toList)
    assert(got === Seq(List("aa", "a"), List("aa", "b", "aa"), List("b", "a")))
  }
}
