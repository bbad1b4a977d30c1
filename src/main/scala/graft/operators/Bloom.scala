package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Broadcast bloom-filter pre-filter for semi joins whose key set is
  * too large to broadcast raw but whose MEMBERSHIP fits in a few KB —
  * the hand-rolled version of Spark's runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.*`), kept relational so
  * the plan shows exactly what ships where:
  *
  *   - `bitmap` folds the key set into an m=65536-bit array<long>
  *     (1024 words, 8 KB) with two 16-bit hashes drawn from DISJOINT
  *     hex windows of one md5 digest — one digest evaluation per key,
  *     two independent probes.
  *   - `prefilter` crossJoins the 1-row bitmap (broadcast; the only
  *     tuple that moves) and keeps rows whose BOTH bits are set — a
  *     pure map-side filter with zero shuffle, so only candidate rows
  *     (true members + ~(n/m)^2 false positives) reach the exact
  *     semi join that follows.
  *
  * The filter never drops a true member (each member's bits are set
  * by construction), so `prefilter` + exact semi join ≡ exact semi
  * join — the oracle for any query built on it is the plain join.
  * At 100 TB this is the difference between shuffling the full fact
  * table into the join and shuffling the ~selectivity fraction that
  * can possibly match.
  */
object Bloom {

  /** Bits in the filter (2^16: each 16-bit hash IS a position). */
  val M = 65536
  private val Words = M / 64

  private def h1(key: Column) = Text.md5LongAt(key.cast("string"), 1, 4)
  private def h2(key: Column) = Text.md5LongAt(key.cast("string"), 5, 4)

  /** 1-row DataFrame with column `words`: array<long> of length 1024,
    * bit p set iff some key hashes to position p. Dense (zeros
    * included) so probes index words directly. */
  def bitmap(keys: DataFrame, key: Column): DataFrame = {
    // NULL keys are dropped (review): md5(null) is null, and a null
    // position would reach map_from_entries as a null map key — a
    // runtime crash. Semantically free: a null key can never match
    // the exact semi join this filter fronts (equi-join null
    // semantics), and prefilter's probe expression already evaluates
    // null -> filtered for null probe keys.
    val pos = keys.filter(key.isNotNull)
      .select(explode(array(h1(key), h2(key))).as("pos")).distinct()
    val words = pos
      .groupBy(shiftright(col("pos"), 6).as("bucket"))
      .agg(expr("bit_or(shiftleft(1L, cast(pos & 63 as int)))").as("word"))
    words
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("word"))))
        .as("kv"))
      .select(transform(sequence(lit(0L), lit(Words - 1L)),
        b => coalesce(element_at(col("kv"), b), lit(0L))).as("words"))
  }

  /** Map-side candidate filter: keep rows of `df` whose key MIGHT be
    * in the set `bm` summarizes (both bloom bits set). No shuffle; the
    * broadcast is the 8 KB bitmap row. Follow with an exact semi join
    * to remove false positives. Working columns are __bloom_-reserved
    * so a caller's own `words` column survives the round trip. */
  def prefilter(df: DataFrame, key: Column, bm: DataFrame): DataFrame = {
    val test = "(element_at(__bloom_words, cast((%s div 64) as int) + 1) & " +
      "shiftleft(1L, cast(%s %% 64 as int))) <> 0"
    df.crossJoin(broadcast(bm.select(col("words").as("__bloom_words"))))
      .withColumn("__bloom_h1", h1(key))
      .withColumn("__bloom_h2", h2(key))
      .filter(expr(test.format("__bloom_h1", "__bloom_h1")) &&
        expr(test.format("__bloom_h2", "__bloom_h2")))
      .drop("__bloom_h1", "__bloom_h2", "__bloom_words")
  }
}
