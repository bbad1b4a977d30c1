package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** WINNOWING (Schleimer/Wilkerson/Aiken, the MOSS fingerprinter):
  * instead of keeping every k-gram hash (the inverted-index path) or
  * a fixed random sample (MinHash), keep the MINIMUM hash of every
  * sliding window of `w` consecutive k-grams. The selection is
  * locally determined by content, which buys the guarantee neither
  * alternative has: any match of length >= w + k - 1 tokens shares
  * at least one SELECTED fingerprint, while expected density stays
  * ~2/w of the grams. That is the tool for plagiarism-style partial
  * overlap at 100 TB — the fingerprint index is a w-th of the full
  * inverted index, with detection still guaranteed above the length
  * floor.
  *
  * Determinism: the frame-min runs over (h << 23) + pos packed longs
  * (40-bit md5 hash, 23-bit position), so "which gram wins a tied
  * window" is decided by the packing, identically in any engine —
  * no arg_min tie ambiguity. The packing is overflow-proof by
  * construction: (2^40-1)*2^23 + pos < 2^63. Documents beyond 2^23
  * (~8.4M) grams have their tail grams dropped from fingerprinting
  * (a guard filter, loud in the code) — at that length the doc is
  * concatenation junk a length gate should have caught upstream.
  */
object Winnow {

  /** Selected fingerprints per doc: (id, h, pos), one row per
    * DISTINCT selected (hash, position). Docs with fewer than
    * n + w - 1 tokens (no full window) contribute nothing. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, w: Int): DataFrame =
    // STEP-WISE selects: the tokens regex lands in its own projection
    // (inside tokenTable) so CollapseProject keeps it
    // single-evaluation — inlined into the shingle lambda it would
    // re-run per element_at reference (the elementHashes rule)
    fingerprintsFromTokens(
      Dedup.tokenTable(docs, idCol, textCol), n, w)

  /** Fingerprints over an already-built (id, toks) token table (one
    * materialized tokenize pass feeds every lexical family — the
    * q193 scorecard discipline). */
  def fingerprintsFromTokens(tok: DataFrame, n: Int, w: Int): DataFrame = {
    val grams = tok
      .select(col("id"),
        posexplode(Text.shinglesWithDuplicates(col("toks"), n)))
      .select(col("id"), (col("pos") + 1).as("pos"),
        Text.md5Long(col("col"), 10).as("h"))
      // position guard: the 23-bit pos field caps addressable grams;
      // beyond it the packing would corrupt (see object doc)
      .filter(col("pos") < (1L << 23))
      .withColumn("packed", shiftleft(col("h"), 23) + col("pos"))
    val frame = Window.partitionBy("id").orderBy(col("pos"))
      .rowsBetween(-(w - 1), 0)
    grams
      .withColumn("sel", min(col("packed")).over(frame))
      // first w-1 frames are partial windows — winnowing starts at w
      .filter(col("pos") >= w)
      // unpack with BIT ops: packed reaches 2^63, where a double
      // division would round — shiftright/AND stay exact
      .select(col("id"), shiftright(col("sel"), 23).as("h"),
        col("sel").bitwiseAND(lit((1L << 23) - 1)).as("pos"))
      .distinct()
  }

  /** Per-doc fingerprint profile with the density bounds pinned:
    * the guarantee gives >= 1 selection per w consecutive windows
    * (lb_ok) and at most one per window (ub_ok); expectation ~2m/w. */
  def profile(fps: DataFrame, docs: DataFrame, idCol: String,
              textCol: String, n: Int, w: Int): DataFrame = {
    val m = docs
      .select(col(idCol).as("id"), col(textCol).as("doc_text"))
      // spread the CPU-bound re-tokenize off the single input split
      .transform(Spread.byKey("id"))
      // gram COUNT is arithmetic on the token count — never build
      // the gram array here, and keep the regex single-evaluation
      // (own projection, the CollapseProject rule above)
      .select(col("id"), size(Text.tokens(col("doc_text"))).as("n_toks"))
      .select(col("id"),
        // capped at the fingerprint position guard (review): the
        // selector only addresses grams at pos < 2^23, so a longer
        // doc's bounds must be computed against the ADDRESSABLE gram
        // count — uncapped, lb_ok would falsely fail for ~8.4M+ gram
        // docs even though the operator behaved exactly as designed
        least(when(col("n_toks") >= n, col("n_toks") - (n - 1)).otherwise(0)
          .cast("long"), lit((1L << 23) - 1)).as("n_grams"))
      .filter(col("n_grams") >= w)
    m.join(fps.groupBy("id").agg(count(lit(1)).as("n_fp")), "id")
      .select(col("id"), col("n_grams"), col("n_fp"),
        (col("n_fp") * w >= col("n_grams") - w + 1).as("lb_ok"),
        (col("n_fp") <= col("n_grams") - w + 1).as("ub_ok"))
  }

  /** Cross-doc pairs sharing >= minShared selected fingerprints —
    * partial-overlap candidates off the winnowed (1/w-sized) index.
    * Same inverted-index + hot-key-guard discipline as the shingle
    * pair ops (a fingerprint selected in > maxDf docs is boilerplate
    * for pair purposes). */
  def sharedPairs(fps: DataFrame, minShared: Int,
                  maxDf: Int = 100): DataFrame = {
    val byHash = Dedup.DefaultMaterialize(
      fps.select(col("id"), col("h")).distinct())
    val hot = byHash.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("h")
    // materialized: feeds both sides of the pair self-join (the
    // multi-consumer rule)
    val filtered = Dedup.DefaultMaterialize(
      byHash.join(broadcast(hot), Seq("h"), "left_anti"))
    filtered.as("a").join(filtered.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
