package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Whole-document sequence packing: assign each document to a pack
  * of token budget L with NO doc ever split across packs — the
  * batch-construction shape for training runs where documents must
  * not cross sequence boundaries (SFT, contrastive pairs), the
  * complement of q81's concat-and-split packing.
  *
  * Online first-fit is inherently sequential (pack state carries
  * across every row), so the distributed scheme is HARMONIC CLASS
  * packing (Lee & Lee, JACM 1985): class f = floor(L / n_tokens)
  * groups docs by how many of them fit a pack; within a class,
  * consecutive runs of f docs (deterministic doc_id order) share a
  * pack. Docs in class f have n in (L/(f+1), L/f], so f of them sum
  * to <= L — every pack is feasible BY CONSTRUCTION, no pack state
  * ever crosses rows, and the whole assignment is one window rank
  * per partition key. Waste is the harmonic bound (<= 1.691x optimal
  * asymptotically); the stats entry MEASURES the realized fill
  * instead of assuming it.
  *
  * Scale shape (100 TB): one shuffle on (partition keys, class) for
  * the rank window — no global window, no driver loop, no pack-state
  * recursion. Class cardinality is <= L values, so window partitions
  * stay balanced wherever doc lengths are not pathological; the
  * partitionCols (e.g. lang) further split them.
  *
  * Oversized docs (n > L, class 0) cannot fit any pack: they are
  * assigned one-per-pack and flagged `is_overflow` — truncation is a
  * separate, explicit decision (Chunking.truncateToCharBudget), not
  * a silent side effect of packing.
  */
object Packing {

  /** A partition-key segment rendered collision-proof for pack_key:
    * "<length>:<value>", or the bare marker "n" for NULL. The joiner
    * below is '-', which a caller's partition value (BCP-47 "pt-br",
    * arbitrary partitionCols) may legitimately contain — without the
    * length prefix, ("pt-br", 1) and ("pt", "br-1"-shaped neighbors)
    * could concatenate to the same key and silently merge two packs,
    * breaking the feasibility-by-construction guarantee for any
    * consumer grouping by pack_key alone. The length prefix makes
    * every non-null segment self-delimiting; fclass and bin are
    * non-negative integers and need none. NULL gets its own marker
    * (ADVICE r12): a null segment would otherwise render NULL and be
    * silently DROPPED by concat_ws, so (NULL, "a") and ("a", NULL)
    * collapsed to one key. "n" cannot collide with any non-null
    * segment (those all start with a digit; the empty string renders
    * "0:"), so null keeps its own packs. */
  private[graft] def keySeg(c: Column): Column =
    when(c.isNull, lit("n"))
      .otherwise(concat(length(c).cast("string"), lit(":"), c))

  /** Per-doc pack assignment. Input must carry `idCol` and a
    * positive-integer token count `nCol`; rows with n <= 0 are
    * dropped (nothing to pack). Output adds:
    *   fclass   — floor(L / n) (0 = oversized),
    *   pack_key — "<len:partitionCol>…-<fclass>-<bin>" (globally
    *              unique, deterministic; partition segments are
    *              length-prefixed — see keySeg),
    *   is_overflow — n > L.
    */
  def harmonicPack(df: DataFrame, idCol: String, nCol: String,
                   budget: Int, partitionCols: Seq[String]): DataFrame = {
    require(budget > 0, "Packing.harmonicPack: budget must be positive")
    val f = expr(s"CAST($budget AS BIGINT) div $nCol")
    val w = Window
      .partitionBy((partitionCols :+ "fclass").map(col): _*)
      .orderBy(col(idCol).asc)
    df.filter(col(nCol) > 0)
      .withColumn("fclass", f)
      .withColumn("rn", row_number().over(w).cast("long"))
      // class 0 (oversized): one doc per pack
      .withColumn("perpack", greatest(col("fclass"), lit(1L)))
      .withColumn("bin", expr("(rn - 1) div perpack"))
      .withColumn("pack_key",
        concat_ws("-", (partitionCols.map(c => keySeg(col(c)))
          :+ col("fclass") :+ col("bin")): _*))
      .withColumn("is_overflow", col(nCol) > budget)
      .drop("rn", "perpack", "bin")
  }

  /** Per-partition-key packing quality: pack count vs the
    * ceil(total/L) lower bound, and realized fill of the feasible
    * (non-overflow) packs in parts-per-million — exact integers
    * throughout. */
  def packStats(packed: DataFrame, nCol: String, budget: Int,
                partitionCols: Seq[String]): DataFrame = {
    val keys = partitionCols.map(col)
    val feasible = packed.filter(!col("is_overflow"))
    val packs = feasible
      .groupBy((keys :+ col("pack_key")): _*)
      .agg(sum(col(nCol)).as("pack_tokens"))
    packs.groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n_packs"),
        sum(col("pack_tokens")).as("total_tokens"),
        max(col("pack_tokens")).as("max_pack_tokens"))
      .withColumn("lower_bound",
        expr(s"(total_tokens + ${budget - 1}) div $budget"))
      .withColumn("fill_ppm",
        expr(s"(total_tokens * 1000000) div (n_packs * $budget)"))
  }
}
