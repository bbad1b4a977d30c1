package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase ("salted") aggregation. A hot grouping
  * key that would pin one reducer gets split across `nSalts`
  * sub-groups in phase 1 (each a partial aggregate, map-side
  * combinable), then phase 2 merges the per-salt partials — the hot
  * key's work is spread over nSalts reducers instead of one.
  *
  * The salt must be DETERMINISTIC (derived from row content, not
  * rand()) so results are reproducible and retries are safe.
  *
  * Decimal-typed sums keep the result independent of the extra
  * aggregation layer (double sums would re-associate).
  */
object Salt {

  /** Skew-safe equi-join: the big (skewed) side gets a deterministic
    * salt in [0, nSalts); the small side is replicated once per salt
    * value, so a hot key's rows spread over nSalts reducers instead
    * of one. Result set is IDENTICAL to the plain equi-join.
    * (With AQE skew-join handling this is often automatic; explicit
    * salting still wins when one key dominates a partition entirely.)
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                     salt: Column, nSalts: Int): DataFrame = {
    // coalesce: a NULL salt expression would make _salt NULL, match
    // no replicated small-side row, and silently drop the big-side
    // row — breaking the identical-to-plain-join contract.
    val b = big.withColumn("_salt",
      coalesce(pmod(salt, lit(nSalts)), lit(0)).cast("int"))
    val s = small.withColumn("_salt", explode(sequence(lit(0), lit(nSalts - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    b.join(s, keys :+ "_salt").drop("_salt")
  }

  /** Per-key sum + count with an intermediate salt layer.
    * `salt` should spread rows of a key across [0, nSalts). */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     salt: Column, nSalts: Int): DataFrame = {
    val keyed = df.withColumn("_salt", coalesce(pmod(salt, lit(nSalts)), lit(0)))
    val phase1 = keyed
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      // decimal(28,4): same scale (values unchanged), but headroom to
      // ~10^24 — (18,4) would turn a >=1e14 value into NULL (non-ANSI
      // cast) and silently drop it from the sum.
      .agg(sum(col(valueCol).cast("decimal(28,4)")).as("_psum"),
        count(lit(1)).as("_pcnt"))
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_psum")).as("salted_sum"),
        sum(col("_pcnt")).as("n_rows"))
  }
}
