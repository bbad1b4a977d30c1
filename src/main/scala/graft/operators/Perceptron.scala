package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BATCH-perceptron trainer — the quality-classifier
  * training loop a curation pipeline runs to replace hand-tuned
  * quality thresholds (the fastText-classifier role in CCNet-style
  * stacks) with a model fit on labeled examples.
  *
  * Scale design (the kmeansFit discipline, Similarity.scala): the
  * per-round job is ONE distributed aggregation over the feature
  * table — `sum(y * x_i)` over the misclassified rows plus their
  * count — collected as a SINGLE driver row (F+1 longs, bounded by
  * contract). Weights live driver-side and enter the next round's
  * plan as literals, so nothing iterative ever shuffles: R rounds =
  * R scans, each embarrassingly parallel, map-side-combined, and
  * whole-stage-codegen'd. At 100 TB the feature table is the only
  * big operand and it streams.
  *
  * Cross-engine determinism: features and labels are INTEGERS, the
  * update is an integer sum, and the margin test `y * (w·x) <= 0`
  * is integer arithmetic — so weights are EXACTLY reproducible in
  * any engine at any partitioning (no float summation order anywhere;
  * the oracle unrolls the same rounds in SQL, the q151 Lloyd
  * precedent). Overflow headroom: |w| after round t is bounded by
  * t * n * max|x|, far inside int64 at any tested scale; callers
  * feeding 100 TB shard the fit or scale features down.
  *
  * Batch (not per-row sequential) perceptron: every round updates on
  * ALL currently-misclassified examples at once — the variant whose
  * round is a pure aggregation (per-row perceptron is inherently
  * sequential and cannot distribute). On linearly separable labels
  * the error count drives toward zero (not monotonically — the
  * unnormalized batch step can overshoot; q198's spec pins the
  * fixed-round trajectory, the gate pins it cross-engine).
  */
object Perceptron {

  /** Fit `rounds` batch-perceptron rounds on integer features.
    * `feats` must have `xCols` (integer-valued) and `yCol` (+1/-1).
    * A bias term is implicit (constant feature 1, weight "w_bias").
    * Returns one row per round: (round, n_mis, w_bias, w_<xCol>...)
    * where n_mis is the misclassified count under the PREVIOUS
    * round's weights (so round 1 reports the error of the zero
    * vector) and the weights are AFTER the round's update. */
  def fit(feats: DataFrame, xCols: Seq[String], yCol: String,
          rounds: Int): DataFrame = {
    require(rounds >= 1, "Perceptron.fit: rounds must be >= 1")
    val spark = feats.sparkSession
    // one pass per round over this — cut the upstream plan once so R
    // actions don't recompute tokenization R times
    val f = Dedup.DefaultMaterialize(
      feats.select((yCol +: xCols).map(col): _*))
    val y = col(yCol).cast("long")
    val xs = lit(1L) +: xCols.map(c => col(c).cast("long"))

    var w: IndexedSeq[Long] = IndexedSeq.fill(xCols.size + 1)(0L)
    val out = (1 to rounds).map { r =>
      val margin = y * xs.zip(w).map { case (x, wi) => x * lit(wi) }
        .reduce(_ + _)
      // sum(y*x_i) over misclassified + count: ONE row collected
      // coalesce: sum() over ZERO input rows is NULL, and getLong on
      // a null delta would NPE — an empty feature table must yield
      // the zero-weight trajectory, not a crash (EmptyInputSpec rule)
      val aggs = count(when(margin <= 0L, 1L)).as("n_mis") +:
        xs.zipWithIndex.map { case (x, i) =>
          coalesce(sum(when(margin <= 0L, y * x).otherwise(0L)), lit(0L))
            .as(s"d$i")
        }
      val row = f.agg(aggs.head, aggs.tail: _*).head()
      val nMis = row.getLong(0)
      w = w.indices.map(i => w(i) + row.getLong(i + 1))
      Row.fromSeq(r.toLong +: nMis +: w)
    }
    val schema = StructType(
      StructField("round", LongType, nullable = false) ::
      StructField("n_mis", LongType, nullable = false) ::
      StructField("w_bias", LongType, nullable = false) ::
      xCols.map(c => StructField(s"w_$c", LongType, nullable = false)).toList)
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1), schema)
  }
}
