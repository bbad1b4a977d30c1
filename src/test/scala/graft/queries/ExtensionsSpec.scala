package graft.queries

import graft.SparkSpec

/** q91's raw HLL sketch value can't hash-match across engines, so the
  * query outputs a within-5%-tolerance flag the DuckDB oracle asserts
  * TRUE; this spec exercises the same contract at test scale. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("interval islands: touching intervals merge, gapped ones split") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // [1,3] and [3,5] touch (start == prev end -> same island);
    // [7,8] is gapped -> second island. Mirrors the q85 window logic.
    val iv = Seq((1, "2024-01-01", "2024-01-03"), (1, "2024-01-03", "2024-01-05"),
      (1, "2024-01-07", "2024-01-08"))
      .toDF("k", "s", "e")
      .select(col("k"), to_date(col("s")).as("start_d"), to_date(col("e")).as("end_d"))
    val ord = Seq(col("start_d"), col("end_d"))
    val wPrev = Window.partitionBy("k").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("k").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = iv
      .withColumn("prev_max", max(col("end_d")).over(wPrev))
      .withColumn("ni", when(col("prev_max").isNull || col("start_d") > col("prev_max"), 1)
        .otherwise(0))
      .withColumn("iid", sum(col("ni")).over(wRun))
      .groupBy("k", "iid")
      .agg(min("start_d").as("is"), max("end_d").as("ie"))
      .select(datediff(col("ie"), col("is")).as("span"))
      .as[Int].collect().toSeq.sorted
    assert(islands == Seq(1, 4)) // merged [1..5] span 4; [7..8] span 1
  }

  test("kmeansIteration: hand-checkable assignment and centroid on axis vectors") {
    import org.apache.spark.sql.functions.col
    // seeds: e1=(1,0), e2=(0,1); vectors near each axis assign to it;
    // the (1,1) diagonal ties at cosine 0.707107 on both seeds and
    // must go to the SMALLER seed id (0).
    val data = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),   // the seeds themselves
      (2L, Array(4f, 0f)), (3L, Array(0f, 2f)),
      (4L, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.kmeansIteration(
        data, data.filter(col("vec_id") < 2), "vec_id", "embedding")
      .select("cluster_id", "dim_no", "n", "centroid")
      .as[(Long, Int, Long, Double)].collect().toSet
    // cluster 0: vecs (1,0),(4,0),(1,1) -> centroid (2, 1/3); n=3
    // cluster 1: vecs (0,1),(0,2) -> centroid (0, 1.5); n=2
    assert(out == Set(
      (0L, 0, 3L, 2.0), (0L, 1, 3L, 0.333333),
      (1L, 0, 2L, 0.0), (1L, 1, 2L, 1.5)))
  }

  test("kmeansIteration: the centroid overflow guard survives the fit " +
    "path's column pruning") {
    import org.apache.spark.sql.functions.col
    // ADVICE r6: the >4e8-member guard used to ride the `n` column,
    // which the fit loops prune away — so the one consumer that can
    // see a wrapped int64 sum never ran the check. It now lives
    // INSIDE the `centroid` expression; pin that by asserting the
    // OPTIMIZED plan of the fit path's exact projection still
    // carries the raise_error.
    val data = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val fitProjection = graft.operators.Similarity.kmeansIteration(
        data, data.filter(col("vec_id") < 2), "vec_id", "embedding")
      .select("cluster_id", "dim_no", "centroid") // what the fit loop keeps
    val optimized = fitProjection.queryExecution.optimizedPlan.toString
    assert(optimized.contains("raise_error"),
      "overflow guard was pruned out of the fit projection:\n" + optimized)
  }

  test("kmeansFit: converges to the cluster means, early-stops, and carries empty clusters") {
    import org.apache.spark.sql.functions.col
    // two tight clusters around the axes + one far-off seed that
    // captures nothing (an axis seed wins every vector by cosine)
    val data = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)),
      (2L, Array(0f, 0f, 1f)), // the empty-cluster seed
      (10L, Array(4f, 1f, 0f)), (11L, Array(2f, 0.5f, 0f)),
      (12L, Array(1f, 4f, 0f)), (13L, Array(0.5f, 2f, 0f)))
      .toDF("vec_id", "embedding")
    val corpus = data.filter(col("vec_id") >= 10)
    val seeds = data.filter(col("vec_id") < 3)
    val (fitted, rounds) = graft.operators.Similarity.kmeansFitWithRounds(
      corpus, seeds, "vec_id", "embedding", maxIter = 10)
    // converged before the cap: the final round only CONFIRMED the
    // fixpoint (assignments by cosine stabilize after round 1 here)
    assert(rounds < 10, s"did not converge in 10 rounds")
    val cents = fitted.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    // cluster 0: vecs (4,1,0),(2,0.5,0) -> mean (3, 0.75, 0)
    // cluster 1: vecs (1,4,0),(0.5,2,0) -> mean (0.75, 3, 0)
    // cluster 2 captured nothing -> carries its seed vector
    assert(cents(0L) == Seq(3f, 0.75f, 0f))
    assert(cents(1L) == Seq(0.75f, 3f, 0f))
    assert(cents(2L) == Seq(0f, 0f, 1f))
    // idempotence at the fixpoint: one more Lloyd round recomputes
    // the same centroids (what lets a fixed-round oracle certify a
    // convergence-stopped fit)
    val again = graft.operators.Similarity.kmeansFit(
        corpus, fitted, "vec_id", "embedding", maxIter = 1)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    assert(again == cents)
  }

  test("q91 approx_count_distinct stays within 5% of the exact count") {
    val rows = Extensions.queries("q91_approx_distinct")(spark, "/root/testdata/sf0.01")
      .select("event_type", "within_tol").as[(String, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, ok) =>
      assert(ok, s"event_type=$et HLL estimate exceeds the 5% rsd bound")
    }
  }
}
