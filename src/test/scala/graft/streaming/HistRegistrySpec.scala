package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, sum}
import java.nio.file.Files

/** The streaming histogram registry folds by addition — NOT
  * idempotent — so replay safety must come from the batch_id layout
  * (AdditiveRegistry): the folded histogram must equal the
  * single-pass histogram of the full history, a replayed batch must
  * overwrite instead of double-count, compaction must preserve the
  * fold, and quantile reads off the registry must bracket the exact
  * rank statistic to within one bucket. */
class HistRegistrySpec extends SparkSpec {
  import spark.implicits._

  // batch 1: values 1..60; batch 2: values 61..100 — p50 of the
  // union is 50.0 (micro 50000), p99 is 99.0 (micro 99000)
  private val b1 = (1 to 60).map(i => Tuple1(i.toDouble))
  private val b2 = (61 to 100).map(i => Tuple1(i.toDouble))

  test("NULL values never enter the registry (a persisted null bucket " +
    "would shift every quantile down via the nulls-first cumsum); the " +
    "fold is empty (typed) before the first committed batch") {
    val dir = Files.createTempDirectory("graft_hist2_").toString
    val reg = s"$dir/registry"
    // bootstrap: reading a never-written registry is empty, not a throw
    assert(HistRegistry.histogram(spark, reg).count() == 0L)
    val withNulls = (Seq(Some(10.0), None, Some(20.0), None) map Tuple1.apply)
      .toDF("value")
    HistRegistry.appendBatch(reg, "value")(withNulls, 0L)
    val hist = HistRegistry.histogram(spark, reg)
    assert(hist.filter(col("bucket").isNull).count() == 0L,
      "null values must not persist as a bucket=null cell")
    assert(hist.agg(sum("n")).as[Long].head() == 2L)
    // quantiles over the two real values: p50 brackets 10.0
    val p50 = HistRegistry.quantileEstimates(hist, Seq(50))
      .select("bucket_lo").as[Long].head()
    assert(p50 <= 10000 && 10000 < p50 + graft.operators.Hist.BucketMicro)
  }

  test("bucket geometry is pinned (VERDICT r8 #4): a registry written " +
    "under one bucket width refuses an open from a build whose Hist " +
    "constant drifted, instead of silently mixing buckets") {
    val dir = Files.createTempDirectory("graft_histpin_").toString
    val reg = s"$dir/registry"
    HistRegistry.appendBatch(reg, "value")(
      Seq(1.0, 2.0).map(Tuple1.apply).toDF("value"), 0L)
    // simulate a build whose Hist.BucketMicro changed from 500 to 250:
    // the sidecar holds the OLD geometry, this "build" presents the new
    val pp = new org.apache.hadoop.fs.Path(reg + "_params")
    val fs = pp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.operators.RegistryIO.writeLines(fs, pp.toString,
      Seq("bucket_micro=250,micro=cast(floor(value * 1000.0) as bigint)"))
    val err1 = intercept[IllegalArgumentException] {
      HistRegistry.appendBatch(reg, "value")(
        Seq(3.0).map(Tuple1.apply).toDF("value"), 1L)
    }
    assert(err1.getMessage.contains("HistRegistry"), err1.getMessage)
    // the read side refuses too — a fold under the wrong width would
    // mis-scale every reported bucket boundary
    intercept[IllegalArgumentException] { HistRegistry.histogram(spark, reg) }
    intercept[IllegalArgumentException] { HistRegistry.compact(spark, reg, 0L) }
    // restoring the pinned geometry restores service
    graft.operators.RegistryIO.writeLines(fs, pp.toString,
      Seq(s"bucket_micro=${graft.operators.Hist.BucketMicro}," +
        s"micro=${graft.operators.Hist.MicroSql}"))
    assert(HistRegistry.histogram(spark, reg).count() > 0L)
  }

  test("compaction takes the maintenance mutex (round 9): a foreign lock " +
    "blocks compact loudly with the registry intact; appends and folds " +
    "never take it") {
    val dir = Files.createTempDirectory("graft_histlock_").toString
    val reg = s"$dir/registry"
    HistRegistry.appendBatch(reg, "value")(
      (1 to 10).map(_.toDouble).map(Tuple1.apply).toDF("value"), 0L)
    val lock = new org.apache.hadoop.fs.Path(reg + "_maint_lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(lock, false)
    try os.write("pid=0 t=0".getBytes("UTF-8")) finally os.close()
    // a concurrent holder blocks compaction before anything is written
    intercept[IllegalStateException] {
      HistRegistry.compact(spark, reg, upToBatchId = 0L)
    }
    // the fold path is lock-free (reads never serialize on maintenance)
    assert(HistRegistry.histogram(spark, reg)
      .agg(sum("n")).as[Long].head() == 10L)
    // ... and so is the append path (the object doc's concurrent-append
    // guarantee): a batch lands fine while the lock is held
    HistRegistry.appendBatch(reg, "value")(
      Seq(11.0).map(Tuple1.apply).toDF("value"), 1L)
    assert(HistRegistry.histogram(spark, reg)
      .agg(sum("n")).as[Long].head() == 11L)
    // release -> compaction works and cleans up its own lock
    fs.delete(lock, false)
    HistRegistry.compact(spark, reg, upToBatchId = 1L)
    assert(!fs.exists(lock))
    assert(HistRegistry.histogram(spark, reg)
      .agg(sum("n")).as[Long].head() == 11L)
  }

  test("fold equals one pass; replay-safe; compaction preserves; quantiles bracket") {
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("graft_hist_").toString
    val reg = s"$dir/registry"
    val in = MemoryStream[Tuple1[Double]]
    val q = in.toDF().toDF("value").writeStream
      .foreachBatch(HistRegistry.appendBatch(reg, "value") _)
      .option("checkpointLocation", s"$dir/_ckpt")
      .start()
    try {
      in.addData(b1: _*)
      q.processAllAvailable()
      in.addData(b2: _*)
      q.processAllAvailable()

      def histMap(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, Long)].collect().toMap
      val folded = histMap(HistRegistry.histogram(spark, reg))
      val onePass = histMap(HistRegistry.batchHist(
        (b1 ++ b2).map(_._1).toDF("value"), "value"))
      assert(folded == onePass,
        "folded registry must equal the single-pass histogram")

      // at-least-once replay of batch 0: same batchId, same data
      HistRegistry.appendBatch(reg, "value")(
        b1.map(_._1).toDF("value"), 0L)
      assert(histMap(HistRegistry.histogram(spark, reg)) == onePass,
        "replaying a batch must not double-count")

      // quantiles straight off the registry: exact micro rank
      // statistic is value*1000, guaranteed inside the bucket
      val est = HistRegistry.quantileEstimates(
          HistRegistry.histogram(spark, reg), Seq(50, 95, 99))
        .select("pct", "bucket_lo")
        .as[(Int, Long)].collect().toMap
      for ((pct, exact) <- Seq(50 -> 50000L, 95 -> 95000L, 99 -> 99000L))
        assert(est(pct) <= exact && exact < est(pct) + 500,
          s"p$pct bucket ${est(pct)} must bracket exact micro $exact")

      // compaction absorbs both batches; fold and quantiles unchanged
      HistRegistry.compact(spark, reg, upToBatchId = 1L)
      assert(histMap(HistRegistry.histogram(spark, reg)) == onePass,
        "compaction must preserve the folded histogram")

      // a replay of an ABSORBED batch is invisible below the horizon
      HistRegistry.appendBatch(reg, "value")(
        b2.map(_._1).toDF("value"), 1L)
      assert(histMap(HistRegistry.histogram(spark, reg)) == onePass,
        "a replayed absorbed batch must be invisible to readers")

      // post-compaction appends keep folding: add values 101..110,
      // p99 of the 110-value history moves to 109.0
      HistRegistry.appendBatch(reg, "value")(
        (101 to 110).map(_.toDouble).toDF("value"), 2L)
      val est2 = HistRegistry.quantileEstimates(
          HistRegistry.histogram(spark, reg), Seq(99))
        .select("pct", "bucket_lo").as[(Int, Long)].collect().toMap
      assert(est2(99) <= 109000L && 109000L < est2(99) + 500,
        "post-compaction appends must shift the registry quantile")
    } finally q.stop()
  }
}
