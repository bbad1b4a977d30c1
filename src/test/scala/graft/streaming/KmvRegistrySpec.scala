package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The streaming KMV registry must converge to exactly the sketch a
  * single batch pass over the full corpus computes (q152's exact
  * merge law), replaying a batch must be a no-op (set-union then
  * bottom-k is idempotent — exactly-once by algebra), and a stored
  * sketch from a different k must be rejected loudly. */
class KmvRegistrySpec extends SparkSpec {
  import spark.implicits._

  private val K = 4

  private val b1 = Seq(
    ("web", "alpha"), ("web", "bravo"), ("web", "alpha"),
    ("books", "charlie"))
  private val b2 = Seq(
    ("web", "delta"), ("web", "echo"), ("web", "bravo"),
    ("news", "foxtrot"))

  test("incremental merge equals one pass; replay is a fixpoint") {
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("graft_kmv_").toString
    val reg = s"$dir/registry"
    val in = MemoryStream[(String, String)]
    val q = in.toDF().toDF("source", "text").writeStream
      .foreachBatch(KmvRegistry.mergeIntoRegistry(reg, "source", "text", K) _)
      .option("checkpointLocation", s"$dir/_ckpt")
      .start()
    try {
      in.addData(b1: _*)
      q.processAllAvailable()
      in.addData(b2: _*)
      q.processAllAvailable()

      val streamed = spark.read.parquet(reg)
        .as[(String, Seq[Long])].collect().toMap
      val oneShot = KmvRegistry.batchSketches(
          (b1 ++ b2).toDF("source", "text"), "source", "text", K)
        .as[(String, Seq[Long])].collect().toMap
      assert(streamed == oneShot,
        "incremental registry must equal the single-pass sketches")
      // "web" saw 5 distinct contents but keeps only the bottom K=4
      assert(streamed("web").size == K)

      // at-least-once replay of batch 2: registry must not change
      KmvRegistry.mergeIntoRegistry(reg, "source", "text", K)(
        b2.toDF("source", "text"), 1L)
      val replayed = spark.read.parquet(reg)
        .as[(String, Seq[Long])].collect().toMap
      assert(replayed == streamed, "replaying a batch must be a fixpoint")

      // estimates: full sketch (web) uses the KMV estimator, the
      // under-full ones are exact
      val est = KmvRegistry.estimates(spark.read.parquet(reg), K)
        .as[(String, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(est("books") == (1L, 1.0) && est("news") == (1L, 1.0))
      assert(est("web")._1 == K && est("web")._2 > 0)
    } finally q.stop()
  }

  test("RAISING k on a lived-in registry fails loudly too (the sidecar " +
    "pin): sources already discarded hashes above their old kth min, so " +
    "a silent merge would permanently undercount") {
    val dir = Files.createTempDirectory("graft_kmv3_").toString
    val reg = s"$dir/registry"
    KmvRegistry.mergeIntoRegistry(reg, "source", "text", 4)(
      b1.toDF("source", "text"), 0L)
    // size(old) <= 8 would pass the in-plan guard — the sidecar catches it
    val ex = intercept[IllegalArgumentException] {
      KmvRegistry.mergeIntoRegistry(reg, "source", "text", 8)(
        Seq(("web", "golf")).toDF("source", "text"), 1L)
    }
    assert(ex.getMessage.contains("pinned"), ex.getMessage)
    // same k keeps working
    KmvRegistry.mergeIntoRegistry(reg, "source", "text", 4)(
      Seq(("web", "golf")).toDF("source", "text"), 1L)
  }

  test("a stored sketch larger than k fails loudly, not by truncation") {
    val dir = Files.createTempDirectory("graft_kmv2_").toString
    val reg = s"$dir/registry"
    // write at k=4...
    KmvRegistry.mergeIntoRegistry(reg, "source", "text", 4)(
      b1.toDF("source", "text").union(b2.toDF("source", "text")), 0L)
    // ...merge at k=2 must raise, not silently re-bottom
    val ex = intercept[Exception] {
      KmvRegistry.mergeIntoRegistry(reg, "source", "text", 2)(
        Seq(("web", "golf")).toDF("source", "text"), 1L)
    }
    assert(ex.getMessage.contains("KmvRegistry") ||
      ex.getCause != null && ex.getCause.getMessage.contains("KmvRegistry"))
  }
}
