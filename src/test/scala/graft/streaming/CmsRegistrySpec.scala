package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** The streaming CMS registry folds by addition — NOT idempotent —
  * so replay safety must come from the batch_id partition layout:
  * the folded sketch must equal the single-pass sketch of the full
  * corpus, a replayed batch must overwrite its own partition (not
  * double-count), and estimates must dominate true counts. */
class CmsRegistrySpec extends SparkSpec {
  import spark.implicits._

  private val D = 4
  private val W = 64

  private val b1 = Seq(
    "spark spark spark engine",
    "engine scans parquet").map(Tuple1(_))
  private val b2 = Seq(
    "spark pushes filters down",
    "parquet files parquet").map(Tuple1(_))

  test("(d, w) is pinned on first append: a different geometry fails " +
    "loudly instead of silently under-estimating; the fold is empty " +
    "(typed) before the first committed batch") {
    val dir = Files.createTempDirectory("graft_cms3_").toString
    val reg = s"$dir/registry"
    // bootstrap: probing a never-written registry returns EMPTY, not
    // PATH_NOT_FOUND — estimates come back exact-zero
    val est0 = CmsRegistry.estimate(Seq("spark").toDF("term"), "term",
      CmsRegistry.sketch(spark, reg), D, W)
    assert(est0.select("est").as[Long].collect().toSeq == Seq(0L))
    CmsRegistry.appendBatch(reg, "text", D, W)(b1.toDF("text"), 0L)
    // a mismatched append OR verified fold fails loudly (probe
    // buckets hashed mod a different w would mostly miss -> min 0)
    val ex1 = intercept[IllegalArgumentException] {
      CmsRegistry.appendBatch(reg, "text", D, W / 2)(b2.toDF("text"), 1L)
    }
    assert(ex1.getMessage.contains("pinned"), ex1.getMessage)
    val ex2 = intercept[IllegalArgumentException] {
      CmsRegistry.sketch(spark, reg, D + 1, W)
    }
    assert(ex2.getMessage.contains("pinned"), ex2.getMessage)
    // the matching geometry keeps working, verified fold included
    CmsRegistry.appendBatch(reg, "text", D, W)(b2.toDF("text"), 1L)
    val est = CmsRegistry.estimate(Seq("spark").toDF("term"), "term",
        CmsRegistry.sketch(spark, reg, D, W), D, W)
      .select("est").as[Long].collect().toSeq
    assert(est == Seq(4L), s"got $est")
  }

  test("fold equals one pass; replay overwrites instead of double-counting") {
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("graft_cms_").toString
    val reg = s"$dir/registry"
    val in = MemoryStream[Tuple1[String]]
    val q = in.toDF().toDF("text").writeStream
      .foreachBatch(CmsRegistry.appendBatch(reg, "text", D, W) _)
      .option("checkpointLocation", s"$dir/_ckpt")
      .start()
    try {
      in.addData(b1: _*)
      q.processAllAvailable()
      in.addData(b2: _*)
      q.processAllAvailable()

      def cellMap(df: org.apache.spark.sql.DataFrame) =
        df.as[(Int, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
      val folded = cellMap(CmsRegistry.sketch(spark, reg))
      val onePass = cellMap(CmsRegistry.batchCells(
        (b1 ++ b2).map(_._1).toDF("text"), "text", D, W))
      assert(folded == onePass,
        "folded registry must equal the single-pass sketch")

      // at-least-once replay of batch 1: same batchId, same data —
      // the partition is overwritten byte-identically, sums unchanged
      CmsRegistry.appendBatch(reg, "text", D, W)(
        b1.map(_._1).toDF("text"), 0L)
      assert(cellMap(CmsRegistry.sketch(spark, reg)) == onePass,
        "replaying a batch must not double-count")

      // estimates dominate true counts; a planted heavy term is seen
      val est = CmsRegistry.estimate(
          Seq("spark", "parquet", "absent").toDF("term"), "term",
          CmsRegistry.sketch(spark, reg), D, W)
        .as[(String, Long)].collect().toMap
      assert(est("spark") >= 4L)
      assert(est("parquet") >= 3L)
      assert(est("absent") <= est("spark"))

      // compaction: absorb both committed batches into the base
      // partition (batch_id = -(upTo+2) = -3) — folded sums
      // unchanged, absorbed partitions GC'd
      CmsRegistry.compact(spark, reg, upToBatchId = 1L)
      assert(cellMap(CmsRegistry.sketch(spark, reg)) == onePass,
        "compaction must preserve the folded sums")
      def parts() = new java.io.File(reg).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch_id=")).map(_.getName).sorted.toSeq
      assert(parts() == Seq("batch_id=-3"),
        s"expected only the compacted base, got ${parts().mkString(",")}")

      // a replay of an ABSORBED batch recreates a partition below the
      // horizon — readers must ignore it (correctness never depended
      // on the GC)
      CmsRegistry.appendBatch(reg, "text", D, W)(
        b2.map(_._1).toDF("text"), 1L)
      assert(cellMap(CmsRegistry.sketch(spark, reg)) == onePass,
        "a replayed absorbed batch must be invisible to readers")

      // a later batch appends beside the base and keeps folding
      CmsRegistry.appendBatch(reg, "text", D, W)(
        Seq("spark again").toDF("text"), 2L)
      val withB3 = cellMap(CmsRegistry.sketch(spark, reg))
      val onePass3 = cellMap(CmsRegistry.batchCells(
        ((b1 ++ b2).map(_._1) ++ Seq("spark again")).toDF("text"), "text", D, W))
      assert(withB3 == onePass3,
        "post-compaction appends must keep the fold exact")
    } finally q.stop()
  }
}
