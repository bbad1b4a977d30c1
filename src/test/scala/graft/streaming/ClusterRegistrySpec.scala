package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** The streaming cluster registry folds edge micro-batches into a
  * persistent labeling via incremental CC. The fold is idempotent
  * (replaying an absorbed edge set contracts to an empty graph), so
  * exactly-once comes from the algebra: the registry must equal the
  * single-pass clustering of every edge ever ingested, including
  * across-batch bridges that merge clusters created batches apart. */
class ClusterRegistrySpec extends SparkSpec {
  import spark.implicits._

  // batch 1 builds {1,2} and {5,6}; batch 2 attaches 3 to {1,2} and
  // creates {8,9}; batch 3 bridges the two oldest clusters via (6,2)
  private val b1 = Seq((1L, 2L), (5L, 6L))
  private val b2 = Seq((2L, 3L), (8L, 9L))
  private val b3 = Seq((6L, 2L))

  test("clusters() is empty (typed) before the first batch, as documented") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ccreg2_").toString
    val out = ClusterRegistry.clusters(spark, s"$dir/registry")
    assert(out.columns.toSeq == Seq("id", "cluster") && out.count() == 0L)
  }

  test("fold across batches == one-pass CC; replay is a fixpoint") {
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("graft_ccreg_").toString
    val reg = s"$dir/registry"
    val in = MemoryStream[(Long, Long)]
    val q = in.toDF().toDF("id_a", "id_b").writeStream
      .foreachBatch(ClusterRegistry.mergeIntoRegistry(reg) _)
      .option("checkpointLocation", s"$dir/_ckpt")
      .start()
    try {
      def regMap() = ClusterRegistry.clusters(spark, reg)
        .as[(Long, Long)].collect().toMap
      in.addData(b1: _*); q.processAllAvailable()
      assert(regMap() == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L))

      in.addData(b2: _*); q.processAllAvailable()
      assert(regMap()(3L) == 1L, "new node must attach to the standing cluster")
      assert(regMap()(9L) == 8L)

      in.addData(b3: _*); q.processAllAvailable()
      val after = regMap()
      val onePass = Dedup.connectedComponents(
          (b1 ++ b2 ++ b3).toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(after == onePass,
        s"registry $after must equal one-pass CC $onePass")
      assert(after(6L) == 1L && after(5L) == 1L,
        "the cross-batch bridge must merge the oldest clusters")

      // at-least-once replay of an ABSORBED batch: the contracted
      // graph is empty, the labeling is a fixpoint
      ClusterRegistry.mergeIntoRegistry(reg)(b2.toDF("id_a", "id_b"), 1L)
      assert(regMap() == onePass, "replay must be a no-op")
    } finally q.stop()
  }
}
