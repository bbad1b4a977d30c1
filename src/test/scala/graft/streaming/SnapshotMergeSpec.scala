package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Streaming CDC -> snapshot maintenance (SnapshotMerge): upserts and
  * deletes land, and replaying a batch is a fixpoint — the merge
  * algebra makes at-least-once delivery exactly-once in effect. */
class SnapshotMergeSpec extends SparkSpec {
  import spark.implicits._

  private def snap(dir: String) =
    spark.read.parquet(dir).as[(Long, Double)].collect().toSet

  test("upserts, deletes, and batch replay converge to the same snapshot") {
    val dir = Files.createTempDirectory("graft_snap_").toString + "/t"
    val sink = SnapshotMerge.mergeIntoSnapshot(dir, Seq("k")) _

    // batch 0: three inserts
    sink(Seq((1L, "U", 10.0), (2L, "U", 20.0), (3L, "U", 30.0))
      .toDF("k", "op", "v"), 0L)
    assert(snap(dir) == Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))

    // batch 1: update k=1, delete k=2, tombstone for absent k=9
    val b1 = Seq((1L, "U", 11.0), (2L, "D", 0.0), (9L, "D", 0.0))
      .toDF("k", "op", "v")
    sink(b1, 1L)
    assert(snap(dir) == Set((1L, 11.0), (3L, 30.0)))

    // replay batch 1 (foreachBatch at-least-once): fixpoint
    sink(b1, 1L)
    assert(snap(dir) == Set((1L, 11.0), (3L, 30.0)))
  }

  test("end-to-end: a changes stream maintains the snapshot via foreachBatch") {
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("graft_snap_e2e_").toString + "/t"
    val in = MemoryStream[(Long, String, Double)]
    val q = in.toDF().toDF("k", "op", "v").writeStream
      .foreachBatch(SnapshotMerge.mergeIntoSnapshot(dir, Seq("k")) _)
      .start()
    try {
      in.addData((1L, "U", 1.0), (2L, "U", 2.0))
      q.processAllAvailable()
      in.addData((2L, "D", 0.0), (3L, "U", 3.0))
      q.processAllAvailable()
      assert(snap(dir) == Set((1L, 1.0), (3L, 3.0)))
    } finally q.stop()
  }
}
