package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Streaming CDC compaction: latest-wins per key across micro-batches,
  * tie-break on the unique id, late (older) rows absorbed silently. */
class CompactLatestSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int): Timestamp = new Timestamp(1700_000_000_000L + h * 3600L * 1000)

  test("compactLatest maintains the newest version per key across batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp, Long, Double)]
    val compacted = StreamOps.compactLatest(
      in.toDF().toDF("user_id", "event_type", "ts", "event_id", "value"),
      keyCols = Seq("user_id", "event_type"),
      tsCol = "ts", tieBreak = "event_id", valueCols = Seq("value"))
    val q = compacted.writeStream.format("memory")
      .queryName("cdc_out").outputMode(OutputMode.Complete).start()
    try {
      in.addData((1L, "set", ts(1), 1L, 10.0), (2L, "set", ts(1), 2L, 20.0))
      q.processAllAvailable()
      // batch 2: newer version for user 1; LATE (older) row for user 2
      // that must NOT displace its current version; a ts-tie for user 1
      // resolved by the higher event_id
      in.addData((1L, "set", ts(5), 3L, 11.0), (2L, "set", ts(0), 4L, 19.0),
        (1L, "set", ts(5), 5L, 12.0))
      q.processAllAvailable()
      val out = spark.table("cdc_out")
        .select("user_id", "event_id", "value")
        .as[(Long, Long, Double)].collect().toSet
      assert(out == Set((1L, 5L, 12.0), (2L, 2L, 20.0)))
    } finally q.stop()
  }

  test("update mode emits only the keys a micro-batch touched") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp, Long, Double)]
    val compacted = StreamOps.compactLatest(
      in.toDF().toDF("user_id", "event_type", "ts", "event_id", "value"),
      keyCols = Seq("user_id", "event_type"),
      tsCol = "ts", tieBreak = "event_id", valueCols = Seq("value"))
    // memory sink in Update mode APPENDS each batch's emitted rows, so
    // the table is the emission LOG — exactly what a foreachBatch
    // MERGE sink would receive per batch.
    val q = compacted.writeStream.format("memory")
      .queryName("cdc_upd").outputMode(OutputMode.Update).start()
    try {
      in.addData((1L, "set", ts(1), 1L, 10.0), (2L, "set", ts(1), 2L, 20.0))
      q.processAllAvailable()
      assert(spark.table("cdc_upd").count() == 2)
      // batch 2 touches ONLY user 1: user 2 must not be re-emitted
      in.addData((1L, "set", ts(5), 3L, 11.0))
      q.processAllAvailable()
      val log = spark.table("cdc_upd")
        .select("user_id", "event_id").as[(Long, Long)].collect().toSeq
      assert(log.size == 3, s"untouched keys re-emitted: $log")
      assert(log.count(_._1 == 2L) == 1)
      assert(log.contains((1L, 3L))) // the new version was emitted
    } finally q.stop()
  }
}
