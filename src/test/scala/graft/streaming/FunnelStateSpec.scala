package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** The streaming funnel state machine: strictly-after advances only,
  * out-of-order steps don't count, state carries across batches. */
class FunnelStateSpec extends SparkSpec {
  import spark.implicits._

  private val Steps = Seq("view", "click", "purchase")

  private def ev(u: Long, t: String, ms: Long) =
    FunnelEvent(u, t, new Timestamp(ms))

  test("advances on ordered steps, ignores skipped and tied ones") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[FunnelEvent]
    val stages = FunnelState.funnelStages(
      in.toDS().withWatermark("ts", "1 hour").as[FunnelEvent],
      Steps, idleMs = 86400000L)
    val q = stages.writeStream.format("memory")
      .queryName("funnel_out").outputMode("append").start()
    try {
      in.addData(
        // user 1: clean view -> click -> purchase
        ev(1, "view", 1000), ev(1, "click", 2000), ev(1, "purchase", 3000),
        // user 2: click BEFORE any view never counts; the later
        // view@2000 then click@3000 do
        ev(2, "click", 1000), ev(2, "view", 2000), ev(2, "click", 3000),
        // user 3: purchase without click stalls at stage 1
        ev(3, "view", 5000), ev(3, "purchase", 6000),
        // user 4: click TIED with view is not strictly after
        ev(4, "view", 7000), ev(4, "click", 7000))
      q.processAllAvailable()
      // user 2 purchases in a LATER batch: state must carry over
      in.addData(ev(2, "purchase", 9000))
      q.processAllAvailable()

      val out = spark.table("funnel_out").as[FunnelStage].collect()
        .map(s => (s.user_id, s.stage, s.ts.getTime)).toSet
      assert(out == Set(
        (1L, 1, 1000L), (1L, 2, 2000L), (1L, 3, 3000L),
        (2L, 1, 2000L), (2L, 2, 3000L), (2L, 3, 9000L),
        (3L, 1, 5000L),
        (4L, 1, 7000L)))
    } finally q.stop()
  }
}
