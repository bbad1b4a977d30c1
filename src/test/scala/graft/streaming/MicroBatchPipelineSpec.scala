package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.pipeline.Arbitrage

/** The whole arbitrage batch plan re-run per micro-batch: stream in
  * raw grid rows, collect alerts per batch. */
class MicroBatchPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch re-runs the arbitrage plan per micro-batch") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Int, String, String, String, String, String, String)]
    val named = in.toDF().toDF("idx", "Sport", "Team", "BetType", "Info",
      "DraftKings", "Caesars")

    val alerts = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = MicroBatchPipeline.start(named,
      batch => Arbitrage.detect(batch, Seq("DraftKings", "Caesars"), 3),
      (out, id) => out.select("Team").collect()
        .foreach(r => alerts.synchronized { alerts += ((id, r.getString(0))) }),
      intervalMs = 100)
    try {
      // batch 1: the planted arb
      in.addData((1, "NFL", "Chiefs", "ML", "Payout", "+225", "-500"),
        (2, "NFL", "Bills", "ML", "Payout", "-600", "-180"))
      q.processAllAvailable()
      // batch 2: nothing alert-worthy
      in.addData((3, "NFL", "Jets", "ML", "Payout", "-110", "-115"),
        (4, "NFL", "Dolphins", "ML", "Payout", "-110", "-112"))
      q.processAllAvailable()
      val teams = alerts.synchronized { alerts.map(_._2).toSet }
      assert(teams == Set("Chiefs", "Bills"))
    } finally q.stop()
  }
}
