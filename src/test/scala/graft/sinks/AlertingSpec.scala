package graft.sinks

import graft.SparkSpec
import graft.pipeline.Arbitrage
import graft.functions.TextNorm
import org.apache.spark.sql.functions._

class AlertingSpec extends SparkSpec {
  import spark.implicits._

  test("alerts flow from the pipeline into the sink adapter") {
    val grid = Seq(
      (1, "NFL", "Chiefs", "ML", "Payout", "+225", "-500"),
      (2, "NFL", "Bills", "ML", "Payout", "-600", "-180")
    ).toDF("idx", "Sport", "Team", "BetType", "Info", "DraftKings", "Caesars")
    val alerts = Arbitrage.detect(grid, Seq("DraftKings", "Caesars"), 3)
    val sink = new CollectingAlertSink
    val n = Alerting.deliver(alerts, "message", sink)
    assert(n == 2 && sink.sent.size == 2)
    assert(sink.sent.exists(_.contains("Chiefs")))
    val mirror = new CollectingMirror
    assert(Alerting.mirror(alerts, mirror) == 2)
    assert(mirror.last.get._1.contains("margin_pct"))
  }

  test("engine-native mirror: overwrite parquet round trip") {
    val grid = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val path = java.nio.file.Files.createTempDirectory("mir").toString + "/grid"
    Alerting.mirrorTable(Alerting.withUpdatedAt(grid,
      to_timestamp(lit("2026-01-02 03:04:56"))), path)
    // overwrite replaces, not appends
    Alerting.mirrorTable(Alerting.withUpdatedAt(grid,
      to_timestamp(lit("2026-01-02 03:05:56"))), path)
    val back = spark.read.parquet(path)
    assert(back.count() == 2)
    assert(back.select("updated_at").as[String].collect()
      .forall(_ == "2026-01-02 03:05"))
  }

  test("afterMarker: positional find + dynamic substring (F10)") {
    val in = Seq("10:10 PM Seattle at Denver", "no marker here").toDF("t")
    val out = col1[String](in.select(TextNorm.afterMarker(col("t"), "PM", 1)))
    assert(out == Seq("Seattle at Denver", ""))
  }
}
