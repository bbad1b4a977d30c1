package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimestampsSpec extends SparkSpec {
  import spark.implicits._

  private val utc = to_timestamp(lit("2026-01-02 03:04:56"))

  test("F25: displayMinute renders yyyy-MM-dd HH:mm") {
    val out = spark.range(1).select(Timestamps.displayMinute(utc))
      .as[String].head()
    assert(out == "2026-01-02 03:04")
  }

  test("F27: phoenixDisplay renders the instant at UTC-7 (no DST)") {
    // 2026-01-02 03:04 UTC == 2026-01-01 20:04 America/Phoenix
    val out = spark.range(1).select(Timestamps.phoenixDisplay(utc))
      .as[String].head()
    assert(out == "2026-01-01 20:04")
    // July: Phoenix does not observe DST, still UTC-7
    val july = to_timestamp(lit("2026-07-02 03:04:56"))
    val out2 = spark.range(1).select(Timestamps.phoenixDisplay(july))
      .as[String].head()
    assert(out2 == "2026-07-01 20:04")
  }

  test("sinks stamp updated_at: mirror grid and log append") {
    val grid = Seq((1, "a")).toDF("k", "v")
    val stamped = graft.sinks.Alerting.withUpdatedAt(grid, utc)
    assert(stamped.select("updated_at").as[String].head() == "2026-01-02 03:04")

    val dir = java.nio.file.Files.createTempDirectory("nlog2").toString + "/log"
    val log = new graft.sinks.NotificationLog(dir)
    val out = log.rateLimitAndAppend(
      Seq(("A", new java.sql.Timestamp(1700000000000L), "m1"))
        .toDF("team", "ts", "message"),
      maxPerDay = 3, appendedAt = utc)
    assert(out.select("updated_at").as[String].head() == "2026-01-01 20:04")
    // stamp is persisted in the log, not just returned
    assert(log.read(spark).select("updated_at").as[String].head()
      == "2026-01-01 20:04")
  }
}
