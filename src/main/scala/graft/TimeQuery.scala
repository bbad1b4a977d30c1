package graft

/** Single-query timer: `runMain graft.TimeQuery <names> [sfDir] [passes]`
  * — runs each comma-separated catalog query N times (default 3) in
  * ONE session and prints per-pass seconds plus the min per query (the
  * Bench noise-floor discipline applied to single queries, for A/B-ing
  * a plan change — or a shared-JVM interaction between queries —
  * without paying a full catalog pass). */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.fromEnv()
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sf).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $name passes=${times.map(t => f"$t%.3f").mkString(",")} min=${times.min}%.3f")
    }
    spark.stop()
  }
}
