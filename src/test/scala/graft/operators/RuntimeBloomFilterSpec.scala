package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (clusterConf enables it in
  * production): a selective dimension-side predicate is turned into a
  * bloom filter applied on the fact side BEFORE the join shuffle —
  * the semi-join pushdown that keeps a 100 TB probe side from
  * shuffling rows that cannot match. Local thresholds are lowered to
  * let the tiny testdata trigger the same plan rewrite. */
class RuntimeBloomFilterSpec extends SparkSpec {

  test("selective join injects a bloom filter on the probe side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // testdata is KB-scale: drop the size gates so the rewrite fires
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force a shuffle join: broadcast joins don't need the filter
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val sf = "/root/testdata/sf0.001"
      val li = Tables.lineitem(spark, sf)
      val ord = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") ||
        optimized.contains("BloomFilter"),
        s"no runtime bloom filter in:\n$optimized")
      assert(joined.collect().map(_.getLong(1)).sum > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
