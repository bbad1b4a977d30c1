package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The 100 TB co-located-join story, demonstrated: two tables written
  * bucketed on the join key join WITHOUT any Exchange in the physical
  * plan — at scale this is the difference between a full shuffle of
  * the fact table and none. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join with zero shuffle") {
    // force the shuffle-join path: at real scale neither side of a
    // fact-fact join broadcasts
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")

    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // SortMergeJoin with NO Exchange below it: bucketing pre-shuffled
    // the data at write time.
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    // only the final single-key aggregation may exchange; the join
    // itself must not re-shuffle either side.
    assert(exchanges <= 1, s"unexpected exchanges in:\n$plan")
    assert(joined.count() > 0)

    // managed tables: DROP removes the warehouse files
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    val wh = new java.io.File("spark-warehouse")
    if (wh.exists()) wh.delete() // empty after the drops
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("Bucketing.revenueByPriority joins shuffle-free and is re-runnable") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // run twice: the operator must be idempotent (stale warehouse
      // locations from a previous JVM are the production failure mode)
      Bucketing.revenueByPriority(spark, "/root/testdata/sf0.001").count()
      val df = Bucketing.revenueByPriority(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      // only the final 5-key priority aggregation may exchange
      assert(exchanges <= 1, s"unexpected exchanges in:\n$plan")
      assert(df.count() == 5)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
