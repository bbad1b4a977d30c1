package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Storage-layout operator: bucketed, sorted table materialization for
  * SHUFFLE-FREE co-located joins — the 100 TB answer to "this fact ×
  * fact join shuffles both sides every run".
  *
  * Writing both join inputs `bucketBy(n, key).sortBy(key)` fixes their
  * physical partitioning at write time; every later equi-join on the
  * bucket key plans as a sort-merge join with NO Exchange on either
  * side (BucketingSpec asserts this on the physical plan). On a real
  * cluster this turns the recurring join of two 100 TB tables into a
  * map-side merge — the shuffle is paid ONCE at ingest, amortized over
  * every downstream run. The same layout also gives bucket pruning on
  * point predicates over the key.
  *
  * Buckets-vs-files note: n buckets caps join parallelism at n tasks,
  * so size n to the target cluster (executors × cores), not to the
  * local test profile — 8 here only because testdata is tiny.
  */
object Bucketing {

  /** Deterministic table-name tag per source dir (managed tables are
    * global; two sf dirs must not collide on one table). */
  private def tag(sfDir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  /** Idempotence across JVMs: a fresh session's in-memory catalog has
    * no entry for the table, but the warehouse DIRECTORY survives on
    * disk and saveAsTable then fails with LOCATION_ALREADY_EXISTS —
    * so drop both the catalog entry and any stale location. */
  private def dropStale(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    // the managed location lives under the CURRENT database's dir
    // (review: hardcoding <warehouse>/<table> only held in the
    // default database — with a current database set, the stale dir
    // is <warehouse>/<db>.db/<table> and deleting the wrong path
    // reintroduces the LOCATION_ALREADY_EXISTS failure this method
    // exists to prevent)
    val db = spark.catalog.currentDatabase
    val base = if (db == "default") new org.apache.hadoop.fs.Path(wh)
      else new org.apache.hadoop.fs.Path(wh, s"${db.toLowerCase}.db")
    val path = new org.apache.hadoop.fs.Path(base, table.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }

  /** Writes (lineitem, orders) projections as bucketed+sorted managed
    * tables (idempotent overwrite) and returns them re-read from the
    * bucketed layout. */
  def bucketedLineitemOrders(spark: SparkSession, sfDir: String,
                             nBuckets: Int = 8): (DataFrame, DataFrame) = {
    // nBuckets is part of the table identity: a later call sized for a
    // bigger target must not silently reuse a coarser layout.
    val t = s"${tag(sfDir)}_$nBuckets"
    val liT = s"graft_li_bkt_$t"
    val ordT = s"graft_ord_bkt_$t"
    // Pay the layout ONCE per (JVM, source dir) — that is the whole
    // bucketing contract: ingest shuffles once, every later run joins
    // shuffle-free. The source parquet is immutable testdata, so a
    // catalog hit means the bucketed copy is current.
    if (spark.catalog.tableExists(liT) && spark.catalog.tableExists(ordT))
      return (spark.table(liT), spark.table(ordT))
    dropStale(spark, liT)
    dropStale(spark, ordT)
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(liT)
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderpriority")
      .write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(ordT)
    (spark.table(liT), spark.table(ordT))
  }

  /** Revenue per order priority over the CO-LOCATED join: both inputs
    * read pre-bucketed on the join key, so the join stage itself has
    * zero Exchange (only the final tiny per-priority aggregation
    * shuffles). Decimal-exact revenue per the shared determinism
    * rules. */
  def revenueByPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val (li, ord) = bucketedLineitemOrders(spark, sfDir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")), 2).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }
}
