package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated testdata
  * (see TESTDATA.md). Every query receives the scale-factor
  * directory at call time, so plans are built per-SF and Catalyst
  * sees real parquet relations (pushdown + pruning apply).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects. Sessions set
    * spark.sql.legacy.parquet.nanosAsLong=true, so ts arrives as a
    * nanos long; normalize to a microsecond TimestampType here
    * (matching DuckDB's read of the same file).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

/** One named group of oracle-checked queries. SparkEntry aggregates
  * all groups; each group keeps its Spark plans and the equivalent
  * DuckDB SQL side by side so they evolve together.
  *
  * Determinism rules every query here follows:
  *   - sums/avgs of double columns go through DECIMAL(18,4) so the
  *     result is independent of partial-aggregation order in both
  *     engines (then rounded and cast back to double);
  *   - every window/rank has a total deterministic ORDER BY;
  *   - output column names are aliased identically in both dialects.
  */
trait QueryGroup {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
