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
  /** events.parquet's ts arrives differently depending on how the
    * driver generated it: TIMESTAMP(NANOS) (rejected by Spark's
    * reader unless spark.sql.legacy.parquet.nanosAsLong=true, which
    * sessions set — ts is then a nanos long) or TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (read as TIMESTAMP_NTZ, which time
    * functions like unix_millis reject). Normalize BOTH to a
    * microsecond TimestampType here; sessions run in UTC, so the
    * NTZ->LTZ cast is value-preserving and matches DuckDB's read of
    * the same file. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
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
