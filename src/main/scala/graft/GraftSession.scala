package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's SparkSession tuning so every entry
  * point (Verify, Bench, Explain, tests) runs the same profile.
  *
  * Notable settings:
  *  - shuffle.partitions = cores (not 200): right-sized for local[N];
  *    on a real cluster this scales with executor count / AQE.
  *  - legacy.parquet.nanosAsLong: events.parquet carries
  *    TIMESTAMP(NANOS) which vanilla Spark refuses; Tables.events
  *    rebuilds a microsecond timestamp from the long.
  *  - excludedRules = InferFiltersFromGenerate: explode(generated
  *    array) otherwise infers `size(arr)>0 AND isnotnull(arr)` and
  *    predicate pushdown clones the WHOLE array-producing expression
  *    (tokenizer regex, shingle HOFs) below every projection boundary
  *    and exchange — observed 17x slowdown on the dedup pipeline at
  *    sf0.1. The filters are redundant for us: explode drops empty
  *    arrays by itself.
  */
object GraftSession {
  val ExcludedRules = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"

  def build(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.optimizer.excludedRules", ExcludedRules)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def fromEnv(): SparkSession = build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
}
