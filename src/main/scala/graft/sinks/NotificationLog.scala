package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K2 + S5 + E3 (SURVEY.md §2.1-§2.2, §3): the append-only
  * notification log whose READ-BACK feeds the next run's rate limit —
  * the reference's only stateful loop (read sheet worksheet 2, count
  * per (team, day), drop alerts past the cap, append survivors;
  * arbitrage_scanner.py:434-515).
  *
  * Engine-native representation: an append-mode parquet table (Sheets
  * stays an external mirror per SURVEY). The batch rate limit is a
  * broadcast join against the per-(team, day) counts; the
  * streaming-native equivalent (no log scan at all) is
  * graft.streaming.StreamOps.rateLimitedAlerts.
  */
class NotificationLog(path: String) {

  def read(spark: SparkSession): DataFrame = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "team STRING, sent_at TIMESTAMP, message STRING, updated_at STRING"))
    // short-circuit a never-written log BEFORE planning the read
    // (VERDICT r8 #6 extended beyond the registries): resolving a
    // parquet source over an absent path logs a FileNotFoundException
    // line per bootstrap even though the catch below answers
    // correctly — the listing check answers silently.
    if (!graft.operators.RegistryIO.committedDataExists(spark, path)) empty
    else try {
      // mergeSchema: a log written before a schema addition (e.g. the
      // updated_at stamp) holds narrower files; footer sampling would
      // otherwise make the union schema depend on listing order.
      val d = spark.read.option("mergeSchema", "true").parquet(path)
      if (d.columns.isEmpty) empty else d
    } catch { case _: org.apache.spark.sql.AnalysisException => empty }
  }

  /** Counts already sent per (team, UTC day). */
  def dailyCounts(spark: SparkSession): DataFrame =
    read(spark).groupBy(col("team"), to_date(col("sent_at")).as("day"))
      .agg(count(lit(1)).as("sent"))

  /** Batch rate limit (arbitrage_scanner.py:457-459): keep alerts for
    * (team, day) pairs with fewer than maxPerDay already logged, and
    * at most the remaining quota per pair (deterministic order by the
    * `orderCol` column). Appends survivors to the log; returns them.
    * Alerts schema: team STRING, ts TIMESTAMP, message STRING.
    */
  def rateLimitAndAppend(alerts: DataFrame, maxPerDay: Int,
                         orderCol: String = "ts",
                         appendedAt: org.apache.spark.sql.Column =
                           current_timestamp()): DataFrame = {
    val spark = alerts.sparkSession
    val withDay = alerts.withColumn("day", to_date(col("ts")))
    val counts = dailyCounts(spark)
    // message as tie-break: equal timestamps would otherwise make
    // row_number nondeterministic, and WHICH alerts survive the cap
    // (and get appended to the persistent log) could differ on retry.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("team", "day").orderBy(col(orderCol), col("message"))
    val survivors = withDay
      .join(broadcast(counts), Seq("team", "day"), "left")
      .withColumn("sent", coalesce(col("sent"), lit(0L)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") + col("sent") <= maxPerDay)
      .select(col("team"), col("ts").as("sent_at"), col("message"),
        // F27 (arbitrage_scanner.py:509-510): every appended row is
        // stamped with the append wall-clock rendered in
        // America/Phoenix — injectable for deterministic tests.
        graft.functions.Timestamps.phoenixDisplay(appendedAt).as("updated_at"))
    // Materialize BEFORE the append and CUT the lineage: the
    // survivors plan READS the log it is about to WRITE (the E3
    // feedback loop). A plain persist is not enough — writing to the
    // path recaches plans that scan it (recacheByPath), re-deriving
    // different counts post-append (SURVEY.md §7 risk 6).
    val pinned = survivors.localCheckpoint(true)
    pinned.write.mode("append").parquet(path)
    pinned
  }
}
