package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries live in graft.queries.* groups (one object per SURVEY.md §2
  * operator family); this object aggregates them. Each query has a
  * DuckDB-dialect oracle kept in the same file as its Spark plan.
  */
object SparkEntry {
  private val groups: Seq[QueryGroup] = Seq(
    q.Relational,
    q.Domain,
    q.TrainingData,
    q.Extensions,
    q.Curation,
    q.Scale,
    q.Learn,
    q.Retrieval,
    q.Pack
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Pricing-summary aggregate over lineitem — exercises parquet scan,
    * partial aggregation, and decimal-exact sums.
    */
  def entry(spark: SparkSession): DataFrame =
    q.Relational.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.flatMap(_.oracles).toMap
}
