package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** S4 + J1 (SURVEY.md §2.1, §2.4): team dimension CSVs and the
  * dim-enrichment join. The reference merges three per-sport CSVs one
  * after another and coalesces three abbreviation columns
  * (arbitrage_scanner.py:184-198); unioning the dims first collapses
  * that to ONE broadcast left join — the fact side never shuffles.
  */
object TeamDims {

  val Schema: StructType = StructType.fromDDL(
    "Team STRING, Sport STRING, Abbreviation STRING")

  /** Load one or more team-dim CSVs (header row, explicit schema —
    * never infer on a production path). */
  def load(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.option("header", "true").schema(Schema).csv(paths: _*)

  /** Enrich odds rows with the team abbreviation: single broadcast
    * left join on (Team, Sport); unmatched teams keep a null
    * abbreviation (the reference's fillna-chain outcome). */
  def enrich(odds: DataFrame, teams: DataFrame): DataFrame =
    odds.join(broadcast(teams), Seq("Team", "Sport"), "left")
}
