package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Odds, TextNorm}
import graft.operators.Reshape
import graft.sources.TextBlob

/** E2 (SURVEY.md §3): the bovada module — one scraped page text blob
  * -> long per-team quote rows, entirely with the F-battery + G2/G3
  * generators (bovada_pull.py:46-200 re-expressed; no iterrows, no
  * blank-then-coalesce dance).
  *
  * Section format (FIXTURES.md A3): after a date marker, each matchup
  * section reads
  *   `<h:mm AM/PM> <Team1Team2> <sp1>(<p1>)<sp2>(<p2>) O<t>(<p3>)U<t>(<p4>) <ml1><ml2>`
  * with the team pair camel-concatenated (the 49ers case splits
  * BEFORE a space-digit boundary, bovada_pull.py:105-118).
  */
object Bovada {

  /** Parse blobs into long quotes: (Team, BetType, Info, Bovada). */
  def quotes(blobs: DataFrame, textCol: String): DataFrame = {
    val sections = TextBlob.sections(blobs, textCol)
      // P5 (bovada_pull.py:55-56): junk rows are short " Bets" strings
      .filter(!(length(col("content")) < 25 && col("content").endsWith(" Bets")))

    // field extraction (bovada_pull.py:58-97 battery)
    val parsed = sections
      .withColumn("rest", regexp_replace(col("content"),
        "^\\d{1,2}:\\d{2} [AP]M ", ""))
      .withColumn("team_pair", trim(regexp_extract(col("rest"), "^([^+-]*?)(?=[+-]\\d)", 1)))
      .withColumn("team1", TextNorm.camelFirst(col("team_pair")))
      .withColumn("team2", TextNorm.camelSecond(col("team_pair")))
      .withColumn("spreads", regexp_extract_all(col("rest"),
        lit("([+-]\\d+(?:\\.\\d+)?)\\("), lit(1)))
      // anything inside parens: a payout can be "EVEN" or "+100",
      // not only a bare signed integer — a digits-only pattern would
      // under-count and the size filter would silently drop the
      // whole matchup (bovada_pull.py:152-154 normalizes EVEN).
      .withColumn("paren_payouts", regexp_extract_all(col("rest"),
        lit("\\(([^()]+)\\)"), lit(1)))
      .withColumn("totals", regexp_extract_all(col("rest"),
        lit("[OU](\\d+(?:\\.\\d+)?)"), lit(1)))
      .withColumn("mls", regexp_extract_all(col("rest"),
        lit("(?<!\\()(EVEN|[+-]\\d+)(?![\\d.(])"), lit(1)))
      .filter(size(col("spreads")) === 2 && size(col("paren_payouts")) === 4 &&
        size(col("totals")) === 2 && size(col("mls")) === 2)

    // G2 (bovada_pull.py:123-148): one row per side.
    val sides = Reshape.explodeSides(parsed, Seq(
      Seq("Team" -> col("team1"),
        "spread" -> element_at(col("spreads"), 1),
        "spread_pay" -> element_at(col("paren_payouts"), 1),
        "total" -> concat(lit("o"), element_at(col("totals"), 1)),
        "total_pay" -> element_at(col("paren_payouts"), 3),
        "ml" -> element_at(col("mls"), 1)),
      Seq("Team" -> col("team2"),
        "spread" -> element_at(col("spreads"), 2),
        "spread_pay" -> element_at(col("paren_payouts"), 2),
        "total" -> concat(lit("u"), element_at(col("totals"), 2)),
        "total_pay" -> element_at(col("paren_payouts"), 4),
        "ml" -> element_at(col("mls"), 2))))
      // team key reduced to the nickname (last word,
      // bovada_pull.py:167,180,191) — the odds grid and the dims join
      // on nicknames, so full names would silently match nothing.
      .withColumn("Team", TextNorm.lastToken(col("Team")))

    // O6 (bovada_pull.py:156-162): a team appearing in a SECOND
    // matchup (Monday pull showing tonight's and next weekend's game)
    // drops that second game whole — without this, duplicate
    // (Team, BetType, Info) keys would fan out the grid join.
    val deduped = Reshape.dropRepeatMatchups(sides, "Team",
      Seq(col("section_no"), col("side_no")))

    // G1/G3 (bovada_pull.py:164-200): five (BetType, Info) quote kinds
    // per side — ONE generator pass (a 5-way union of projections
    // would re-run the whole regex battery once per branch; Catalyst
    // does not share subplans across union arms). EVEN -> +100 and
    // N/A -> null normalization per bovada_pull.py:152-154.
    val kinds = array(
      struct(lit("ML").as("BetType"), lit("Payout").as("Info"),
        Odds.normalizePayout(col("ml")).as("Bovada")),
      struct(lit("Spread").as("BetType"), lit("Line").as("Info"),
        col("spread").as("Bovada")),
      struct(lit("Spread").as("BetType"), lit("Payout").as("Info"),
        Odds.normalizePayout(col("spread_pay")).as("Bovada")),
      struct(lit("Over/Under").as("BetType"), lit("Line").as("Info"),
        Odds.totalLineToSigned(col("total")).as("Bovada")),
      struct(lit("Over/Under").as("BetType"), lit("Payout").as("Info"),
        Odds.normalizePayout(col("total_pay")).as("Bovada")))
    deduped.select(col("Team"), explode(kinds).as("q"))
      .select(col("Team"), col("q.BetType").as("BetType"),
        col("q.Info").as("Info"), col("q.Bovada").as("Bovada"))
  }
}
