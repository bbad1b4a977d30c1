package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Betting-odds domain functions from the reference, re-expressed as
  * pure Column => Column combinators (whole-stage-codegen friendly —
  * zero UDFs, per SURVEY.md §2.10).
  *
  * Reference semantics (cited per function):
  *   - arbitrage_scanner.py:360-366 american→decimal conversion
  *   - arbitrage_scanner.py:90-99   bet-type classifier
  *   - arbitrage_scanner.py:381-391 plus-prefix display form
  *   - arbitrage_scanner.py:368-378 stake sizing + profit margin
  *   - arbitrage_scanner.py:152-154,178-179 EVEN / o/u normalization
  */
object Odds {

  /** American odds → decimal odds (arbitrage_scanner.py:360-366):
    * +150 → 2.5, -200 → 1.5; 0/invalid → 1.0 (a no-payout leg).
    */
  def americanToDecimal(c: Column): Column =
    when(c > 0, c / 100 + 1)
      .when(c < 0, lit(100) / abs(c) + 1)
      .otherwise(lit(1.0))

  /** Classify a raw quote string into a bet type
    * (arbitrage_scanner.py:90-99): o/u chars ⇒ Over/Under; short
    * 4-5 char token ⇒ ML; +/- ⇒ Spread; else ERROR.
    */
  def betType(c: Column): Column =
    when(c.rlike("[ou]"), lit("Over/Under"))
      .when(length(c).isin(4, 5), lit("ML"))
      .when(c.rlike("[+-]"), lit("Spread"))
      .otherwise(lit("ERROR"))

  /** Display form with explicit sign for positive american odds
    * (arbitrage_scanner.py:381-386): 150 → "+150", -110 → "-110".
    */
  def plusPrefix(c: Column): Column = format_string("%+d", c.cast("int"))

  /** Normalize scraped payout text (arbitrage_scanner.py:152-154,
    * 178-179): EVEN/even → +100; N/A → null.
    */
  def normalizePayout(c: Column): Column = {
    val evened = regexp_replace(c, "(?i)^EVEN$", "+100")
    when(evened === "N/A", lit(null).cast("string")).otherwise(evened)
  }

  /** Over/Under line text → signed line (arbitrage_scanner.py:178-179):
    * o47.5 → +47.5, u47.5 → -47.5.
    */
  def totalLineToSigned(c: Column): Column =
    translate(c, "oOuU", "++--")

  /** Leg-2 stake given the pair's payout and this leg's decimal odds
    * (arbitrage_scanner.py:368-370): both legs pay out equally.
    */
  def hedgeStake(payout: Column, decimalOdds: Column): Column =
    round(payout / decimalOdds, 2)

  /** Profit margin percent, integer-rounded
    * (arbitrage_scanner.py:378): (payout - totalStake)/totalStake*100.
    */
  def profitMargin(payout: Column, totalStake: Column): Column =
    round((payout - totalStake) / totalStake * 100).cast("int")

  /** Custom categorical sort key (arbitrage_scanner.py:167-169):
    * ML < Spread < Over/Under.
    */
  def betTypeSortKey(c: Column): Column =
    when(c === "ML", 0).when(c === "Spread", 1).otherwise(2)
}
