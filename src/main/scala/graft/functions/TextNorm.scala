package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scraped-text normalization battery from the reference
  * (SURVEY.md §2.9 F1-F15), as pure Column combinators. The camel-split
  * is the one function the reference implements as a Python callable
  * (bovada_pull.py:105-118); here it is a regex expression with the
  * 49ers special case, parity-tested in TextNormSpec.
  */
object TextNorm {

  /** Strip a leading rank prefix, e.g. "12 Chiefs" → "Chiefs"
    * (arbitrage_scanner.py:77). */
  def stripLeadingRank(c: Column): Column = regexp_replace(c, "^\\d+ ", "")

  /** Strip a trailing parenthesized rank, e.g. "Chiefs (3-1)" → "Chiefs"
    * (bovada_pull.py:151). */
  def stripParenSuffix(c: Column): Column = regexp_replace(c, " \\(.+\\)$", "")

  /** Extract the spread token before a paren: "-3.5(-110)" → "-3.5"
    * (bovada_pull.py:70,77). */
  def spreadBeforeParen(c: Column): Column = regexp_extract(c, "([-+][^(]*?)\\(", 1)

  /** Extract the payout inside parens: "-3.5(-110)" → "-110"
    * (bovada_pull.py:72,79). */
  def payoutInParen(c: Column): Column = regexp_extract(c, "\\((.*?)\\)", 1)

  /** First whitespace token (arbitrage_scanner.py:151). */
  def firstToken(c: Column): Column = element_at(split(c, " "), 1)

  /** Last whitespace token (bovada_pull.py:167,180,191). */
  def lastToken(c: Column): Column = element_at(split(c, " "), -1)

  /** Everything after the first space (arbitrage_scanner.py:155-162). */
  def afterFirstSpace(c: Column): Column = regexp_replace(c, "^\\S+ ", "")

  /** Trailing " +" strip per bookie column (arbitrage_scanner.py:86-87). */
  def rstripPlus(c: Column): Column = regexp_replace(c, "[ +]+$", "")

  /** First team of a concatenated pair, split at the first camel
    * boundary: "Seattle SeahawksSan Francisco 49ers" → "Seattle
    * Seahawks" (bovada_pull.py:105-110). A camel boundary is a
    * lower→upper or digit→upper transition with no space between.
    */
  def camelFirst(c: Column): Column = regexp_extract(c, "^(.*?[a-z0-9])(?=[A-Z])", 1)

  /** Second team of a concatenated pair (bovada_pull.py:112-116),
    * with the "49ers" special case (a team may START with digits:
    * "...Seahawks San Francisco 49ers" splits before "San", not
    * inside "49ers").
    */
  def camelSecond(c: Column): Column = regexp_replace(c, "^(.*?[a-z0-9])(?=[A-Z])", "")

  /** F10 (bovada_pull.py:58-66): positional find + dynamic substring —
    * everything after the first occurrence of `marker` plus `offset`
    * more characters; empty when the marker is absent (pandas find
    * returns -1 and the slice degenerates). locate() is 1-based.
    */
  def afterMarker(c: Column, marker: String, offset: Int = 0): Column =
    when(locate(marker, c) > 0,
      c.substr(locate(marker, c) + marker.length + offset, length(c)))
      .otherwise(lit(""))

  /** Sign character of a numeric string (arbitrage_scanner.py:428). */
  def signChar(c: Column): Column = substring(c, 1, 1)

  /** Blank values containing any bet-markup char ()OU
    * (bovada_pull.py:172). */
  def blankMarkup(c: Column): Column =
    when(c.rlike("[()OU]"), lit("")).otherwise(c)
}
