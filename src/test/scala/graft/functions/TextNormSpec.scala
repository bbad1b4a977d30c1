package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity corpus for the scraped-text battery (SURVEY.md §2.9),
  * especially the camel-boundary team split — the one reference
  * function implemented as a Python callable (bovada_pull.py:105-118).
  */
class TextNormSpec extends SparkSpec {
  import spark.implicits._

  test("camel split: pairs split at lower->Upper boundary") {
    val cases = Seq(
      ("Seattle SeahawksSan Francisco 49ers", "Seattle Seahawks", "San Francisco 49ers"),
      ("Buffalo BillsMiami Dolphins", "Buffalo Bills", "Miami Dolphins"),
      ("San Francisco 49ersLos Angeles Rams", "San Francisco 49ers", "Los Angeles Rams"))
    val in = cases.map(_._1).toDF("t")
    val first = col1[String](in.select(TextNorm.camelFirst(col("t"))))
    val second = col1[String](in.select(TextNorm.camelSecond(col("t"))))
    assert(first == cases.map(_._2))
    assert(second == cases.map(_._3))
  }

  test("regex battery: rank strip, paren strip, spread/payout extract") {
    val in = Seq("12 Chiefs").toDF("t")
    assert(col1[String](in.select(TextNorm.stripLeadingRank(col("t")))) == Seq("Chiefs"))
    val in2 = Seq("Chiefs (3-1)").toDF("t")
    assert(col1[String](in2.select(TextNorm.stripParenSuffix(col("t")))) == Seq("Chiefs"))
    val in3 = Seq("-3.5(-110)").toDF("t")
    assert(col1[String](in3.select(TextNorm.spreadBeforeParen(col("t")))) == Seq("-3.5"))
    assert(col1[String](in3.select(TextNorm.payoutInParen(col("t")))) == Seq("-110"))
  }

  test("token extraction: first/last token, after first space") {
    val in = Seq("-110 extra words here").toDF("t")
    assert(col1[String](in.select(TextNorm.firstToken(col("t")))) == Seq("-110"))
    assert(col1[String](in.select(TextNorm.lastToken(col("t")))) == Seq("here"))
    assert(col1[String](in.select(TextNorm.afterFirstSpace(col("t")))) == Seq("extra words here"))
  }

  test("rstripPlus and markup blanking") {
    val in = Seq("-110 +").toDF("t")
    assert(col1[String](in.select(TextNorm.rstripPlus(col("t")))) == Seq("-110"))
    val in2 = Seq("(110)", "plain").toDF("t")
    assert(col1[String](in2.select(TextNorm.blankMarkup(col("t")))) == Seq("", "plain"))
  }
}
