package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Domain semantics from the reference scanner
  * (arbitrage_scanner.py:90-99, 360-391): the highest-risk pure
  * functions per SURVEY.md §5. */
class OddsSpec extends SparkSpec {
  import spark.implicits._

  test("americanToDecimal: +150 -> 2.5, -200 -> 1.5, 0 -> 1.0") {
    val in = Seq(150.0, -200.0, 0.0, 100.0, -100.0).toDF("a")
    val out = col1[Double](in.select(Odds.americanToDecimal(col("a"))))
    assert(out == Seq(2.5, 1.5, 1.0, 2.0, 2.0))
  }

  test("betType classifier: o/u, ML token length, spread sign, ERROR") {
    val cases = Seq(
      "o47.5" -> "Over/Under", "u47.5" -> "Over/Under",
      "+150" -> "ML", "-1200" -> "ML", // 4-5 chars, no o/u
      "+3.5 -110" -> "Spread",
      "zz" -> "ERROR")
    val in = cases.map(_._1).toDF("q")
    val out = col1[String](in.select(Odds.betType(col("q"))))
    assert(out == cases.map(_._2))
  }

  test("plusPrefix adds explicit sign for positives only") {
    val in = Seq(150, -110, 0).toDF("v")
    assert(col1[String](in.select(Odds.plusPrefix(col("v")))) ==
      Seq("+150", "-110", "+0"))
  }

  test("normalizePayout: EVEN -> +100, N/A -> null") {
    val in = Seq("EVEN", "even", "N/A", "-105").toDF("p")
    assert(col1[String](in.select(Odds.normalizePayout(col("p")))) ==
      Seq("+100", "+100", null, "-105"))
  }

  test("totalLineToSigned maps o/u to +/-") {
    val in = Seq("o47.5", "u47.5", "O3", "U3").toDF("l")
    assert(col1[String](in.select(Odds.totalLineToSigned(col("l")))) ==
      Seq("+47.5", "-47.5", "+3", "-3"))
  }

  test("stake sizing makes both legs pay out equally (property)") {
    // For any two american odds with a positive arb sum, leg1 stakes
    // 100 with payout d1*100; leg2 stakes payout/d2 so its payout is
    // (payout/d2)*d2 = payout — equal by construction. Check the
    // column math agrees with direct computation.
    val quotes = Seq((225.0, -180.0), (150.0, -120.0), (110.0, 105.0))
    val in = quotes.toDF("a1", "a2")
    val out = in.select(
      Odds.americanToDecimal(col("a1")).as("d1"),
      Odds.americanToDecimal(col("a2")).as("d2"))
      .withColumn("payout", round(col("d1") * 100, 2))
      .withColumn("stake2", Odds.hedgeStake(col("payout"), col("d2")))
      .withColumn("leg2_payout", col("stake2") * col("d2"))
      .collect()
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("leg2_payout") - r.getAs[Double]("payout")) < 0.02)
    }
  }

  test("profitMargin: integer-rounded percent") {
    val in = Seq((325.0, 300.0), (200.0, 210.0)).toDF("payout", "total")
    assert(col1[Int](in.select(Odds.profitMargin(col("payout"), col("total")))) ==
      Seq(8, -5))
  }
}
