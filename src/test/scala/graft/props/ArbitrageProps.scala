package graft.props

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.Odds
import graft.operators.Reshape

/** ScalaCheck properties (SURVEY.md §5.4): domain invariants of the
  * arbitrage math and the order-reconstruction operators, evaluated
  * through the actual Column expressions on batched generated rows.
  */
object ArbitrageProps extends Properties("arbitrage") {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val american: Gen[Int] =
    Gen.oneOf(Gen.choose(100, 2000), Gen.choose(-2000, -101))

  property("decimal odds are > 1 and ordered with payout attractiveness") =
    forAll(Gen.listOfN(50, american)) { as =>
      val rows = as.toDF("a")
        .select(col("a"), Odds.americanToDecimal(col("a").cast("double")).as("d"))
        .as[(Int, Double)].collect()
      rows.forall { case (a, d) =>
        d > 1.0 &&
          // reconstruct: positive a -> a/100+1; negative -> 100/|a|+1
          math.abs(d - (if (a > 0) a / 100.0 + 1 else 100.0 / math.abs(a) + 1)) < 1e-9
      }
    }

  property("arb profit is positive iff 1/d1 + 1/d2 < 1 (away from the boundary)") =
    forAll(Gen.listOfN(40, Gen.zip(american, american))) { pairs =>
      val df = pairs.toDF("a1", "a2")
        .select(Odds.americanToDecimal(col("a1").cast("double")).as("d1"),
          Odds.americanToDecimal(col("a2").cast("double")).as("d2"))
        .withColumn("payout", round(col("d1") * 100, 2))
        .withColumn("stake2", Odds.hedgeStake(col("payout"), col("d2")))
        .withColumn("profit", col("payout") - (col("stake2") + 100.0))
      df.as[(Double, Double, Double, Double, Double)].collect().forall {
        case (d1, d2, _, _, profit) =>
          val inv = 1.0 / d1 + 1.0 / d2
          // 2dp stake rounding blurs the boundary: only assert clear cases
          if (math.abs(inv - 1.0) < 1e-3) true
          else (profit > 0) == (inv < 1.0)
      }
    }

  property("both legs pay out equally after hedging (within rounding)") =
    forAll(Gen.listOfN(40, Gen.zip(american, american))) { pairs =>
      val rows = pairs.toDF("a1", "a2")
        .select(Odds.americanToDecimal(col("a1").cast("double")).as("d1"),
          Odds.americanToDecimal(col("a2").cast("double")).as("d2"))
        .withColumn("payout", round(col("d1") * 100, 2))
        .withColumn("stake2", Odds.hedgeStake(col("payout"), col("d2")))
        .withColumn("leg2_payout", col("stake2") * col("d2"))
        .as[(Double, Double, Double, Double, Double)].collect()
      // hedge stake is rounded to cents: payouts match within d2 cents
      rows.forall { case (_, d2, payout, _, leg2) =>
        math.abs(leg2 - payout) <= d2 * 0.005 + 1e-9
      }
    }

  property("pairId is a bijection onto 1..n/2 with every pair size 2") =
    forAll(Gen.choose(1, 30)) { nPairs =>
      val n = nPairs * 2
      val ids = (1 to n).toDF("ord")
        .withColumn("g", lit("g"))
        .withColumn("pair", Reshape.pairId(Seq("g"), Seq(col("ord"))))
        .select("pair").as[Int].collect()
      val counts = ids.groupBy(identity).view.mapValues(_.length).toMap
      counts.keySet == (1 to nPairs).toSet && counts.values.forall(_ == 2)
    }

  property("as-of join matches a brute-force reference on random data") =
    forAll(Gen.listOfN(25, Gen.zip(Gen.choose(1, 3), Gen.choose(0, 1000))),
      Gen.listOfN(10, Gen.zip(Gen.choose(1, 3), Gen.choose(0, 1000)))) { (ls, rsRaw) =>
      import graft.operators.AsOfJoin
      // dedup right per (key, ts) as the operator contract requires
      val rs = rsRaw.distinct.groupBy(identity).keys.toList
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (s"k$k", new java.sql.Timestamp(t * 1000L), i.toLong) }
        .toDF("key", "ts", "lid")
      val right = rs.map { case (k, t) =>
        (s"k$k", new java.sql.Timestamp(t * 1000L), t.toDouble) }
        .toDF("key", "qts", "px")
      val got = AsOfJoin.backward(left, right, Seq("key"), "ts", "qts", Seq("px"))
        .select("lid", "px").as[(Long, Option[Double])].collect().toMap
      ls.zipWithIndex.forall { case ((k, t), i) =>
        val expected = rs.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.map(_._2.toDouble)
        got(i.toLong) == expected
      }
    }

  property("null-keeping inequality parity: null rows survive the filter") =
    forAll(Gen.listOfN(30, Gen.option(Gen.oneOf("error", "ok", "warn")))) { vals =>
      val df = vals.toDF("status")
      val kept = df.filter(col("status").isNull || col("status") =!= "error")
        .as[Option[String]].collect()
      val expected = vals.filter(v => v.isEmpty || v.get != "error")
      kept.toSeq.sortBy(_.getOrElse("")) == expected.sortBy(_.getOrElse(""))
    }
}
