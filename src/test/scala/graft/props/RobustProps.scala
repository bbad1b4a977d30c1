package graft.props

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Robust

/** Properties of the distributed median/MAD outlier operator against
  * a driver-side brute-force reference on random data: the rank
  * median matches, and the flagged set is exactly the >k*MAD set. */
object RobustProps extends Properties("robust") {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  // a handful of entities, small per-entity samples, values with ties
  private val rows: Gen[List[(Long, String, Double)]] = for {
    n <- Gen.choose(5, 60)
    xs <- Gen.listOfN(n, Gen.zip(
      Gen.oneOf("a", "b", "c"),
      Gen.choose(-50, 50).map(_ / 4.0)))
  } yield xs.zipWithIndex.map { case ((e, v), i) => (i.toLong, e, v) }

  private def refMedian(vs: Seq[Double]): Double = {
    val sorted = vs.sorted
    sorted((sorted.size + 1) / 2 - 1) // R-1 lower-nearest rank
  }

  property("madOutliers == brute-force median/MAD filter") =
    forAll(rows) { xs =>
      val df = xs.toDF("id", "entity", "v")
      val got = Robust.madOutliers(df, "entity", "v", "id", k = 3.0)
        .select("id").as[Long].collect().toSet
      val expected = xs.groupBy(_._2).flatMap { case (_, es) =>
        val vs = es.map(_._3)
        val med = refMedian(vs)
        val mad = refMedian(vs.map(v => math.abs(v - med)))
        es.filter(e => math.abs(e._3 - med) > 3.0 * mad).map(_._1)
      }.toSet
      got == expected
    }
}
