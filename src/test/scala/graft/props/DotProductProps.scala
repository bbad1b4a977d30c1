package graft.props

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.TestSpark

/** ScalaCheck property for the HOF→FloatDotProduct rewrite: the
  * DataFrame result (rewritten to the codegen'd expression) must be
  * BITWISE equal to a driver-side Scala reference fold with the same
  * IEEE operation order — over random floats including negatives,
  * subnormals-adjacent magnitudes, NaN and infinities. */
object DotProductProps extends Properties("float_dot") {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val float: Gen[Float] = Gen.frequency(
    8 -> Gen.choose(-1e6f, 1e6f),
    2 -> Gen.choose(-1e-6f, 1e-6f),
    1 -> Gen.oneOf(Float.NaN, Float.PositiveInfinity,
      Float.NegativeInfinity, 0.0f, -0.0f))

  private val pair: Gen[(Array[Float], Array[Float])] = for {
    n <- Gen.choose(0, 65)
    a <- Gen.listOfN(n, float)
    b <- Gen.listOfN(n, float)
  } yield (a.toArray, b.toArray)

  private def refFold(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)

  private def hof = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
    lit(0.0), (acc, x) => acc + x)

  /** A literal-backed LocalRelation constant-folds through the
    * interpreted HOF before the injected rewrite runs — round-trip
    * through parquet so the property actually exercises the
    * codegen'd FloatDotProduct (and assert it is in the plan). */
  private def viaParquet(rows: Seq[(Int, Array[Float], Array[Float])]) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_dotprop_").toString
    rows.toDF("i", "a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def usesFloatDot(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.graft.FloatDotProduct]))

  property("rewritten HOF dot == driver-side reference fold, bitwise") =
    forAll(Gen.listOfN(16, pair)) { pairs =>
      val rows = pairs.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      val q = viaParquet(rows).select(col("i"), hof.as("d"))
      val out = q.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      usesFloatDot(q) && pairs.zipWithIndex.forall { case ((a, b), i) =>
        java.lang.Double.doubleToLongBits(out(i)) ==
          java.lang.Double.doubleToLongBits(refFold(a, b))
      }
    }

  property("length mismatch yields null (zip_with pad semantics)") =
    forAll(Gen.choose(1, 32)) { n =>
      val q = viaParquet(Seq((0, Array.fill(n)(1.0f), Array.fill(n + 1)(1.0f))))
        .select(hof.as("d"))
      usesFloatDot(q) && q.collect().head.isNullAt(0)
    }
}
