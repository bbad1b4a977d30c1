package graft.expressions_test

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FloatDotProductSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (Array(0.1f, -0.2f), Array(0.3f, 0.4f))
  ).toDF("a", "b")

  test("matches the interpreted HOF fold bit for bit") {
    val hof = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x)
    val out = vecs.select(
      graft.operators.Similarity.dot(col("a"), col("b")).as("fast"), hof.as("slow"))
      .as[(Double, Double)].collect()
    out.foreach { case (fast, slow) =>
      assert(java.lang.Double.doubleToLongBits(fast) ==
        java.lang.Double.doubleToLongBits(slow))
    }
    assert(out.head._1 == 32.0) // 1*4 + 2*5 + 3*6
  }

  test("null array yields null") {
    val d = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = d.select(graft.operators.Similarity.dot(col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("null ELEMENT yields null even when arrays are non-null") {
    val d = Seq((Array[java.lang.Float](1.0f, null), Array[java.lang.Float](2.0f, 3.0f)))
      .toDF("a", "b")
    val r = d.select(graft.operators.Similarity.dot(col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("literal containsNull=false inputs execute in codegen") {
    // array(...) of literals has containsNull=false and nullable=false;
    // the expression itself is ALWAYS nullable (length mismatch -> null)
    // so ev.isNull stays a real variable and codegen must still compile
    // and evaluate against these non-nullable inputs.
    val d = spark.range(2).select(
      array(lit(1.0f), lit(2.0f)).as("a"), array(lit(3.0f), lit(0.5f)).as("b"))
    val e = graft.operators.Similarity.dot(col("a"), col("b")).as("d")
    val out = d.select(e).as[Double].collect()
    assert(out.toSeq == Seq(4.0, 4.0))
  }

  test("registered as SQL function float_dot via GraftExtensions") {
    vecs.createOrReplaceTempView("v")
    val r = spark.sql("SELECT float_dot(a, b) FROM v").as[Double].collect()
    assert(r.contains(32.0))
  }
}
