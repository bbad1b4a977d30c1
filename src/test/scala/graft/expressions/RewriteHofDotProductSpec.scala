package graft.expressions_test

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.FloatDotProduct

/** The injected optimizer rule: the declarative HOF dot-product over
  * float arrays is swapped for the codegen'd FloatDotProduct, with
  * bitwise-identical results on every edge the HOF chain defines. */
class RewriteHofDotProductSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def usesFloatDot(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[FloatDotProduct]))

  /** Round-trip through parquet: a literal-backed LocalRelation is
    * constant-folded to a result literal before the plan can be
    * inspected, hiding the rewrite. */
  private def viaParquet(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_hof_").toString
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("float-array HOF chain is rewritten to FloatDotProduct") {
    val d = viaParquet(Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b"))
    val q = d.select(hofDot(col("a"), col("b")).as("dot"))
    assert(usesFloatDot(q), q.queryExecution.optimizedPlan.toString)
    assert(q.as[Double].head() == 11.0)
  }

  test("rewrite preserves HOF null/empty/mismatch semantics exactly") {
    val d = viaParquet(Seq(
      (1, Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))), // 11.0
      (2, Some(Array(1.0f, 2.0f)), Some(Array(3.0f))),       // length mismatch -> null
      (3, Some(Array.empty[Float]), Some(Array.empty[Float])), // 0.0
      (4, None, Some(Array(1.0f)))                            // null array -> null
    ).toDF("row_no", "a", "b"))
    val q = d.select(col("row_no"), hofDot(col("a"), col("b")).as("dot"))
    assert(usesFloatDot(q))
    val out = q.orderBy("row_no").select("dot").as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(11.0), None, Some(0.0), None))
  }

  test("double arrays and float-typed products are NOT rewritten") {
    // double arrays: not the float_dot input type
    val dd = viaParquet(Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b"))
    assert(!usesFloatDot(dd.select(hofDot(col("a"), col("b")))))
    // float product WITHOUT the double casts: rounds to float first,
    // a genuinely different sum — must stay on the HOF path
    val df = viaParquet(Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b"))
    val noCast = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y).cast("array<double>"),
      lit(0.0), (acc, x) => acc + x)
    assert(!usesFloatDot(df.select(noCast)))
  }
}
