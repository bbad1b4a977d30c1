package graft.props

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Similarity

/** ScalaCheck property for the r7 assignment refactor: the corpus
  * argmax as a STRUCT-MAX AGGREGATE (assignCellsScored — one row per
  * vector shuffles) must pick exactly the row the old formulation's
  * `row_number() OVER (ORDER BY cs DESC, cid ASC) = 1` window picks,
  * over random vectors INCLUDING NaN components (cs = NaN: struct
  * max treats NaN greatest, the window's desc sorts it first),
  * zero-norm vectors (cs = NULL via try_divide: struct field NULL
  * sorts smallest, desc-nulls-last ditto), and duplicate centroid
  * vectors (cs ties — the cid ASC tiebreak must agree). The 205-query
  * oracle gate proves this on real data; this property pins it on
  * adversarial corners no fixture covers. */
object AssignArgmaxProps extends Properties("assign_argmax") {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private val component: Gen[Float] = Gen.frequency(
    8 -> Gen.choose(-2.0f, 2.0f),
    1 -> Gen.const(0.0f),
    1 -> Gen.const(Float.NaN))

  private val vec: Gen[Seq[Float]] = Gen.frequency(
    8 -> Gen.listOfN(4, component).map(_.toSeq),
    1 -> Gen.const(Seq(0.0f, 0.0f, 0.0f, 0.0f))) // zero norm -> NULL cs

  private val corpusAndCents: Gen[(Seq[Seq[Float]], Seq[Seq[Float]])] = for {
    n  <- Gen.choose(1, 10)
    vs <- Gen.listOfN(n, vec)
    k  <- Gen.choose(1, 4)
    cs <- Gen.listOfN(k, vec)
    // duplicate a centroid VECTOR under a new id with prob ~1/2:
    // exact cs ties across distinct cids exercise the tiebreak
    dup <- Gen.oneOf(true, false)
  } yield (vs, if (dup) cs :+ cs.head else cs)

  /** The cs column both formulations rank on (cosineScore's public
    * reconstruction: round-6 cosine, try_divide so zero-norm -> NULL). */
  private def cs(v: org.apache.spark.sql.Column,
                 c: org.apache.spark.sql.Column) =
    round(try_divide(Similarity.dot(v, c),
      sqrt(Similarity.norm2(v) * Similarity.norm2(c))), 6)

  private def bits(d: Any): Any = d match {
    case x: java.lang.Double => java.lang.Double.doubleToLongBits(x)
    case other => other
  }

  property("struct-max aggregate == rnk-1 window, incl. NaN/NULL/ties") =
    forAll(corpusAndCents) { case (vs, centVecs) =>
      val vecs = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val cents = centVecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val got = Similarity.assignCellsScored(vecs, cents,
          "vec_id", "embedding")
        .select("id", "cell", "cs").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), bits(r.get(2)))).toMap
      val v = vecs.select(col("vec_id").as("id"), col("embedding").as("v"))
      val c = cents.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val w = Window.partitionBy("id").orderBy(col("cs").desc, col("cid").asc)
      val ref = v.join(broadcast(c))
        .withColumn("cs", cs(col("v"), col("cv")))
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
        .select("id", "cid", "cs").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), bits(r.get(2)))).toMap
      got == ref
    }
}
