package graft.props

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Packing

/** ScalaCheck properties of harmonic whole-document packing: budget
  * feasibility and the class-occupancy invariant under RANDOM doc
  * lengths (including oversized and degenerate ones), plus
  * conservation (every packable doc packed exactly once). */
object PackingProps extends Properties("packing") {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private val Budget = 128

  // lengths across every class boundary: tiny, mid, boundary-exact,
  // oversized; zero excluded from packing by contract (generated to
  // prove the drop)
  private val docLen: Gen[Long] =
    Gen.frequency(
      (3, Gen.choose(1L, Budget.toLong)),
      (1, Gen.oneOf(Budget.toLong, Budget + 1L, 2L * Budget)),
      (1, Gen.const(0L)))

  private def packed(ns: List[Long]) = {
    val docs = ns.zipWithIndex
      .map { case (n, i) => (i.toLong, if (i % 2 == 0) "en" else "de", n) }
      .toDF("id", "grp", "n")
    Packing.harmonicPack(docs, "id", "n", Budget, Seq("grp"))
  }

  property("every non-overflow pack holds <= budget tokens") =
    forAll(Gen.listOfN(80, docLen)) { ns =>
      packed(ns).filter(!col("is_overflow"))
        .groupBy("pack_key").agg(sum("n").as("s"))
        .as[(String, Long)].collect()
        .forall(_._2 <= Budget)
    }

  property("class f packs hold at most max(f,1) docs") =
    forAll(Gen.listOfN(80, docLen)) { ns =>
      packed(ns).groupBy("pack_key", "fclass")
        .agg(count(lit(1)).as("c"))
        .as[(String, Long, Long)].collect()
        .forall { case (_, f, c) => c <= math.max(f, 1L) }
    }

  property("conservation: every n>0 doc packed exactly once, n=0 dropped") =
    forAll(Gen.listOfN(60, docLen)) { ns =>
      val ids = packed(ns).select("id").as[Long].collect().sorted.toSeq
      val expect = ns.zipWithIndex.collect { case (n, i) if n > 0 => i.toLong }
      ids == expect.sorted
    }

  property("overflow iff n > budget") =
    forAll(Gen.listOfN(60, docLen)) { ns =>
      packed(ns).select("n", "is_overflow").as[(Long, Boolean)].collect()
        .forall { case (n, o) => o == (n > Budget) }
    }
}
