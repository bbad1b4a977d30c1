package graft.props

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Dedup

/** The PPJoin completeness theorem under random corpora: the
  * prefix-filtered join (with the length AND positional prunes)
  * must return EXACTLY the brute-force jaccard pairs — the prunes
  * may only drop candidates that cannot pass, never a true pair.
  * Random small-alphabet docs make high-jaccard pairs common, so the
  * filters are exercised at the boundary (equal-size near-identical
  * sets AND size-skewed pairs the length filter kills). */
object PrefixFilterProps extends Properties("prefixFilter") {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  // docs over a 12-word alphabet, 5-20 tokens: dense overlap
  private val word: Gen[String] = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "eps", "zeta",
    "eta", "theta", "iota", "kappa", "lam", "mu")
  private val doc: Gen[String] =
    Gen.choose(5, 20).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  private def bruteForce(docs: Seq[(Long, String)], n: Int,
                         permille: Int): Set[(Long, Long)] = {
    val sh = docs.map { case (id, text) =>
      id -> text.split(" ").toSeq.sliding(n).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      inter = (sa & sb).size
      if inter * 1000 >= permille * (sa.size + sb.size - inter)
    } yield (ia, ib)).toSet
  }

  property("prefix-filtered pairs == brute force at t=0.5 and t=0.8") =
    forAll(Gen.choose(6, 14).flatMap(k =>
      Gen.listOfN(k, doc))) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val sh = Dedup.shingleSets(docs.toDF("doc_id", "text"), "doc_id", "text", 2)
      Seq(500, 800).forall { pm =>
        val got = Dedup.prefixFilterPairs(sh, pm)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
        val want = bruteForce(docs, 2, pm)
        got == want
      }
    }
}
