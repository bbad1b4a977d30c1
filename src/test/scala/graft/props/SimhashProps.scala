package graft.props

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Dedup

/** Properties of the 64-bit SimHash: the fingerprint is a function of
  * the token MULTISET only (token order never matters — so partition
  * and shuffle order can't change it), duplicate documents collide,
  * and flipping one token moves few bits relative to unrelated text. */
object SimhashProps extends Properties("simhash64") {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val word: Gen[String] = for {
    n <- Gen.choose(2, 8)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
  } yield cs.mkString

  private val doc: Gen[List[String]] =
    Gen.choose(3, 30).flatMap(n => Gen.listOfN(n, word))

  private def fp(docs: (Long, String)*): Map[Long, Long] =
    Dedup.simhash64(docs.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long)].collect().toMap

  property("order-invariant: a shuffled token stream fingerprints identically") =
    forAll(doc, Gen.choose(1L, 1000L)) { (toks, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(toks)
      val m = fp(1L -> toks.mkString(" "), 2L -> shuffled.mkString(" "))
      m(1L) == m(2L)
    }

  property("identical docs collide; doubling the multiset preserves the fp") =
    forAll(doc) { toks =>
      // doubling every token count doubles every bit-sum, which
      // preserves its sign (and the >= 0 tie), so the fingerprint is
      // invariant — the scale-free property that makes the fp safe
      // under document repetition
      val m = fp(1L -> toks.mkString(" "), 2L -> toks.mkString(" "),
        3L -> (toks ++ toks).mkString(" "))
      m(1L) == m(2L) && m(1L) == m(3L)
    }
}
