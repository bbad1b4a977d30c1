package graft.props

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.LateInteraction

/** ScalaCheck properties of the MaxSim late-interaction chain under
  * RANDOM corpora: the engine's scores equal an independent Scala
  * reference (md5 digests recomputed from scratch), and the
  * two-stage path with a full-corpus pool is exactly brute force. */
object LateInteractionProps extends Properties("lateinteraction") {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private val li = LateInteraction

  private def refVec(t: String): Array[Long] = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"mv:$t".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    (0 until li.Dim).map(j =>
      java.lang.Long.parseLong(hex.substring(5 * j, 5 * j + 5), 16) % 17L - 8L
    ).toArray
  }

  // small shared vocabulary so docs overlap (the corpus regime) plus
  // occasional fresh tokens
  private val token: Gen[String] =
    Gen.frequency(
      (4, Gen.oneOf("alpha", "beta", "gamma", "delta", "kilo", "zulu")),
      (1, Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)))

  private val doc: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, token).map(_.mkString(" ")))

  private def frames(texts: List[String]) = {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val dv = li.withVec(li.docTokens(docs, "doc_id", "text", 24), "t", "dc")
    val qv = li.withVec(
      li.docTokens(docs.filter(col("doc_id") < 2), "doc_id", "text", 6)
        .withColumnRenamed("doc_id", "query_id")
        .withColumnRenamed("t", "qt"), "qt", "qc")
    (docs, dv, qv)
  }

  private def refScores(texts: List[String]): Map[(Long, Long), Long] = {
    def toks(s: String, cap: Int) =
      "([a-z0-9]+)".r.findAllIn(s).toList.take(cap).distinct
    val corpus = texts.zipWithIndex.map { case (t, i) => i.toLong -> toks(t, 24) }
    val queries = texts.zipWithIndex.take(2)
      .map { case (t, i) => i.toLong -> toks(t, 6) }
    (for {
      (q, qts) <- queries if qts.nonEmpty
      (d, dts) <- corpus if d != q && dts.nonEmpty
    } yield (q, d) -> qts.map { qt =>
      dts.map(dt => refVec(qt).zip(refVec(dt)).map { case (a, b) => a * b }.sum).max
    }.sum).toMap
  }

  property("maxSimScores == independent Scala reference on random corpora") =
    forAll(Gen.listOfN(12, doc)) { texts =>
      val (_, dv, qv) = frames(texts)
      val got = li.maxSimScores(qv, dv).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      got == refScores(texts)
    }

  property("two-stage with pool >= corpus == brute top-k, rank for rank") =
    forAll(Gen.listOfN(12, doc)) { texts =>
      val (_, dv, qv) = frames(texts)
      val brute = li.topK(li.maxSimScores(qv, dv), 4).collect()
        .map(r => (r.getLong(0), r.getAs[Int]("rank"), r.getLong(2), r.getLong(3)))
        .toSet
      val cand = li.pooledTopC(qv, dv, c = texts.size + 1)
        .select("query_id", "doc_id")
      val two = li.topK(li.prunedMaxSimScores(qv, dv, cand), 4).collect()
        .map(r => (r.getLong(0), r.getAs[Int]("rank"), r.getLong(2), r.getLong(3)))
        .toSet
      two == brute
    }
}
