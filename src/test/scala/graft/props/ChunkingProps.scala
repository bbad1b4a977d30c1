package graft.props

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.TestSpark
import graft.operators.Chunking

/** ScalaCheck invariants of the chunking/truncation operators: for
  * any token count, the chunks reassemble the document exactly (drop
  * each chunk's leading `overlap` tokens after the first), and the
  * greedy char-budget prefix is maximal (keeping one more token would
  * break the budget). */
object ChunkingProps extends Properties("chunking") {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val nTokens: Gen[Int] = Gen.choose(1, 200)

  property("chunks reassemble the document exactly for any length") =
    forAll(Gen.listOfN(10, nTokens)) { ns =>
      val docs = ns.zipWithIndex.map { case (n, i) =>
        (i.toLong, (1 to n).map(t => s"w$t").mkString(" "))
      }
      val chunks = Chunking.chunk(docs.toDF("doc_id", "text"), "doc_id", "text", 32, 8)
        .select("doc_id", "chunk_no", "chunk_text")
        .as[(Long, Int, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3.split(" ").toSeq)).toMap
      docs.forall { case (id, text) =>
        val cs = chunks(id)
        // consecutive chunk numbers, full reassembly, overlap agreement
        cs.zip(cs.tail).forall { case (a, b) => a.takeRight(8) == b.take(8) } &&
          (cs.head ++ cs.tail.flatMap(_.drop(8))) == text.split(" ").toSeq
      }
    }

  property("char-budget prefix is maximal and within budget") =
    forAll(Gen.listOfN(8, Gen.choose(1, 12)), Gen.choose(1, 60)) { (lens, budget) =>
      // token i: l chars from [a-z0-9] (digit prefix then 'b' fill)
      val text = lens.zipWithIndex
        .map { case (l, i) => (i.toString + "b" * l).take(l) }
        .mkString(" ")
      val toks = text.split(" ").toSeq.filter(_.nonEmpty)
      val r = Chunking.truncateToCharBudget(
          Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", budget)
        .select("n_kept", "kept_chars").as[(Int, Long)].collect().head
      val (nKept, keptChars) = r
      val joined = (n: Int) => toks.take(n).map(_.length).sum + math.max(n - 1, 0)
      keptChars == joined(nKept) &&
        keptChars <= budget &&
        (nKept == toks.size || joined(nKept + 1) > budget)
    }
}
