package graft.props

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.TestSpark
import graft.operators.Dedup

/** The incremental-CC contract on RANDOM graphs: for ANY edge set and
  * ANY split into standing/batch, clustering the standing edges and
  * folding the batch in must equal clustering everything at once —
  * the q182 oracle property, here exercised across arbitrary graph
  * shapes (chains, stars, bridges, isolated merges) instead of one
  * corpus. */
object IncrementalCcProps extends Properties("incrementalCC") {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  /** Random edges over a small id space (dense enough to force merges). */
  private val edges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 18)
    es <- Gen.listOfN(n, for {
      a <- Gen.choose(0L, 11L)
      b <- Gen.choose(0L, 11L) if a != b
    } yield (a, b))
  } yield es

  private def cc(es: Seq[(Long, Long)]): Map[Long, Long] =
    if (es.isEmpty) Map.empty
    else Dedup.connectedComponents(es.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  /** Reference union-find (driver-side, path-compressed, union-by-min)
    * — the INDEPENDENT oracle the distributed fixpoint must match:
    * attaching the larger root under the smaller keeps the root the
    * component's min id at every step. */
  private def refCC(es: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    es.flatMap(e => Seq(e._1, e._2)).distinct.map(i => i -> find(i)).toMap
  }

  property("pointer-jumping fixpoint == reference union-find") =
    forAll(edges) { es => es.isEmpty || cc(es) == refCC(es) }

  /** The pointer-jumping adversarial case: one long CHAIN (diameter =
    * n), edges delivered shuffled — plain propagation's O(diameter)
    * worst case, the shape the label-of-label jump exists for. */
  property("long shuffled chains cluster to the chain min (the " +
    "O(log d) adversarial shape)") =
    forAll(Gen.choose(5, 30), Gen.choose(0L, 1000L)) { (n, off) =>
      val chain = (0 until n).map(i => (off + i, off + i + 1))
      val shuffled = scala.util.Random.shuffle(chain.toList)
      val got = cc(shuffled)
      got.nonEmpty && got.values.forall(_ == off) &&
        got.keySet == (off to off + n).toSet
    }

  property("fold(standing, batch) == full recompute, for any split") =
    forAll(edges, Gen.choose(0, 100)) { (es, splitPct) =>
      val k = es.length * splitPct / 100
      val (standing, batch) = es.splitAt(k)
      val full = cc(es)
      val incremental =
        if (batch.isEmpty) cc(standing)
        else Dedup.connectedComponentsIncremental(
            if (standing.isEmpty)
              Seq.empty[(Long, Long)].toDF("id", "cluster")
            else Dedup.connectedComponents(standing.toDF("id_a", "id_b")),
            batch.toDF("id_a", "id_b"))
          .as[(Long, Long)].collect().toMap
      incremental == full
    }

  property("folding a batch twice equals folding it once (idempotent)") =
    forAll(edges) { es =>
      val (standing, batch) = es.splitAt(es.length / 2)
      if (batch.isEmpty) true
      else {
        val base =
          if (standing.isEmpty) Seq.empty[(Long, Long)].toDF("id", "cluster")
          else Dedup.connectedComponents(standing.toDF("id_a", "id_b"))
        val once = Dedup.connectedComponentsIncremental(
          base, batch.toDF("id_a", "id_b"))
        val twice = Dedup.connectedComponentsIncremental(
            once, batch.toDF("id_a", "id_b"))
          .as[(Long, Long)].collect().toMap
        twice == once.as[(Long, Long)].collect().toMap
      }
    }
}
