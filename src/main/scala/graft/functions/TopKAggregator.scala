package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k buffer as parallel arrays (a concrete Product, so
  * Encoders.product gives it a real schema — no kryo blobs). */
case class TopK(scores: Seq[Double], ids: Seq[Long]) {
  def pairs: Seq[(Double, Long)] = scores.zip(ids)
}

/** Typed Aggregator for group-wise top-k (SURVEY.md §2.10's extension
  * slot): keeps the k best (score, id) pairs per group in a bounded
  * buffer with map-side partial aggregation.
  *
  * Why not a window: row_number() over (partition ... order by score)
  * sorts EVERY row of every group and shuffles them all; the
  * aggregator is O(n log k) per input and shuffles only k rows per
  * group after partial aggregation — the difference between sorting
  * 100 TB and sorting k * |groups| rows.
  *
  * Ordering: score DESC, then id ASC — a total order, so results are
  * deterministic and oracle-checkable.
  */
class TopKAggregator(k: Int) extends Aggregator[(Double, Long), TopK, TopK] {

  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  private def fromPairs(xs: Seq[(Double, Long)]): TopK = {
    val top = xs.sorted(ord).take(k)
    TopK(top.map(_._1), top.map(_._2))
  }

  override def zero: TopK = TopK(Nil, Nil)

  /** Bounded insertion: when the buffer is full and the input sorts
    * at-or-after the current kth element, skip without re-sorting —
    * O(1) for the common reject path, O(k log k) only on insert.
    * NaN scores are dropped on input (NaN makes the Ordering
    * non-total; the row_number oracle would order them arbitrarily).
    */
  override def reduce(buf: TopK, in: (Double, Long)): TopK =
    if (in._1.isNaN) buf
    else if (buf.scores.size < k) fromPairs(in +: buf.pairs)
    else if (ord.compare(in, (buf.scores.last, buf.ids.last)) >= 0) buf
    else fromPairs(in +: buf.pairs)

  override def merge(a: TopK, b: TopK): TopK = fromPairs(a.pairs ++ b.pairs)
  override def finish(buf: TopK): TopK = buf

  override def bufferEncoder: Encoder[TopK] = Encoders.product[TopK]
  override def outputEncoder: Encoder[TopK] = Encoders.product[TopK]
}
