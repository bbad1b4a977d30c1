package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) sketch state: the k smallest DISTINCT
  * hash values seen, sorted ascending (a concrete Product, so
  * Encoders.product gives it a real schema — no kryo blobs). */
case class KmvSketch(vals: Seq[Long])

/** Typed Aggregator building a KMV bottom-k-distinct sketch — the
  * classic mergeable distinct-count estimator (Bar-Yossef et al.'s
  * k-minimum-values; reference behavior: count distinct contents per
  * source without a global distinct shuffle).
  *
  * Why not `countDistinct`: exact distinct shuffles EVERY distinct
  * value to its group's reducer; this aggregator shuffles at most k
  * values per group after map-side partial aggregation, and its
  * estimate `(k-1) / (kth_min / 2^48)` is within ~1/sqrt(k-2)
  * relative error. Unlike TopKAggregator the buffer DEDUPES on
  * insert — a value seen twice must not occupy two slots, or the
  * kth minimum (the estimator's whole input) drifts low.
  *
  * Merge law (exact, order- and partition-independent): the bottom-k
  * of a union is the bottom-k of the per-part bottom-ks. That makes
  * per-shard sketches answer the global question by union — the
  * q129/q146 registry discipline — and makes every estimate here
  * deterministic and oracle-checkable.
  */
class BottomKDistinctAggregator(k: Int)
    extends Aggregator[Long, KmvSketch, KmvSketch] {
  require(k >= 1, s"BottomKDistinctAggregator: k must be >= 1, got $k")

  override def zero: KmvSketch = KmvSketch(Nil)

  /** O(1) for the common reject path (full buffer, hash >= current
    * kth); O(log k) dup check on the sorted buffer; O(k log k) only
    * on a real insert. */
  override def reduce(buf: KmvSketch, h: Long): KmvSketch = {
    val v = buf.vals
    if (v.size >= k && h >= v.last) buf
    else if (java.util.Arrays.binarySearch(v.toArray, h) >= 0) buf
    else KmvSketch((h +: v).sorted.take(k))
  }

  override def merge(a: KmvSketch, b: KmvSketch): KmvSketch =
    KmvSketch((a.vals ++ b.vals).distinct.sorted.take(k))

  override def finish(buf: KmvSketch): KmvSketch = buf

  override def bufferEncoder: Encoder[KmvSketch] = Encoders.product[KmvSketch]
  override def outputEncoder: Encoder[KmvSketch] = Encoders.product[KmvSketch]
}
