package graft.props

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.BottomKDistinctAggregator

/** Properties of the KMV bottom-k-distinct sketch: the exact merge
  * law (bottom-k of per-part sketches == direct bottom-k of the
  * union — the identity that lets per-shard sketches answer global
  * distinct questions), and input-order independence (so partition
  * and shuffle order can't change the sketch). */
object BottomKDistinctProps extends Properties("bottomKDistinct") {

  private val agg = new BottomKDistinctAggregator(8)

  // small domain forces duplicates both within and across parts
  private val xsGen: Gen[List[Long]] = Gen.listOf(Gen.chooseNum(0L, 40L))

  property("merge law: split anywhere, merge, equals direct") =
    forAll(xsGen, Gen.chooseNum(0, 100)) { (xs, cutPct) =>
      val cut = xs.size * cutPct / 100
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      val direct = xs.foldLeft(agg.zero)(agg.reduce)
      merged.vals == direct.vals &&
        direct.vals == xs.distinct.sorted.take(8)
    }

  property("order independence: reversed input, same sketch") =
    forAll(xsGen) { xs =>
      xs.foldLeft(agg.zero)(agg.reduce).vals ==
        xs.reverse.foldLeft(agg.zero)(agg.reduce).vals
    }
}
