package graft.functions

import graft.SparkSpec

class BottomKDistinctSpec extends SparkSpec {

  test("buffer keeps the k smallest DISTINCT values, sorted ascending") {
    val agg = new BottomKDistinctAggregator(3)
    val buf = Seq(9L, 2L, 9L, 7L, 2L, 5L, 1L).foldLeft(agg.zero)(agg.reduce)
    // duplicates occupy ONE slot (9 and 2 repeat); bottom-3 of
    // {1,2,5,7,9} is {1,2,5}
    assert(agg.finish(buf).vals == Seq(1L, 2L, 5L))
  }

  test("full-buffer reject path: at-or-above the kth is skipped") {
    val agg = new BottomKDistinctAggregator(2)
    val full = Seq(3L, 1L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.reduce(full, 5L).vals == Seq(1L, 3L)) // above kth
    assert(agg.reduce(full, 3L).vals == Seq(1L, 3L)) // equal to kth (dup)
    assert(agg.reduce(full, 2L).vals == Seq(1L, 2L)) // below kth: inserted
  }
}
