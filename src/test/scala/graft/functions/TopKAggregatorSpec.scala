package graft.functions

import graft.SparkSpec

class TopKAggregatorSpec extends SparkSpec {

  test("reduce/merge keep the k best with (score desc, id asc) order") {
    val agg = new TopKAggregator(3)
    val items = Seq((5.0, 10L), (9.0, 2L), (9.0, 1L), (1.0, 7L), (7.0, 4L))
    val half = items.take(2).foldLeft(agg.zero)(agg.reduce)
    val other = items.drop(2).foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(agg.merge(half, other))
    // 9.0 tie broken by id asc; 5.0 and 1.0 fall out of the top 3
    assert(out.pairs == Seq((9.0, 1L), (9.0, 2L), (7.0, 4L)))
  }

  test("merge with empty buffers and fewer than k items") {
    val agg = new TopKAggregator(5)
    val one = agg.reduce(agg.zero, (3.0, 1L))
    assert(agg.finish(agg.merge(one, agg.zero)).pairs == Seq((3.0, 1L)))
    assert(agg.finish(agg.zero).pairs.isEmpty)
  }

  test("full-buffer reject path skips worse and ties, accepts better") {
    val agg = new TopKAggregator(2)
    val full = Seq((9.0, 1L), (7.0, 4L)).foldLeft(agg.zero)(agg.reduce)
    // worse than the kth -> rejected without resort
    assert(agg.reduce(full, (6.0, 9L)).pairs == Seq((9.0, 1L), (7.0, 4L)))
    // equal (score, id) to the kth -> rejected (duplicate)
    assert(agg.reduce(full, (7.0, 4L)).pairs == Seq((9.0, 1L), (7.0, 4L)))
    // same score, smaller id -> sorts before the kth -> accepted
    assert(agg.reduce(full, (7.0, 2L)).pairs == Seq((9.0, 1L), (7.0, 2L)))
    // better score -> accepted
    assert(agg.reduce(full, (8.0, 5L)).pairs == Seq((9.0, 1L), (8.0, 5L)))
  }

  test("NaN scores are dropped on input") {
    val agg = new TopKAggregator(3)
    val buf = Seq((Double.NaN, 1L), (2.0, 2L), (Double.NaN, 3L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf).pairs == Seq((2.0, 2L)))
  }
}
