package graft.queries

import graft.SparkSpec

/** Scale-group contracts beyond the DuckDB gate: q121's sketch
  * accuracy flag (the oracle pins within_tol TRUE; this exercises the
  * same bound at test scale) and q113's layout property (the point of
  * z-ordering is the bound, not the numbers). */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("q121 percentile_approx stays within 1% of the exact median") {
    val rows = Scale.queries("q121_quantile_audit")(spark, "/root/testdata/sf0.01")
      .select("l_returnflag", "within_tol")
      .as[(String, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, ok) =>
      assert(ok, s"flag=$flag percentile_approx exceeds the 1% bound")
    }
  }

  test("q113 z-blocks bound small rectangles: mean bbox area << full grid") {
    val rows = Scale.queries("q113_zorder_layout")(spark, "/root/testdata/sf0.01")
      .select("bbox_area").as[Long].collect()
    assert(rows.nonEmpty)
    val mean = rows.sum.toDouble / rows.length
    // 16-bit Morton on a 256x256 grid: each of the 256 z-blocks covers
    // a 16x16 tile (area 256) when fully populated — 1/256 of the
    // 65536-cell grid. Allow slack for sparsely hit blocks.
    assert(mean <= 512.0, s"mean bbox area $mean — z-order locality lost")
  }
}
