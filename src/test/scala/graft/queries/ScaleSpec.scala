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

  test("madOutliers flags only >k*MAD deviations, MAD=0 degenerates sanely") {
    import org.apache.spark.sql.functions._
    // u1: values [1,1,1,10] -> med=1, devs [0,0,0,9], MAD=0 -> only
    // the 10 is flagged (9 > 3*0). u2: [1,2,3] -> med=2, MAD=1 ->
    // max dev 1 <= 3 -> nothing flagged. The null value must neither
    // shift u1's rank-median nor be flagged itself.
    val ev = Seq((1L, "u1", Some(1.0)), (2L, "u1", Some(1.0)),
      (3L, "u1", Some(1.0)), (4L, "u1", Some(10.0)), (8L, "u1", None),
      (5L, "u2", Some(1.0)), (6L, "u2", Some(2.0)), (7L, "u2", Some(3.0)))
      .toDF("event_id", "user_id", "value")
    val out = graft.operators.Robust
      .madOutliers(ev, "user_id", "value", "event_id", k = 3.0)
      .select("event_id", "med", "mad").as[(Long, Double, Double)].collect().toSeq
    assert(out == Seq((4L, 1.0, 0.0)))
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
