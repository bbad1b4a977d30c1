package graft.queries

import graft.SparkSpec

/** q91 has no DuckDB oracle (HLL sketches can't hash-match across
  * engines); its accuracy contract lives here instead: the default
  * approx_count_distinct rsd is 5%, so the observed relative error
  * vs the exact count must stay within that at test scale. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("q91 approx_count_distinct stays within 5% of the exact count") {
    val rows = Extensions.queries("q91_approx_distinct")(spark, "/root/testdata/sf0.01")
      .select("event_type", "rel_err").as[(String, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, err) =>
      assert(err <= 0.05, s"event_type=$et rel_err=$err exceeds the 5% rsd bound")
    }
  }
}
