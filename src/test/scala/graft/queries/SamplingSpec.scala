package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden tests for the round-5 sampling queries on PLANTED data
  * (the oracle gate re-checks them against DuckDB at sf0.01; these
  * pin the mathematical invariants on cases small enough to verify
  * by hand). Each writes a tiny documents.parquet and runs the REAL
  * SparkEntry query against it. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  /** Planted documents table: 2 langs, 3 sources, known n_chars. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_sampling").toString
    val rows = (0 until 30).map { i =>
      (i.toLong, s"doc text $i", if (i % 2 == 0) "en" else "de",
        s"src${i % 3}", (10L + i))
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("q154: systematic PPS draws EXACTLY N times, each doc floor-or-ceil of its share") {
    val out = graft.SparkEntry.queries("q154_systematic_pps")(spark, dir)
      .select("doc_id", "w", "n_hits").collect()
    val totalW = (0 until 30).map(10L + _).sum
    // exactly N = 100 draws in total across all sampled docs
    assert(out.map(_.getLong(2)).sum == 100L)
    // each doc's draw count is floor or ceil of N * w / W (the
    // systematic-sampling guarantee; Bernoulli/Poisson samplers only
    // get this in expectation)
    out.foreach { r =>
      val share = 100.0 * r.getLong(1) / totalW
      val hits = r.getLong(2)
      assert(hits == math.floor(share).toLong || hits == math.ceil(share).toLong,
        s"doc ${r.getLong(0)}: $hits draws for share $share")
    }
  }

  test("q153: per-stratum sample size is exactly least(greatest(ceil(f*n), m), n)") {
    val out = graft.SparkEntry.queries("q153_stratified_sample")(spark, dir)
    val perStratum = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    // 15 docs per lang: ceil(0.2*15) = 3 < floor 10 -> take 10
    assert(perStratum == Map("en" -> 10L, "de" -> 10L))
    // and the selection is the hash-rank prefix: rn <= take_n for all
    assert(out.filter(col("rn") > col("take_n")).count() == 0)
  }

  test("q159: positions are distinct and consecutive positions never share a source") {
    val out = graft.SparkEntry.queries("q159_epoch_interleave")(spark, dir)
      .select("position", "source").as[(Long, String)].collect().sortBy(_._1)
    assert(out.map(_._1).distinct.length == out.length)
    // equal strata (10 docs x 3 sources): round-robin means adjacent
    // POSITIONS (dense here) cycle all 3 sources
    out.sliding(2).foreach { case Array((p1, s1), (p2, s2)) =>
      if (p2 == p1 + 1) assert(s1 != s2, s"positions $p1,$p2 both from $s1")
    }
  }
}
