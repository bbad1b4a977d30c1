package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The explicit relational bloom pre-filter (operators.Bloom) behind
  * q163: membership is never lost, false positives exist (that's the
  * deal) and the exact semi join removes them, and the whole
  * bloom-then-exact path equals the plain semi join on real data. */
class BloomSpec extends SparkSpec {

  test("a NULL key on the build side is dropped, not a runtime crash; " +
    "null probe keys are filtered (they can never match the semi join)") {
    import spark.implicits._
    val keys = Seq(Some("a"), None, Some("b")).toDF("k")
    val bm = Bloom.bitmap(keys, col("k")) // pre-fix: null map key crash
    val probe = Seq(Some("a"), None, Some("z")).toDF("k")
    val kept = Bloom.prefilter(probe, col("k"), bm)
      .select("k").as[Option[String]].collect().toSet
    assert(kept.contains(Some("a")) && !kept.contains(None), kept.toString)
  }

  test("no true member is ever dropped by the prefilter") {
    val keys = spark.range(0, 5000).select(col("id"))
    val bm = Bloom.bitmap(keys, col("id"))
    assert(Bloom.prefilter(keys, col("id"), bm).count() === 5000L)
  }

  test("false positives pass the prefilter and the exact join removes them") {
    val members = spark.range(0, 5000).select(col("id"))
    val bm = Bloom.bitmap(members, col("id"))
    val nonMembers = spark.range(5000, 30000).select(col("id"))
    val fp = Bloom.prefilter(nonMembers, col("id"), bm)
    // ~10k of 65536 bits set -> FP rate ~0.023 -> ~580 expected over
    // 25k probes; deterministic given md5, measured non-zero
    val nFp = fp.count()
    assert(nFp > 0, "expected at least one deterministic false positive")
    assert(nFp < 2500, s"FP rate out of band: $nFp / 25000")
    val exact = fp.join(members, Seq("id"), "left_semi")
    assert(exact.count() === 0L, "exact semi join must remove every FP")
  }

  test("bloom-then-exact equals the plain semi join on sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val sel = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 400000.0).select(col("o_orderkey"))
    val li = Tables.lineitem(spark, sf)
    val bloomPath = Bloom.prefilter(li, col("l_orderkey"), Bloom.bitmap(sel, col("o_orderkey")))
      .join(sel, col("l_orderkey") === col("o_orderkey"), "left_semi")
    val plain = li.join(sel, col("l_orderkey") === col("o_orderkey"), "left_semi")
    val a = bloomPath.select("l_orderkey", "l_linenumber").collect().toSet
    val b = plain.select("l_orderkey", "l_linenumber").collect().toSet
    assert(a === b)
    // and the prefilter actually filtered: candidates << full table
    val candidates = Bloom.prefilter(li, col("l_orderkey"),
      Bloom.bitmap(sel, col("o_orderkey"))).count()
    assert(candidates < li.count() / 2,
      s"prefilter kept $candidates of ${li.count()} rows - not selective")
  }
}
