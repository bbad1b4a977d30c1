package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Harmonic whole-document packing: feasibility by construction,
  * class layout, overflow isolation, determinism. */
class PackingSpec extends SparkSpec {

  private val docs = df("id BIGINT, grp STRING, n BIGINT", Seq(
    Row(1L, "en", 100L), Row(2L, "en", 90L),  // class 2 (f = floor(200/n))
    Row(3L, "en", 95L),  Row(4L, "en", 100L),
    Row(5L, "en", 60L),  Row(6L, "en", 55L),  // class 3
    Row(7L, "en", 66L),
    Row(8L, "en", 250L),                      // oversized (n > 200)
    Row(9L, "en", 0L),                        // unpackable, dropped
    Row(10L, "de", 100L)                      // other partition key
  ))

  private def packAll = Packing.harmonicPack(docs, "id", "n", 200, Seq("grp"))

  test("every non-overflow pack holds <= budget tokens") {
    val sums = packAll.filter(!col("is_overflow"))
      .groupBy("pack_key").agg(sum("n").as("s"))
      .collect().map(_.getLong(1))
    assert(sums.nonEmpty && sums.forall(_ <= 200L))
  }

  test("class f holds at most f docs per pack and fills greedily in id order") {
    val p = packAll.collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("fclass"), r.getAs[String]("pack_key"))).toMap
    // docs 1-4: n in (66, 100] -> f=2, packs of 2 in id order
    assert(p(1L)._1 == 2L && p(1L)._2 == p(2L)._2)
    assert(p(3L)._2 == p(4L)._2 && p(1L)._2 != p(3L)._2)
    // docs 5-7: n in (50, 66] -> f=3, one pack of 3
    assert(p(5L)._1 == 3L && p(5L)._2 == p(6L)._2 && p(6L)._2 == p(7L)._2)
    // partition keys never mix
    assert(p(10L)._2.startsWith("2:de-"))
  }

  test("pack_key segments are length-prefixed: delimiter-bearing " +
    "partition values cannot collide") {
    // before length-prefixing, ("a-1", "b") and ("a", "1-b") both
    // rendered "a-1-b-<f>-<bin>" — two different partitions silently
    // merged into one pack_key, breaking feasibility for consumers
    // grouping by pack_key alone
    val d = df("id BIGINT, c1 STRING, c2 STRING, n BIGINT", Seq(
      Row(1L, "a-1", "b", 100L), Row(2L, "a", "1-b", 100L)))
    val keys = Packing.harmonicPack(d, "id", "n", 200, Seq("c1", "c2"))
      .select("pack_key").collect().map(_.getString(0))
    assert(keys.length == 2 && keys.distinct.length == 2)
    assert(keys.contains("3:a-1-1:b-2-0") && keys.contains("1:a-3:1-b-2-0"))
  }

  test("NULL partition values keep their own packs: the null segment " +
    "renders a marker instead of being dropped by concat_ws") {
    // before the marker, a NULL segment rendered SQL NULL and
    // concat_ws silently dropped it, so (NULL, "a") and ("a", NULL)
    // produced the identical pack_key and merged packs (ADVICE r12)
    val d = df("id BIGINT, c1 STRING, c2 STRING, n BIGINT", Seq(
      Row(1L, null, "a", 100L), Row(2L, "a", null, 100L),
      Row(3L, "", "a", 100L))) // empty string is NOT null: "0:" != "n"
    val keys = Packing.harmonicPack(d, "id", "n", 200, Seq("c1", "c2"))
      .select("id", "pack_key").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keys(1L) == "n-1:a-2-0" && keys(2L) == "1:a-n-2-0")
    assert(keys(3L) == "0:-1:a-2-0")
    assert(keys.values.toSeq.distinct.length == 3)
  }

  test("oversized docs are isolated one-per-pack and flagged; n=0 dropped") {
    val rows = packAll.collect()
    val over = rows.filter(_.getAs[Boolean]("is_overflow"))
    assert(over.map(_.getAs[Long]("id")).toSeq == Seq(8L))
    assert(over.head.getAs[Long]("fclass") == 0L)
    val packMates = rows.count(_.getAs[String]("pack_key") ==
      over.head.getAs[String]("pack_key"))
    assert(packMates == 1)
    assert(!rows.exists(_.getAs[Long]("id") == 9L))
  }

  test("packStats lower bound and fill are exact and consistent") {
    val st = Packing.packStats(packAll, "n", 200, Seq("grp"))
      .filter(col("grp") === "en").collect().head
    val total = st.getAs[Long]("total_tokens")
    assert(total == 100L + 90L + 95L + 100L + 60L + 55L + 66L)
    assert(st.getAs[Long]("lower_bound") == (total + 199L) / 200L)
    val nPacks = st.getAs[Long]("n_packs")
    assert(nPacks == 3L) // two f=2 packs + one f=3 pack
    assert(st.getAs[Long]("fill_ppm") == total * 1000000L / (nPacks * 200L))
    assert(st.getAs[Long]("max_pack_tokens") <= 200L)
  }

  test("assignment is deterministic across evaluations") {
    val a = packAll.collect().map(_.toString).sorted.toSeq
    val b = packAll.collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
