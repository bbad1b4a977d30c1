package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Packing

/** Streaming incremental whole-doc packing: stream == batch when
  * arrival order matches id order, packs fill across batch
  * boundaries without breaking feasibility, replay is byte-stable,
  * and the compaction-vs-replay hazard aborts loudly. */
class PackRegistrySpec extends SparkSpec {

  private val Budget = 200

  private def mkDocs(rows: Seq[Row]) = df("id BIGINT, lang STRING, n BIGINT", rows)

  // 9 docs, id order == arrival order; en class 2 (n in (66,100]) gets
  // 5 docs -> packs of 2 with one straddling the batch boundary
  private val b0 = mkDocs(Seq(
    Row(1L, "en", 100L), Row(2L, "en", 90L), Row(3L, "en", 95L),
    Row(4L, "en", 60L), Row(5L, "de", 80L)))
  private val b1 = mkDocs(Seq(
    Row(6L, "en", 97L), Row(7L, "en", 92L),
    Row(8L, "en", 55L), Row(9L, "de", 70L)))

  private def runStream(reg: String, out: String): Unit = {
    PackRegistry.packBatch(spark, reg, out, "id", "n", Budget)(b0, 0L)
    PackRegistry.packBatch(spark, reg, out, "id", "n", Budget)(b1, 1L)
  }

  private def keyMap(d: org.apache.spark.sql.DataFrame): Map[Long, String] =
    d.collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("pack_key")).toMap

  test("stream over two batches equals batch harmonicPack on the union") {
    val reg = Files.createTempDirectory("graft_packreg_").toString
    val out = Files.createTempDirectory("graft_packout_").toString
    runStream(reg, out)
    val streamed = keyMap(PackRegistry.assignments(spark, out))
    val batch = keyMap(Packing.harmonicPack(b0.union(b1), "id", "n",
      Budget, Seq("lang")))
    assert(streamed == batch)
  }

  test("a boundary pack fills across batches and stays budget-feasible") {
    val reg = Files.createTempDirectory("graft_packreg2_").toString
    val out = Files.createTempDirectory("graft_packout2_").toString
    runStream(reg, out)
    val a = PackRegistry.assignments(spark, out)
    // doc 3 (batch 0, third en class-2 doc) shares its pack of 2 with
    // doc 6 (batch 1) — the half-empty boundary pack got filled
    val m = keyMap(a)
    assert(m(3L) == m(6L))
    val byBatch = a.filter(col("pack_key") === m(3L))
      .select("batch_id").distinct().count()
    assert(byBatch == 2L)
    val sums = a.filter(!col("is_overflow"))
      .groupBy("pack_key").agg(sum("n").as("s"))
      .collect().map(_.getLong(1))
    assert(sums.forall(_ <= Budget))
  }

  test("replaying an earlier batch after later ones is byte-stable") {
    val reg = Files.createTempDirectory("graft_packreg3_").toString
    val out = Files.createTempDirectory("graft_packout3_").toString
    runStream(reg, out)
    val before = PackRegistry.assignments(spark, out).collect()
      .map(_.toString).sorted.toSeq
    // at-least-once replay of batch 0 with its original data
    PackRegistry.packBatch(spark, reg, out, "id", "n", Budget)(b0, 0L)
    val after = PackRegistry.assignments(spark, out).collect()
      .map(_.toString).sorted.toSeq
    assert(after == before)
    // counters did not double: fold sums one delta per batch
    val folded = AdditiveRegistry.fold(spark, reg, Seq("lang", "fclass"),
      "n_assigned", spark.range(0).selectExpr("'x' AS lang",
        "id AS fclass", "id AS n_assigned"))
      .agg(sum("n_assigned")).head().getLong(0)
    assert(folded == 9L)
  }

  test("replay behind a compacted horizon aborts loudly instead of misfolding") {
    val reg = Files.createTempDirectory("graft_packreg4_").toString
    val out = Files.createTempDirectory("graft_packout4_").toString
    runStream(reg, out)
    PackRegistry.compact(spark, reg, upToBatchId = 1L)
    val e = intercept[IllegalArgumentException] {
      PackRegistry.packBatch(spark, reg, out, "id", "n", Budget)(b1, 1L)
    }
    assert(e.getMessage.contains("unreconstructable"))
    // but NEW batches continue fine on the compacted registry
    PackRegistry.packBatch(spark, reg, out, "id", "n", Budget)(
      mkDocs(Seq(Row(10L, "en", 93L))), 2L)
    val m = keyMap(PackRegistry.assignments(spark, out))
    // doc 10 is the 6th en class-2 doc -> pack bin 2 (packs of 2)
    assert(m(10L) == "2:en-2-2")
  }

  test("zero-token docs drop; oversized docs flagged and isolated") {
    val reg = Files.createTempDirectory("graft_packreg5_").toString
    val out = Files.createTempDirectory("graft_packout5_").toString
    PackRegistry.packBatch(spark, reg, out, "id", "n", Budget)(
      mkDocs(Seq(Row(1L, "en", 0L), Row(2L, "en", 300L), Row(3L, "en", 40L))), 0L)
    val rows = PackRegistry.assignments(spark, out).collect()
    assert(rows.map(_.getAs[Long]("id")).toSet == Set(2L, 3L))
    val over = rows.filter(_.getAs[Boolean]("is_overflow"))
    assert(over.map(_.getAs[Long]("id")).toSeq == Seq(2L))
    assert(over.head.getAs[String]("pack_key").startsWith("2:en-0-"))
  }
}
