package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Text
import graft.operators.Dedup

/** Golden tests for the Curation group's composed semantics on
  * planted data (the oracle gate re-checks them against DuckDB at
  * sf0.01; these pin the SEMANTICS on cases small enough to eyeball). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("cdc compaction keeps the latest version per key with event_id tie-break") {
    val ev = Seq(
      // user 1, type "set": two versions, later ts wins
      (1L, "2024-01-01 10:00:00", 1L, "set", 1.0),
      (2L, "2024-01-01 11:00:00", 1L, "set", 2.0),
      // user 1, type "del": ts TIE -> higher event_id wins
      (3L, "2024-01-02 09:00:00", 1L, "del", 3.0),
      (4L, "2024-01-02 09:00:00", 1L, "del", 4.0),
      // user 2: single version
      (5L, "2024-01-03 08:00:00", 2L, "set", 5.0)
    ).toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")

    val out = ev.groupBy("user_id", "event_type")
      .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("last"),
        count(lit(1)).as("n_versions"))
      .select(col("user_id"), col("event_type"),
        col("last.event_id").as("last_event_id"),
        col("last.value").as("last_value"), col("n_versions"))
      .as[(Long, String, Long, Double, Long)].collect().toSet

    assert(out == Set(
      (1L, "set", 2L, 2.0, 2L),
      (1L, "del", 4L, 4.0, 2L),
      (2L, "set", 5L, 5.0, 1L)))
  }

  test("source cap keeps the top-k most diverse docs per source, deterministic on ties") {
    val docs = Seq(
      // source A: d1 ttr=1.0, d2 ttr=0.5, d3 ttr=0.5 (tie -> lower id first)
      (1L, "a b c d", "A"),
      (2L, "a a b b", "A"),
      (3L, "c c d d", "A"),
      (4L, "x x x x", "B")
    ).toDF("doc_id", "text", "source")
    val w = Window.partitionBy("source").orderBy(col("ttr").desc, col("doc_id"))
    val out = docs.select(col("doc_id"), col("source"),
        round(Text.typeTokenRatio(Text.tokens(col("text"))), 6).as("ttr"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .select("doc_id", "rk").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 1, 2L -> 2, 4L -> 1))
  }

  test("minhash estimate agrees exactly with jaccard on identical docs") {
    val same = "spark query engine scans parquet files with vectorized readers"
    val docs = Seq((1L, same), (2L, same)).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, numPerm = 32)
      .as[(Long, Seq[Long])].collect().toMap
    // identical shingle sets -> identical signatures -> est = 1.0
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L).length == 32)
  }

  test("leakage-safe split puts every member of a near-dup cluster on one side") {
    val a = "spark query engine scans parquet files with vectorized readers and pushes filters down"
    val docs = Seq(
      (10L, a), (20L, a), (21L, a.replace("vectorized", "columnar")),
      (30L, "completely different text about cooking pasta with garlic butter and basil")
    ).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
    val clusters = Dedup.connectedComponents(pairs).withColumnRenamed("id", "doc_id")
    val bucket = pmod(Text.md5Long(
      concat(col("rep").cast("string"), lit(":split-seed-42")), 8), lit(100))
    val out = docs.join(clusters, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster"), col("doc_id")))
      .withColumn("split", when(bucket < 80, "train").otherwise("test"))
      .select("doc_id", "rep", "split")
      .as[(Long, Long, String)].collect()
    val byRep = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
    // the 10/20/21 cluster shares rep 10 and ONE split side
    assert(out.filter(r => Set(10L, 20L, 21L)(r._1)).map(_._2).toSet == Set(10L))
    assert(byRep(10L).size == 1)
    assert(out.find(_._1 == 30L).get._2 == 30L)
  }

  test("dedup materialization keeps cluster representatives plus singletons") {
    val a = "spark query engine scans parquet files with vectorized readers and pushes filters down"
    val docs = Seq(
      (10L, a), (20L, a), // near-dup cluster, rep = 10
      (30L, "completely different text about cooking pasta with garlic butter and basil")
    ).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
    val clusters = Dedup.connectedComponents(pairs).withColumnRenamed("id", "doc_id")
    val kept = docs.join(clusters, Seq("doc_id"), "left")
      .filter(col("cluster").isNull || col("cluster") === col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L, 30L))
  }

  test("q133 identity equals brute-force pairwise dots (sf0.001)") {
    // cross-engine parity can't catch BOTH engines encoding the same
    // wrong formula — this pins the algebra itself against O(n^2)
    val dir = "/root/testdata/sf0.001"
    val got = Curation.queries("q133_label_dispersion")(spark, dir)
      .select("label", "mean_pair_dot").as[(String, Double)].collect().toMap
    val vecs = graft.Tables.embeddings(spark, dir)
      .select("label", "embedding").as[(String, Seq[Float])].collect()
    val brute = vecs.groupBy(_._1).map { case (lbl, vs) =>
      val es = vs.map(_._2.map(_.toDouble))
      val dots = for (i <- es.indices; j <- i + 1 until es.size)
        yield es(i).zip(es(j)).map { case (a, b) => a * b }.sum
      lbl -> dots.sum / dots.size
    }
    brute.foreach { case (lbl, expected) =>
      assert(math.abs(got(lbl) - expected) < 1e-4,
        s"label=$lbl identity=${got(lbl)} brute=$expected")
    }
  }
}
