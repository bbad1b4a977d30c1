package graft.streaming

import graft.SparkSpec
import graft.functions.Text
import graft.operators.DedupRegistry
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end CONTINUOUS corpus ingestion from existing pieces:
  * MicroBatchPipeline (one batch plan per micro-batch) + a quality
  * gate + DedupRegistry (persistent cross-batch content dedup).
  * Asserts the production invariants: low-quality docs never land,
  * content seen in ANY earlier batch never lands twice, survivors
  * land exactly once. */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  test("quality gate + persistent dedup across micro-batches") {
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("graft_cur_").toString
    val corpus = s"$dir/corpus"
    val reg = new DedupRegistry(s"$dir/registry")
    val in = MemoryStream[(Long, String)]

    val gate: DataFrame => DataFrame =
      b => b.filter(size(Text.tokens(col("text"))) >= 5)
    val q = MicroBatchPipeline.start(
      in.toDF().toDF("doc_id", "text"),
      gate,
      (batch, _) => {
        reg.dedupAppend(batch, "doc_id", md5(col("text")),
          out => out.write.mode("append").parquet(corpus))
        ()
      },
      intervalMs = 100)
    try {
      in.addData(
        (1L, "the quick brown fox jumps over the dog"),
        (2L, "too short")) // fails the 5-token gate
      q.processAllAvailable()
      in.addData(
        (3L, "the quick brown fox jumps over the dog"), // dup of 1
        (4L, "pack my box with five dozen liquor jugs"))
      q.processAllAvailable()

      val kept = spark.read.parquet(corpus)
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 4L),
        s"expected gate+dedup survivors {1,4}, got $kept")
    } finally q.stop()
  }
}
