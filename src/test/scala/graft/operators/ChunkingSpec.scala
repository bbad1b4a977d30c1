package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Chunking + budget truncation (the round-3 corpus extensions):
  * window coverage, overlap, short-doc and empty-doc edges, and the
  * greedy prefix semantics of the char-budget fold. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def toksOf(n: Int): String = (1 to n).map(i => s"t$i").mkString(" ")

  test("chunk: sliding windows with overlap, last partial window emitted once") {
    // 33 tokens, size 32 overlap 8 -> starts 0 and 24; chunk 2 has 9 tokens
    val in = Seq((1L, toksOf(33))).toDF("doc_id", "text")
    val out = Chunking.chunk(in, "doc_id", "text", 32, 8)
      .select("chunk_no", "n_chunk_tokens").as[(Int, Int)].collect().toSeq.sorted
    assert(out == Seq((0, 32), (1, 9)))
  }

  test("chunk: doc shorter than one window is a single chunk; empty doc emits none") {
    val in = Seq((1L, "a b c"), (2L, ""), (3L, "...")).toDF("doc_id", "text")
    val out = Chunking.chunk(in, "doc_id", "text", 32, 8)
      .select("doc_id", "chunk_no", "chunk_text").as[(Long, Int, String)].collect().toSeq
    assert(out == Seq((1L, 0, "a b c")))
  }

  test("chunk: consecutive chunks share exactly `overlap` tokens") {
    val in = Seq((1L, toksOf(60))).toDF("doc_id", "text")
    val chunks = Chunking.chunk(in, "doc_id", "text", 32, 8)
      .orderBy("chunk_no").select("chunk_text").as[String].collect()
      .map(_.split(" ").toSeq)
    assert(chunks.length == 3) // starts 0, 24, 48
    assert(chunks(0).takeRight(8) == chunks(1).take(8))
    assert(chunks(1).takeRight(8) == chunks(2).take(8))
    // union restores the document exactly
    assert((chunks(0) ++ chunks(1).drop(8) ++ chunks(2).drop(8)) ==
      (1 to 60).map(i => s"t$i"))
  }

  test("truncateToCharBudget: greedy whole-token prefix, joined length <= budget") {
    // "alpha beta gamma" -> lens 5,4,5; budget 10 keeps "alpha beta" (10 chars)
    val in = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val r = Chunking.truncateToCharBudget(in, "doc_id", "text", 10)
      .select("n_tokens", "n_kept", "kept_chars", "truncated", "text_trunc")
      .as[(Int, Int, Long, Boolean, String)].collect().head
    assert(r == ((3, 2, 10L, true, "alpha beta")))
  }

  test("truncateToCharBudget: prefix stops at first overflow — later short tokens do NOT sneak in") {
    // lens 4,9,1: budget 8 keeps only "aaaa" (4); the 1-char token
    // after the overflowing 9-char one must not be appended
    val in = Seq((1L, "aaaa bbbbbbbbb c")).toDF("doc_id", "text")
    val r = Chunking.truncateToCharBudget(in, "doc_id", "text", 8)
      .select("n_kept", "text_trunc").as[(Int, String)].collect().head
    assert(r == ((1, "aaaa")))
  }

  test("truncateToCharBudget: budget below first token keeps nothing; empty doc is stable") {
    val in = Seq((1L, "longtoken"), (2L, "")).toDF("doc_id", "text")
    val out = Chunking.truncateToCharBudget(in, "doc_id", "text", 3)
      .select("doc_id", "n_kept", "kept_chars", "truncated", "text_trunc")
      .as[(Long, Int, Long, Boolean, String)].collect().toSeq.sortBy(_._1)
    assert(out == Seq(
      (1L, 0, 0L, true, ""),
      (2L, 0, 0L, false, "")))
  }

  test("truncateToCharBudget: untouched doc reports truncated=false and full length") {
    val in = Seq((1L, "ab cd")).toDF("doc_id", "text")
    val r = Chunking.truncateToCharBudget(in, "doc_id", "text", 100)
      .select("n_kept", "kept_chars", "truncated", "text_trunc")
      .as[(Int, Long, Boolean, String)].collect().head
    assert(r == ((2, 5L, false, "ab cd")))
  }
}
