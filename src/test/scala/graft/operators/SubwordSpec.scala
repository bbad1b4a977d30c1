package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Greedy longest-match subword encoding, hand-computed: the longest
  * vocabulary prefix wins at every position, mid-word vocabulary hits
  * occur, and unmatched characters fall back to negative codepoints
  * advancing one char at a time. */
class SubwordSpec extends SparkSpec {
  import spark.implicits._

  private def vocab = Seq(("foo", 1L), ("foobar", 2L), ("a", 3L))
    .toDF("term", "token_id")

  private def enc(ws: String*): Map[String, Seq[Long]] =
    Subword.encodeWords(ws.toDF("word"), vocab)
      .orderBy("word", "spos")
      .collect()
      .groupBy(_.getString(0))
      .map { case (w, rows) => w -> rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }

  test("longest match wins; greedy consumes left to right") {
    // "foobar" must encode as the single id 2, not foo + fallback
    // b/a/r; "foobarfoo" = foobar + foo
    val m = enc("foobar", "foobarfoo", "foo")
    assert(m("foobar") == Seq(2L))
    assert(m("foobarfoo") == Seq(2L, 1L))
    assert(m("foo") == Seq(1L))
  }

  test("mid-word vocabulary hits and character fallbacks") {
    // x(-120) foo(1) a(3); z z z all fall back to -122
    val m = enc("xfooa", "zzz")
    assert(m("xfooa") == Seq(-120L, 1L, 3L))
    assert(m("zzz") == Seq(-122L, -122L, -122L))
  }

  test("wordCounts and docCounts aggregate real token counts") {
    val wc = Subword.wordCounts(Seq("foobarfoo", "zzz").toDF("word"), vocab)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc == Map("foobarfoo" -> 2L, "zzz" -> 3L))
    val docs = Seq((1L, "foobarfoo zzz"), (2L, "a")).toDF("doc_id", "text")
    val dc = Subword.docCounts(docs, "doc_id", "text", vocab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(dc.toSet == Set((1L, 2L, 5L), (2L, 1L, 1L)))
  }

  test("vocabulary ranks by (df desc, tf desc, term) with ids 1..k") {
    val docs = Seq((1L, "b b c a"), (2L, "b a"), (3L, "c")).toDF("doc_id", "text")
    // df: b=2 c=2 a=2; tf: b=3, a=2, c=2 -> order b, a, c (term tiebreak)
    val v = Subword.vocabulary(docs, "doc_id", "text", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("b" -> 1L, "a" -> 2L))
  }
}
