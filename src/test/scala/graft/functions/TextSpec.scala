package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.security.MessageDigest

/** Text-analysis primitives: hash parity against a direct JVM
  * computation, shingle edge cases, simhash/fingerprint properties. */
class TextSpec extends SparkSpec {
  import spark.implicits._

  private def jvmMd5Long(s: String, k: Int): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, k), 16)
  }

  test("md5Long matches a direct JVM md5-hex parse") {
    val words = Seq("hello", "the quick brown", "a b c", "49ers")
    val out = col1[Long](words.toDF("w").select(Text.md5Long(col("w"), 12)))
    assert(out == words.map(jvmMd5Long(_, 12)))
  }

  test("tokens: regex extraction ignores leading/multiple spaces") {
    val in = Seq("  agg  small   scan", "one").toDF("t")
    val out = in.select(Text.tokens(col("t")).as("toks")).collect()
      .map(_.getSeq[String](0))
    assert(out(0) == Seq("agg", "small", "scan"))
    assert(out(1) == Seq("one"))
  }

  test("shingles: distinct n-grams; fewer than n tokens -> empty") {
    val in = Seq("a b c d", "a b", "x y x y x y x y").toDF("t")
    val out = in
      .select(Text.tokens(col("t")).as("toks"))
      .select(Text.shingles(col("toks"), 3).as("sh")).collect()
      .map(_.getSeq[String](0))
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq.empty)
    // duplicates collapse: only the two distinct 3-grams survive
    assert(out(2).toSet == Set("x y x", "y x y"))
  }

  test("minhash agg path equals the array-fold path") {
    val docs = Seq((1L, "a b c d e f"), (2L, "b c d e f g")).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id").as("id"), Text.tokens(col("text")).as("toks"))
      .select(col("id"), Text.shingles(col("toks"), 3).as("shingles"))
    // fold path
    val foldSig = sh.select(col("id"),
        Text.minhashSignature(col("shingles"), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // agg path
    val exploded = sh.select(col("id"), explode(col("shingles")).as("s"))
      .select(col("id"), pmod(Text.md5Long(col("s"), 12), lit(Text.MinhashP)).as("h"))
    val aggs = Text.minhashAggs(col("h"), 8)
    val aggSig = exploded.groupBy("id").agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(j => r.getAs[Long](s"mh_$j"))).toMap
    assert(foldSig.view.mapValues(_.toSeq).toMap == aggSig.view.mapValues(_.toSeq).toMap)
  }

  test("simhash: identical token streams agree; disjoint vocab differs") {
    val in = Seq("spark fast query engine", "spark fast query engine",
      "zebra yak xylophone walrus").toDF("t")
    val hashes = in
      .select(Text.tokens(col("t")).as("toks"))
      .select(transform(col("toks"), t => Text.md5Long(t, 4)).as("h"))
      .select(Text.simhashFromHashes(col("h"), 16))
    val out = col1[Long](hashes)
    assert(out(0) == out(1))
    assert(out(0) != out(2))
    assert(out.forall(h => h >= 0 && h < (1L << 16)))
  }

  test("rolling fingerprint is order-sensitive; window fingerprint is shared by near-dups") {
    val in = Seq("a b c d e", "e d c b a", "a b c d e x").toDF("t")
    val toks = in.select(Text.tokens(col("t")).as("toks"))
    val roll = col1[Long](toks.select(Text.rollingFingerprint(col("toks"))))
    assert(roll(0) != roll(1)) // order matters
    val win = col1[Long](toks.select(Text.windowFingerprint(col("toks"), 4)))
    // suffix edit keeps the min-window fingerprint only if the min
    // window is untouched — with one extra token the original windows
    // are a subset, so equality holds iff min stays; at minimum the
    // fingerprints of doc0's windows are a subset of doc2's.
    assert(win(2) <= win(0))
  }

  test("scrubPii masks emails, IPs, and phones; plain text untouched") {
    val in = Seq(
      "write to bob.smith+news@sub.example.org today",
      "server at 192.168.001.1 responded",
      "call +1 (555) 014-2297 or 555 123 4567 now",
      "dial 555.123.4567 today", // dot-separated phone, NOT an IPv4
      "no pii here, just words and the number 42").toDF("t")
    val out = col1[String](in.select(Text.scrubPii(col("t"))))
    assert(out(0) == "write to [EMAIL] today")
    assert(out(1) == "server at [IP] responded")
    assert(out(2) == "call [PHONE] or [PHONE] now")
    assert(out(3) == "dial [PHONE] today")
    assert(out(4) == "no pii here, just words and the number 42")
  }

  test("quality score is in [0,1] and penalizes stopword soup") {
    val in = Seq("the the the the a a a of of", // stopword soup
      "diverse vocabulary with many distinct informative tokens here").toDF("t")
    val out = col1[Double](in.select(Text.tokens(col("t")).as("toks"))
      .select(Text.qualityScore(col("toks"))))
    assert(out.forall(q => q >= 0.0 && q <= 1.0))
    assert(out(1) > out(0))
  }
}
