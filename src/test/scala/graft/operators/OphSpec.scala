package graft.operators

import graft.SparkSpec
import graft.functions.Text

/** One-permutation-hashing MinHash against a plain-Scala reference:
  * binning, the (hop, value) densification encoding, and the empty-
  * bin count must match exactly — including borrowed entries, which
  * is where an off-by-one in the rotation would hide. */
class OphSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8

  private def h12(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 12), 16) % Text.MinhashP
  }

  /** Reference OPH: bins by h mod k, min per bin, densify by minimum
    * (hop-major) encoded candidate — the operator's exact contract. */
  private def refSig(shingles: Seq[String], k: Int): (Seq[Long], Long) = {
    val hs = shingles.map(h12)
    val bins = (0 until k).map(b => hs.filter(_ % k == b) match {
      case Nil => None
      case xs  => Some(xs.min)
    })
    val sig = (0 until k).map { j =>
      (0 until k).flatMap(d =>
        bins((j + d) % k).map(v => d.toLong * (1L << 34) + v)).min
    }
    (sig, bins.count(_.isEmpty).toLong)
  }

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    (3L, "one two three four") // 2 shingles << 8 bins -> densified
  )

  test("signature and n_empty match the plain-Scala reference") {
    val out = Dedup.ophSignatures(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, k = K)
      .select("id", "sig", "n_empty").as[(Long, Seq[Long], Long)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    for ((id, text) <- docs) {
      val sh = text.split(" ").toSeq.sliding(3).map(_.mkString(" ")).toSeq.distinct
      val (sig, ne) = refSig(sh, K)
      assert(out(id)._1 == sig, s"doc $id signature")
      assert(out(id)._2 == ne, s"doc $id n_empty")
    }
    // the short doc really exercised densification
    assert(out(3L)._2 > 0)
  }

  test("near-identical docs agree on most bins; signatures are total") {
    val out = Dedup.ophSignatures(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, k = K)
      .select("id", "sig").as[(Long, Seq[Long])].collect().toMap
    val agree = out(1L).zip(out(2L)).count { case (a, b) => a == b }
    // docs 1/2 share 7 of 9 distinct shingles - most bins agree;
    // doc 3 is disjoint from doc 1 - no direct-entry agreement forced
    assert(agree >= K / 2)
    assert(out(1L).size == K && out(3L).size == K)
  }
}
