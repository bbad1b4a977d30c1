package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("backward: latest right row at-or-before each left row, per key") {
    val quotes = Seq(
      ("k1", ts(10), 1.0), ("k1", ts(20), 2.0), ("k1", ts(30), 3.0),
      ("k2", ts(15), 9.0)
    ).toDF("key", "qts", "px")
    val ticks = Seq(
      ("k1", ts(5), "a"),   // before any quote -> null
      ("k1", ts(20), "b"),  // equal ts -> inclusive match 2.0
      ("k1", ts(25), "c"),  // between -> 2.0
      ("k1", ts(99), "d"),  // after all -> 3.0
      ("k2", ts(16), "e"),  // -> 9.0
      ("k3", ts(50), "f")   // key with no quotes -> null
    ).toDF("key", "tts", "tick")

    val out = AsOfJoin.backward(ticks, quotes, Seq("key"), "tts", "qts", Seq("px"))
      .select("tick", "px").as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "a" -> None, "b" -> Some(2.0), "c" -> Some(2.0),
      "d" -> Some(3.0), "e" -> Some(9.0), "f" -> None))
  }

  test("backward: payload travels as a unit — no cross-row stitching") {
    // the as-of row at ts=20 has bid=NULL: the output must keep that
    // NULL, not resurrect bid=10 from the older ts=10 row
    val quotes = Seq(
      ("k", ts(10), Some(10.0), Some(11.0)),
      ("k", ts(20), Option.empty[Double], Some(12.0))
    ).toDF("key", "qts", "bid", "ask")
    val ticks = Seq(("k", ts(30), "t1")).toDF("key", "tts", "tick")
    val out = AsOfJoin.backward(ticks, quotes, Seq("key"), "tts", "qts",
      Seq("bid", "ask")).select("bid", "ask")
      .as[(Option[Double], Option[Double])].head()
    assert(out == (None, Some(12.0)))
  }

  test("backward: NULL timestamps never match") {
    val quotes = Seq(
      ("k", Option.empty[Timestamp], 7.0), // null qts: not a quote
      ("k", Some(ts(20)), 9.0)
    ).toDF("key", "qts", "px")
    val ticks = Seq(
      ("k", Some(ts(5)), "early"), // before the only real quote
      ("k", Option.empty[Timestamp], "null_ts") // null left ts -> no match
    ).toDF("key", "tts", "tick")
    val out = AsOfJoin.backward(ticks, quotes, Seq("key"), "tts", "qts", Seq("px"))
      .select("tick", "px").as[(String, Option[Double])].collect().toMap
    assert(out == Map("early" -> None, "null_ts" -> None))
  }
}
