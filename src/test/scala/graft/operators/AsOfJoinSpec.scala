package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
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

  test("NULL join keys never match (SQL equi-join semantics), and " +
    "null-key left rows still flow through unmatched") {
    val quotes = Seq(
      (Option("k1"), ts(10), 1.0),
      (Option.empty[String], ts(10), 5.0) // null-key right row: inert
    ).toDF("key", "qts", "px")
    val ticks = Seq(
      (Option("k1"), ts(20), "a"),          // -> 1.0
      (Option.empty[String], ts(20), "b")   // null key -> never matches
    ).toDF("key", "tts", "tick")
    val out = AsOfJoin.backward(ticks, quotes, Seq("key"), "tts", "qts", Seq("px"))
      .select("tick", "px").as[(String, Option[Double])].collect().toMap
    assert(out == Map("a" -> Some(1.0), "b" -> None), out.toString)
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

  test("forward: earliest right row at-or-after each left row, per key") {
    val quotes = Seq(
      ("k1", ts(10), 1.0), ("k1", ts(20), 2.0), ("k1", ts(30), 3.0),
      ("k2", ts(15), 9.0)
    ).toDF("key", "qts", "px")
    val ticks = Seq(
      ("k1", ts(5), "a"),   // -> first future quote 1.0
      ("k1", ts(20), "b"),  // equal ts -> inclusive match 2.0
      ("k1", ts(25), "c"),  // -> 3.0
      ("k1", ts(99), "d"),  // after all -> null
      ("k2", ts(16), "e"),  // past the only k2 quote -> null
      ("k3", ts(50), "f")   // no quotes -> null
    ).toDF("key", "tts", "tick")
    val out = AsOfJoin.forward(ticks, quotes, Seq("key"), "tts", "qts", Seq("px"))
      .select("tick", "px").as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "a" -> Some(1.0), "b" -> Some(2.0), "c" -> Some(3.0),
      "d" -> None, "e" -> None, "f" -> None))
  }

  test("forward: NULL timestamps never match (left sorts before any right row)") {
    val quotes = Seq(
      ("k", Some(ts(10)), 1.0), ("k", Some(ts(20)), 2.0),
      ("k", Option.empty[Timestamp], 7.0) // null qts: not a quote
    ).toDF("key", "qts", "px")
    val ticks = Seq(
      ("k", Option.empty[Timestamp], "null_ts"), // must NOT grab ts=10's payload
      ("k", Some(ts(15)), "mid")
    ).toDF("key", "tts", "tick")
    val out = AsOfJoin.forward(ticks, quotes, Seq("key"), "tts", "qts", Seq("px"))
      .select("tick", "px").as[(String, Option[Double])].collect().toMap
    assert(out == Map("null_ts" -> None, "mid" -> Some(2.0)))
  }

  test("forward: tolerance nulls the WHOLE payload beyond the bound") {
    val quotes = Seq(("k", ts(100), 5.0, "mk")).toDF("key", "qts", "px", "tag")
    val ticks = Seq(
      ("k", ts(95), "in"),   // 5s away, within tol=10s
      ("k", ts(80), "out")   // 20s away, beyond tol
    ).toDF("key", "tts", "tick")
    val out = AsOfJoin.forward(ticks, quotes, Seq("key"), "tts", "qts",
        Seq("px", "tag"), tolerance = Some(expr("INTERVAL 10 SECONDS")))
      .select("tick", "px", "tag")
      .as[(String, Option[Double], Option[String])].collect()
      .map { case (k, v, t) => k -> ((v, t)) }.toMap
    assert(out == Map(
      "in" -> ((Some(5.0), Some("mk"))),
      "out" -> ((None, None))))
  }

  test("nearest: smaller gap wins, ties go backward, tolerance bounds both sides") {
    val quotes = Seq(
      ("k1", ts(10), 1.0), ("k1", ts(30), 3.0),
      ("k2", ts(100), 9.0)
    ).toDF("key", "qts", "px")
    val ticks = Seq(
      ("k1", ts(12), "a"),  // gaps 2 back / 18 fwd -> 1.0
      ("k1", ts(28), "b"),  // gaps 18 back / 2 fwd -> 3.0
      ("k1", ts(20), "c"),  // TIE (10 both) -> backward 1.0
      ("k1", ts(30), "d"),  // exact match -> 3.0
      ("k2", ts(10), "e"),  // only match 90s away, tolerance 60s -> null
      ("k3", ts(50), "f")   // no quotes on key -> null
    ).toDF("key", "tts", "tick")
    val out = AsOfJoin.nearest(ticks, quotes, Seq("key"), "tts", "qts",
        Seq("px"), tolerance = Some(expr("INTERVAL 60 SECONDS")))
      .select("tick", "px").as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "a" -> Some(1.0), "b" -> Some(3.0), "c" -> Some(1.0),
      "d" -> Some(3.0), "e" -> None, "f" -> None))
  }

  test("nearest: one exchange feeds both directional fills") {
    val quotes = Seq(("k", ts(10), 1.0)).toDF("key", "qts", "px")
    val ticks = Seq(("k", ts(12), "a")).toDF("key", "tts", "tick")
    val plan = AsOfJoin.nearest(ticks, quotes, Seq("key"), "tts", "qts", Seq("px"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected a single keyed exchange in:\n$plan")
  }
}
