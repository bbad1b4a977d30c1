package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Order-sensitive reshaping (SURVEY.md §2.6-§2.8): the pandas-index
  * semantics re-specified as explicit keys. */
class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  test("pairId assigns i//2+1 per consecutive pair within a partition") {
    val in = Seq(("g", 1), ("g", 2), ("g", 3), ("g", 4), ("g", 5))
      .toDF("grp", "ord")
    val out = in.withColumn("pair",
        Reshape.pairId(Seq("grp"), Seq(col("ord"))))
      .orderBy("ord").select("pair").as[Int].collect().toSeq
    assert(out == Seq(1, 1, 2, 2, 3))
  }

  test("isAnchorLeg flags the first row of each pair order") {
    val in = Seq(("g1", 1), ("g1", 2), ("g2", 5)).toDF("grp", "ord")
    val out = in.withColumn("anchor",
        Reshape.isAnchorLeg(Seq("grp"), Seq(col("ord"))))
      .orderBy("grp", "ord").select("anchor").as[Boolean].collect().toSeq
    assert(out == Seq(true, false, true))
  }

  test("explodeLinePayout duplicates rows and drops (ML, Line)") {
    val in = Seq(("ML", 1), ("Spread", 2)).toDF("bt", "v")
    val out = Reshape.explodeLinePayout(in, "bt")
      .select("bt", "Info").as[(String, String)].collect().toSet
    assert(out == Set(("ML", "Payout"), ("Spread", "Line"), ("Spread", "Payout")))
  }

  test("explodeSides emits one row per side with side_no") {
    val in = Seq((1, "x", "y")).toDF("k", "s1", "s2")
    val out = Reshape.explodeSides(in, Seq(
        Seq("v" -> col("s1")), Seq("v" -> col("s2"))))
      .select("k", "side_no", "v").as[(Int, Int, String)].collect().toSet
    assert(out == Set((1, 1, "x"), (1, 2, "y")))
  }

  test("unpivot stacks measure columns into (metric, value)") {
    val in = Seq((1, 10.0, 20.0)).toDF("k", "m1", "m2")
    val out = Reshape.unpivot(in, Seq("k"), Seq("m1", "m2"))
      .as[(Int, String, Double)].collect().toSet
    assert(out == Set((1, "m1", 10.0), (1, "m2", 20.0)))
  }

  test("dropRepeatMatchups removes the whole second game of a team") {
    // Bills play game 1 (rows 1,2) and AGAIN game 3 (rows 5,6):
    // game 3 is dropped entirely — including the opponent Jets row.
    val in = Seq(
      (1, "Bills"), (2, "Chiefs"),
      (3, "Rams"), (4, "Lions"),
      (5, "Bills"), (6, "Jets")
    ).toDF("idx", "team")
    val out = Reshape.dropRepeatMatchups(in, "team", Seq(col("idx")))
      .select("idx", "team", "game_id").as[(Int, String, Int)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq((1, "Bills", 1), (2, "Chiefs", 1),
      (3, "Rams", 2), (4, "Lions", 2)))
  }

  test("dropRepeatMatchups only flags rank == 2 (reference semantics)") {
    // A team appearing three times: games of rank-2 are dropped; the
    // rank-3 game survives unless it shares the rank-2 game id.
    val in = Seq(
      (1, "Bills"), (2, "Chiefs"),
      (3, "Bills"), (4, "Jets"),
      (5, "Bills"), (6, "Rams")
    ).toDF("idx", "team")
    val out = Reshape.dropRepeatMatchups(in, "team", Seq(col("idx")))
      .select("idx").as[Int].collect().toSet
    assert(out == Set(1, 2, 5, 6))
  }

  test("unpivot escapes quotes and backticks in column names") {
    val in = Seq((1, 10.0, 20.0)).toDF("k", "it's", "a`b")
    val out = Reshape.unpivot(in, Seq("k"), Seq("it's", "a`b"))
      .as[(Int, String, Double)].collect().toSet
    assert(out == Set((1, "it's", 10.0), (1, "a`b", 20.0)))
  }
}
