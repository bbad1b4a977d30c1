package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.htmltable.HtmlTableSource
import org.apache.spark.sql.functions._

class HtmlTableSourceSpec extends SparkSpec {
  import spark.implicits._

  private def write(dir: java.nio.file.Path, name: String, html: String) = {
    Files.writeString(dir.resolve(name), html)
    dir.resolve(name).toString
  }

  private val oddsPage =
    """<html><body><h1>Odds</h1>
      |<table class="odds">
      | <tr><th>Time</th><th> Team </th><th>Bet365</th></tr>
      | <tr><td>7:00</td><td>Chiefs &amp; co</td><td>+150</td></tr>
      | <tr><td>7:00</td><td><b>Bills</b></td><td>-170</td></tr>
      |</table>
      |<table class="other"><tr><td>second table</td></tr></table>
      |</body></html>""".stripMargin

  test("parseTables: tags stripped, entities unescaped, whitespace collapsed") {
    val tables = HtmlTableSource.parseTables(oddsPage)
    assert(tables.size == 2)
    assert(tables(0) == Seq(
      Seq("Time", "Team", "Bet365"),
      Seq("7:00", "Chiefs & co", "+150"),
      Seq("7:00", "Bills", "-170")))
    assert(tables(1) == Seq(Seq("second table")))
  }

  test("nested tables stay inside their outer table's span") {
    val page = "<table><tr><td>outer1</td></tr>" +
      "<tr><td><table><tr><td>inner</td></tr></table></td></tr>" +
      "<tr><td>outer2</td></tr></table>" +
      "<table><tr><td>second</td></tr></table>"
    val tables = HtmlTableSource.parseTables(page)
    // two TOP-LEVEL tables; the nested one does not split the first
    assert(tables.size == 2)
    assert(tables(1) == Seq(Seq("second")))
    // rows after the nested table are still attributed to table 0
    assert(tables(0).flatten.contains("outer2"))
  }

  test("promoteHeader on an empty snapshot dir yields an empty frame") {
    val dir = Files.createTempDirectory("htmlsrc0")
    write(dir, "empty.html", "<p>no tables here</p>")
    val named = graft.pipeline.Normalize.promoteHeader(
      spark.read.format("odds-html").load(dir.toString))
    assert(named.columns.toSeq == Seq("file", "row_no", "idx"))
    assert(named.isEmpty)
  }

  test("format(odds-html) reads one row per tr with positional cells") {
    val dir = Files.createTempDirectory("htmlsrc")
    write(dir, "nfl.html", oddsPage)
    val df = spark.read.format("odds-html").load(dir.toString)
    val rows = df.select("row_no", "cells").as[(Int, Seq[String])]
      .collect().sortBy(_._1).toSeq
    assert(rows == Seq(
      (0, Seq("Time", "Team", "Bet365")),
      (1, Seq("7:00", "Chiefs & co", "+150")),
      (2, Seq("7:00", "Bills", "-170"))))
  }

  test("tableIndex option selects the nth table; dirs read all snapshots") {
    val dir = Files.createTempDirectory("htmlsrc2")
    write(dir, "a.html", oddsPage)
    write(dir, "b.html", oddsPage)
    write(dir, "notes.txt", "ignored")
    val df = spark.read.format("odds-html").option("tableIndex", 1)
      .load(dir.toString)
    val out = df.select("file", "cells").as[(String, Seq[String])].collect()
    assert(out.length == 2) // one row per file's second table
    assert(out.map(_._1).distinct.length == 2)
    assert(out.forall(_._2 == Seq("second table")))
  }

  test("snapshot -> promoteHeader -> grid -> arbitrage alert, fully end to end") {
    val page =
      """<table>
        | <tr><th>Time</th><th>Team</th><th>DraftKings</th><th>Caesars</th><th>Bet365</th></tr>
        | <tr><td>7:00</td><td>Chiefs</td><td>+225</td><td>-500</td><td>+215</td></tr>
        | <tr><td>7:00</td><td>Bills</td><td>-600</td><td>-180</td><td>-580</td></tr>
        |</table>""".stripMargin
    val dir = Files.createTempDirectory("htmlsrc4")
    write(dir, "nfl.html", page)
    val named = graft.pipeline.Normalize.promoteHeader(
      spark.read.format("odds-html").load(dir.toString))
    assert(named.columns.toSeq ==
      Seq("file", "row_no", "idx", "Time", "Team", "DraftKings", "Caesars", "Bet365"))
    val raw = named.withColumn("Sport", lit("NFL"))
    val grid = graft.pipeline.Normalize.grid(raw,
      Seq("DraftKings", "Caesars", "Bet365"), "Bet365")
    val alerts = graft.pipeline.Arbitrage.detect(grid,
      Seq("DraftKings", "Caesars", "Bet365"), minMarginPct = 3)
    val byTeam = alerts.select("Team", "best_bookie")
      .as[(String, String)].collect().toMap
    assert(byTeam == Map("Chiefs" -> "DraftKings", "Bills" -> "Caesars"))
  }

  test("required-column pushdown prunes the scan's read schema") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val dir = Files.createTempDirectory("htmlsrc6")
    write(dir, "nfl.html", oddsPage)
    val df = spark.read.format("odds-html").load(dir.toString)

    def scanSchema(q: org.apache.spark.sql.DataFrame): Seq[String] = {
      val plan = q.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      plan.collectLeaves().collect {
        case b: BatchScanExec => b.scan.readSchema().fieldNames.toSeq
      }.head
    }

    // projection reaches the source: the per-row file path and the
    // cell arrays are never materialized for a row_no-only read
    assert(scanSchema(df.select("row_no")) == Seq("row_no"))
    assert(scanSchema(df.select("cells", "row_no")).sorted == Seq("cells", "row_no"))
    // a bare count materializes no columns at all
    assert(scanSchema(df.groupBy().count()).isEmpty)
    // and the pruned reads still return correct values
    assert(df.select("row_no").as[Int].collect().sorted.toSeq == Seq(0, 1, 2))
    assert(df.count() == 3)
    val teams = df.select(col("cells").getItem(1)).as[String].collect().toSet
    assert(teams == Set("Team", "Chiefs & co", "Bills"))
  }

  test("promoteHeader de-duplicates repeated header labels") {
    val page = "<table><tr><th>A</th><th>A</th></tr>" +
      "<tr><td>1</td><td>2</td></tr></table>"
    val dir = Files.createTempDirectory("htmlsrc5")
    write(dir, "x.html", page)
    val named = graft.pipeline.Normalize.promoteHeader(
      spark.read.format("odds-html").load(dir.toString))
    assert(named.columns.toSeq == Seq("file", "row_no", "idx", "A", "A_2"))
    assert(named.select("A", "A_2").as[(String, String)].head() == ("1", "2"))
  }

  test("snapshot -> Scores.finishedGames end to end") {
    // a scores-site snapshot: 8 cells per row, info at 0, teams at 4/7
    val longFinal = "Final " + "x" * 44
    def tr(info: String, t1: String, t2: String) =
      s"<tr><td>$info</td><td>a</td><td>b</td><td>c</td><td>$t1</td>" +
        s"<td>d</td><td>e</td><td>$t2</td></tr>"
    val page = "<table>" +
      tr(longFinal, "Cardinals99-77Final", "49ers21-10Final") +
      tr("Final short", "Hawks1-2", "Lions3-4") +
      "</table>"
    val dir = Files.createTempDirectory("htmlsrc3")
    write(dir, "scores.html", page)
    val raw = spark.read.format("odds-html").load(dir.toString)
      .select((0 until 8).map(i => col("cells").getItem(i).as(s"c$i")): _*)
    val out = graft.pipeline.Scores.finishedGames(raw, "NFL")
      .as[(Option[String], String)].collect().toSet
    assert(out == Set((Some("Cardinals"), "NFL"), (Some("49ers"), "NFL")))
  }
}
