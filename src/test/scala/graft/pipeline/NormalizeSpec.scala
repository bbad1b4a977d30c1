package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** E1-from-raw golden test: scraped wide strings -> canonical grid ->
  * arbitrage alert, end to end. */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val bookies = Seq("DraftKings", "Caesars", "Bet365")

  // A1 odds_raw shape: (idx, Sport, Team, DraftKings, Caesars, Bet365)
  private def raw = Seq(
    // embedded header row (the scraper re-emits them mid-table)
    (0, "NFL", "Time", "DraftKings", "Caesars", "Bet365"),
    // ML game with the planted arb
    (1, "NFL", "Chiefs", "+225", "-500", "+215"),
    (2, "NFL", "Bills", "-600", "-180", "-580"),
    // spread game: "<line> <payout>" cells
    (3, "NFL", "Jets", "-3.5 -110", "-3.5 -105", "-3.5 -108"),
    (4, "NFL", "Dolphins", "+3.5 -110", "+3.5 -115", "+3.5 -112"),
    // over/under game: o/u prefixes
    (5, "NFL", "Rams", "o47.5 -110", "o47.0 -105", "o47.5 -110"),
    (6, "NFL", "49ers", "u47.5 -110", "u47.0 -115", "u47.5 -110"),
    // empty-team junk row
    (7, "NFL", "", "x", "x", "x")
  ).toDF("idx", "Sport", "Team", "DraftKings", "Caesars", "Bet365")

  test("grid: classify, pair, expand, extract — golden shape") {
    val g = Normalize.grid(raw, bookies, classifierBookie = "Bet365")
      .orderBy("idx", "Info")
    val rows = g.select("Team", "BetType", "Info", "DraftKings")
      .as[(String, String, String, String)].collect().toSeq
    // ML legs have Payout only; Spread/OU have Line+Payout
    assert(rows.count(_._2 == "ML") == 2)
    assert(rows.filter(_._1 == "Jets").map(r => (r._3, r._4)).toSet ==
      Set(("Line", "-3.5"), ("Payout", "-110")))
    assert(rows.filter(_._1 == "Rams").map(r => (r._3, r._4)).toSet ==
      Set(("Line", "+47.5"), ("Payout", "-110"))) // o -> +
    assert(rows.filter(_._1 == "49ers").map(r => (r._3, r._4)).toSet ==
      Set(("Line", "-47.5"), ("Payout", "-110"))) // u -> -
    // header + empty rows are gone
    assert(!rows.exists(r => r._1 == "Time" || r._1 == ""))
  }

  test("STRING idx orders numerically — '10' pairs after '9', not after '1'") {
    val rows = (1 to 12).map(i =>
      (i.toString, "NFL", s"T$i", "+100", "-110", "+102"))
    val raw12 = rows.toDF("idx", "Sport", "Team", "DraftKings", "Caesars", "Bet365")
    val games = Normalize.grid(raw12, bookies, "Bet365")
      .select("Team", "game_id").as[(String, Int)].collect().toMap
    // lexicographic order ('1','10','11','12','2',...) would pair
    // T1 with T10; numeric order pairs consecutive legs
    assert(games("T1") == games("T2"))
    assert(games("T9") == games("T10"))
    assert(games("T11") == games("T12"))
  }

  test("withBovada merges the bovada column; empty bovada leaves nulls") {
    val g = Normalize.grid(raw, bookies, classifierBookie = "Bet365")
    val bov = Seq(("Chiefs", "ML", "Payout", "+240")).toDF("Team", "BetType", "Info", "Bovada")
    val merged = Normalize.withBovada(g, bov)
    val vals = merged.select("Team", "Bovada").as[(String, String)].collect().toMap
    assert(vals("Chiefs") == "+240" && vals("Bills") == null)
    // with Bovada as a bookie, the better +240 quote wins the argmax
    val alerts = Arbitrage.detect(merged, bookies :+ "Bovada", minMarginPct = 3)
      .select("Team", "best_bookie").as[(String, String)].collect().toMap
    assert(alerts("Chiefs") == "Bovada")
  }

  test("raw strings -> grid -> arbitrage alert, end to end") {
    val g = Normalize.grid(raw, bookies, classifierBookie = "Bet365")
    val alerts = Arbitrage.detect(g, bookies, minMarginPct = 3)
      .select("Team", "margin_pct").as[(String, Int)].collect().toMap
    assert(alerts.keySet == Set("Chiefs", "Bills"))
    assert(alerts("Chiefs") == 5)
  }
}
