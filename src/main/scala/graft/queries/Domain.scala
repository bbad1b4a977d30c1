package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryGroup, Tables}
import graft.functions.Odds
import graft.operators.Reshape
import graft.pipeline.{Arbitrage, Scores}

/** The banksy betting-domain semantics (SURVEY.md §2.9 math +
  * §2.5-§2.6 arbitrage shapes) exercised over deterministic synthetic
  * odds derived from the testdata, so every domain function sits
  * behind the DuckDB oracle gate. The string-normalization battery
  * (regex-heavy F1-F15) is parity-tested in ScalaTest instead, where
  * Python-regex fixtures are the reference.
  *
  * Synthetic-odds construction: each order's first two lineitems form
  * a game pair (the reference's consecutive-row pairs, made explicit);
  * two "bookies" quote american odds derived from l_discount / l_tax.
  */
object Domain extends QueryGroup {

  /** Legs table: per order, the first two lines, with two bookie
    * quotes in american odds. Deterministic: (orderkey, linenumber)
    * is a unique total order.
    */
  private def legs(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
    // order by every output-affecting column so the chosen pair is a
    // deterministic multiset even under duplicate rows.
    val w = Window.partitionBy("l_orderkey")
      .orderBy("l_linenumber", "l_discount", "l_tax")
    li.withColumn("rn", row_number().over(w))
      .withColumn("n_lines", count(lit(1)).over(Window.partitionBy("l_orderkey")))
      .filter(col("rn") <= 2 && col("n_lines") >= 2)
      .select(col("l_orderkey").as("game_id"), col("rn").as("leg"),
        (round(col("l_discount") * 4000) - 200).as("bookie_disc"),
        (round(col("l_tax") * 4000) - 200).as("bookie_tax"))
  }

  private val legsSql =
    """SELECT l_orderkey AS game_id, rn AS leg,
       round(l_discount*4000) - 200 AS bookie_disc,
       round(l_tax*4000) - 200 AS bookie_tax
       FROM (SELECT *,
               row_number() OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_discount, l_tax) AS rn,
               count(*) OVER (PARTITION BY l_orderkey) AS n_lines
             FROM lineitem)
       WHERE rn <= 2 AND n_lines >= 2"""

  /** Shared team-name universe for the scores-feed queries; includes
    * the "49ers" special case and "76ers" (digit prefix, NOT special-
    * cased -> extracts to null, exercising the inert-null path). */
  private val scoreTeams = Seq("Hawks", "Lions", "Bears", "Tigers",
    "Eagles", "Falcons", "Jets", "Giants", "Rams", "Bills", "Chiefs",
    "Colts", "Broncos", "Ravens", "Saints", "Packers", "Bengals",
    "Chargers", "Raiders", "49ers", "76ers")

  private def teamAt(ix: org.apache.spark.sql.Column) =
    element_at(array(scoreTeams.map(lit): _*),
      (pmod(ix, lit(scoreTeams.size)) + 1).cast("int"))

  private def teamAtSql(expr: String) =
    s"(['${scoreTeams.mkString("','")}'])[(($expr) % ${scoreTeams.size}) + 1]"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S2+P9+P10+J3 composed: the finished-games scores stage over a
    // synthetic positional scrape grid (info blob + ordinal team
    // columns with junk suffixes), then the NaN-keeping anti join
    // against an odds relation (arbitrage_scanner.py:216-252).
    "q71_scores_pipeline" -> ((s, dir) => {
      val okey = col("o_orderkey")
      val o = Tables.orders(s, dir).select(okey)
      val info = when(pmod(okey, lit(4)) === 0,
          concat(lit("Final "), rpad(concat(lit("g"), okey), 44, "x")))
        .when(pmod(okey, lit(4)) === 1,
          concat(lit("Final "), rpad(concat(lit("g"), okey), 43, "x")))
        .when(pmod(okey, lit(4)) === 2,
          concat(lit("Live "), rpad(concat(lit("g"), okey), 60, "x")))
        .otherwise(concat(lit("Final "), rpad(concat(lit("g"), okey), 60, "x")))
      val raw = o.select(
        info.as("c0"), lit("f1").as("c1"), lit("f2").as("c2"), lit("f3").as("c3"),
        concat(teamAt(okey), lit("99-12Final")).as("c4"),
        lit("f5").as("c5"), lit("f6").as("c6"),
        concat(teamAt(okey + 7), lit("88-3Final")).as("c7"),
        concat(lit("S"), pmod(okey, lit(3))).as("c8"))
      val finished = Scores.finishedGames(raw, col("c8"))
      val odds = Tables.orders(s, dir).select(
        okey.as("bet_id"), teamAt(okey * 3 + 1).as("Team"),
        concat(lit("S"), pmod(okey + 1, lit(3))).as("Sport"))
      Scores.removeFinished(odds, finished)
    }),

    // O6 batch form: second-matchup dedup (bovada_pull.py:156-162) —
    // pair ids over explicit order, per-team cumcount, drop games
    // where a team appears a second time; partitioned by sport (the
    // scale-correct form of the reference's single global order).
    "q72_second_matchup_dedup" -> ((s, dir) => {
      val okey = col("o_orderkey")
      val legs = Tables.orders(s, dir).select(okey)
        .withColumn("leg", explode(array(lit(1), lit(2))))
      val rows = legs.select(
        (okey * 2 + col("leg")).as("idx"),
        concat(lit("S"), pmod(okey, lit(4))).as("sport"),
        concat(lit("T"), when(col("leg") === 1, pmod(okey, lit(41)))
          .otherwise(pmod(okey * 13 + 5, lit(41)))).as("team"))
      Reshape.dropRepeatMatchups(rows, "team", Seq(col("idx")), Seq("sport"))
        .select("idx", "sport", "team", "game_id")
    }),

    // F16 classifier over constructed quote strings.
    "q20_bettype_classify" -> ((s, dir) => {
      val p = Tables.part(s, dir)
      val quote = when(pmod(col("p_partkey"), lit(4)) === 0,
          concat(lit("o"), col("p_size").cast("string"), lit(".5")))
        .when(pmod(col("p_partkey"), lit(4)) === 1,
          concat(lit("+"), (col("p_size") * 10).cast("string"), lit(" -110")))
        .when(pmod(col("p_partkey"), lit(4)) === 2,
          concat(lit("-"), col("p_size").cast("string"), lit(".5 -105")))
        .otherwise(when(pmod(col("p_size"), lit(2)) === 0,
            lpad((col("p_size") * 7).cast("string"), 4, "1"))
          .otherwise(lit("xx")))
      p.select(col("p_partkey"), quote.as("quote"))
        .withColumn("bet_type", Odds.betType(col("quote")))
        .withColumn("sort_key", Odds.betTypeSortKey(col("bet_type")))
    }),

    // F17: american → decimal odds.
    "q21_odds_decimal" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      // + 0.0 collapses IEEE -0.0 (from rounding tiny negatives) to
      // +0.0 so the driver's value hash can't see a sign-of-zero drift.
      val american = round((col("value") - 5.0) * 40) + lit(0.0)
      ev.select(col("event_id"), american.as("american"),
        round(Odds.americanToDecimal(american), 4).as("decimal_odds"))
    }),

    // A1+A3+P12: the core arbitrage detection — per-leg best quote
    // (row-wise max + argmax side), per-game window sum, positive-calc
    // filter with the double-EVEN false-positive guard
    // (arbitrage_scanner.py:275-293,331-332).
    "q22_arb_detect" -> ((s, dir) => {
      val l = legs(s, dir)
      val withBest = Reshape.argmax(l, Seq("bookie_disc", "bookie_tax"), "max_payout", "best_bookie")
      val w = Window.partitionBy("game_id")
      withBest
        .withColumn("arb_calc", sum(col("max_payout")).over(w))
        .filter(col("arb_calc") > 0 &&
          !(col("max_payout") === 100 && col("arb_calc") === 200))
        .select("game_id", "leg", "max_payout", "best_bookie", "arb_calc")
    }),

    // F17+F18+F19: stake sizing and profit margin per arbitrage game
    // (arbitrage_scanner.py:360-378) — leg 1 stakes 100, leg 2 hedges
    // to equal payout; margin integer-rounded.
    "q23_stake_sizing" -> ((s, dir) => {
      val l = legs(s, dir)
      val best = greatest(col("bookie_disc"), col("bookie_tax"))
      val w = Window.partitionBy("game_id")
      val wo = Window.partitionBy("game_id").orderBy("leg")
      val withDec = l.withColumn("dec_odds", Odds.americanToDecimal(best))
        .withColumn("arb_calc", sum(best).over(w))
        .filter(col("arb_calc") > 0)
      val payout = first(round(col("dec_odds") * 100, 2)).over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      withDec
        .withColumn("payout", payout)
        .withColumn("stake", when(col("leg") === 1, lit(100.0))
          .otherwise(Odds.hedgeStake(col("payout"), col("dec_odds"))))
        .withColumn("total_stake", sum(col("stake")).over(w))
        .filter(col("leg") === 1)
        .select(col("game_id"), col("payout"),
          round(col("total_stake"), 2).as("total_stake"),
          Odds.profitMargin(col("payout"), col("total_stake")).as("margin_pct"))
    }),

    // F13: explicit-sign display form.
    "q24_plus_prefix" -> ((s, dir) => {
      val p = Tables.part(s, dir)
      p.select(col("p_partkey"),
        Odds.plusPrefix(col("p_size") - 25).as("signed_size"))
    }),

    // A5+J9+P12: the ≤3-alerts-per-(team,day) rate limit
    // (arbitrage_scanner.py:434-461) — cumulative rank within the
    // day, keep the first 3.
    "q25_rate_limit" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val w = Window.partitionBy(col("user_id"), to_date(col("ts")))
        .orderBy("ts", "event_id")
      ev.withColumn("day", to_date(col("ts")))
        .withColumn("alert_no", row_number().over(w))
        .filter(col("alert_no") <= 3)
        .select("event_id", "user_id", "day", "alert_no")
    }),

    // A6: sign audit — groups where both legs carry the same sign are
    // not real arbitrage (arbitrage_scanner.py:427-431).
    "q26_sign_audit" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val sign = when(col("value") >= 5, lit("+")).otherwise(lit("-"))
      ev.withColumn("sign", sign)
        .groupBy("user_id", "event_type")
        .agg(countDistinct(col("sign")).as("n_signs"))
        .filter(col("n_signs") =!= 1)
    }),

    // G2: two-sides-per-row explode (bovada_pull.py:123-148) via
    // Reshape.explodeSides.
    "q27_explode_sides" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      Reshape.explodeSides(
        o.select("o_orderkey", "o_totalprice"),
        Seq(
          Seq("role" -> lit("base"), "amount" -> col("o_totalprice")),
          // no rounding: /2 of a 2-dp price sits exactly on a .xx5
          // tie where HALF_UP (Spark) and DuckDB disagree; the raw
          // double division is bit-deterministic in both engines.
          Seq("role" -> lit("half"), "amount" -> col("o_totalprice") / 2)))
        .select("o_orderkey", "side_no", "role", "amount")
    }),

    // E1 end-to-end: the WHOLE composed arbitrage pipeline
    // (normalize -> argmax -> window calc -> guards -> stake sizing
    // -> margin -> alert text) over a synthetic wide odds grid that
    // exercises the string quirks (EVEN/even, N/A, trailing " +").
    "q29_arbitrage_pipeline" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val w = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_discount", "l_tax")
      val pairs = li
        .withColumn("rn", row_number().over(w))
        .withColumn("nl", count(lit(1)).over(Window.partitionBy("l_orderkey")))
        .filter(col("rn") <= 2 && col("nl") >= 2)
        .select(col("l_orderkey").as("okey"), col("rn"),
          (round(col("l_discount") * 4000) - 200).as("dkv"),
          (round(col("l_tax") * 4000) - 200).as("czv"))
      val grid = pairs.select(
        // build-time game id, like Normalize.grid's production
        // contract (each okey contributes exactly the two legs of one
        // game, so okey IS the pair id — no re-derivation window)
        col("okey").as("game_id"),
        (col("okey") * 10 + col("rn")).as("idx"),
        concat(lit("S"), pmod(col("okey"), lit(8))).as("Sport"),
        concat(lit("T"), col("okey"), lit("_"), col("rn")).as("Team"),
        lit("ML").as("BetType"), lit("Payout").as("Info"),
        when(pmod(col("okey"), lit(7)) === 0, lit("EVEN"))
          .when(pmod(col("okey"), lit(11)) === 0, lit("N/A"))
          .when(pmod(col("okey"), lit(5)) === 0,
            concat(Odds.plusPrefix(col("dkv")), lit(" +")))
          .otherwise(Odds.plusPrefix(col("dkv"))).as("DraftKings"),
        when(pmod(col("okey"), lit(13)) === 0, lit("even"))
          .otherwise(Odds.plusPrefix(col("czv"))).as("Caesars"))
      Arbitrage.detect(grid, Seq("DraftKings", "Caesars"), minMarginPct = 3)
    }),

    // F22+J1: left join to a partial dim + coalesce fallback chain
    // (arbitrage_scanner.py:196-197).
    "q28_coalesce_dim" -> ((s, dir) => {
      val sup = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir).filter(col("n_nationkey") < 13)
      sup.join(broadcast(n), sup("s_nationkey") === n("n_nationkey"), "left")
        .select(col("s_suppkey"),
          coalesce(col("n_name"), lit("N/A")).as("nation_name"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q71_scores_pipeline" ->
      s"""WITH t AS (SELECT o_orderkey AS okey FROM orders),
         raw AS (
           SELECT okey,
             CASE WHEN okey % 4 = 0 THEN 'Final ' || rpad('g' || okey, 44, 'x')
                  WHEN okey % 4 = 1 THEN 'Final ' || rpad('g' || okey, 43, 'x')
                  WHEN okey % 4 = 2 THEN 'Live ' || rpad('g' || okey, 60, 'x')
                  ELSE 'Final ' || rpad('g' || okey, 60, 'x') END AS info,
             ${teamAtSql("okey")} || '99-12Final' AS t1,
             ${teamAtSql("okey + 7")} || '88-3Final' AS t2,
             'S' || (okey % 3) AS sport
           FROM t),
         fin AS (
           SELECT CASE WHEN substr(team_raw, 1, 5) = '49ers' THEN '49ers'
                       ELSE nullif(regexp_extract(team_raw, '^([A-Za-z]+)', 1), '')
                  END AS team, sport
           FROM (SELECT unnest([t1, t2]) AS team_raw, sport
                 FROM raw WHERE length(info) >= 50 AND info LIKE 'Final %')),
         odds AS (
           SELECT okey AS bet_id, ${teamAtSql("okey * 3 + 1")} AS Team,
             'S' || ((okey + 1) % 3) AS Sport FROM t)
         SELECT bet_id, Team, Sport FROM odds
         WHERE NOT EXISTS (SELECT 1 FROM fin
           WHERE fin.team = odds.Team AND fin.sport = odds.Sport)""",

    "q72_second_matchup_dedup" ->
      """WITH legs AS (SELECT o_orderkey AS okey, unnest([1, 2]) AS leg FROM orders),
         r AS (
           SELECT okey*2 + leg AS idx, 'S' || (okey % 4) AS sport,
             'T' || (CASE WHEN leg = 1 THEN okey % 41
                          ELSE (okey*13 + 5) % 41 END) AS team
           FROM legs),
         ranked AS (
           SELECT idx, sport, team,
             CAST(FLOOR((row_number() OVER (PARTITION BY sport ORDER BY idx) - 1) / 2) + 1 AS INT) AS game_id,
             row_number() OVER (PARTITION BY sport, team ORDER BY idx) AS rnk
           FROM r)
         SELECT idx, sport, team, game_id FROM ranked a
         WHERE NOT EXISTS (SELECT 1 FROM ranked b
           WHERE b.rnk = 2 AND b.sport = a.sport AND b.game_id = a.game_id)""",

    "q20_bettype_classify" ->
      """SELECT p_partkey, quote,
         CASE WHEN regexp_matches(quote, '[ou]') THEN 'Over/Under'
              WHEN length(quote) IN (4,5) THEN 'ML'
              WHEN regexp_matches(quote, '[+-]') THEN 'Spread'
              ELSE 'ERROR' END AS bet_type,
         CASE WHEN regexp_matches(quote, '[ou]') THEN 2
              WHEN length(quote) IN (4,5) THEN 0
              WHEN regexp_matches(quote, '[+-]') THEN 1
              ELSE 2 END AS sort_key
         FROM (
           SELECT p_partkey,
             CASE WHEN p_partkey % 4 = 0 THEN 'o' || p_size || '.5'
                  WHEN p_partkey % 4 = 1 THEN '+' || (p_size*10) || ' -110'
                  WHEN p_partkey % 4 = 2 THEN '-' || p_size || '.5 -105'
                  ELSE CASE WHEN p_size % 2 = 0 THEN lpad((p_size*7)::VARCHAR, 4, '1')
                            ELSE 'xx' END
             END AS quote
           FROM part)""",
    "q21_odds_decimal" ->
      """SELECT event_id, american,
         round(CASE WHEN american > 0 THEN american/100 + 1
                    WHEN american < 0 THEN 100/abs(american) + 1
                    ELSE 1.0 END, 4) AS decimal_odds
         FROM (SELECT event_id, round((value - 5.0) * 40) + 0.0 AS american
               FROM events)""",
    "q22_arb_detect" ->
      s"""WITH legs AS ($legsSql)
         SELECT game_id, leg, max_payout, best_bookie, arb_calc FROM (
           SELECT game_id, leg,
             greatest(bookie_disc, bookie_tax) AS max_payout,
             CASE WHEN bookie_tax >= bookie_disc THEN 'bookie_tax' ELSE 'bookie_disc' END AS best_bookie,
             sum(greatest(bookie_disc, bookie_tax)) OVER (PARTITION BY game_id) AS arb_calc
           FROM legs)
         WHERE arb_calc > 0 AND NOT (max_payout = 100 AND arb_calc = 200)""",
    "q23_stake_sizing" ->
      s"""WITH legs AS ($legsSql),
         dec AS (
           SELECT game_id, leg,
             CASE WHEN greatest(bookie_disc, bookie_tax) > 0
                    THEN greatest(bookie_disc, bookie_tax)/100 + 1
                  WHEN greatest(bookie_disc, bookie_tax) < 0
                    THEN 100/abs(greatest(bookie_disc, bookie_tax)) + 1
                  ELSE 1.0 END AS dec_odds,
             sum(greatest(bookie_disc, bookie_tax)) OVER (PARTITION BY game_id) AS arb_calc
           FROM legs),
         filtered AS (SELECT * FROM dec WHERE arb_calc > 0),
         staged AS (
           SELECT game_id, leg, dec_odds,
             first_value(round(dec_odds*100, 2)) OVER (PARTITION BY game_id ORDER BY leg
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS payout
           FROM filtered),
         staked AS (
           SELECT game_id, leg, payout,
             CASE WHEN leg = 1 THEN 100.0 ELSE round(payout/dec_odds, 2) END AS stake
           FROM staged)
         SELECT game_id, payout,
           round(sum(stake) OVER (PARTITION BY game_id), 2) AS total_stake,
           CAST(round((payout - sum(stake) OVER (PARTITION BY game_id))
                / sum(stake) OVER (PARTITION BY game_id) * 100) AS INT) AS margin_pct
         FROM staked QUALIFY leg = 1""",
    "q24_plus_prefix" ->
      """SELECT p_partkey, printf('%+d', p_size - 25) AS signed_size FROM part""",

    "q29_arbitrage_pipeline" ->
      """WITH lipairs AS (
           SELECT l_orderkey AS okey, rn,
             round(l_discount*4000) - 200 AS dkv,
             round(l_tax*4000) - 200 AS czv
           FROM (SELECT *,
                   row_number() OVER (PARTITION BY l_orderkey
                     ORDER BY l_linenumber, l_discount, l_tax) AS rn,
                   count(*) OVER (PARTITION BY l_orderkey) AS nl
                 FROM lineitem)
           WHERE rn <= 2 AND nl >= 2),
         grid AS (
           SELECT okey AS game_id, okey*10 + rn AS idx, 'S' || (okey % 8) AS Sport,
             'T' || okey || '_' || rn AS Team, 'ML' AS BetType, 'Payout' AS Info,
             CASE WHEN okey % 7 = 0 THEN 'EVEN'
                  WHEN okey % 11 = 0 THEN 'N/A'
                  WHEN okey % 5 = 0 THEN printf('%+d', CAST(dkv AS INT)) || ' +'
                  ELSE printf('%+d', CAST(dkv AS INT)) END AS DraftKings,
             CASE WHEN okey % 13 = 0 THEN 'even'
                  ELSE printf('%+d', CAST(czv AS INT)) END AS Caesars
           FROM lipairs),
         normed AS (
           SELECT *,
             regexp_replace(trim(regexp_replace(DraftKings, '[ +]+$', '')), '(?i)^EVEN$', '+100') AS dkn,
             regexp_replace(trim(regexp_replace(Caesars, '[ +]+$', '')), '(?i)^EVEN$', '+100') AS czn
           FROM grid WHERE Info = 'Payout'),
         parsed AS (
           SELECT *,
             TRY_CAST(CASE WHEN dkn = 'N/A' THEN NULL ELSE dkn END AS DOUBLE) AS dk_v,
             TRY_CAST(CASE WHEN czn = 'N/A' THEN NULL ELSE czn END AS DOUBLE) AS cz_v
           FROM normed),
         best AS (
           SELECT *,
             greatest(coalesce(dk_v, -1.7976931348623157e308),
                      coalesce(cz_v, -1.7976931348623157e308)) AS max_payout,
             CASE WHEN coalesce(cz_v, -1.7976931348623157e308)
                     > coalesce(dk_v, -1.7976931348623157e308)
                  THEN 'Caesars' ELSE 'DraftKings' END AS best_bookie
           FROM parsed),
         calc AS (
           SELECT *, sum(max_payout) OVER (PARTITION BY Sport, BetType, game_id) AS arb_calc
           FROM best),
         audited AS (
           SELECT * FROM (
             SELECT *, CASE WHEN max_payout >= 0 THEN '+' ELSE '-' END AS sgn
             FROM calc
             WHERE arb_calc > 0 AND NOT (max_payout = 100 AND arb_calc = 200))
           QUALIFY min(sgn) OVER (PARTITION BY Sport, BetType, game_id)
                != max(sgn) OVER (PARTITION BY Sport, BetType, game_id)),
         sized AS (
           SELECT *,
             CASE WHEN max_payout > 0 THEN max_payout/100 + 1
                  WHEN max_payout < 0 THEN 100/abs(max_payout) + 1
                  ELSE 1.0 END AS dec_odds,
             (row_number() OVER (PARTITION BY Sport, BetType, game_id ORDER BY idx) = 1) AS is_anchor
           FROM audited),
         pay AS (
           SELECT *, first_value(round(dec_odds*100, 2)) OVER (
             PARTITION BY Sport, BetType, game_id ORDER BY idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS payout
           FROM sized),
         stk AS (
           SELECT *, CASE WHEN is_anchor THEN 100.0
                          ELSE round(payout/dec_odds, 2) END AS stake FROM pay),
         tot AS (
           SELECT *, round(sum(stake) OVER (PARTITION BY Sport, BetType, game_id), 2) AS total_stake
           FROM stk),
         mar AS (
           SELECT *, CAST(round((payout - total_stake)/total_stake*100) AS INT) AS margin_pct
           FROM tot)
         SELECT Sport, game_id, BetType, Team, best_bookie, max_payout, stake,
           payout, total_stake, margin_pct,
           printf('%s %s %s: bet %.2f on %s @ %s (%s), margin %d%%',
             Sport, BetType, Team, stake, Team,
             printf('%+d', CAST(max_payout AS INT)), best_bookie, margin_pct) AS message
         FROM mar WHERE margin_pct >= 3""",
    "q25_rate_limit" ->
      """SELECT event_id, user_id, CAST(ts AS DATE) AS day, alert_no FROM (
           SELECT event_id, user_id, ts,
             row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS alert_no
           FROM events)
         WHERE alert_no <= 3""",
    "q26_sign_audit" ->
      """SELECT user_id, event_type,
         count(DISTINCT CASE WHEN value >= 5 THEN '+' ELSE '-' END) AS n_signs
         FROM events GROUP BY user_id, event_type
         HAVING count(DISTINCT CASE WHEN value >= 5 THEN '+' ELSE '-' END) != 1""",
    "q27_explode_sides" ->
      """SELECT o_orderkey, 1 AS side_no, 'base' AS role, o_totalprice AS amount FROM orders
         UNION ALL
         SELECT o_orderkey, 2, 'half', o_totalprice/2 FROM orders""",
    "q28_coalesce_dim" ->
      """SELECT s_suppkey, coalesce(n_name, 'N/A') AS nation_name
         FROM supplier LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 13) n
         ON s_nationkey = n_nationkey"""
  )
}
