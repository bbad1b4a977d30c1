package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryGroup, Tables}

/** Core relational operators from SURVEY.md §2.3–§2.7 re-expressed
  * over the TPC-H-ish testdata: aggregation (A1/A5), broadcast dim
  * joins (J1-J3), semi/anti joins (P13/J3/J10), window sums (J4/J7),
  * pair renumbering (W1), forward-fill (W2), group argmax (A3/J6),
  * distinct-count audit (A6), cumcount (A4), top-k (O1+P12).
  *
  * Scale notes (100 TB stance): dim joins broadcast the small side so
  * the fact table never shuffles; windows partition by high-cardinality
  * keys (orderkey/custkey/user_id) so state per partition stays tiny;
  * all aggregates are partial-aggregation friendly (sum/count/min/max).
  */
object Relational extends QueryGroup {

  /** Exact, order-independent sum of a double column: decimal in,
    * rounded double out. Mirrors the SQL-side
    * round(sum(CAST(x AS DECIMAL(18,4))), s)::DOUBLE so both engines
    * produce the bit-identical double regardless of partial-agg order.
    */
  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    round(sum(c.cast("decimal(18,4)")), scale).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1 + F19: pricing summary (TPC-H Q1 shape) — group-sum with
    // derived measures; partial agg (map-side combine) does the heavy
    // lifting, only |groups| rows shuffle.
    "q01_pricing_summary" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
    }),

    // J1: star-schema dim enrichment — both dims broadcast (≤25 rows);
    // the customer side never shuffles for the join, only for the agg.
    "q02_region_rollup" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_customers"),
             dsum(col("c_acctbal")).as("sum_acctbal"))
    }),

    // J2-shape fact⋈dim: orders joined to (broadcast) customer, rolled
    // up by market segment.
    "q03_segment_revenue" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
             dsum(col("o_totalprice")).as("revenue"))
    }),

    // P13 semi-join: customers having at least one big order.
    "q04_semi_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),

    // J3/J10 anti-join: customers with no orders at all (the
    // "remove finished games" idiom, null-safe by construction).
    "q05_anti_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // J4/J5 eliminated-join window: per-order total and line share —
    // the SURVEY's "window instead of groupby+merge-back" rewrite.
    // Decimal window sum keeps the total order-independent; the final
    // double division is then bit-deterministic.
    "q06_window_share" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val w = Window.partitionBy("l_orderkey")
      val total = sum(col("l_extendedprice").cast("decimal(18,4)")).over(w)
      li.select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") / total.cast("double"), 6).as("price_share"))
    }),

    // W1: positional pair-id (the reference's `i//2+1` game-id) as an
    // explicit deterministic window — rows pair up within an order by
    // line number.
    "q07_pair_id" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
      li.select(col("l_orderkey"), col("l_linenumber"),
        (floor((row_number().over(w) - 1) / 2) + 1).cast("int").as("pair_id"))
    }),

    // W2: forward-fill (pandas ffill) = last(ignoreNulls) over an
    // explicit (ts, event_id) order; nulls injected deterministically.
    "q08_ffill" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val v = when(col("event_type") === "click", lit(null)).otherwise(col("value"))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.select(col("event_id"), col("user_id"),
        last(v, ignoreNulls = true).over(w).as("value_ffill"))
    }),

    // A3: row-wise max across measure columns + which-column argmax
    // (the bookie-grid `max(axis=1)` + find_max_payout_column pair).
    "q09_rowmax" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.select(col("l_orderkey"), col("l_linenumber"),
        greatest(col("l_discount"), col("l_tax")).as("best_rate"),
        when(col("l_tax") >= col("l_discount"), lit("tax"))
          .otherwise(lit("discount")).as("best_side"))
    }),

    // A3/J6 group-argmax: per customer, their single most expensive
    // order — rank-1 window with a total tie-break order, replacing
    // the reference's O(cols) row-scan + re-join.
    "q10_group_argmax" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("top_orderkey"),
                col("o_totalprice").as("top_price"))
    }),

    // A6: the sign-audit shape — groups whose member set is not
    // uniform (count distinct != 1). Exact distinct on tiny groups.
    "q11_status_audit" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      o.groupBy("o_custkey")
        .agg(countDistinct(col("o_orderstatus")).as("n_status"))
        .filter(col("n_status") > 1)
    }),

    // A4/W5: group cumcount (rank of repeat appearance) with explicit
    // deterministic order — pandas' silent row order made explicit.
    "q12_cumcount" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      ev.select(col("event_id"), col("user_id"),
        row_number().over(w).as("visit_no"))
    }),

    // O1+P12 top-k per group: 3 priciest parts per brand,
    // deterministic tie-break on partkey.
    "q13_topk_per_group" -> ((s, dir) => {
      val p = Tables.part(s, dir)
      val w = Window.partitionBy("p_brand")
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      p.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("p_brand"), col("rnk"), col("p_partkey"), col("p_retailprice"))
    }),

    // Typed Aggregator top-k (SURVEY §2.10 extension slot): bounded
    // O(n log k) buffer with map-side partial aggregation — only k
    // rows per group ever shuffle, vs the window variant (q13)
    // sorting and shuffling every row. Same oracle as q13.
    "q55_topk_aggregator" -> ((s, dir) => {
      val p = Tables.part(s, dir)
      val topk = udaf(new graft.functions.TopKAggregator(3),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaDouble,
          org.apache.spark.sql.Encoders.scalaLong))
      p.groupBy("p_brand")
        .agg(topk(col("p_retailprice"), col("p_partkey")).as("tk"))
        .select(col("p_brand"),
          posexplode(arrays_zip(col("tk.scores"), col("tk.ids"))))
        .select(col("p_brand"), (col("pos") + 1).cast("int").as("rnk"),
          col("col.ids").as("p_partkey"), col("col.scores").as("p_retailprice"))
    }),

    // O5: unpivot wide measures → long EAV (the mega_df melt).
    "q14_unpivot" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.selectExpr("l_orderkey", "l_linenumber",
        "stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice, " +
          "'discount', l_discount, 'tax', l_tax) as (metric, value)")
    }),

    // G1: row-duplicating generator — explode a literal array into
    // Line/Payout rows, then drop the (ML, Line) combination, exactly
    // the reference's iterrows duplication rewritten as a Generator.
    "q15_explode_pair" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val tagged = o.select(col("o_orderkey"),
        when(col("o_orderstatus") === "O", lit("ML")).otherwise(lit("Spread")).as("bet_type"))
      tagged.withColumn("info", explode(array(lit("Line"), lit("Payout"))))
        .filter(!(col("bet_type") === "ML" && col("info") === "Line"))
    }),

    // O3: vertical union with provenance tag (concat-rows idiom).
    "q16_union_tagged" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select(col("c_name").as("name"), lit("customer").as("kind"))
      val sup = Tables.supplier(s, dir).select(col("s_name").as("name"), lit("supplier").as("kind"))
      c.unionByName(sup)
    }),

    // Sessionization: gap > 30 min starts a new session (lag + running
    // sum — the standard event-analytics pattern; partitions by
    // user_id so window state is tiny at any scale).
    "q46_sessionize" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val ms = unix_millis(col("ts"))
      val gap = ms - lag(ms, 1).over(w)
      val isNew = when(gap.isNull || gap > 1800000L, 1).otherwise(0)
      ev.withColumn("ms", ms)
        .withColumn("session_id", sum(isNew).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ms")).as("start_ms"), max(col("ms")).as("end_ms"))
    }),

    // Rollup (grouping sets): subtotal rows per status, priority, and
    // grand total, tagged by grouping_id — Catalyst expands to one
    // Expand + single aggregation pass.
    "q47_rollup" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      o.rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"),
          grouping_id().as("gid"))
    }),

    // Salted two-phase aggregation (skew mitigation): results must be
    // IDENTICAL to the plain group-by — which is exactly the oracle.
    "q48_salted_agg" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.operators.Salt.saltedSumCount(
        ev, Seq("user_id"), "value", col("event_id"), nSalts = 8)
        .select(col("user_id"),
          round(col("salted_sum"), 2).cast("double").as("sum_value"),
          col("n_rows"))
    }),

    // As-of join (backward): each click joins the most recent
    // purchase at-or-before it per user — union+window form (one
    // shuffle, no range cross-join); oracle is DuckDB's NATIVE
    // ASOF LEFT JOIN, an independently-implemented semantics check.
    "q49_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val mw = Window.partitionBy("user_id", "ts").orderBy(col("event_id").desc)
      val marks = ev.filter(col("event_type") === "purchase")
        .withColumn("rn", row_number().over(mw)).filter(col("rn") === 1)
        .select(col("user_id"), col("ts").as("mts"), col("value").as("mark_value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      graft.operators.AsOfJoin.backward(clicks, marks,
        Seq("user_id"), "ts", "mts", Seq("mark_value"))
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"), col("mark_value"))
    }),

    // Salted equi-join (skew mitigation for joins): small side
    // replicated per salt; result identical to the plain join, which
    // is exactly the oracle.
    "q67_salted_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val dim = ev.select(col("user_id")).distinct()
        .withColumn("tier", when(pmod(col("user_id"), lit(3)) === 0, "gold")
          .otherwise("standard"))
      graft.operators.Salt.saltedEquiJoin(ev, dim, Seq("user_id"),
        col("event_id"), nSalts = 4)
        .groupBy("tier", "event_type")
        .agg(count(lit(1)).as("n"))
    }),

    // CUBE: all grouping-set combinations with grouping_id.
    "q65_cube" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      o.cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
    }),

    // Correlated-subquery pattern: orders above their customer's
    // average order value — decorrelated to a window (exact decimal
    // mean so the comparison is engine-deterministic).
    "q66_above_customer_avg" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val w = Window.partitionBy("o_custkey")
      // decimal sum -> double BEFORE dividing, and NO final round():
      // the raw double is bit-identical across engines, while round()
      // diverges on shortest-repr midpoints (Spark rounds the decimal
      // string, DuckDB the exact binary value — x.xxxx5 splits them).
      val avgP = sum(col("o_totalprice").cast("decimal(18,4)")).over(w)
        .cast("double") / count(lit(1)).over(w)
      o.withColumn("cust_avg", avgP)
        .filter(col("o_totalprice") > col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
    }),

    // Semi-structured: JSON property extraction from the event props
    // column (string JSON -> typed value -> aggregate), the scraped
    // semi-structured-text shape generalized.
    "q64_json_extract" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val k = get_json_object(col("props"), "$.k").cast("int")
      ev.select(col("event_type"), k.as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"),
          count(when(col("k") > 50, 1)).as("n_high"),
          count(when(col("k").isNull, 1)).as("n_missing"))
    }),

    // Set operations: customers in BUILDING who are also big spenders
    // (INTERSECT) and suppliers-only names (EXCEPT).
    "q59_set_ops" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("k"))
      val building = c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k"))
      val inter = building.intersect(big).withColumn("op", lit("both"))
      val exc = building.except(big).withColumn("op", lit("building_only"))
      inter.unionByName(exc)
    }),

    // Pivot long -> wide via conditional aggregation (engine-portable
    // pivot; the reference's wide bookie grid shape).
    "q60_pivot" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      o.groupBy("o_orderpriority").agg(
        count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
        count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
        count(when(col("o_orderstatus") === "P", 1)).as("n_p"))
    }),

    // Fuzzy matching: Levenshtein distance <= 2 between part brands
    // and a probe list, blocked on the shared prefix so no cross join
    // (the team-name fuzzy-join need of the reference domain).
    "q61_edit_distance" -> ((s, dir) => {
      import s.implicits._
      val p = Tables.part(s, dir).select(col("p_brand")).distinct()
      val probes = Seq("Brand#11", "Brand#1", "Brnd#32").toDF("probe")
      p.join(broadcast(probes),
          substring(col("p_brand"), 1, 1) === substring(col("probe"), 1, 1))
        .withColumn("dist", levenshtein(col("p_brand"), col("probe")))
        .filter(col("dist") <= 2)
        .select("probe", "p_brand", "dist")
    }),

    // RANGE frame: trailing one-hour event-count per user over event
    // TIME (not row count) — rangeBetween on epoch milliseconds.
    // Offset + distribution window battery: lead/lag with defaults,
    // percent_rank, cume_dist over a deterministic total order — the
    // ordered-analytics family the reference never needed but any
    // generalized engine user reaches for first.
    "q74_lead_lag" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      // coalesce, not lag's default arg: the default fires only when
      // the OFFSET ROW is missing, while the oracle's coalesce also
      // masks a genuine NULL event_type — align on coalesce so a
      // nullable column cannot diverge the two engines.
      ev.select(col("event_id"), col("user_id"),
        coalesce(lag(col("event_type"), 1).over(w), lit("none")).as("prev_type"),
        coalesce(lead(col("event_type"), 1).over(w), lit("none")).as("next_type"),
        (unix_millis(col("ts")) -
          unix_millis(lag(col("ts"), 1).over(w))).as("ms_since_prev"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
    }),

    // Calendar-part battery (F26 generalized): year/month/hour,
    // day-of-week (Spark counts 1=Sunday; DuckDB dow counts
    // 0=Sunday — the oracle shifts explicitly), ISO week, and
    // Monday-start week truncation.
    "q77_time_parts" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.select(col("event_id"),
        year(col("ts")).as("y"), month(col("ts")).as("m"),
        dayofweek(col("ts")).as("dow_sun1"),
        weekofyear(col("ts")).as("iso_week"),
        hour(col("ts")).as("h"),
        // DATE, not timestamp: Spark parquet stamps UTC-instant
        // semantics the oracle's naive timestamp can't hash-match
        to_date(date_trunc("week", col("ts"))).as("week_start"))
    }),

    // Null-safe equi-join (<=>): null keys MATCH null keys — the join
    // form pandas merge gives for free on NaN-free frames but SQL
    // engines need spelled out. Keys come from the nullable JSON
    // property extraction (q64's k), aggregated per side first so the
    // join is dimension-sized.
    "q76_nullsafe_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      // distinct column names per side: self-join disambiguation via
      // dataset ids is fragile ("trivially true equals predicate"
      // warning) — renamed keys make the join condition unambiguous
      // by construction.
      def side(filtered: org.apache.spark.sql.DataFrame, tag: String) = filtered
        .select(col("event_type").as(s"et_$tag"),
          get_json_object(col("props"), "$.k").try_cast("int").as(s"k_$tag"))
        .groupBy(s"et_$tag", s"k_$tag").agg(count(lit(1)).as(s"n_$tag"))
      val a = side(ev.filter(pmod(col("user_id"), lit(2)) === 0), "even")
      val b = side(ev.filter(pmod(col("user_id"), lit(2)) === 1), "odd")
      a.join(b, col("et_even") === col("et_odd") && col("k_even") <=> col("k_odd"))
        .select(col("et_even").as("event_type"), col("k_even").as("k"),
          col("n_even"), col("n_odd"))
    }),

    // Ordered string aggregation: each user's event-type SEQUENCE as
    // one string (the session-sequence shape behavior-cloning corpora
    // are built from). sort_array on a (ts, event_id, type) struct
    // gives the deterministic order; map-side partial collect_list
    // keeps the shuffle at one row per user.
    "q75_string_agg" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        concat_ws(",", transform(
          sort_array(collect_list(struct(col("ts"), col("event_id"),
            col("event_type")))),
          e => e.getField("event_type"))).as("type_seq"))
    }),

    "q62_range_frame" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val ms = unix_millis(col("ts"))
      val w = Window.partitionBy("user_id").orderBy("ms")
        .rangeBetween(-3600000L, 0L)
      ev.withColumn("ms", ms)
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_trailing_1h"))
    }),

    // Exact interpolated quantiles per group (percentile == DuckDB
    // quantile_cont: same sort + linear interpolation).
    "q56_quantiles" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      o.groupBy("o_orderpriority")
        .agg(percentile(col("o_totalprice"), lit(0.5)).as("p50"),
          percentile(col("o_totalprice"), lit(0.9)).as("p90"))
        .select(col("o_orderpriority"),
          round(col("p50"), 4).as("p50"), round(col("p90"), 4).as("p90"))
    }),

    // ntile deciles over a total order — distribution analytics.
    "q57_ntile" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val w = Window.partitionBy("event_type").orderBy("value", "event_id")
      ev.select(col("event_id"), col("event_type"),
        ntile(10).over(w).as("decile"))
    }),

    // Deterministic moments at scale: mean/variance derived from
    // DECIMAL power sums (S1, S2) — exact, order-independent partial
    // aggregation, unlike streaming variance which re-associates.
    "q58_exact_moments" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val g = ev.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,10)")).cast("double").as("s1"),
        sum((col("value") * col("value")).cast("decimal(28,10)")).cast("double").as("s2"))
      g.select(col("event_type"), col("n"),
        round(col("s1") / col("n"), 6).as("mean"),
        round(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")), 6)
          .as("variance"))
    }),

    // Spark's NATIVE session_window aggregation, oracled against a
    // from-first-principles lag/cumsum sessionization in DuckDB — an
    // independent-implementations semantics check (like q49's ASOF).
    "q54_session_window" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          min(unix_millis(col("ts"))).as("start_ms"))
        .select("user_id", "start_ms", "n_events")
    }),

    // TPC-H Q3 shape: 3-way join, date split, top-10 by revenue with
    // a total tie-break. Ordering uses the ROUNDED revenue so both
    // engines rank identically; dims broadcast.
    "q50_shipping_priority" -> ((s, dir) => {
      val cutoff = lit("1998-01-01").cast("timestamp")
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
      val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
        .select(col("l_orderkey"), col("revenue"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("odate_ms"), col("o_orderpriority"))
    }),

    // TPC-H Q5 shape: 6-way join (local-supplier constraint), region +
    // date-range filter, revenue per nation.
    "q51_local_supplier" -> ((s, dir) => {
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1998-01-01").cast("timestamp")
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir)
      val sup = Tables.supplier(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      val li = Tables.lineitem(s, dir)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    }),

    // Range (interval) join via week-bucketing: campaigns cover
    // [start, start+7d); lineitems land in their ship-week bucket and
    // only meet campaigns overlapping that bucket — no interval cross
    // join, the standard scale pattern. Oracle joins with a plain
    // BETWEEN (same result, quadratic plan DuckDB can afford here).
    "q52_range_join" -> ((s, dir) => {
      val wk = 7L * 86400000L
      val camp = Tables.orders(s, dir)
        .filter(pmod(col("o_orderkey"), lit(997)) === 0)
        .select(col("o_orderkey").as("campaign_id"),
          col("o_orderdate").as("start_ts"),
          (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("end_ts"))
      val campB = camp.withColumn("bucket",
        explode(sequence(
          floor(unix_millis(col("start_ts").cast("timestamp")) / wk),
          floor((unix_millis(col("end_ts").cast("timestamp")) - 1) / wk))))
      val li = Tables.lineitem(s, dir)
        .withColumn("bucket", floor(unix_millis(col("l_shipdate").cast("timestamp")) / wk))
      li.join(broadcast(campB), Seq("bucket"))
        .filter(col("l_shipdate") >= col("start_ts") &&
          col("l_shipdate") < col("end_ts"))
        .groupBy("campaign_id")
        .agg(count(lit(1)).as("n_lines"),
          dsum(col("l_extendedprice")).as("revenue"))
    }),

    // P11: pandas null-KEEPING inequality — `NaN != x` is true in
    // pandas, null in SQL; the null-safe rewrite keeps null rows.
    "q17_nullsafe_neq" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val status = when(col("event_type") === "purchase", lit(null).cast("string"))
        .otherwise(col("event_type"))
      ev.select(col("event_id"), status.as("status"))
        .filter(col("status").isNull || col("status") =!= "error")
    }),

    // ORDERED EVENT FUNNEL view -> click -> purchase: each stage is
    // the min timestamp STRICTLY AFTER the previous stage's, so
    // out-of-order users drop out (the semantics product funnels
    // need, not mere per-type existence). Three aggregations and two
    // joins, every one partitioned on user_id — at 100 TB one
    // user_id shuffle feeds the whole cascade, and stage relations
    // only shrink. Dwell times ship as exact BIGINT epoch-ms sums
    // (double avgs would drift with partition order); the three
    // 1-row stage summaries meet in broadcast crossJoins.
    "q164_event_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_type"), unix_millis(col("ts")).as("ms"))
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ms").as("t1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, "user_id").filter(col("ms") > col("t1"))
        .groupBy("user_id").agg(min("t1").as("t1"), min("ms").as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, "user_id").filter(col("ms") > col("t2"))
        .groupBy("user_id").agg(min("t2").as("t2"), min("ms").as("t3"))
      val s1 = t1.agg(count(lit(1)).as("n_view"))
      val s2 = t2.agg(count(lit(1)).as("n_click_after"),
        sum(col("t2") - col("t1")).as("ms_view_to_click"))
      val s3 = t3.agg(count(lit(1)).as("n_purchase_after"),
        sum(col("t3") - col("t2")).as("ms_click_to_purchase"))
      s1.crossJoin(broadcast(s2)).crossJoin(broadcast(s3))
    })
  )

  def oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(CAST(l_quantity AS DECIMAL(18,4))),2)::DOUBLE AS sum_qty,
         round(sum(CAST(l_extendedprice AS DECIMAL(18,4))),2)::DOUBLE AS sum_base_price,
         round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))),2)::DOUBLE AS sum_disc_price,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q02_region_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
         round(sum(CAST(c_acctbal AS DECIMAL(18,4))),2)::DOUBLE AS sum_acctbal
         FROM customer JOIN nation ON c_nationkey=n_nationkey
         JOIN region ON n_regionkey=r_regionkey
         GROUP BY r_name, n_name""",
    "q03_segment_revenue" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
         round(sum(CAST(o_totalprice AS DECIMAL(18,4))),2)::DOUBLE AS revenue
         FROM orders JOIN customer ON o_custkey=c_custkey
         GROUP BY c_mktsegment""",
    "q04_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey=c.c_custkey AND o.o_totalprice > 400000)""",
    "q05_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey=c.c_custkey)""",
    "q06_window_share" ->
      """SELECT l_orderkey, l_linenumber,
         round(l_extendedprice / (sum(CAST(l_extendedprice AS DECIMAL(18,4)))
           OVER (PARTITION BY l_orderkey))::DOUBLE, 6) AS price_share
         FROM lineitem""",
    "q07_pair_id" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(FLOOR((row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1) / 2) + 1 AS INT) AS pair_id
         FROM lineitem""",
    "q08_ffill" ->
      """SELECT event_id, user_id,
         last_value(CASE WHEN event_type='click' THEN NULL ELSE value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
         FROM events""",
    "q09_rowmax" ->
      """SELECT l_orderkey, l_linenumber,
         greatest(l_discount, l_tax) AS best_rate,
         CASE WHEN l_tax >= l_discount THEN 'tax' ELSE 'discount' END AS best_side
         FROM lineitem""",
    "q10_group_argmax" ->
      """SELECT o_custkey, o_orderkey AS top_orderkey, o_totalprice AS top_price
         FROM orders
         QUALIFY row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) = 1""",
    "q11_status_audit" ->
      """SELECT o_custkey, count(DISTINCT o_orderstatus) AS n_status
         FROM orders GROUP BY o_custkey HAVING count(DISTINCT o_orderstatus) > 1""",
    "q12_cumcount" ->
      """SELECT event_id, user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS visit_no
         FROM events""",
    "q13_topk_per_group" ->
      """SELECT p_brand, rnk, p_partkey, p_retailprice FROM (
           SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey ASC) AS rnk
           FROM part) WHERE rnk <= 3""",
    "q14_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS value FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem""",
    "q15_explode_pair" ->
      """SELECT o_orderkey,
         CASE WHEN o_orderstatus='O' THEN 'ML' ELSE 'Spread' END AS bet_type,
         info
         FROM orders
         CROSS JOIN (VALUES ('Line'), ('Payout')) AS infos(info)
         WHERE NOT (o_orderstatus='O' AND info='Line')""",
    "q16_union_tagged" ->
      """SELECT c_name AS name, 'customer' AS kind FROM customer
         UNION ALL
         SELECT s_name AS name, 'supplier' AS kind FROM supplier""",
    "q46_sessionize" ->
      """WITH ms AS (
           SELECT user_id, event_id, ts, epoch_ms(ts) AS ms
           FROM events),
         flagged AS (
           SELECT *, CASE WHEN gap IS NULL OR gap > 1800000 THEN 1 ELSE 0 END AS is_new
           FROM (SELECT *, ms - lag(ms) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS gap FROM ms)),
         sess AS (
           SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM flagged)
         SELECT user_id, session_id::BIGINT AS session_id, count(*) AS n_events,
           min(ms) AS start_ms, max(ms) AS end_ms
         FROM sess GROUP BY user_id, session_id""",
    "q47_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         round(sum(CAST(o_totalprice AS DECIMAL(18,4))),2)::DOUBLE AS revenue,
         GROUPING(o_orderstatus, o_orderpriority) AS gid
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""",
    "q48_salted_agg" ->
      """SELECT user_id,
         round(sum(CAST(value AS DECIMAL(18,4))),2)::DOUBLE AS sum_value,
         count(*) AS n_rows
         FROM events GROUP BY user_id""",
    "q67_salted_join" ->
      """SELECT tier, event_type, count(*) AS n
         FROM events e
         JOIN (SELECT DISTINCT user_id,
                 CASE WHEN user_id % 3 = 0 THEN 'gold' ELSE 'standard' END AS tier
               FROM events) d USING (user_id)
         GROUP BY tier, event_type""",
    "q65_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         GROUPING(o_orderstatus, o_orderpriority) AS gid
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
    "q66_above_customer_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, cust_avg FROM (
           SELECT o_orderkey, o_custkey, o_totalprice,
             (sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w)::DOUBLE
                   / count(*) OVER w AS cust_avg
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey))
         WHERE o_totalprice > cust_avg""",
    "q64_json_extract" ->
      """SELECT event_type,
         sum(k)::BIGINT AS sum_k,
         count(CASE WHEN k > 50 THEN 1 END) AS n_high,
         count(CASE WHEN k IS NULL THEN 1 END) AS n_missing
         FROM (SELECT event_type,
                 TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k
               FROM events)
         GROUP BY event_type""",
    "q59_set_ops" ->
      """SELECT k, 'both' AS op FROM (
           SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
           INTERSECT
           SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
         UNION ALL
         SELECT k, 'building_only' FROM (
           SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
           EXCEPT
           SELECT o_custkey FROM orders WHERE o_totalprice > 400000)""",
    "q60_pivot" ->
      """SELECT o_orderpriority,
         count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
         count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
         count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
         FROM orders GROUP BY o_orderpriority""",
    "q61_edit_distance" ->
      """SELECT probe, p_brand, dist FROM (
           SELECT probe, p_brand, levenshtein(p_brand, probe) AS dist
           FROM (SELECT DISTINCT p_brand FROM part) p
           JOIN (VALUES ('Brand#11'), ('Brand#1'), ('Brnd#32')) AS t(probe)
             ON substr(p_brand, 1, 1) = substr(probe, 1, 1))
         WHERE dist <= 2""",
    "q77_time_parts" ->
      """SELECT event_id,
         year(ts)::INT AS y, month(ts)::INT AS m,
         (dayofweek(ts) + 1)::INT AS dow_sun1,
         weekofyear(ts)::INT AS iso_week, hour(ts)::INT AS h,
         date_trunc('week', ts)::DATE AS week_start
         FROM events""",
    "q76_nullsafe_join" ->
      """WITH sides AS (
           SELECT event_type, user_id % 2 AS par,
             TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k
           FROM events),
         a AS (SELECT event_type, k, count(*) AS n_even FROM sides
               WHERE par = 0 GROUP BY event_type, k),
         b AS (SELECT event_type, k, count(*) AS n_odd FROM sides
               WHERE par = 1 GROUP BY event_type, k)
         SELECT a.event_type, a.k, n_even, n_odd
         FROM a JOIN b ON a.event_type = b.event_type
           AND a.k IS NOT DISTINCT FROM b.k""",
    "q75_string_agg" ->
      """SELECT user_id, count(*) AS n_events,
         coalesce(string_agg(event_type, ',' ORDER BY ts, event_id), '') AS type_seq
         FROM events GROUP BY user_id""",
    "q74_lead_lag" ->
      """SELECT event_id, user_id,
         coalesce(lag(event_type, 1) OVER w, 'none') AS prev_type,
         coalesce(lead(event_type, 1) OVER w, 'none') AS next_type,
         epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER w AS ms_since_prev,
         round(percent_rank() OVER w, 6) AS pr,
         round(cume_dist() OVER w, 6) AS cd
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    "q62_range_frame" ->
      """SELECT event_id, user_id,
         count(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
           RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS n_trailing_1h
         FROM events""",
    "q56_quantiles" ->
      """SELECT o_orderpriority,
         round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
         round(quantile_cont(o_totalprice, 0.9), 4) AS p90
         FROM orders GROUP BY o_orderpriority""",
    "q57_ntile" ->
      """SELECT event_id, event_type,
         ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS decile
         FROM events""",
    "q58_exact_moments" ->
      """WITH g AS (
           SELECT event_type, count(*) AS n,
             sum(CAST(value AS DECIMAL(28,10)))::DOUBLE AS s1,
             sum(CAST(value * value AS DECIMAL(28,10)))::DOUBLE AS s2
           FROM events GROUP BY event_type)
         SELECT event_type, n,
           round(s1 / n, 6) AS mean,
           round(s2 / n - (s1 / n) * (s1 / n), 6) AS variance
         FROM g""",
    "q55_topk_aggregator" ->
      """SELECT p_brand, rnk, p_partkey, p_retailprice FROM (
           SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey ASC) AS rnk
           FROM part) WHERE rnk <= 3""",
    "q54_session_window" ->
      """WITH ms AS (
           SELECT user_id, event_id, ts, epoch_ms(ts) AS ms FROM events),
         flagged AS (
           SELECT *, CASE WHEN gap IS NULL OR gap >= 1800000 THEN 1 ELSE 0 END AS is_new
           FROM (SELECT *, ms - lag(ms) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS gap FROM ms)),
         sess AS (
           SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM flagged)
         SELECT user_id, min(ms) AS start_ms, count(*) AS n_events
         FROM sess GROUP BY user_id, session_id""",
    "q50_shipping_priority" ->
      """SELECT l_orderkey, revenue, epoch_ms(o_orderdate) AS odate_ms, o_orderpriority
         FROM (
           SELECT l_orderkey, o_orderdate, o_orderpriority,
             round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))),2)::DOUBLE AS revenue
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           WHERE c_mktsegment = 'BUILDING'
             AND o_orderdate < TIMESTAMP '1998-01-01'
             AND l_shipdate > TIMESTAMP '1998-01-01'
           GROUP BY l_orderkey, o_orderdate, o_orderpriority)
         ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""",
    "q51_local_supplier" ->
      """SELECT n_name,
         round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))),2)::DOUBLE AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY n_name""",
    "q52_range_join" ->
      """WITH camp AS (
           SELECT o_orderkey AS campaign_id, o_orderdate AS start_ts,
             o_orderdate + INTERVAL 7 DAY AS end_ts
           FROM orders WHERE o_orderkey % 997 = 0)
         SELECT campaign_id, count(*) AS n_lines,
           round(sum(CAST(l_extendedprice AS DECIMAL(18,4))),2)::DOUBLE AS revenue
         FROM camp JOIN lineitem
           ON l_shipdate >= start_ts AND l_shipdate < end_ts
         GROUP BY campaign_id""",
    "q49_asof_join" ->
      """WITH marks AS (
           SELECT user_id, ts AS mts, value AS mark_value FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id, ts
               ORDER BY event_id DESC) AS rn
             FROM events WHERE event_type = 'purchase') WHERE rn = 1),
         clicks AS (
           SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
         SELECT c.event_id, c.user_id, epoch_ms(c.ts) AS ts_ms, m.mark_value
         FROM clicks c ASOF LEFT JOIN marks m
           ON c.user_id = m.user_id AND c.ts >= m.mts""",
    "q17_nullsafe_neq" ->
      """SELECT event_id, status FROM (
           SELECT event_id,
             CASE WHEN event_type='purchase' THEN NULL ELSE event_type END AS status
           FROM events)
         WHERE status IS NULL OR status != 'error'""",

    "q164_event_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
             epoch_ms(ts)::BIGINT AS ms FROM events),
         t1 AS (SELECT user_id, min(ms) AS t1 FROM e
             WHERE event_type = 'view' GROUP BY 1),
         t2 AS (SELECT e.user_id, min(t1) AS t1, min(ms) AS t2
             FROM e JOIN t1 USING (user_id)
             WHERE event_type = 'click' AND ms > t1 GROUP BY 1),
         t3 AS (SELECT e.user_id, min(t2) AS t2, min(ms) AS t3
             FROM e JOIN t2 USING (user_id)
             WHERE event_type = 'purchase' AND ms > t2 GROUP BY 1),
         s1 AS (SELECT count(*)::BIGINT AS n_view FROM t1),
         s2 AS (SELECT count(*)::BIGINT AS n_click_after,
             sum(t2 - t1)::BIGINT AS ms_view_to_click FROM t2),
         s3 AS (SELECT count(*)::BIGINT AS n_purchase_after,
             sum(t3 - t2)::BIGINT AS ms_click_to_purchase FROM t3)
         SELECT * FROM s1 CROSS JOIN s2 CROSS JOIN s3"""
  )
}
