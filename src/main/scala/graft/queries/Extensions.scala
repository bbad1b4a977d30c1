package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryGroup, Tables}
import graft.functions.Text
import graft.operators.{AsOfJoin, Chunking}

/** Round-3 extension queries: corpus chunking/truncation for
  * training/RAG pipelines, vocabulary construction, an n-gram LM
  * statistic, and the relational long tail (interval-union islands,
  * two-pass histogram, forward as-of with tolerance, explicit
  * GROUPING SETS, approx-distinct audit). Same contract as every
  * other group: the DuckDB oracle lives beside each Spark plan and
  * both follow the shared determinism rules (exact integer
  * arithmetic, total ORDER BYs, identical aliases, ::BIGINT casts
  * where DuckDB would widen to HUGEINT).
  */
object Extensions extends QueryGroup {

  private val dToks = "regexp_extract_all(text, '([a-z0-9]+)', 1)"
  private val dTok = s"tok AS (SELECT doc_id, $dToks AS toks FROM documents)"

  /** Decimal-exact double sum (shared determinism rule). */
  private def dsum(c: org.apache.spark.sql.Column) =
    round(sum(c.cast("decimal(18,4)")), 2).cast("double")

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // RAG/context chunking: sliding 32-token windows, 8-token
    // overlap. Narrow generator — no shuffle at any scale.
    "q83_doc_chunking" -> ((s, dir) => {
      Chunking.chunk(Tables.documents(s, dir), "doc_id", "text",
        chunkSize = 32, overlap = 8)
    }),

    // Vocabulary build: top-500 terms by document frequency
    // (df desc, tf desc, term — a total order). TakeOrderedAndProject:
    // only 500 rows per partition survive the final exchange, the
    // scale-correct top-k (NOT a global sort).
    "q84_vocabulary" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      d.select(col("doc_id"), explode(Text.tokens(col("text"))).as("term"))
        .groupBy("term")
        .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
        .orderBy(col("df").desc, col("tf").desc, col("term"))
        .limit(500)
    }),

    // REAL subword tokenization (greedy longest-match over the q84
    // vocabulary build at K=16): every (doc, word position) in LONG
    // form with its 0-based subword position and token id — positive
    // ids are vocabulary ranks, negative ids are character-fallback
    // codepoints. Every emitted token is hash-checked against the
    // recursive-CTE oracle, so the greedy semantics (longest match
    // wins, mid-word vocabulary hits, fallback advance-by-one) are
    // machine-verified, not asserted.
    "q197_subword_encode" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val vocab = graft.operators.Subword.vocabulary(
        d, "doc_id", "text", SubwordSql.K)
      graft.operators.Subword.encodeCorpus(d, "doc_id", "text", vocab)
        .select(col("id").as("doc_id"), col("wpos"), col("spos"),
          col("subword_id"))
    }),

    // Interval-union "islands": per supplier, merge overlapping
    // [shipdate, shipdate + 1..7 days] intervals and report island
    // count + total covered days. The classic gaps-and-islands shape:
    // one shuffle on the partition key, running-max window, NO range
    // self-join (the quadratic formulation).
    "q85_interval_islands" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val iv = li.select(col("l_suppkey").as("suppkey"),
        to_date(col("l_shipdate")).as("start_d"),
        date_add(to_date(col("l_shipdate")),
          pmod(floor(col("l_quantity")).cast("int"), lit(7)) + 1).as("end_d"),
        col("l_orderkey"), col("l_linenumber"))
      val ord = Seq(col("start_d"), col("end_d"), col("l_orderkey"), col("l_linenumber"))
      val wPrev = Window.partitionBy("suppkey").orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, -1)
      val wRun = Window.partitionBy("suppkey").orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      iv.withColumn("prev_max_end", max(col("end_d")).over(wPrev))
        .withColumn("new_island",
          when(col("prev_max_end").isNull || col("start_d") > col("prev_max_end"), 1)
            .otherwise(0))
        .withColumn("island_id", sum(col("new_island")).over(wRun))
        .groupBy(col("suppkey"), col("island_id"))
        .agg(min(col("start_d")).as("i_start"), max(col("end_d")).as("i_end"),
          count(lit(1)).as("n_iv"))
        .groupBy("suppkey")
        .agg(count(lit(1)).as("n_islands"),
          sum(datediff(col("i_end"), col("i_start")) + 1).as("covered_days"),
          sum(col("n_iv")).as("n_intervals"))
    }),

    // Two-pass histogram: global min/max (one tiny broadcast), then
    // 20 equal-width buckets. Bucket edges are raw doubles — both
    // engines compute mn + b*((mx-mn)/20) with the same IEEE ops, so
    // no rounding is needed (or wanted; see README midpoint note).
    "q86_histogram" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val mm = o.agg(min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
      o.crossJoin(broadcast(mm))
        .withColumn("w", (col("mx") - col("mn")) / 20.0)
        .withColumn("bucket",
          when(col("w") === 0.0, lit(0.0))
            .otherwise(least(floor((col("o_totalprice") - col("mn")) / col("w")), lit(19.0)))
            .cast("int"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"),
          min(col("mn") + col("bucket") * col("w")).as("lo"),
          min(col("mn") + (col("bucket") + 1) * col("w")).as("hi"))
    }),

    // Forward as-of with tolerance: each click joins the EARLIEST
    // purchase at-or-after it per user, but only within 3 days —
    // union+window (one shuffle), vs DuckDB's native forward
    // ASOF JOIN, an independently-implemented semantics oracle.
    "q87_asof_forward" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val mw = Window.partitionBy("user_id", "ts").orderBy(col("event_id").desc)
      val marks = ev.filter(col("event_type") === "purchase")
        .withColumn("rn", row_number().over(mw)).filter(col("rn") === 1)
        .select(col("user_id"), col("ts").as("mts"), col("value").as("mark_value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      AsOfJoin.forward(clicks, marks, Seq("user_id"), "ts", "mts",
          Seq("mts", "mark_value"), tolerance = Some(expr("INTERVAL 3 DAYS")))
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"),
          unix_millis(col("mts")).as("mts_ms"), col("mark_value"))
    }),

    // Explicit GROUPING SETS (beyond q47 rollup / q65 cube): the
    // analyst-chosen subset with grouping_id disambiguation.
    "q88_grouping_sets" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      o.groupingSets(
          Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
            Seq(col("o_orderpriority")), Seq.empty),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"),
          grouping_id().as("gid"))
    }),

    // Token-budget truncation: greedy whole-WORD prefix under a
    // 64-SUBWORD budget (the context-window guillotine, counted in
    // REAL tokens — the q197 greedy encoder — because a context
    // window holds subwords, not whitespace words; VERDICT r5 #7).
    // Per-doc window cumsum over the per-distinct-word counts; the
    // char-budget variant remains as Chunking.truncateToCharBudget
    // (spec-covered).
    "q89_token_budget" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val vocab = graft.operators.Subword.vocabulary(
        d, "doc_id", "text", SubwordSql.K)
      val toks = d.select(col("doc_id"), col("text"))
        .transform(graft.operators.Spread.byKey("doc_id"))
        .select(col("doc_id"), posexplode(Text.tokens(col("text"))))
        .select(col("doc_id"), col("pos").as("wpos"), col("col").as("word"))
      val words = graft.operators.Dedup.DefaultMaterialize(
        toks.select("word").distinct())
      val wc = graft.operators.Subword.wordCounts(words, vocab)
      val wcum = Window.partitionBy("doc_id").orderBy("wpos")
      val agg = toks.join(wc, Seq("word"))
        .withColumn("cum", sum(col("n_subwords")).over(wcum))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("w"),
          max(col("cum")).as("sw"),
          count(when(col("cum") <= 64, 1)).as("k"),
          coalesce(max(when(col("cum") <= 64, col("cum"))), lit(0L)).as("ks"),
          array_join(transform(
            array_sort(collect_list(when(col("cum") <= 64,
              struct(col("wpos"), col("word"))))),
            x => x.getField("word")), " ").as("tt"))
      d.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("w"), lit(0L)).as("n_words"),
          coalesce(col("sw"), lit(0L)).as("n_subwords"),
          coalesce(col("k"), lit(0L)).as("n_kept"),
          coalesce(col("ks"), lit(0L)).as("kept_subwords"),
          (coalesce(col("k"), lit(0L)) < coalesce(col("w"), lit(0L))).as("truncated"),
          coalesce(col("tt"), lit("")).as("text_trunc"))
    }),

    // Bigram LM statistics: the most likely next token per token,
    // with conditional probability — two partial-agg shuffles plus a
    // per-w1 window, no driver-side state.
    "q90_bigram_lm" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      // tokens behind a projection boundary (multi-referenced alias)
      // so the tokenizer regex runs once per doc, not per element_at
      // inside the bigram lambda; Spread.byKey spreads the CPU-heavy
      // projection across cores regardless of input split count.
      val sp = d
        .select(col("doc_id"), col("text"))
        .transform(graft.operators.Spread.byKey("doc_id"))
        .select(Text.tokens(col("text")).as("toks"))
        .select(explode(Text.shinglesWithDuplicates(col("toks"), 2)).as("gram"))
        .select(substring_index(col("gram"), " ", 1).as("w1"),
          substring_index(col("gram"), " ", -1).as("w2"))
      val counts = sp.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      val wTot = Window.partitionBy("w1")
      val wRank = Window.partitionBy("w1").orderBy(col("cnt").desc, col("w2"))
      counts
        .withColumn("total", sum(col("cnt")).over(wTot))
        .withColumn("rn", row_number().over(wRank))
        .filter(col("rn") === 1 && col("total") >= 20)
        .select(col("w1"), col("w2").as("next_tok"), col("cnt"), col("total"),
          round(col("cnt").cast("double") / col("total"), 6).as("p"))
    }),

    // Data MIXING: deterministic per-source downsampling to target
    // mixture weights (the corpus-reweighting step before training).
    // Hash-bucketed like q63/q68 — rand()-free, so the sample is
    // reproducible on any cluster at any parallelism, and a narrow
    // map (no shuffle) at any scale.
    "q92_mixture_sample" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val wgt = when(col("source") === "src0", 1.0)
        .when(col("source") === "src1", 0.5)
        .when(col("source") === "src2", 0.25)
        .otherwise(0.1)
      d.withColumn("bucket",
          pmod(Text.md5Long(concat_ws(":", col("source"), col("doc_id")), 12),
            lit(10000L)))
        .filter(col("bucket") < wgt * 10000)
        .select("doc_id", "source", "bucket")
    }),

    // Cross-corpus decontamination: web-side docs sharing their
    // winnowing-style minimal 8-token-window fingerprint with the
    // curated corpus (src0-4) — robust to prefix/suffix edits where
    // an exact content hash is not. Shuffle hash-join on the
    // fingerprint — at 100 TB both sides partition on it, nothing
    // broadcasts, no row compares beyond its hash bucket.
    "q93_cross_corpus_dedup" -> ((s, dir) => {
      val curated = Seq("src0", "src1", "src2", "src3", "src4")
      // Staged projections (tokens -> grams -> fingerprint): inlining
      // tokens() into the shingle lambda re-runs the tokenizer regex
      // per element_at (the 17x trap; see Dedup.shingleSets), and the
      // two consumers + the join's inferred isNotNull would clone the
      // whole fingerprint chain — materialize once instead.
      val h = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("text"))
        .transform(graft.operators.Spread.byKey("doc_id"))
        .select(col("doc_id"), col("source"), Text.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("source"),
          Text.windowFingerprint(col("toks"), 8).as("wfp"))
        .localCheckpoint(false)
        .filter(col("wfp").isNotNull)
      val a = h.filter(col("source").isin(curated: _*))
        .groupBy("wfp").agg(min(col("doc_id")).as("matched_a_id"))
      h.filter(!col("source").isin(curated: _*))
        .join(a, "wfp")
        .select(col("doc_id"), col("source"), col("matched_a_id"))
    }),

    // One k-means Lloyd iteration: cosine assignment to 8 seed
    // centroids (vec_id < 8) + integer-micro-exact centroid recompute —
    // the embedding-clustering step (semantic dedup, corpus
    // bucketing) as a two-shuffle relational plan.
    "q94_kmeans_iter" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      graft.operators.Similarity.kmeansIteration(
        e, e.filter(col("vec_id") < 8), "vec_id", "embedding")
    }),

    // Per-GROUP exact quantiles: Spark percentile() and DuckDB
    // quantile_cont are both the R-7 estimator (pos = q*(n-1),
    // lower + frac*(upper-lower)) — raw doubles, no rounding (the
    // interpolation arithmetic is IEEE-identical).
    "q95_group_quantiles" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          percentile(col("l_extendedprice"), lit(0.5)).as("p50"),
          percentile(col("l_extendedprice"), lit(0.9)).as("p90"))
    }),

    // Three-stage FUNNEL: first view -> first click at-or-after it ->
    // first purchase at-or-after that, per user. Each stage is a
    // partial-agg min + a key join — no window over the whole event
    // stream, no per-user event arrays; state per stage is one row
    // per surviving user.
    "q96_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("v_ts"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") >= col("v_ts"))
        .groupBy("user_id", "v_ts").agg(min(col("ts")).as("c_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") >= col("c_ts"))
        .groupBy("user_id", "v_ts", "c_ts").agg(min(col("ts")).as("p_ts"))
      p.select(col("user_id"), unix_millis(col("v_ts")).as("v_ms"),
        unix_millis(col("c_ts")).as("c_ms"), unix_millis(col("p_ts")).as("p_ms"))
    }),

    // Bivariate moments: per-group Pearson correlation from
    // decimal-EXACT power sums (q58's univariate moments extended).
    // Built-in corr() uses a streaming co-moment update whose float
    // order differs per engine/partitioning; the closed-form over
    // exact sums is deterministic everywhere — and it's one partial
    // aggregation, no second pass.
    "q97_correlation" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val x = col("l_quantity"); val y = col("l_extendedprice")
      val agg = li.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        sum(x.cast("decimal(28,8)")).as("sx"),
        sum(y.cast("decimal(28,8)")).as("sy"),
        sum((x * y).cast("decimal(28,8)")).as("sxy"),
        sum((x * x).cast("decimal(28,8)")).as("sx2"),
        sum((y * y).cast("decimal(28,8)")).as("sy2"))
      val nD = col("n").cast("double")
      val (sx, sy, sxy, sx2, sy2) = (col("sx").cast("double"),
        col("sy").cast("double"), col("sxy").cast("double"),
        col("sx2").cast("double"), col("sy2").cast("double"))
      // 6-dp rounding: the big decimal sums convert to double with
      // one-ulp differences between engines (Spark rounds the decimal
      // directly; DuckDB divides the int128 by 10^scale) — the 1e-16
      // drift is far below the 1e-6 grain.
      agg.select(col("l_returnflag"), col("n"),
        round((nD * sxy - sx * sy) /
          sqrt((nD * sx2 - sx * sx) * (nD * sy2 - sy * sy)), 6).as("corr_qty_price"))
    }),

    // Per-group LINEAR REGRESSION (price on quantity) from the same
    // decimal-exact power sums as q97 — slope AND intercept in closed
    // form over the sums (intercept from sums directly, NOT from the
    // rounded slope, so each output rounds exactly once). One partial
    // aggregation; built-in regr_slope's streaming update would not
    // be cross-engine deterministic.
    "q131_group_regression" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val x = col("l_quantity"); val y = col("l_extendedprice")
      val agg = li.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        sum(x.cast("decimal(28,8)")).as("sx"),
        sum(y.cast("decimal(28,8)")).as("sy"),
        sum((x * y).cast("decimal(28,8)")).as("sxy"),
        sum((x * x).cast("decimal(28,8)")).as("sx2"))
      val nD = col("n").cast("double")
      val (sx, sy, sxy, sx2) = (col("sx").cast("double"),
        col("sy").cast("double"), col("sxy").cast("double"),
        col("sx2").cast("double"))
      val det = nD * sx2 - sx * sx
      agg.select(col("l_returnflag"), col("n"),
        round((nD * sxy - sx * sy) / det, 6).as("slope"),
        round((sy * sx2 - sx * sxy) / det, 6).as("intercept"))
    }),

    // Time-series RESAMPLING to daily OHLC bars: open/close are
    // struct-min/max over (ts, event_id, value) — one partial-agg
    // shuffle, no window over the raw stream, no sort; the total
    // (ts, event_id) order makes first/last deterministic.
    "q98_daily_bars" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.withColumn("day", to_date(col("ts")))
        .groupBy("user_id", "day")
        .agg(count(lit(1)).as("n"),
          min(struct(col("ts"), col("event_id"), col("value"))).as("o"),
          max(struct(col("ts"), col("event_id"), col("value"))).as("c"),
          max(col("value")).as("high"), min(col("value")).as("low"))
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n"), col("o.value").as("open"), col("high"), col("low"),
          col("c.value").as("close"))
    }),

    // Model-based quality score (the perplexity-filter shape): each
    // doc's mean corpus-bigram probability. The LM is built from the
    // same gram relation it scores (materialized once — at 100 TB
    // the LM table would be persisted and reused across corpora);
    // 6-dp probs summed through DECIMAL so the per-doc mean is
    // aggregation-order-free in both engines.
    "q99_lm_quality" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val grams = d.select(col("doc_id"), col("text"))
        .transform(graft.operators.Spread.byKey("doc_id"))
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          explode(Text.shinglesWithDuplicates(col("toks"), 2)).as("gram"))
        .select(col("doc_id"), substring_index(col("gram"), " ", 1).as("w1"),
          substring_index(col("gram"), " ", -1).as("w2"))
        .localCheckpoint(false)
      val lm = grams.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
        .withColumn("total", sum(col("cnt")).over(Window.partitionBy("w1")))
        .select(col("w1"), col("w2"),
          round(col("cnt").cast("double") / col("total"), 6).as("p"))
      // sum_p_micro: the 6-dp probs summed as exact integers (x 1e6).
      // A final round(sum/n, 6) would land on rounding midpoints
      // (observed at sf0.01) where the engines' half-up disagree —
      // the mean stays a consumer-side division of two exact ints.
      grams.join(lm, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          (sum(col("p").cast("decimal(18,6)")) * 1000000)
            .cast("long").as("sum_p_micro"))
    }),

    // Approx-distinct audit: HLL++ sketch next to the exact count.
    // The raw sketch value can't cross-engine hash-match, so the
    // OUTPUT is the exact count plus a within-5% flag: the oracle
    // asserts TRUE, so a sketch that drifts past the bound breaks the
    // hash gate — a full correctness check, not rows-only. rsd=0.02
    // (not the 0.05 default): rsd is ONE standard deviation, and the
    // default breached 5% at sf0.1 (6.7% observed); at 0.02 the
    // observed error is <=0.5% at both test scales — the flag holds
    // with margin, and the tighter sketch is what corpus accounting
    // runs in production anyway. Deterministic for fixed input.
    "q91_approx_distinct" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")).cast("double")
            / col("exact_users") <= 0.05).as("within_tol"))
    })
  )

  override val oracles: Map[String, String] = Map(

    "q83_doc_chunking" ->
      s"""WITH $dTok,
         st AS (SELECT doc_id, toks,
                  unnest(generate_series(0, greatest(len(toks) - 9, 0), 24)) AS start
                FROM tok WHERE len(toks) > 0)
         SELECT doc_id, CAST(start // 24 AS INT) AS chunk_no,
           len(list_slice(toks, start + 1, start + 32)) AS n_chunk_tokens,
           array_to_string(list_slice(toks, start + 1, start + 32), ' ') AS chunk_text
         FROM st""",

    "q84_vocabulary" ->
      s"""WITH $dTok,
         ex AS (SELECT doc_id, unnest(toks) AS term FROM tok)
         SELECT term, count(DISTINCT doc_id) AS df, count(*) AS tf
         FROM ex GROUP BY term
         ORDER BY df DESC, tf DESC, term LIMIT 500""",

    "q85_interval_islands" ->
      """WITH iv AS (
           SELECT l_suppkey AS suppkey,
             CAST(l_shipdate AS DATE) AS start_d,
             CAST(l_shipdate AS DATE)
               + ((CAST(floor(l_quantity) AS INT) % 7) + 1) AS end_d,
             l_orderkey, l_linenumber
           FROM lineitem),
         flagged AS (
           SELECT suppkey, start_d, end_d, l_orderkey, l_linenumber,
             CASE WHEN max(end_d) OVER w1 IS NULL
                    OR start_d > max(end_d) OVER w1 THEN 1 ELSE 0 END AS new_island
           FROM iv
           WINDOW w1 AS (PARTITION BY suppkey
             ORDER BY start_d, end_d, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         numbered AS (
           SELECT suppkey, start_d, end_d,
             sum(new_island) OVER (PARTITION BY suppkey
               ORDER BY start_d, end_d, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
           FROM flagged),
         islands AS (
           SELECT suppkey, island_id, min(start_d) AS i_start,
             max(end_d) AS i_end, count(*) AS n_iv
           FROM numbered GROUP BY suppkey, island_id)
         SELECT suppkey, count(*) AS n_islands,
           CAST(sum(date_diff('day', i_start, i_end) + 1) AS BIGINT) AS covered_days,
           CAST(sum(n_iv) AS BIGINT) AS n_intervals
         FROM islands GROUP BY suppkey""",

    "q86_histogram" ->
      """WITH mm AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders),
         b AS (SELECT o_totalprice, mn, mx, (mx - mn)/20 AS w,
                 CAST(CASE WHEN (mx - mn)/20 = 0 THEN 0
                      ELSE least(floor((o_totalprice - mn)/((mx - mn)/20)), 19)
                      END AS INT) AS bucket
               FROM orders, mm)
         SELECT bucket, count(*) AS cnt,
           min(mn + bucket * w) AS lo,
           min(mn + (bucket + 1) * w) AS hi
         FROM b GROUP BY bucket""",

    "q87_asof_forward" ->
      """WITH marks0 AS (
           SELECT user_id, ts AS mts, value AS mark_value,
             row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
           FROM events WHERE event_type = 'purchase'),
         m AS (SELECT user_id, mts, mark_value FROM marks0 WHERE rn = 1),
         c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
         j AS (SELECT c.event_id, c.user_id, c.ts, m.mts, m.mark_value
               FROM c ASOF LEFT JOIN m
                 ON c.user_id = m.user_id AND c.ts <= m.mts)
         SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
           CASE WHEN mts <= ts + INTERVAL 3 DAY THEN epoch_ms(mts) END AS mts_ms,
           CASE WHEN mts <= ts + INTERVAL 3 DAY THEN mark_value END AS mark_value
         FROM j""",

    "q88_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
         round(sum(CAST(o_totalprice AS DECIMAL(18,4))),2)::DOUBLE AS revenue,
         GROUPING(o_orderpriority, o_orderstatus) AS gid
         FROM orders
         GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                 (o_orderpriority), ())""",

    "q197_subword_encode" ->
      s"""WITH RECURSIVE ${SubwordSql.ctes()},
         $dTok,
         docw AS (SELECT doc_id, CAST(u.i - 1 AS INT) AS wpos, u.t AS word
           FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)),
                   i -> {'i': i, 't': toks[i]})) AS u
                 FROM tok))
         SELECT d.doc_id, d.wpos, t.spos, t.subword_id
         FROM docw d JOIN swtokens t ON t.word = d.word""",

    "q89_token_budget" ->
      s"""WITH RECURSIVE ${SubwordSql.ctes()},
         $dTok,
         docw AS (SELECT doc_id, u.i AS i, u.t AS word
           FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)),
                   i -> {'i': i, 't': toks[i]})) AS u
                 FROM tok)),
         per AS (SELECT d.doc_id, d.i, d.word,
             sum(c.n_subwords) OVER (PARTITION BY d.doc_id ORDER BY d.i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM docw d JOIN swcounts c ON c.word = d.word),
         agg AS (SELECT doc_id, count(*)::BIGINT AS w, max(cum)::BIGINT AS sw,
             sum(CASE WHEN cum <= 64 THEN 1 ELSE 0 END)::BIGINT AS k,
             coalesce(max(CASE WHEN cum <= 64 THEN cum END), 0)::BIGINT AS ks,
             array_to_string(list(word ORDER BY i) FILTER (WHERE cum <= 64), ' ') AS tt
           FROM per GROUP BY 1)
         SELECT d.doc_id,
           coalesce(a.w, 0) AS n_words,
           coalesce(a.sw, 0) AS n_subwords,
           coalesce(a.k, 0) AS n_kept,
           coalesce(a.ks, 0) AS kept_subwords,
           coalesce(a.k, 0) < coalesce(a.w, 0) AS truncated,
           coalesce(a.tt, '') AS text_trunc
         FROM documents d LEFT JOIN agg a USING (doc_id)""",

    "q99_lm_quality" ->
      s"""WITH $dTok,
         g AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
                 THEN list_transform(generate_series(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1])
                 ELSE []::VARCHAR[] END) AS gram
               FROM tok),
         sp AS (SELECT doc_id, split_part(gram, ' ', 1) AS w1,
                       split_part(gram, ' ', 2) AS w2 FROM g),
         lm AS (SELECT w1, w2,
                  round(cnt::DOUBLE / sum(cnt) OVER (PARTITION BY w1), 6) AS p
                FROM (SELECT w1, w2, count(*) AS cnt FROM sp GROUP BY w1, w2))
         SELECT doc_id, count(*) AS n_bigrams,
           CAST(sum(CAST(p AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS sum_p_micro
         FROM sp JOIN lm USING (w1, w2)
         GROUP BY doc_id""",

    "q98_daily_bars" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id, value
                    FROM events),
         o AS (SELECT user_id, day, value,
                 row_number() OVER (PARTITION BY user_id, day
                   ORDER BY ts, event_id) AS rn_a,
                 row_number() OVER (PARTITION BY user_id, day
                   ORDER BY ts DESC, event_id DESC) AS rn_d
               FROM e),
         agg AS (SELECT user_id, day, count(*) AS n, min(value) AS low,
                   max(value) AS high
                 FROM e GROUP BY user_id, day)
         SELECT a.user_id, strftime(a.day, '%Y-%m-%d') AS day, a.n,
           oo.value AS open, a.high, a.low, cc.value AS close
         FROM agg a
         JOIN o oo ON oo.user_id = a.user_id AND oo.day = a.day AND oo.rn_a = 1
         JOIN o cc ON cc.user_id = a.user_id AND cc.day = a.day AND cc.rn_d = 1""",

    "q97_correlation" ->
      """WITH a AS (
           SELECT l_returnflag, count(*) AS n,
             sum(CAST(l_quantity AS DECIMAL(28,8))) AS sx,
             sum(CAST(l_extendedprice AS DECIMAL(28,8))) AS sy,
             sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,8))) AS sxy,
             sum(CAST(l_quantity * l_quantity AS DECIMAL(28,8))) AS sx2,
             sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,8))) AS sy2
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n,
           round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / sqrt((n::DOUBLE * sx2::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                  * (n::DOUBLE * sy2::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 6)
             AS corr_qty_price
         FROM a""",

    "q95_group_quantiles" ->
      """SELECT l_returnflag, count(*) AS n,
         quantile_cont(l_extendedprice, 0.5) AS p50,
         quantile_cont(l_extendedprice, 0.9) AS p90
         FROM lineitem GROUP BY l_returnflag""",

    "q96_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, v.v_ts, min(e.ts) AS c_ts
               FROM events e JOIN v ON e.user_id = v.user_id
               WHERE e.event_type = 'click' AND e.ts >= v.v_ts
               GROUP BY e.user_id, v.v_ts),
         p AS (SELECT e.user_id, c.v_ts, c.c_ts, min(e.ts) AS p_ts
               FROM events e JOIN c ON e.user_id = c.user_id
               WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
               GROUP BY e.user_id, c.v_ts, c.c_ts)
         SELECT user_id, epoch_ms(v_ts) AS v_ms, epoch_ms(c_ts) AS c_ms,
           epoch_ms(p_ts) AS p_ms
         FROM p""",

    "q94_kmeans_iter" -> {
      // double-accumulation left-to-right fold == FloatDotProduct
      def dDot(a: String, b: String) =
        s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(" +
          s"generate_series(1, len($a)), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), " +
          "(acc, x) -> acc + x)"
      s"""WITH s AS (SELECT vec_id AS seed_id, embedding AS sv,
             ${dDot("embedding", "embedding")} AS sn
           FROM embeddings WHERE vec_id < 8),
         c AS (SELECT vec_id, embedding AS cv,
             ${dDot("embedding", "embedding")} AS cn
           FROM embeddings),
         scored AS (SELECT vec_id, seed_id, cv,
             round(${dDot("sv", "cv")} / sqrt(sn * cn), 6) AS score
           FROM c, s),
         best AS (SELECT vec_id, seed_id AS cluster_id, cv,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY score DESC, seed_id ASC) AS rn
           FROM scored WHERE score IS NOT NULL AND NOT isnan(score)),
         a AS (SELECT cluster_id, cv FROM best WHERE rn = 1),
         -- exact integer micro-unit mean (kmeansIteration's scheme:
         -- REAL->DECIMAL casts diverge between engines; floor of the
         -- double value + bigint division do not)
         sums AS (SELECT cluster_id, dim_no, count(*) AS n,
             sum(floor(v::DOUBLE * 10000000000 + 0.5))::BIGINT AS s,
             count(*) * 10000 AS d
           FROM (SELECT cluster_id,
                   unnest(generate_series(0, len(cv) - 1)) AS dim_no,
                   unnest(cv) AS v
                 FROM a)
           GROUP BY cluster_id, dim_no)
         SELECT cluster_id, CAST(dim_no AS INT) AS dim_no, n,
           (CASE WHEN s >= 0 THEN (2 * s + d) // (2 * d)
                 ELSE -((2 * -s + d) // (2 * d)) END) / 1000000.0 AS centroid
         FROM sums""" },

    "q92_mixture_sample" ->
      """SELECT doc_id, source,
         ('0x' || substr(md5(source || ':' || doc_id), 1, 12))::BIGINT % 10000 AS bucket
         FROM documents
         WHERE ('0x' || substr(md5(source || ':' || doc_id), 1, 12))::BIGINT % 10000
           < (CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
              WHEN 'src2' THEN 0.25 ELSE 0.1 END) * 10000""",

    "q93_cross_corpus_dedup" -> {
      val gram8 = (0 until 8).map(o => s"toks[i+$o]").mkString(" || ' ' || ")
      s"""WITH tok AS (SELECT doc_id, source, $dToks AS toks FROM documents),
         fp AS (SELECT doc_id, source,
                  list_min(list_transform(
                    list_distinct(list_transform(generate_series(1, len(toks) - 7),
                      i -> $gram8)),
                    g -> ('0x' || substr(md5(g), 1, 12))::BIGINT)) AS wfp
                FROM tok WHERE len(toks) >= 8),
         a AS (SELECT wfp, min(doc_id) AS matched_a_id FROM fp
               WHERE source IN ('src0','src1','src2','src3','src4')
               GROUP BY wfp)
         SELECT doc_id, source, matched_a_id
         FROM fp JOIN a USING (wfp)
         WHERE source NOT IN ('src0','src1','src2','src3','src4')""" },

    "q90_bigram_lm" ->
      s"""WITH $dTok,
         g AS (SELECT unnest(CASE WHEN len(toks) >= 2
                 THEN list_transform(generate_series(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1])
                 ELSE []::VARCHAR[] END) AS gram
               FROM tok),
         sp AS (SELECT split_part(gram, ' ', 1) AS w1,
                       split_part(gram, ' ', 2) AS w2 FROM g),
         c AS (SELECT w1, w2, count(*) AS cnt FROM sp GROUP BY w1, w2),
         r AS (SELECT w1, w2, cnt,
                 CAST(sum(cnt) OVER (PARTITION BY w1) AS BIGINT) AS total,
                 row_number() OVER (PARTITION BY w1 ORDER BY cnt DESC, w2) AS rn
               FROM c)
         SELECT w1, w2 AS next_tok, cnt, total,
           round(cnt::DOUBLE / total, 6) AS p
         FROM r WHERE rn = 1 AND total >= 20""",

    "q131_group_regression" ->
      """WITH a AS (
           SELECT l_returnflag, count(*) AS n,
             sum(CAST(l_quantity AS DECIMAL(28,8))) AS sx,
             sum(CAST(l_extendedprice AS DECIMAL(28,8))) AS sy,
             sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,8))) AS sxy,
             sum(CAST(l_quantity * l_quantity AS DECIMAL(28,8))) AS sx2
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n,
           round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / (n::DOUBLE * sx2::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6) AS slope,
           round((sy::DOUBLE * sx2::DOUBLE - sx::DOUBLE * sxy::DOUBLE)
             / (n::DOUBLE * sx2::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6) AS intercept
         FROM a""",

    // The oracle asserts within_tol = TRUE: the spark side computes it
    // from the live HLL++ sketch, so sketch drift fails the hash gate.
    "q91_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
         TRUE AS within_tol
         FROM events GROUP BY event_type"""
  )
}
