package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.fromEnv()
    // Warm up the JVM/codegen/parquet-footer paths once so the first
    // measured query doesn't carry ~3-5s of one-time cost.
    spark.range(1000000).selectExpr("sum(id)").collect()
    // Per-table try: a missing table must only affect the queries
    // that use it (reported as -1 below), not abort the whole bench.
    Tables.names.foreach(t =>
      try Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () })

    // A failed query records the -1 sentinel, NOT its elapsed time —
    // a missing table must not masquerade as a 20 ms "success".
    def pass(): Map[String, Double] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case _: Throwable => false }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }.toMap

    // Two full passes: the first carries per-query JIT/codegen-cache
    // warmup (a local-mode artifact — a long-running cluster JVM is
    // always warm); the second measures the steady-state plans.
    // Headline per-query time = MIN of the two measurements — the
    // standard noise-floor estimator: GC/scheduler jitter only ever
    // ADDS time (observed ±4x on single queries across runs), so the
    // min of two runs is the best available estimate of the plan's
    // true cost. cold_total (first pass as-is) is kept alongside.
    val cold = pass()
    // release unreachable localCheckpoint/cache blocks from pass 1
    // (ContextCleaner is async; the hint keeps pass 2 comparable)
    System.gc(); Thread.sleep(500)
    val pass2 = pass()
    // Headline per-query time = MIN of the two passes, labeled
    // "min2" so cross-round consumers never mistake it for a single
    // measured pass; the true second-pass total rides alongside as
    // warm_total (ADVICE r3: value/pass semantics must be explicit).
    val best = pass2.map { case (k, v) =>
      val c = cold.getOrElse(k, -1.0)
      // a failed pass (-1) never masks the other pass's success
      k -> (if (v < 0) c else if (c < 0) v else math.min(c, v))
    }
    // Locale.ROOT: default-locale formatting renders "1,234" under
    // comma-decimal locales and corrupts the JSON.
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // JSON string escape for the sf path (quotes/backslashes/control chars)
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // totals sum only the successful queries (failures are -1)
    val total = best.values.filter(_ >= 0).sum
    val coldTotal = cold.values.filter(_ >= 0).sum
    val warmTotal = pass2.values.filter(_ >= 0).sum
    // "value" has meant min-of-two since r4; min2_total spells the
    // same number under its own name so a cross-round consumer that
    // ignores the pass label still can't mistake it for a single
    // measured pass (ADVICE r4).
    def header(qs: String) =
      s""""metric":"total","value":${fmt(total)},"unit":"sec","pass":"min2",""" +
        s""""min2_total":${fmt(total)},""" +
        s""""cold_total":${fmt(coldTotal)},"warm_total":${fmt(warmTotal)},""" +
        s""""queries":$qs,"sf":${jstr(sfDir)}"""
    // Full-name per-query map: printed first (and written to a file)
    // for humans/tools reading the whole log.
    val fullQs = best.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val full = "{" + header(fullQs) + "}"
    println(full)
    try {
      val w = new java.io.PrintWriter("target/bench-full.json")
      try w.println(full) finally w.close()
    } catch { case _: Throwable => () }
    // The FINAL line is the machine contract. The harness that reads
    // it keeps only the last ~2000 chars of output (an sbt [success]
    // trailer eats ~80 more), so this line must fit ~1800 chars BY
    // CONSTRUCTION — the r12 artifact shipped unparseable because the
    // old fixed-threshold tiers all overflowed and the fallback
    // printed the oversized last tier anyway, truncating the captured
    // JSON mid-object. Now the SLOWEST queries (the informative ones)
    // are added greedily until the budget is spent; failures (-1)
    // are always included first, and the omission is announced
    // in-line so a reader can't mistake the shorter map for a
    // shrunken catalog. Full precision for every query is always on
    // the first line and in target/bench-full.json.
    val budget = 1800
    val ordered = best.toSeq.sortBy { case (_, v) =>
      (if (v < 0) Double.NegativeInfinity else -v, 0) // failures first
    }
    def entryStr(k: String, v: Double): String =
      "\"" + k.takeWhile(_ != '_') + "\":" +
        "%.1f".formatLocal(java.util.Locale.ROOT, v)
    // fixed-size parts: header with an empty map + the omission note
    // at its widest
    val fixedLen = ("{" + header("{}") +
      s""","queries_omitted":${best.size}""" + "}").length
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = fixedLen
    ordered.foreach { case (k, v) =>
      val e = entryStr(k, v)
      if (used + e.length + 1 <= budget) { kept += e; used += e.length + 1 }
    }
    val omitted =
      if (kept.size == best.size) ""
      else s""","queries_omitted":${best.size - kept.size}"""
    println("{" + header(kept.mkString("{", ",", "}")) + omitted + "}")
    spark.stop()
  }
}
