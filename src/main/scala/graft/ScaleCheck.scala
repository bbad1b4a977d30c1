package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Empirical scale check (VERDICT r4 #5): measure the dedup stack at
  * 1x vs 10x corpus size and commit the table (SCALE.md) — the 100 TB
  * stance measured instead of argued.
  *
  * The 10x corpus is sf0.1 documents unioned with 9 id-offset copies
  * whose every token is prefixed with the copy number: shingle sets
  * are DISJOINT across copies, so 10x the rows means 10x distinct
  * content (the full-pipeline cost must scale ~linearly in input, not
  * in answer size — near-dup answer size is a property of the data,
  * not the engine). Expectations, by construction of the plans:
  *
  *  - q31/q33/q100 (whole-corpus pair finding / clustering /
  *    materialization): ~linear in corpus size — every pairwise stage
  *    is blocked (shingle / band bucket) with hot keys bounded.
  *  - q145 (incremental probe, batch = 10% of corpus): ~linear too —
  *    the BATCH grows with the corpus here.
  *  - NearDupRegistry.dedupAppend of a FIXED 500-doc batch against a
  *    1x vs 10x registry: ~flat — the probe is a broadcast of the
  *    batch bands against the persisted band index; history size only
  *    enters through the (columnar, pruned) index scan.
  *
  * runMain graft.ScaleCheck [sfDir] — prints a markdown table.
  */
object ScaleCheck {

  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.fromEnv()
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup
    val base = Tables.documents(spark, sf)
    val root = java.nio.file.Files.createTempDirectory("graft_scale").toString

    /** Copy c of the corpus: ids offset, every token prefixed "c<c>"
      * so shingles are disjoint from every other copy. */
    def copy(c: Int): DataFrame =
      if (c == 0) base
      else base
        .withColumn("doc_id", col("doc_id") + lit(c * 10000000L))
        .withColumn("text",
          regexp_replace(col("text"), "([a-z0-9]+)", s"c$c$$1"))

    /** Copy c of the embeddings: ids offset, a hashed per-(copy, dim)
      * sign pattern flips ~half the dims between any two copies, so
      * cross-copy cosine is ~0 (far below every near-dup threshold) —
      * 10x the vectors is 10x distinct content, the embedding
      * analogue of the token-prefix trick. Copy 0 is the original. */
    val embBase = Tables.embeddings(spark, sf)
    def copyEmb(c: Int): DataFrame = {
      val flips = (0 until 64).map { d =>
        val h = (c * 2654435761L + d * 40503L) >>> 13
        if (c != 0 && (h & 1L) == 1L) -1.0f else 1.0f
      }
      val flipCol = array(flips.map(lit): _*)
      if (c == 0) embBase
      else embBase
        .withColumn("vec_id", col("vec_id") + lit(c * 10000000L))
        .withColumn("embedding",
          zip_with(col("embedding"), flipCol, (x, s) => (x * s).cast("float")))
    }

    def synth(mult: Int): String = {
      val dir = s"$root/x$mult"
      (0 until mult).map(copy).reduce(_ unionAll _)
        .coalesce(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      (0 until mult).map(copyEmb).reduce(_ unionAll _)
        .coalesce(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    /** min-of-two, the Bench noise-floor discipline. */
    def time2(f: => Unit): Double = math.min(time(f), time(f))

    val dirs = Map(1 -> synth(1), 10 -> synth(10))
    val queryNames = Seq("q31_jaccard_pairs", "q33_minhash_lsh_pairs",
      "q100_dedup_materialize", "q145_incremental_lsh",
      // round-5 session additions: the prefix-filtered join and the
      // winnowed-fingerprint pair mining — both blocked pair finders
      // whose 10x behavior should match q31's ~linear shape
      "q169_prefix_filter_pairs", "q172_winnowing_pairs",
      // OPH signatures: one hash per shingle + binned conditional
      // mins — expected ~linear like the tokenize+hash paths it feeds
      "q184_oph_minhash",
      // embedding-side pair finders at their catalog-FIXED blocking
      // width (16 buckets / 12 cells): these rows measure the
      // fixed-width penalty — within-block pairs grow ~n²/width —
      // and the width-scaled row below shows the recovery. The
      // sign-flip synthesis keeps copies far apart in cosine, so
      // answer size stays a data property.
      "q35_embedding_near_dup", "q183_semdedup")

    println("| component | 1x (s) | 10x (s) | ratio |")
    println("|---|---|---|---|")
    val qtimes = queryNames.map { name =>
      val fn = SparkEntry.queries(name)
      val t1 = time2(fn(spark, dirs(1)).count())
      val t10 = time2(fn(spark, dirs(10)).count())
      println(f"| $name | $t1%.2f | $t10%.2f | ${t10 / t1}%.1fx |")
      (name, t1, t10)
    }

    // Blocking width must TRACK corpus size: the q35/q183 rows run
    // with their catalog-fixed width (16 LSH buckets / 12 cells), so
    // within-block candidate pairs grow ~quadratically at 10x — the
    // measured penalty. The SAME operator with bits += 3 (8x the
    // buckets, ~matching the 10x data) restores the near-linear
    // shape; k (cells) is SemDeDup's identical knob.
    val cpScaled = Seq((1, 4), (10, 7)).map { case (mult, bits) =>
      (mult, time2(operators.Similarity.cosinePairs(
        Tables.embeddings(spark, dirs(mult)), "vec_id", "embedding",
        dim = 64, threshold = 0.35, bits = bits).count()))
    }
    val Seq((_, cp1), (_, cp10)) = cpScaled
    println(f"| q35 with width-scaled blocking (bits 4 -> 7) | $cp1%.2f | $cp10%.2f | ${cp10 / cp1}%.1fx |")

    // fixed 500-doc probe batch (disjoint content and ids: copy 99)
    val batch = copy(99).filter(pmod(col("doc_id"), lit(10)) === 3)
      .limit(500).localCheckpoint(true)
    val regTimes = Seq(1, 10).map { mult =>
      val reg = new operators.NearDupRegistry(s"$root/reg$mult/r",
        numPerm = 32, bands = 8, rowsPerBand = 4, simThreshold = 0.5)
      val seedSecs = time(
        reg.dedupAppend(Tables.documents(spark, dirs(mult)), "doc_id", "text").count())
      val probeSecs = time(reg.dedupAppend(batch, "doc_id", "text").count())
      (mult, seedSecs, probeSecs)
    }
    val Seq((_, seed1, probe1), (_, seed10, probe10)) = regTimes
    println(f"| registry seed (full corpus) | $seed1%.2f | $seed10%.2f | ${seed10 / seed1}%.1fx |")
    println(f"| registry dedupAppend (fixed 500-doc batch) | $probe1%.2f | $probe10%.2f | ${probe10 / probe1}%.1fx |")

    // incremental CC: fold a FIXED 300-edge batch into the standing
    // labeling of the 1x vs 10x corpus — the contracted fixpoint is
    // bounded by the batch, so history size enters only through the
    // rep-lookup/remap equi-joins (expected ~flat, like the registry
    // probe). Standing labelings are seeded untimed.
    val ccBatch = {
      import spark.implicits._
      (0 until 300).map { i =>
        (i.toLong * 7 % 5000, 900000000L + i) // existing id <- new id
      }.toDF("id_a", "id_b").localCheckpoint(true)
    }
    val ccTimes = Seq(1, 10).map { mult =>
      val standing = operators.Dedup.connectedComponents(
        operators.Dedup.jaccardPairs(Tables.documents(spark, dirs(mult)),
          "doc_id", "text", n = 3, threshold = 0.5, maxDf = 100))
        .localCheckpoint(true)
      (mult, time2(operators.Dedup
        .connectedComponentsIncremental(standing, ccBatch).count()))
    }
    val Seq((_, ccf1), (_, ccf10)) = ccTimes
    println(f"| incremental CC fold (fixed 300-edge batch) | $ccf1%.2f | $ccf10%.2f | ${ccf10 / ccf1}%.1fx |")

    // machine-readable line for the round artifact
    val qjson = qtimes.map { case (n, a, b) =>
      s""""$n":[${f"$a%.3f"},${f"$b%.3f"}]""" }.mkString(",")
    println(s"""{"scalecheck":{$qjson,"registry_seed":[${f"$seed1%.3f"},${f"$seed10%.3f"}],""" +
      s""""registry_probe":[${f"$probe1%.3f"},${f"$probe10%.3f"}],""" +
      s""""incremental_cc_fold":[${f"$ccf1%.3f"},${f"$ccf10%.3f"}],""" +
      s""""cosine_pairs_width_scaled":[${f"$cp1%.3f"},${f"$cp10%.3f"}],"sf":"$sf"}}""")
    spark.stop()
  }
}
