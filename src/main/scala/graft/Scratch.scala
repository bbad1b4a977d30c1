package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Text
import graft.operators.{Dedup, Similarity}

/** Temporary profiling harness — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.fromEnv()
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[scratch] $label pass$i: $n rows ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    time("q103-current") {
      SparkEntry.queries("q103_knn_classify")(spark, dir).count()
    }
    time("q103-bcast-nn") {
      val e = Tables.embeddings(spark, dir)
      val labeled = e.filter(col("vec_id") >= 8)
      val nn = Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 8), labeled, "vec_id", "embedding", k = 5)
      val votes = labeled.select(col("vec_id").as("neighbor_id"), col("label"))
        .join(broadcast(nn), "neighbor_id")
        .groupBy("query_id", "label")
        .agg(count(lit(1)).as("votes"), min(col("rank")).as("best_rank"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("votes").desc, col("best_rank"), col("label"))
      votes.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).count()
    }
    time("q104-current") {
      SparkEntry.queries("q104_bigram_lift")(spark, dir).count()
    }
    time("q104-no-materialize") {
      val toks = Tables.documents(spark, dir)
        .select(Text.tokens(col("text")).as("toks"))
      val bg = toks.select(
        explode(Text.shinglesWithDuplicates(col("toks"), 2)).as("bigram"))
      val bgc = bg.groupBy("bigram").agg(count(lit(1)).as("c_ab"))
      val ug = toks.select(explode(col("toks")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("c"))
      val tot = bgc.agg(sum(col("c_ab")).as("n_bigrams"))
      bgc.filter(col("c_ab") >= 5)
        .withColumn("w1", split(col("bigram"), " ").getItem(0))
        .withColumn("w2", split(col("bigram"), " ").getItem(1))
        .join(ug.select(col("term").as("w1"), col("c").as("c_a")), "w1")
        .join(ug.select(col("term").as("w2"), col("c").as("c_b")), "w2")
        .crossJoin(broadcast(tot))
        .withColumn("lift", round(
          (col("c_ab") * col("n_bigrams")).cast("double") /
            (col("c_a") * col("c_b")), 6))
        .orderBy(col("lift").desc, col("bigram"))
        .limit(100).count()
    }
    time("q104-bcast-ug") {
      val toks = Dedup.DefaultMaterialize(Tables.documents(spark, dir)
        .select(Text.tokens(col("text")).as("toks")))
      val bg = toks.select(
        explode(Text.shinglesWithDuplicates(col("toks"), 2)).as("bigram"))
      val bgc = bg.groupBy("bigram").agg(count(lit(1)).as("c_ab"))
      val ug = toks.select(explode(col("toks")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("c"))
      val tot = bgc.agg(sum(col("c_ab")).as("n_bigrams"))
      bgc.filter(col("c_ab") >= 5)
        .withColumn("w1", split(col("bigram"), " ").getItem(0))
        .withColumn("w2", split(col("bigram"), " ").getItem(1))
        .join(broadcast(ug.select(col("term").as("w1"), col("c").as("c_a"))), "w1")
        .join(broadcast(ug.select(col("term").as("w2"), col("c").as("c_b"))), "w2")
        .crossJoin(broadcast(tot))
        .withColumn("lift", round(
          (col("c_ab") * col("n_bigrams")).cast("double") /
            (col("c_a") * col("c_b")), 6))
        .orderBy(col("lift").desc, col("bigram"))
        .limit(100).count()
    }
    time("q119-current") {
      SparkEntry.queries("q119_skyline")(spark, dir).count()
    }
    spark.stop()
  }
}
