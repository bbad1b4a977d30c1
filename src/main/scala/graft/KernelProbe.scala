package graft

import org.apache.spark.sql.functions._
import graft.operators.LateInteraction

/** Scratch decomposition probe for the MaxSim brute kernel (not part
  * of the driver contract): times each layer of q230's chain with the
  * noop sink at a given sf. runMain graft.KernelProbe [sfDir] [passes]
  */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.fromEnv()
    spark.range(1000000).selectExpr("sum(id)").collect()
    val li = LateInteraction
    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label passes=${ts.map(t => f"$t%.3f").mkString(",")} min=${ts.min}%.3f")
    }
    def docs = Tables.documents(spark, sf)
    def dv = li.withVec(li.docTokens(docs, "doc_id", "text", 24), "t", "dc")
    def qv = li.withVec(
      li.docTokens(docs.filter(col("doc_id") < 8), "doc_id", "text", 6)
        .withColumnRenamed("doc_id", "query_id")
        .withColumnRenamed("t", "qt"), "qt", "qc")
    def dvSpread = li.withVec(
      li.docTokens(docs.repartition(
        spark.sessionState.conf.numShufflePartitions, col("doc_id")),
        "doc_id", "text", 24),
      "t", "dc")
    time("docs_scan")(docs)
    time("doc_tokens")(li.docTokens(docs, "doc_id", "text", 24))
    time("dv_withvec")(dv)
    time("dv_spread")(dvSpread)
    time("scores_spread")(li.maxSimScores(qv, dvSpread))
    time("topk_spread")(li.topK(li.maxSimScores(qv, dvSpread), 5))
    time("scores_postpart")(li.maxSimScores(qv, dv.repartition(col("doc_id"))))
    time("topk_postpart")(li.topK(li.maxSimScores(qv, dv.repartition(col("doc_id"))), 5))
    spark.stop()
  }
}
