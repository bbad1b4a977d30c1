package graft

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.execution.ExplainMode

/** Batch plan capture for the optimization-round evidence files:
  * runMain graft.PlanDump <outDir> <suffix> <sfDir> <query...>
  * writes <outDir>/<query>_<suffix>.txt with the formatted physical
  * plan of each named declared query (the same text
  * df.explain("formatted") prints). One JVM for the whole list so
  * the per-JVM untimed store builds are paid once, like Bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val sfDir = args(2)
    val names = args.drop(3)
    Files.createDirectories(outDir)
    val spark = GraftSession.fromEnv()
    val mode = ExplainMode.fromString("formatted")
    for (name <- names) {
      val txt =
        try SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(mode)
        catch { case e: Throwable => s"PLAN CAPTURE FAILED: $e" }
      Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] wrote $name ($suffix)")
    }
    spark.stop()
  }
}
