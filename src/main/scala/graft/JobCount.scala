package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicInteger

/** Job/stage counter for one catalog query: `runMain graft.JobCount
  * <name> [sfDir]` — runs the query twice (first pass absorbs
  * codegen/JIT and any per-JVM setup caches) and prints the SECOND
  * pass's scheduled job and stage counts plus its wall seconds. The
  * floor-accounting primitive for entries whose cost is job-count ×
  * scheduling floor rather than data volume (README's measured-floor
  * discipline, VERDICT r9 #2). */
object JobCount {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.fromEnv()
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    }
    val fn = SparkEntry.queries(name)
    fn(spark, sf).write.mode("overwrite").format("noop").save() // warm pass
    // listener events are delivered asynchronously: let the warm
    // pass's queue drain BEFORE registering, or its trailing
    // stage/job events would count against the measured pass
    Thread.sleep(1000)
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sf).write.mode("overwrite").format("noop").save()
    val sec = (System.nanoTime() - t0) / 1e9
    // listener events are posted asynchronously; a short settle is
    // enough at this scale (job-START events precede the action's
    // return anyway; only the last stage-completion can trail)
    Thread.sleep(500)
    println(f"[jobs] $name jobs=${jobs.get()} stages=${stages.get()} sec=$sec%.3f")
    spark.stop()
  }
}
