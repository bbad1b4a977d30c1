package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Storage-layout evidence for the 100 TB stance: a table written
  * partitioned by a derived date column is read back with a partition
  * filter that PRUNES directories (no data read outside the selected
  * partitions), and a column projection that prunes the read schema.
  */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned write -> partition-pruned scan + schema pruning") {
    val dir = java.nio.file.Files.createTempDirectory("events_part").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", to_date(col("ts")))
    ev.write.mode("overwrite").partitionBy("day").parquet(dir)

    val days = ev.select("day").distinct().count()
    val oneDay = ev.select(max("day")).collect()(0).getDate(0)

    val q = spark.read.parquet(dir)
      .filter(col("day") === lit(oneDay))
      .select("event_id", "user_id")
    val plan = q.queryExecution.executedPlan.toString

    // the day predicate must appear as PartitionFilters (directory
    // pruning), NOT as a post-scan filter; and the read schema must
    // carry only the projected columns.
    assert(plan.contains("PartitionFilters"), plan)
    assert("PartitionFilters: \\[[^\\]]*day".r.findFirstIn(plan).isDefined,
      s"day not in partition filters:\n$plan")
    assert(plan.contains("ReadSchema: struct<event_id:bigint,user_id:bigint>"),
      s"schema not pruned:\n$plan")
    assert(q.count() > 0 && q.count() < ev.count())
    assert(days > 1) // pruning was actually selective
  }

  test("IVF cell-partitioned corpus: probe prunes to nprobe cells, ranking unchanged") {
    import spark.implicits._
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = e.filter(col("vec_id") < 12)
    val qs = e.filter(col("vec_id") >= 12 && col("vec_id") < 20)
    val dir = java.nio.file.Files.createTempDirectory("ivf_cells").toString
    Similarity.writeCellPartitioned(e, cents, "vec_id", "embedding", dir)

    val probed = Similarity.ivfTopKPartitioned(
      qs, dir, cents, "vec_id", "embedding", k = 5, nprobe = 2)
    val plan = probed.queryExecution.executedPlan.toString
    // probe cells ride as a LITERAL partition filter: directory
    // pruning at planning time, not a post-scan filter
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"cell not in partition filters:\n$plan")

    // ranking semantics identical to the in-memory ivfTopK
    val inMem = Similarity.ivfTopK(
        qs, e, cents, "vec_id", "embedding", k = 5, nprobe = 2)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val fromDisk = probed.select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(fromDisk == inMem && fromDisk.nonEmpty)

    // and the pruning is selective: fewer cells scanned than exist
    val allCells = spark.read.parquet(dir).select("cell").distinct().count()
    val probeCells = probed.select("cell").distinct().count()
    assert(probeCells < allCells)
  }

  test("IVF int8-on-disk probe: cell pruning + vq-only read schema, ranking parity") {
    import spark.implicits._
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = e.filter(col("vec_id") < 12)
    val qs = e.filter(col("vec_id") >= 12 && col("vec_id") < 20)
    val dir = java.nio.file.Files.createTempDirectory("ivf_cells_q8").toString
    Similarity.writeCellPartitioned(e, cents, "vec_id", "embedding", dir)

    val probed = Similarity.ivfQuantizedTopKPartitioned(
      qs, dir, cents, "vec_id", "embedding", k = 5, nprobe = 2)
    val plan = probed.queryExecution.executedPlan.toString
    // directory pruning: probe cells are a literal partition filter
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"cell not in partition filters:\n$plan")
    // column pruning: the corpus scan reads ONLY (id, vq) — the
    // full-precision vectors and norms written beside them move zero
    // bytes (the 4x-less-I/O half of VERDICT r4 #2)
    val corpusSchema = "ReadSchema: struct<[^>]*>".r.findAllIn(plan)
      .find(_.contains("vq")).getOrElse(fail(s"no scan reads vq:\n$plan"))
    assert(!corpusSchema.contains("v:") && !corpusSchema.contains("n2"),
      s"corpus scan not pruned to int8: $corpusSchema")

    // ranking semantics identical to the in-memory quantized stack
    val inMem = Similarity.ivfQuantizedTopK(
        qs, e, cents, "vec_id", "embedding", k = 5, nprobe = 2)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val fromDisk = probed.select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(fromDisk == inMem && fromDisk.nonEmpty)
  }
}
