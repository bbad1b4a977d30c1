package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Range-layout guarantees (operators.Layout): after
  * repartitionByRange + sortWithinPartitions, physical partitions
  * cover DISJOINT, ordered key ranges — the property parquet zone-map
  * pruning relies on — and no rows are lost or duplicated. */
class LayoutSpec extends SparkSpec {

  test("partitions cover disjoint ordered ranges; counts preserved") {
    import spark.implicits._
    // keys arrive shuffled (hash of i) so the range exchange has work to do
    val src = spark.range(0, 10000).select(
      (hash(col("id")) % 1000).cast("long").as("k"), col("id"))
    val laid = Layout.rangeLayout(src, 8, col("k"))
    val ranges = Layout.partitionRanges(laid, "k")
      .orderBy("lo").collect().toSeq
    assert(ranges.map(_.getAs[Long]("cnt")).sum == 10000L)
    assert(ranges.size > 1) // the exchange actually spread the data
    // hi of each partition strictly below lo of the next: disjoint zone maps
    ranges.sliding(2).foreach {
      case Seq(a, b) => assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"))
      case _ => ()
    }
  }

  test("rows are sorted within each partition") {
    import spark.implicits._
    val src = spark.range(0, 5000).select(
      (hash(col("id")) % 97).cast("long").as("k"))
    val laid = Layout.rangeLayout(src, 4, col("k"))
    val violations = laid
      .select(spark_partition_id().as("pid"), col("k"))
      .mapPartitions { it =>
        val s = it.toSeq.map(r => r.getLong(1))
        Iterator.single(if (s.isEmpty) 0 else s.sliding(2).count {
          case Seq(a, b) => a > b
          case _ => false
        })
      }
    assert(violations.collect().sum == 0)
  }
}
