package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltSpec extends SparkSpec {
  import spark.implicits._

  test("saltedEquiJoin: identical to the plain join, even with NULL salt") {
    val big = Seq((1, Some(10)), (1, None), (2, Some(7))).toDF("k", "salt_src")
    val small = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val out = Salt.saltedEquiJoin(big, small, Seq("k"), col("salt_src"), 4)
      .select("k", "v").as[(Int, String)].collect().toSeq.sorted
    val plain = big.join(small, Seq("k"))
      .select("k", "v").as[(Int, String)].collect().toSeq.sorted
    // the NULL-salt row must not be silently dropped
    assert(out == plain && out.size == 3)
  }

  test("saltedSumCount: values beyond decimal(18,4) are not nulled away") {
    val df = Seq(("k", 2.0e14), ("k", 1.0)).toDF("g", "v")
    val out = Salt.saltedSumCount(df, Seq("g"), "v",
      pmod(col("v").cast("long"), lit(7)), nSalts = 7)
      .select("salted_sum", "n_rows").collect().head
    assert(out.getDecimal(0).doubleValue() == 2.0e14 + 1.0)
    assert(out.getLong(1) == 2L)
  }
}
