package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Batch MERGE semantics (operators.Merge): the five clause outcomes,
  * plus the degenerate inputs a CDC feed produces in practice. */
class MergeSpec extends SparkSpec {

  private def target = df("k INT, status STRING, v DOUBLE", Seq(
    Row(1, "A", 10.0), Row(2, "B", 20.0), Row(3, "C", 30.0)))

  test("matched update wins, unmatched insert lands, matched delete drops") {
    val changes = df("k INT, op STRING, v DOUBLE", Seq(
      Row(2, "U", 99.0),   // matched upsert
      Row(3, "D", 0.0),    // matched delete
      Row(4, "U", 40.0),   // unmatched insert
      Row(5, "D", 0.0)))   // unmatched delete -> no-op
    val out = Merge.upsert(target, changes, Seq("k"))
      .orderBy("k").collect().toSeq
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getDouble(2), r.getString(3))) ==
      Seq((1, "A", 10.0, "keep"),
          (2, "B", 99.0, "update"),   // status kept: changes lack it
          (4, null, 40.0, "insert"))) // target-only column null on insert
  }

  test("a NULL op in changes fails loudly instead of injecting a phantom row") {
    // pre-fix: an unmatched null-op change row masqueraded as a
    // target-only row and emitted (keys, all-null values, 'keep')
    val changes = df("k INT, op STRING, v DOUBLE", Seq(Row(7, null, 1.0)))
    val ex = intercept[Exception] {
      Merge.upsert(target, changes, Seq("k")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("null op")), msgs(ex).mkString(" | "))
  }

  test("empty changes passes the target through unchanged") {
    val changes = df("k INT, op STRING, v DOUBLE", Seq.empty)
    val out = Merge.upsert(target, changes, Seq("k"))
    assert(out.filter(col("action") =!= "keep").isEmpty)
    assert(out.count() == 3)
  }

  test("all-delete changes empties the matched keys only") {
    val changes = df("k INT, op STRING, v DOUBLE", Seq(
      Row(1, "D", 0.0), Row(2, "D", 0.0), Row(3, "D", 0.0), Row(9, "D", 0.0)))
    assert(Merge.upsert(target, changes, Seq("k")).isEmpty)
  }

  test("changes columns must be a subset of target value columns") {
    val bad = df("k INT, op STRING, other DOUBLE", Seq(Row(1, "U", 1.0)))
    intercept[IllegalArgumentException] {
      Merge.upsert(target, bad, Seq("k"))
    }
  }
}
