package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch MERGE (upsert/delete) — the table-maintenance half of a
  * CDC-fed lakehouse pipeline: apply a changes table (op column:
  * update-or-insert vs delete) onto a target snapshot in ONE
  * full-outer join on the key.
  *
  * Semantics (Delta/Iceberg MERGE with the common three clauses):
  *   - matched + delete-op      -> row dropped;
  *   - matched + upsert-op      -> change values win (columns the
  *     changes table lacks keep their target value);
  *   - not-matched + upsert-op  -> row inserted (target-only columns
  *     null);
  *   - not-matched + delete-op  -> no-op (tombstone for an absent
  *     key produces nothing);
  *   - target rows without a change row pass through.
  *
  * Scale: one shuffle of each side on the key (or ZERO exchanges if
  * both sides are bucketed on the key — see operators.Bucketing); the
  * changes side is typically a small delta, so AQE picks a broadcast
  * and the target never shuffles at all. Output carries an `action`
  * column (keep/update/insert) so downstream audits don't re-derive
  * provenance.
  */
object Merge {

  def upsert(target: DataFrame, changes: DataFrame, keys: Seq[String],
             opCol: String = "op", deleteOp: String = "D"): DataFrame = {
    val valueCols = target.columns.filterNot(keys.contains)
    val changeVals = changes.columns.filterNot(c => keys.contains(c) || c == opCol)
    require(changeVals.forall(valueCols.contains),
      s"changes columns ${changeVals.mkString(",")} must be a subset of target value columns")
    // reserved working names (the AsOfJoin guard): a caller column
    // named like one would be silently overwritten or ambiguous
    val reserved = "__t_present" +: "__op" +: changeVals.map(v => s"__c_$v")
    require(!(target.columns ++ changes.columns).exists(reserved.contains),
      s"Merge.upsert reserves ${reserved.mkString(", ")} as working columns")

    // presence flags survive the full-outer join where key columns
    // coalesce; op == null identifies change-absent rows — which is
    // exactly why a NULL op INSIDE changes must fail loudly (review):
    // it would masquerade as a target-only row, and an unmatched one
    // emitted a phantom (keys, all-null values, action 'keep') row
    // that existed in neither input.
    val t = target.withColumn("__t_present", lit(1))
    val opChecked = when(col(opCol).isNull,
        raise_error(lit("Merge.upsert: null op in changes — malformed " +
          "CDC row (op must be an upsert marker or the delete op)")))
      .otherwise(col(opCol))
    val c = changeVals.foldLeft(
        changes.withColumn(opCol, opChecked).withColumnRenamed(opCol, "__op"))(
      (df, v) => df.withColumnRenamed(v, s"__c_$v"))
    val joined = t.join(c, keys, "full_outer")
      .filter(col("__op").isNull || col("__op") =!= deleteOp)

    val out = valueCols.map { v =>
      if (changeVals.contains(v))
        when(col("__op").isNotNull, col(s"__c_$v")).otherwise(col(v)).as(v)
      else col(v).as(v)
    }
    val action = when(col("__op").isNull, lit("keep"))
      .when(col("__t_present").isNotNull, lit("update"))
      .otherwise(lit("insert")).as("action")
    joined.select(keys.map(col) ++ out :+ action: _*)
  }
}
