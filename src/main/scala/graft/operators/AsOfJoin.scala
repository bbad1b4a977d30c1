package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join: for each left row, the most recent right row
  * with rightTs <= leftTs on the same key (the classic ticks-vs-quotes
  * operator; called out in SURVEY.md §7 as a custom-op candidate).
  *
  * Implementation is the scalable union+window form, NOT a range
  * cross-join: tag both sides, union, and forward-fill the right
  * payload over (key) ordered by (ts, side) — right rows sort before
  * left rows at equal timestamps, making the match inclusive. One
  * shuffle on the key, O(n log n) per partition, no row-pair blowup;
  * this is how a 100 TB ticks/quotes join must run.
  *
  * Semantics notes:
  *  - the payload travels as ONE struct, so the matched right row is
  *    carried as a unit: a genuinely-NULL payload field stays NULL
  *    (no per-column forward-fill resurrecting older values, no
  *    output row stitched from different right rows);
  *  - right rows with a NULL rightTs can never satisfy
  *    rightTs <= leftTs and are excluded; a left row with NULL leftTs
  *    sorts before every (non-null-ts) right row and gets NULL
  *    payload — both match SQL ASOF semantics;
  *  - right rows must be unique per (key, ts) — pre-deduplicate; with
  *    duplicates the fill would be order-dependent.
  */
object AsOfJoin {

  /** NULL-key right rows are excluded from every variant (review):
    * Window.partitionBy groups null keys into ONE partition, so a
    * null-key right row would hand its payload to null-key LEFT rows
    * — where SQL ASOF/equi-join semantics say NULL matches nothing.
    * Null-key left rows still flow through unmatched (their partition
    * simply holds no right payload to inherit). */
  private def rightKeysNotNull(keys: Seq[String]) =
    keys.map(col(_).isNotNull).reduce(_ && _)

  private val TsCol = "_graft_asof_ts"
  private val SideCol = "_graft_asof_side"
  private val PayCol = "_graft_asof_payload"

  /** @param payload right-side columns carried onto left rows
    *   (must not collide with left column names) */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(Set(TsCol, SideCol, PayCol)),
      s"AsOfJoin: left side must not contain reserved columns $TsCol/$SideCol/$PayCol")
    val l = left.withColumn(TsCol, col(leftTs)).withColumn(SideCol, lit(1))
    val r = right
      .filter(col(rightTs).isNotNull && rightKeysNotNull(keys))
      .select((keys.map(col) :+ col(rightTs).as(TsCol)) :+
        struct(payload.map(col): _*).as(PayCol): _*)
      .withColumn(SideCol, lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(TsCol).asc_nulls_first, col(SideCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = u.withColumn(PayCol, last(col(PayCol), ignoreNulls = true).over(w))
    filled.filter(col(SideCol) === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(PayCol).getField(p).as(p)): _*)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row
    * with rightTs >= leftTs on the same key, optionally bounded by
    * `tolerance` (match discarded when rightTs > leftTs + tolerance).
    * Same union+window scale shape as `backward`, run in descending
    * time order; the matched rightTs is carried in the payload struct
    * so the tolerance is applied AFTER the fill (a match beyond the
    * bound nulls the whole payload, not just some fields).
    *
    * At equal timestamps the right row matches (inclusive), mirroring
    * `backward`. Right rows must be unique per (key, ts).
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String, payload: Seq[String],
              tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(Set(TsCol, SideCol, PayCol)),
      s"AsOfJoin: left side must not contain reserved columns $TsCol/$SideCol/$PayCol")
    val matchTs = "_graft_asof_match_ts"
    val l = left.withColumn(TsCol, col(leftTs)).withColumn(SideCol, lit(1))
    val r = right
      .filter(col(rightTs).isNotNull && rightKeysNotNull(keys))
      .select((keys.map(col) :+ col(rightTs).as(TsCol)) :+
        struct((col(rightTs).as(matchTs) +: payload.map(col)): _*).as(PayCol): _*)
      .withColumn(SideCol, lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    // Descending time: the running last-seen right payload IS the
    // earliest right row at-or-after the current left row. Left rows
    // with NULL ts must sort FIRST (before any right row has been
    // seen) so they match nothing — nulls_last would put them after
    // every right row and hand them the smallest rightTs's payload.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(TsCol).desc_nulls_first, col(SideCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = u.withColumn(PayCol, last(col(PayCol), ignoreNulls = true).over(w))
    val bounded = tolerance match {
      case Some(tol) => filled.withColumn(PayCol,
        when(col(PayCol).getField(matchTs) <= col(TsCol) + tol, col(PayCol)))
      case None => filled
    }
    bounded.filter(col(SideCol) === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(PayCol).getField(p).as(p)): _*)
  }

  /** NEAREST as-of join: for each left row, the right row minimizing
    * |rightTs - leftTs| on the same key; ties (equal gap both sides)
    * resolve to the BACKWARD match. Still ONE shuffle on the key —
    * the same union carries both a running backward fill (time
    * ascending) and a running forward fill (time descending), two
    * Window passes over one exchange, and the smaller gap wins per
    * row. `tolerance` bounds the gap on BOTH sides.
    *
    * Same contracts as backward/forward: right rows unique per
    * (key, ts), NULL-ts right rows excluded, NULL-ts left rows match
    * nothing, the payload travels as one struct (never stitched from
    * two right rows).
    */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String, payload: Seq[String],
              tolerance: Option[Column] = None): DataFrame = {
    // TIMESTAMP-ONLY contract (review): the tie-break gap is measured
    // in unix_micros, which only accepts timestamp/date columns —
    // backward()/forward() are ordering-only and accept any orderable
    // ts type, but nearest needs a metric. Fail with a clear message
    // instead of an opaque unix_micros AnalysisException.
    require(Seq(leftTs -> left, rightTs -> right).forall { case (c, d) =>
      d.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.TimestampType] ||
        d.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.DateType]
    }, "AsOfJoin.nearest requires timestamp/date ts columns (the gap " +
      "metric is unix_micros); backward/forward accept any orderable type")
    val leftCols = left.columns.toSeq
    val matchTs = "_graft_asof_match_ts"
    val backCol = "_graft_asof_back"
    val fwdCol = "_graft_asof_fwd"
    require(!leftCols.exists(Set(TsCol, SideCol, PayCol, backCol, fwdCol)),
      s"AsOfJoin: left side must not contain reserved columns " +
        s"$TsCol/$SideCol/$PayCol/$backCol/$fwdCol")
    val l = left.withColumn(TsCol, col(leftTs)).withColumn(SideCol, lit(1))
    val r = right
      .filter(col(rightTs).isNotNull && rightKeysNotNull(keys))
      .select((keys.map(col) :+ col(rightTs).as(TsCol)) :+
        struct((col(rightTs).as(matchTs) +: payload.map(col)): _*).as(PayCol): _*)
      .withColumn(SideCol, lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    // Both fills share the partitioning: one exchange, two sorts. At
    // equal timestamps the right row precedes the left row in BOTH
    // orders (SideCol ascending), so an exact-ts match is inclusive
    // from either direction; null-ts left rows sort first in both and
    // see no right payload.
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(TsCol).asc_nulls_first, col(SideCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(TsCol).desc_nulls_first, col(SideCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = u
      .withColumn(backCol, last(col(PayCol), ignoreNulls = true).over(wB))
      .withColumn(fwdCol, last(col(PayCol), ignoreNulls = true).over(wF))
    def inTol(c: Column): Column = tolerance match {
      case Some(tol) =>
        c.getField(matchTs).between(col(TsCol) - tol, col(TsCol) + tol)
      case None => lit(true)
    }
    def gap(c: Column): Column =
      abs(unix_micros(c.getField(matchTs)) - unix_micros(col(TsCol)))
    val chosen = filled
      .withColumn(backCol, when(inTol(col(backCol)), col(backCol)))
      .withColumn(fwdCol, when(inTol(col(fwdCol)), col(fwdCol)))
      .withColumn(PayCol,
        when(col(backCol).isNull, col(fwdCol))
          .when(col(fwdCol).isNull, col(backCol))
          .when(gap(col(fwdCol)) < gap(col(backCol)), col(fwdCol))
          .otherwise(col(backCol)))
    chosen.filter(col(SideCol) === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(PayCol).getField(p).as(p)): _*)
  }
}
