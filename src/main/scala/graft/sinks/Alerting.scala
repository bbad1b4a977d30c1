package graft.sinks

import org.apache.spark.sql.DataFrame

/** K1/K3 (SURVEY.md §2.2): the outward-facing sinks — spreadsheet
  * mirror overwrite and push notification — are driver-side adapters
  * behind traits, exactly as the SURVEY prescribes: the ENGINE's
  * responsibility ends at a deterministic DataFrame; delivery is an
  * integration concern with no-op/test implementations here and
  * HTTP/Sheets clients in deployment.
  */
trait AlertSink {
  /** Push one batch of formatted alert messages
    * (arbitrage_scanner.py:490-502 shape). */
  def push(messages: Seq[String]): Unit
}

trait TableMirror {
  /** Overwrite the external mirror with the current grid
    * (arbitrage_scanner.py:307-320 shape: header + rows). */
  def overwrite(header: Seq[String], rows: Seq[Seq[String]]): Unit
}

/** Test/no-op implementations that record what they were given. */
class CollectingAlertSink extends AlertSink {
  val sent = scala.collection.mutable.ArrayBuffer[String]()
  override def push(messages: Seq[String]): Unit =
    sent.synchronized { sent ++= messages }
}

class CollectingMirror extends TableMirror {
  @volatile var last: Option[(Seq[String], Seq[Seq[String]])] = None
  override def overwrite(header: Seq[String], rows: Seq[Seq[String]]): Unit =
    last = Some((header, rows))
}

object Alerting {
  /** F25 (arbitrage_scanner.py:299-300): stamp the mirror grid with
    * the minute-precision `updated_at` display column before the
    * overwrite. Timestamp injectable for deterministic tests. */
  def withUpdatedAt(grid: DataFrame,
                    ts: org.apache.spark.sql.Column =
                      org.apache.spark.sql.functions.current_timestamp()): DataFrame =
    grid.withColumn("updated_at", graft.functions.Timestamps.displayMinute(ts))

  /** Deliver an alerts DataFrame: collect is intentional and bounded —
    * alerts passed every guard and the rate limit (a handful of rows);
    * the heavy lifting stayed distributed. */
  def deliver(alerts: DataFrame, messageCol: String, sink: AlertSink): Int = {
    val msgs = alerts.select(messageCol).collect().map(_.getString(0)).toSeq
    if (msgs.nonEmpty) sink.push(msgs)
    msgs.size
  }

  /** K1 engine-native form: overwrite the mirror TABLE with the
    * current grid — the scale path for grids too large to collect
    * (the external-sheet TableMirror stays for bounded mirrors). */
  def mirrorTable(grid: DataFrame, path: String): Unit =
    grid.write.mode("overwrite").parquet(path)

  /** Mirror a (small, final) grid to the external table sink. */
  def mirror(grid: DataFrame, m: TableMirror): Int = {
    val header = grid.columns.toSeq
    val rows = grid.collect().map(_.toSeq.map(v => if (v == null) "" else v.toString)).toSeq
    m.overwrite(header, rows)
    rows.size
  }
}
