package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F25/F26/F27 (SURVEY.md §2.9 date/time): the reference's two
  * wall-clock stamps. Both take the timestamp as a PARAMETER (default
  * now) so plans stay deterministic under test — the reference bakes
  * `datetime.now()` into the frame (arbitrage_scanner.py:299-300,
  * 509-510).
  */
object Timestamps {

  /** F25: the sheet mirror's "updated_at" display string —
    * `strftime('%Y-%m-%d %H:%M')` (arbitrage_scanner.py:299-300).
    * Session time zone is pinned UTC, so this renders the instant in
    * UTC unless the caller converts first.
    */
  def displayMinute(ts: Column = current_timestamp()): Column =
    date_format(ts, "yyyy-MM-dd HH:mm")

  /** F27: the notification log's tz-aware stamp — the instant
    * rendered as America/Phoenix local time (no DST, fixed UTC-7),
    * minute precision (arbitrage_scanner.py:509-510).
    */
  def phoenixDisplay(utcTs: Column = current_timestamp()): Column =
    displayMinute(from_utc_timestamp(utcTs, "America/Phoenix"))
}
