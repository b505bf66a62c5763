package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Excel 1900-system serial-date → timestamp, replicating the reference's
  * `convertExcelDateToSQLite` (SQLiteDirectImporter.java:984-1006), which is
  * POI `DateUtil.getJavaDate` semantics:
  *
  *   - non-numeric / empty / serial == 0 → null
  *   - negative serial → null (POI `isValidExcelDate` rejects it)
  *   - 1900-01-01 is serial 1; Excel wrongly treats 1900 as a leap year
  *     (fake 1900-02-29 = serial 60), so serials < 61 sit one day later than
  *     the naive `(serial - 25569) * 86400` epoch formula, and the fake
  *     Feb 29 itself lands on 1900-03-01
  *   - the day fraction becomes time-of-day: millis = trunc(frac * 86_400_000
  *     + 0.5), rendered at seconds precision (millis truncated)
  *
  * One divergence, documented in SURVEY.md §7.5 item 6: the reference renders
  * in the system zone; we pin UTC.
  *
  * Implemented as a built-in expression tree (floor/when/arithmetic) — fully
  * codegen'd, no UDF.
  */
object ExcelSerial {

  /** `c` may be a string (raw stage) or numeric column. Returns TimestampType.
    * `try_cast` (not `cast`): under ANSI mode a malformed serial must become
    * null, like the reference's caught NumberFormatException, not an error.
    */
  def excelSerialToTimestamp(c: Column): Column = {
    val d = c.try_cast(DoubleType)
    val whole = floor(d) // bigint
    // dayAdjust: POI subtracts one day for serials >= 61 to undo the fake
    // 1900-02-29; expressed against the 1900-01-01 anchor:
    // unixDays = whole + (whole < 61 ? 0 : -1) - 25568
    val unixDays = whole + when(whole < 61, lit(0L)).otherwise(lit(-1L)) - lit(25568L)
    val millisInDay = floor((d - whole) * lit(86400000.0) + lit(0.5))
    val secsInDay = floor(millisInDay / lit(1000L)) // integer division, truncates millis
    val epochSec = unixDays * lit(86400L) + secsInDay.cast("long")
    when(d.isNull || d <= 0.0, lit(null).cast("timestamp"))
      .otherwise(timestamp_seconds(epochSec))
  }

  /** The same law expressed as ANSI SQL over a column reference, for the
    * DuckDB oracle. Kept textually parallel to [[excelSerialToTimestamp]] so
    * both engines perform identical IEEE double operations in the same order.
    */
  def oracleSql(col: String): String = {
    val d = s"CAST($col AS DOUBLE)"
    val whole = s"CAST(floor($d) AS BIGINT)"
    s"""CASE WHEN $d IS NULL OR $d <= 0.0 THEN NULL
       |ELSE make_timestamp((($whole + (CASE WHEN $whole < 61 THEN 0 ELSE -1 END) - 25568) * 86400
       |  + CAST(floor(CAST(floor(($d - $whole) * 86400000.0 + 0.5) AS BIGINT) / 1000) AS BIGINT)) * 1000000)
       |END""".stripMargin.replace("\n", " ")
  }
}
