package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ExcelSerial
import graft.model.TransferSchema._

/** String → typed coercion stage (P2/P3).
  *
  * - bigint columns: `trim` + parse, null on failure/empty
  *   (SQLiteDirectImporter.java:522-531) — Spark's string→long cast already
  *   trims and nulls on failure, matching `Long.parseLong` for decimal forms;
  *   we additionally reject non-integer strings the same way parseLong does
  *   (e.g. "12.5" → null, which a plain cast would also null — but "+5" parses
  *   in both).
  * - date columns: Excel serial → timestamp (SQLiteDirectImporter.java:984-1006)
  *   via [[graft.functions.ExcelSerial]].
  * - text columns pass through unchanged: empty string stays "" (never null)
  *   — both states are meaningful downstream (SURVEY.md §7.5 item 4).
  */
object Coerce {

  /** `Long.parseLong`-strict: integral form only. Spark's lax string cast
    * would accept "12.5" (→ 12) where the reference nulls it.
    * `private[graft]` so the query registry can oracle the LAW ITSELF
    * (q_coerce_longs) rather than a re-implementation of it.
    */
  private[graft] def strictLong(c: Column): Column = {
    val t = trim(c.cast("string"))
    // \A..\z (not ^..$): Java's $ matches before a trailing newline, which
    // trim (spaces-only) does not strip — "123\n" must null like parseLong.
    // Both anchors exist in Java regex and RE2, so the DuckDB oracle can
    // apply the identical pattern.
    // try_cast: ANSI-safe (overflow → null, like parseLong's caught exception)
    when(t.rlike("\\A[+-]?\\d+\\z"), t.try_cast("long")).otherwise(lit(null).cast("long"))
  }

  private def coerceCol(name: String): Column = {
    val c = col(name)
    if (bigintColumns(name)) strictLong(c).as(name)
    else if (dateColumns(name)) ExcelSerial.excelSerialToTimestamp(c).as(name)
    else c
  }

  /** Raw frame (19 strings + meta) → typed frame (meta preserved). */
  def apply(raw: DataFrame): DataFrame = {
    val typed = dbColumns.map(coerceCol) ++
      metaColumns.filter(raw.columns.contains).map(col)
    raw.select(typed: _*)
  }
}
