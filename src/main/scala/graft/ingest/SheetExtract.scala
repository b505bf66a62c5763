package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.TransferSchema._

/** Workbook-subset extraction (K4), data-level: the reference's
  * TransferOverviewExtractor copies a single sheet ("Overview") out of each
  * workbook into its own artifact (TransferOverviewExtractor.java:196-234).
  * Relationally that is "SELECT one partition (sheet) of the source and
  * write it per source file" (SURVEY.md §3.2); chart/style binary fidelity
  * is a documented non-goal (§7.6).
  */
object SheetExtract {

  /** Rows of one sheet across all source files. Prefix match, like the
    * reference's sheet predicates (`startsWith`).
    */
  def sheet(raw: DataFrame, sheetName: String): DataFrame =
    raw.filter(col(sheetCol).startsWith(sheetName))

  /** Write the extracted sheet, one artifact directory per source workbook —
    * the layout analog of `report/<file>/Overview/Overview-<file>.xlsx`
    * (TransferOverviewExtractor.java:130-151).
    */
  def writePerSource(raw: DataFrame, sheetName: String, outDir: String): Unit =
    sheet(raw, sheetName)
      .write.mode("overwrite")
      .partitionBy(srcFileCol)
      .parquet(outDir)
}
