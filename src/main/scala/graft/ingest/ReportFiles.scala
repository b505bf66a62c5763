package graft.ingest

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Drop-folder file discovery (S1) — the reference's `findExcelFiles`
  * (SQLiteDirectImporter.java:226-248) and the Overview extractor's variant
  * that also skips its own prior outputs (TransferOverviewExtractor.java:
  * 160-188):
  *
  *   - non-recursive listing of the source directory
  *   - keep the report extensions, case-INSENSITIVE
  *   - skip Office temp files (`~` prefix)
  *   - sorted by file name — this ordering IS the upsert tie-break order
  *     (SURVEY.md §7.5 item 1), so it is part of the semantics, not just UX
  *
  * Driver-side (the reference lists files on one node too); the Spark-side
  * equivalent for distributed listing is `pathGlobFilter` on the source load.
  */
object ReportFiles {

  val defaultExtensions: Seq[String] = Seq("xlsx", "xls", "parquet", "csv")

  def list(dir: String, extensions: Seq[String] = defaultExtensions,
      skipOutputPrefixes: Seq[String] = Seq("~")): Seq[Path] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return Seq.empty
    val exts = extensions.map("." + _.toLowerCase)
    val stream = Files.list(d) // must close: holds a directory fd
    try stream.iterator().asScala
      .filter(Files.isRegularFile(_))
      .filter { p =>
        val name = p.getFileName.toString
        val lower = name.toLowerCase
        exts.exists(lower.endsWith) && !skipOutputPrefixes.exists(name.startsWith)
      }
      .toSeq.sortBy(_.getFileName.toString)
    finally stream.close()
  }

  /** The Overview-extractor variant: additionally skips prior outputs
    * (TransferOverviewExtractor.java:173-180).
    */
  def listSkippingOverviewOutputs(dir: String,
      extensions: Seq[String] = defaultExtensions): Seq[Path] =
    list(dir, extensions, skipOutputPrefixes = Seq("~", "Transfer-Overview-", "Overview-"))
}
