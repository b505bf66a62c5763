package graft.ingest

import java.io.{File, FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.regex.Pattern
import java.util.zip.{ZipEntry, ZipFile, ZipInputStream, ZipOutputStream}

/** Workbook-subset sink with ARTIFACT fidelity (K4): copies the "Overview"
  * sheet of a workbook into a standalone .xlsx, preserving styles, themes,
  * charts, drawings and media — a faithful re-implementation of the
  * reference's ZIP-level surgery (TransferOverviewExtractor.java:303-395,
  * 427-478) on JDK zip alone:
  *
  *   - essential parts copied verbatim ([Content_Types].xml, _rels/.rels,
  *     docProps/, sharedStrings, styles, theme, media, drawings, charts);
  *   - `xl/workbook.xml` rewritten to keep only the Overview `<sheet>`
  *     (its sheetId forced to 1), `xl/_rels/workbook.xml.rels` rewritten to
  *     drop the other worksheet relationships — the same regex surgery the
  *     reference performs (ibid.:438-446, 470-474);
  *   - only the Overview worksheet part and its own rels are carried over.
  *
  * Output naming matches the reference: `Transfer-Overview-<file>.xlsx`
  * beside the source (TransferOverviewExtractor.java:130-151), so
  * [[ReportFiles.listSkippingOverviewOutputs]] skips prior outputs on
  * re-runs. Driver-side file surgery, like the reference — the data-level
  * distributed form is [[SheetExtract]].
  */
object OverviewExtract {

  val defaultSheetName = "Overview"

  /** Extract `sheetName` from `input` into `Transfer-Overview-<name>` with
    * the source's own extension (or `output` if given). Dispatches by
    * format like the reference's extractFromXLSX/extractFromXLS pair
    * (TransferOverviewExtractor.java:279-296): zip surgery for `.xlsx`,
    * BIFF + CFB surgery for legacy `.xls`. Returns the output path, or
    * None when the workbook has no such sheet (the reference logs and
    * skips, ibid.:270-276).
    */
  def extract(input: File, output: Option[File] = None,
      sheetName: String = defaultSheetName): Option[File] =
    if (input.getName.toLowerCase.endsWith(".xls"))
      extractXls(input, output, sheetName)
    else {
      val part = sheetPartName(input, sheetName)
      part.map { p =>
        val sheetFile = p.substring(p.lastIndexOf('/') + 1)
        val out = output.getOrElse(
          new File(input.getParentFile, s"Transfer-Overview-${input.getName}"))
        copySubset(input, out, sheetFile, sheetName)
        out
      }
    }

  /** Legacy `.xls` leg (TransferOverviewExtractor.java:487-526: load,
    * remove every non-Overview sheet, rewrite): [[Xls.subsetWorkbookStream]]
    * performs the BIFF surgery, [[CfbWriter]] rebuilds the container with
    * every OTHER stream (SummaryInformation, CompObj, …) carried over
    * verbatim — the artifact keeps its document properties, not just the
    * sheet data.
    */
  def extractXls(input: File, output: Option[File] = None,
      sheetName: String = defaultSheetName): Option[File] = {
    val container = java.nio.file.Files.readAllBytes(input.toPath)
    val wb = Xls.workbookStream(container)
    Xls.subsetWorkbookStream(wb, sheetName).map { newWb =>
      // ROOT-level streams only: [[CfbWriter]] writes a flat container, and
      // flattening nested storages (VBA projects, embedded OLE) would
      // collide names and orphan their structure — drop them with a
      // visible note instead (the reference's POI path drops VBA from
      // extracted artifacts too; the sheet data itself never lives in a
      // nested storage)
      if (Cfb.hasStorages(container))
        System.err.println(s"[overview] ${input.getName}: nested storages " +
          "(macros/OLE) are not carried into the extracted artifact")
      val streams = Cfb.rootStreams(container).map {
        case (n, _) if n == "Workbook" || n == "Book" => n -> newWb
        case s => s
      }
      val out = output.getOrElse(
        new File(input.getParentFile, s"Transfer-Overview-${input.getName}"))
      java.nio.file.Files.write(out.toPath, CfbWriter.write(streams))
      out
    }
  }

  /** The worksheet part path for the sheet named `sheetName` (exact match,
    * TransferOverviewExtractor.java:259), e.g. "xl/worksheets/sheet3.xml".
    */
  private def sheetPartName(input: File, sheetName: String): Option[String] = {
    val zf = new ZipFile(input)
    try Xlsx.sheetRefs(zf).find(_.name == sheetName).map(_.entry)
    finally zf.close()
  }

  private def copySubset(input: File, output: File, sheetFile: String,
      sheetName: String): Unit = {
    val zis = new ZipInputStream(new FileInputStream(input))
    val zos = new ZipOutputStream(new FileOutputStream(output))
    try {
      val buf = new Array[Byte](8192)
      var entry: ZipEntry = zis.getNextEntry
      var sawWorkbook = false
      var sawSheet = false
      while (entry != null) {
        val name = entry.getName
        if (name == "[Content_Types].xml" || name == "_rels/.rels" ||
            name.startsWith("docProps/") || name == "xl/sharedStrings.xml" ||
            name == "xl/styles.xml" || name == "xl/theme/theme1.xml" ||
            name.startsWith("xl/media/") || name.startsWith("xl/drawings/") ||
            name.startsWith("xl/charts/")) {
          copyEntry(zis, zos, name, buf)
        } else if (name == "xl/workbook.xml") {
          writeEntry(zos, name, rewriteWorkbook(readAll(zis), sheetName))
          sawWorkbook = true
        } else if (name == "xl/_rels/workbook.xml.rels") {
          writeEntry(zos, name, rewriteRels(readAll(zis), sheetFile))
        } else if (name.startsWith("xl/worksheets/_rels/") && name.endsWith(".xml.rels")) {
          if (name.substring(name.lastIndexOf('/') + 1)
              .replace(".xml.rels", ".xml") == sheetFile)
            copyEntry(zis, zos, name, buf)
        } else if (name.startsWith("xl/worksheets/") && name.endsWith(".xml")) {
          if (name.substring(name.lastIndexOf('/') + 1) == sheetFile) {
            copyEntry(zis, zos, name, buf)
            sawSheet = true
          }
        }
        zis.closeEntry()
        entry = zis.getNextEntry
      }
      require(sawWorkbook, "xlsx missing xl/workbook.xml")
      require(sawSheet, s"worksheet part not found: $sheetFile")
    } finally { zis.close(); zos.close() }
  }

  /** Keep only the target `<sheet>` element; force its sheetId to 1
    * (TransferOverviewExtractor.java:438-446). Element-wise rewrite rather
    * than the reference's single regex: OOXML attribute order is not fixed
    * (name may follow sheetId from non-Excel producers), and paired
    * `<sheet ...></sheet>` forms must not survive as dangling entries.
    */
  private[ingest] def rewriteWorkbook(xml: String, sheetName: String): String = {
    val el = Pattern.compile("<sheet\\b[^>]*/>|<sheet\\b[^>]*>.*?</sheet>", Pattern.DOTALL)
    val m = el.matcher(xml)
    val sb = new StringBuffer
    val nameAttr = s"""name="${escAttr(sheetName)}""""
    while (m.find()) {
      val e = m.group()
      val out =
        if (e.contains(nameAttr)) e.replaceAll("""sheetId="[^"]*"""", """sheetId="1"""")
        else ""
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(out))
    }
    m.appendTail(sb)
    sb.toString
  }

  private def escAttr(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;")

  /** Drop worksheet relationships that don't target the kept sheet
    * (TransferOverviewExtractor.java:470-474) — element-wise, any attribute
    * order, relative or absolute Target form.
    */
  private[ingest] def rewriteRels(xml: String, sheetFile: String): String = {
    val el = Pattern.compile("<Relationship\\b[^>]*/>")
    val m = el.matcher(xml)
    val sb = new StringBuffer
    val keepTargets = Seq(
      s"""Target="worksheets/$sheetFile"""",
      s"""Target="/xl/worksheets/$sheetFile"""")
    while (m.find()) {
      val e = m.group()
      val isWorksheet = e.contains("""/worksheet"""")
      val out = if (isWorksheet && !keepTargets.exists(e.contains)) "" else e
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(out))
    }
    m.appendTail(sb)
    sb.toString
  }

  private def readAll(zis: ZipInputStream): String = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = zis.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = zis.read(buf) }
    out.toString(StandardCharsets.UTF_8)
  }

  private def copyEntry(zis: ZipInputStream, zos: ZipOutputStream,
      name: String, buf: Array[Byte]): Unit = {
    zos.putNextEntry(new ZipEntry(name))
    var n = zis.read(buf)
    while (n > 0) { zos.write(buf, 0, n); n = zis.read(buf) }
    zos.closeEntry()
  }

  private def writeEntry(zos: ZipOutputStream, name: String, content: String): Unit = {
    zos.putNextEntry(new ZipEntry(name))
    zos.write(content.getBytes(StandardCharsets.UTF_8))
    zos.closeEntry()
  }
}
