package graft.ingest

import java.io.{File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import scala.collection.mutable

/** Writes REAL .xlsx workbooks (plain JDK zip + hand-built OOXML) for the
  * reader/extractor tests: shared strings, inline strings, numeric cells,
  * sparse cells, multiple sheets. Kept dumb and explicit — it is the test's
  * independent model of the file format, not a copy of the reader's logic.
  */
object XlsxFixture {

  private val numeric = "^-?[0-9]+(\\.[0-9]+)?$".r

  /** One sheet: (name, rows); row cells are raw strings. Encoding choices:
    * numeric-looking → numeric cell, "" → cell omitted (sparse), every 3rd
    * string → inline string, rest → shared string.
    */
  def write(file: File, sheets: Seq[(String, Seq[Seq[String]])],
      extraEntries: Seq[(String, Array[Byte])] = Nil): Unit = {
    val sst = mutable.LinkedHashMap.empty[String, Int]
    def sstIdx(s: String): Int = sst.getOrElseUpdate(s, sst.size)

    def colRef(c: Int): String = {
      var n = c + 1
      val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }

    def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

    // build sheet XMLs first so the shared-string table is complete
    var strCount = 0
    val sheetXmls = sheets.map { case (_, rows) =>
      val sb = new StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      rows.zipWithIndex.foreach { case (cells, ri) =>
        sb.append(s"""<row r="${ri + 1}">""")
        cells.zipWithIndex.foreach { case (v, ci) =>
          val ref = colRef(ci) + (ri + 1)
          if (v == null || v.isEmpty) () // sparse: omit the cell entirely
          else if (numeric.findFirstIn(v).isDefined)
            sb.append(s"""<c r="$ref"><v>$v</v></c>""")
          else {
            strCount += 1
            if (strCount % 3 == 0)
              sb.append(s"""<c r="$ref" t="inlineStr"><is><t>${esc(v)}</t></is></c>""")
            else
              sb.append(s"""<c r="$ref" t="s"><v>${sstIdx(v)}</v></c>""")
          }
        }
        sb.append("</row>")
      }
      sb.append("</sheetData></worksheet>")
      sb.toString
    }

    val workbook = {
      val sheetsXml = sheets.zipWithIndex.map { case ((name, _), i) =>
        s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>$sheetsXml</sheets></workbook>"""
        .stripMargin.replace("\n", "")
    }
    val rels = {
      val rs = sheets.indices.map { i =>
        s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
      }.mkString
      val sstRel = s"""<Relationship Id="rId${sheets.size + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>"""
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rs$sstRel</Relationships>"""
        .stripMargin.replace("\n", "")
    }
    val sharedStrings = {
      val sis = sst.keys.map(s => s"<si><t>${esc(s)}</t></si>").mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sst.size}" uniqueCount="${sst.size}">$sis</sst>"""
        .stripMargin.replace("\n", "")
    }
    val contentTypes = {
      val overrides = sheets.indices.map { i =>
        s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>$overrides<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/></Types>"""
        .stripMargin.replace("\n", "")
    }
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""
        .stripMargin.replace("\n", "")

    val zos = new ZipOutputStream(new FileOutputStream(file))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    try {
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", rels)
      put("xl/sharedStrings.xml", sharedStrings)
      sheetXmls.zipWithIndex.foreach { case (xml, i) =>
        put(s"xl/worksheets/sheet${i + 1}.xml", xml)
      }
      extraEntries.foreach { case (name, bytes) =>
        zos.putNextEntry(new ZipEntry(name)); zos.write(bytes); zos.closeEntry()
      }
    } finally zos.close()
  }
}
