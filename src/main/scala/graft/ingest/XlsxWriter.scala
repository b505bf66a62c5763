package graft.ingest

import java.io.{File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.DataFrame

/** Minimal streaming .xlsx writer — the sink twin of [[Xlsx]] (JDK zip +
  * hand-built OOXML, no POI): one sheet, header row, all cells inline
  * (no shared-string table ⇒ single pass, O(row) memory). Gives the
  * reference's users a workbook EXPORT for report outputs; the distributed
  * canonical store remains parquet (SURVEY.md §2.7) — this is for
  * bounded, human-facing artifacts, written driver-side like the
  * reference's own workbook outputs.
  */
object XlsxWriter {

  private val numeric = "^-?[0-9]+(\\.[0-9]+)?$".r

  private def colRef(c: Int): String = {
    var n = c + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  def write(file: File, sheetName: String, header: Seq[String],
      rows: Iterator[Seq[String]]): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(file))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    // OOXML escaping first (XML 1.0 cannot carry control chars: they become
    // _xHHHH_; a literal _xHHHH_ protects its own underscore as _x005F_ —
    // via LOOKAHEAD, so overlapping runs sharing an underscore are each
    // protected), then XML entity escaping. '\r' MUST be escaped: XML 1.0
    // line-ending normalization silently turns a raw CR into LF on read.
    def esc(s: String): String = {
      val oox0 = s.replaceAll("_(?=x[0-9A-Fa-f]{4}_)", "_x005F_")
      val oox =
        if (oox0.forall(c => c >= ' ' || c == '\t' || c == '\n')) oox0
        else oox0.flatMap(c =>
          if (c < ' ' && c != '\t' && c != '\n') f"_x${c.toInt}%04X_"
          else c.toString)
      oox.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace("\"", "&quot;")
    }
    try {
      put("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        """</Types>""")
      put("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>""")
      put("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        s"""<sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>""")
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        """</Relationships>""")
      zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
      val w = new java.io.OutputStreamWriter(zos, StandardCharsets.UTF_8)
      w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      var ri = 1
      (Iterator.single(header) ++ rows).foreach { cells =>
        w.write(s"""<row r="$ri">""")
        cells.zipWithIndex.foreach { case (v, ci) =>
          val ref = colRef(ci) + ri
          // empty cells are omitted; the explicit r= refs keep positions.
          // numeric cells ONLY for strings that are the canonical General
          // rendering of their value — "0123" or "1.50" would come back as
          // "123"/"1.5" and break round-trips of string-typed keys
          if (v == null || v.isEmpty) ()
          else if (numeric.findFirstIn(v).isDefined && Xlsx.formatGeneral(v) == v)
            w.write(s"""<c r="$ref"><v>$v</v></c>""")
          else
            w.write(s"""<c r="$ref" t="inlineStr"><is><t>${esc(v)}</t></is></c>""")
        }
        w.write("</row>")
        ri += 1
      }
      w.write("</sheetData></worksheet>")
      w.flush()
      zos.closeEntry()
    } finally zos.close()
  }

  /** Export a bounded DataFrame (a report/view result, not a fact table) as
    * one workbook sheet; values rendered via Spark's own string casts.
    */
  def writeFrame(df: DataFrame, file: File, sheetName: String = "Report"): Unit = {
    val cols = df.columns.toSeq
    val it = df.toLocalIterator()
    val rows = new Iterator[Seq[String]] {
      override def hasNext: Boolean = it.hasNext
      override def next(): Seq[String] = {
        val r = it.next()
        cols.indices.map { i => val v = r.get(i); if (v == null) "" else v.toString }
      }
    }
    write(file, sheetName, cols, rows)
  }
}
