package graft.tools

import java.io.File

import graft.ingest.{Xls, Xlsx}

/** Workbook structure inspector — the dependency-free twin of the
  * reference's third tool (InspectColumnsStreaming.java:37-115): streams
  * each sheet of an `.xlsx`/`.xls`, prints sheet names, flags the
  * `Transfer Report*` sheets, and dumps the header row plus the first few
  * data rows with per-cell column positions (§2.10 introspection).
  *
  * `sbt "runMain graft.tools.InspectColumns <workbook> [maxRows]"`
  */
object InspectColumns {

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      println("Usage: runMain graft.tools.InspectColumns <workbook.xlsx|.xls> [maxRows]")
      return
    }
    val file = new File(args(0))
    val maxRows = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    require(file.exists(), s"File not found: $file")
    println(s"Inspecting workbook (streaming): ${file.getName}")
    println("=" * 56)

    val isXlsx = file.getName.toLowerCase.endsWith(".xlsx")
    val sheetNames =
      if (isXlsx) {
        val zf = new java.util.zip.ZipFile(file)
        try Xlsx.sheetRefs(zf).map(_.name) finally zf.close()
      } else Xls.sheetRefs(Xls.workbookStream(file)).map(_.name)

    sheetNames.zipWithIndex.foreach { case (name, i) =>
      println(s"\n--- Sheet ${i + 1}: $name ---")
      if (!name.startsWith("Transfer Report")) {
        println("Not a Transfer Report sheet - skipping")
      } else {
        println("This is a Transfer Report sheet - inspecting structure:")
        val rows =
          if (isXlsx) Xlsx.scanRows(file, _ == name)
          else Xls.scanRows(file, _ == name)
        rows.take(maxRows).foreach { case (_, rowIdx, cells) =>
          val label = if (rowIdx == 0) "Row 1 (headers)" else s"Row ${rowIdx + 1}"
          println(s"\n$label:")
          cells.zipWithIndex.foreach { case (v, c) =>
            if (v.nonEmpty) println(f"  [col ${c + 1}%2d] $v")
          }
        }
        println(s"Inspection complete for sheet: $name")
      }
    }
  }
}
