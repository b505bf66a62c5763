package graft.ingest

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import graft.model.TransferSchema._
import graft.pipeline.Pipeline

/** The dependency-free legacy `.xls` (CFB + BIFF8) reader (S3) against real
  * hand-assembled workbooks from [[XlsFixture]]: shared strings (plain,
  * CONTINUE-split between strings and mid-string), RK/MULRK packing,
  * NUMBER doubles, booleans, sparse cells, sheet predicate, header skip —
  * and full pipeline equivalence with the parquet adapter.
  */
class XlsSpec extends SparkSpec {
  import spark.implicits._

  private def dataRow(fn: String, size: String, id: String, status: String,
      serial: String): Seq[String] =
    Seq(fn, size, "", id, "", "", serial, "", "", "", "", "", "", "", "",
      status, "", "", "")

  private val jobARows = Seq(
    dataRow("Root", "0", "1001", "success", "45000.5"),
    dataRow("Root/Sub", "", "1002", "success", "0"),
    dataRow("Root/Sub/a.pdf", "2048", "1003", "match-exists", "45123.25"),
    dataRow("Root/Sub/b.pdf", "abc", "1004", "filtered", "notadate"),
    dataRow("/lead/slash.txt", "10", "1005", "success", ""),
    dataRow("Root/Sub/a.pdf", "4096", "1003", "success", ""),
    dataRow("Orphan/child.txt", "5", "1006", "weird status!", ""),
    dataRow("", "0", "1007", "", ""))
  private val jobBRows = Seq(
    dataRow("Root", "0", "1001", "resent", ""),
    dataRow("/lead", "0", "1008", "success", ""))

  test("xls pipeline end-to-end equals the parquet adapter result") {
    val dir = Files.createTempDirectory("graft-xls").toString
    XlsFixture.write(new File(dir, "JobA.xls"), Seq(
      "Transfer Report" -> (Seq(excelHeaders) ++ jobARows),
      "Summary" -> Seq(Seq("junk"), Seq("1"))))
    XlsFixture.write(new File(dir, "JobB.xls"), Seq(
      "Transfer Report 2" -> (Seq(excelHeaders) ++ jobBRows)))

    // job_name derives from "JobA.xls"/"JobB.xls" → same JobA/JobB as the
    // parquet fixture's .xlsx names (extension strip is the law under test)
    val viaXls = Pipeline.run(spark, dir, XlsRawSource)

    val pqDir = Files.createTempDirectory("graft-xls-pq").toString
    graft.pipeline.PipelineFixture.raw(spark).write.mode("overwrite").parquet(pqDir)
    val viaParquet = Pipeline.run(spark, pqDir)

    assert(viaXls.count() === viaParquet.count())
    val cols = Seq("file_name", "file_status", "source_file_size", "creation_time",
      "level", "parent_folder", "parent_id", "job_name")
    val a = viaXls.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toSeq).toSet
    val b = viaParquet.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("scanRows: sheet predicate, RK/MULRK/NUMBER/boolean/sparse cells") {
    val dir = Files.createTempDirectory("graft-xls-scan").toString
    val f = new File(dir, "W.xls")
    XlsFixture.write(f, Seq(
      "Transfer Report" -> Seq(
        Seq("H1", "H2", "H3", "H4", "H5", "H6"),
        // 3 consecutive ints → MULRK; a double → NUMBER; bool; sparse gap
        Seq("7", "8", "9", "45000.5", "TRUE", "text"),
        Seq("alpha", "", "", "-12", "", "0.25")),
      "Notes" -> Seq(Seq("skip", "me"))))
    val rows = Xls.scanRows(f, _.startsWith("Transfer Report")).toVector
    assert(rows.map(_._1).distinct === Vector("Transfer Report"))
    assert(rows.map(_._2) === Vector(0L, 1L, 2L))
    assert(rows(1)._3.toSeq === Seq("7", "8", "9", "45000.5", "TRUE", "text"))
    assert(rows(2)._3.toSeq === Seq("alpha", "", "", "-12", "", "0.25"))
  }

  test("SST CONTINUE splits: between strings and mid-string") {
    val dir = Files.createTempDirectory("graft-xls-sst").toString
    val longA = "alpha-" + ("x" * 40)
    val longB = "beta-" + ("y" * 40)
    val rows = Seq("Transfer Report" -> Seq(Seq(longA, longB, "gamma")))
    // budget 20: header+few chars of longA fit → MID-STRING split
    val f1 = new File(dir, "mid.xls")
    XlsFixture.write(f1, rows, sstSplitAt = Some(20))
    assert(Xls.scanRows(f1, _ => true).toVector.head._3.toSeq ===
      Seq(longA, longB, "gamma"))
    // budget exactly after longA: header of longB would straddle →
    // BETWEEN-STRINGS split (8 preamble + 3 header + 46 chars = 57)
    val f2 = new File(dir, "between.xls")
    XlsFixture.write(f2, rows, sstSplitAt = Some(58))
    assert(Xls.scanRows(f2, _ => true).toVector.head._3.toSeq ===
      Seq(longA, longB, "gamma"))
  }

  test("rk decoding laws") {
    assert(Xls.decodeRk((12345 << 2) | 2) === "12345") // int
    assert(Xls.decodeRk((-7 << 2) | 2) === "-7") // negative int (30-bit sign)
    assert(Xls.decodeRk((12345 << 2) | 3) === "123.45") // int / 100
    assert(Xls.decodeRk((123400 << 2) | 3) === "1234") // /100 → integral
    // high 32 bits of an IEEE double: 2048.0
    val bits = java.lang.Double.doubleToLongBits(2048.0)
    assert(Xls.decodeRk(((bits >>> 32) & 0xFFFFFFFCL).toInt) === "2048")
  }

  test("per-file tolerance: a corrupt workbook is skipped, good files survive") {
    val dir = Files.createTempDirectory("graft-wb-corrupt").toString
    XlsFixture.write(new File(dir, "Good.xls"), Seq(
      "Transfer Report" -> (Seq(excelHeaders) ++ Seq(dataRow("G/ok.txt", "1", "1", "s1", "")))))
    // truncated garbage with a workbook extension
    Files.write(new File(dir, "Bad.xls").toPath, Array.fill[Byte](600)(0x42))
    Files.write(new File(dir, "AlsoBad.xlsx").toPath, "not a zip".getBytes)
    val out = Pipeline.run(spark, dir, WorkbookRawSource)
    assert(out.count() === 1)
    assert(out.head.getAs[String]("file_name") === "G/ok.txt")
  }

  test("property: arbitrary cell strings round-trip BIFF8 fixture → reader verbatim") {
    import org.scalacheck.Gen
    val tricky = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOfN(6, Gen.oneOf('a', 'é', '中', 'ß', '€', ' ', '_')).map(_.mkString),
      Gen.const("0123"), Gen.const("1.50"), Gen.const("TRUE"),
      Gen.const("45000.5"), Gen.const("-12"), Gen.const(""))
    // seeded pureApply: deterministic fixture, no sample-returns-None flake
    val rows: Seq[Seq[String]] = Gen.listOfN(50, Gen.listOfN(3, tricky))
      .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L))
      // an all-empty row has no cell records at all and would (correctly)
      // vanish on read — keep every generated row observable
      .map(r => if (r.forall(_.isEmpty)) r.updated(0, "x") else r)
    val dir = Files.createTempDirectory("graft-xls-prop").toString
    val f = new File(dir, "prop.xls")
    XlsFixture.write(f, Seq("Transfer Report" -> rows))
    val got = Xls.scanRows(f, _ => true).toVector.map(_._3.toSeq)
    got.zip(rows).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g.padTo(3, "") === e, s"row $i")
    }
  }

  test("combined WorkbookRawSource dispatches by extension") {
    val dir = Files.createTempDirectory("graft-wb-mixed").toString
    XlsFixture.write(new File(dir, "Old.xls"), Seq(
      "Transfer Report" -> (Seq(excelHeaders) ++ Seq(dataRow("A/x.txt", "1", "1", "s1", "")))))
    XlsxFixture.write(new File(dir, "New.xlsx"), Seq(
      "Transfer Report" -> (Seq(excelHeaders) ++ Seq(dataRow("B/y.txt", "2", "2", "s2", "")))))
    val out = Pipeline.run(spark, dir, WorkbookRawSource)
    assert(out.select("file_name").as[String].collect().toSet === Set("A/x.txt", "B/y.txt"))
    assert(out.filter($"file_name" === "A/x.txt").head.getAs[String]("job_name") === "Old")
  }

  test("CfbWriter: round-trip across the mini/regular cutoff and sector boundaries") {
    // every interesting size: empty, one byte, mini-sector edges (64),
    // the 4096 mini cutoff itself and both neighbors, sector edges (512),
    // and a multi-sector stream — plus a non-ASCII stream name (UTF-16LE)
    val sizes = Seq(0, 1, 63, 64, 65, 511, 512, 513, 4095, 4096, 4097, 10240)
    val streams = sizes.zipWithIndex.map { case (n, i) =>
      s"s${i}_π" -> Array.tabulate[Byte](n)(j => ((j * 31 + i) % 251).toByte)
    }
    val container = CfbWriter.write(streams)
    assert(Cfb.allStreams(container).map(_._1) === streams.map(_._1))
    streams.foreach { case (name, bytes) =>
      assert(Cfb.readStream(container, Seq(name)).get.toSeq === bytes.toSeq, name)
    }
    // the writer's directory tree is walkable: root-level view sees all
    assert(Cfb.rootStreams(container).map(_._1) === streams.map(_._1))
    assert(!Cfb.hasStorages(container))
  }

  test("CfbWriter: zero-length stream start sector is ENDOFCHAIN, not the neighbour's") {
    // a 0-sector stream must not point at the NEXT stream's first mini
    // sector — a reader that walks the miniFAT chain (rather than trusting
    // size) would read the neighbour's data
    val next = Array[Byte](1, 2, 3)
    val container = CfbWriter.write(Seq(
      "EmptyOne" -> Array.empty[Byte], "NextData" -> next))
    val base = container.indexOfSlice("EmptyOne".getBytes("UTF-16LE"))
    assert(base > 0, "directory entry for EmptyOne not found")
    val buf = java.nio.ByteBuffer.wrap(container).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(buf.getInt(base + 116) === 0xFFFFFFFE, "empty stream start must be ENDOFCHAIN")
    assert(Cfb.readStream(container, Seq("EmptyOne")).get.isEmpty)
    assert(Cfb.readStream(container, Seq("NextData")).get.toSeq === next.toSeq)
  }

  test("CfbWriter: directory sibling tree is collation-sorted and balanced") {
    // insertion order deliberately violates CFB collation (length, then
    // uppercased code-unit compare)
    val names = Seq("Workbook", "SummaryInformation", "Tiny", "b", "AZ", "a2", "Book")
    val container = CfbWriter.write(names.map(n => n -> Array[Byte](n.length.toByte)))
    // in-order walk of the sibling tree (Cfb.rootStreams) = collation order
    assert(Cfb.rootStreams(container).map(_._1) === names.sortWith(CfbWriter.nameLt))
    // collation law spot checks: length first, then case-insensitive code units
    assert(CfbWriter.nameLt("Tiny", "Workbook"))           // 4 < 8
    assert(CfbWriter.nameLt("b", "AZ") && CfbWriter.nameLt("a2", "AZ")) // 1<2; A2<AZ
    assert(!CfbWriter.nameLt("workbook", "WORKBOOK") && !CfbWriter.nameLt("WORKBOOK", "workbook"))
    // tree is height-balanced: slots are root + insertion order, contiguous
    // dir sectors (writer layout); depth over sibling ids ≤ ceil(log2(n+1))
    val buf = java.nio.ByteBuffer.wrap(container).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dirStart = buf.getInt(48)
    def entryBase(slot: Int): Int = 512 + (dirStart + slot / 4) * 512 + (slot % 4) * 128
    def sib(slot: Int, off: Int): Int = buf.getInt(entryBase(slot) + off)
    def depth(id: Int): Int =
      if (id < 0) 0 else 1 + math.max(depth(sib(id, 68)), depth(sib(id, 72)))
    val rootChild = sib(0, 76)
    assert(depth(rootChild) <= 3, s"7-node tree must have depth ≤ 3, got ${depth(rootChild)}")
  }

  test("CfbWriter round-trips mini-stream and regular-FAT streams through Cfb") {
    val small = ("payload-α " * 20).getBytes("UTF-8")          // < 4096 → ministream
    val big = Array.tabulate[Byte](9001)(i => (i % 251).toByte) // ≥ 4096 → regular FAT
    val tiny = Array[Byte](1, 2, 3)
    val container = CfbWriter.write(Seq(
      "Workbook" -> big, "SummaryInformation" -> small, "Tiny" -> tiny))
    assert(Cfb.readStream(container, Seq("Workbook")).get.toSeq === big.toSeq)
    assert(Cfb.readStream(container, Seq("SummaryInformation")).get.toSeq === small.toSeq)
    assert(Cfb.readStream(container, Seq("Tiny")).get.toSeq === tiny.toSeq)
    assert(Cfb.allStreams(container).map(_._1) ===
      Seq("Workbook", "SummaryInformation", "Tiny"))
  }

  test(".xls Overview artifact extraction: only Overview survives, cells intact") {
    // the reference's legacy leg (TransferOverviewExtractor.java:487-526):
    // load, remove every other sheet, rewrite the container
    val dir = Files.createTempDirectory("graft-xls-ov").toString
    val overviewRows = Seq(
      Seq("Job", "Files", "Status"),
      Seq("JobA", "120", "success"),
      Seq("JobB", "7", "partial"),
      Seq("", "42.5", "TRUE")) // sparse + number + boolean cells survive
    val src = new File(dir, "Report.xls")
    XlsFixture.write(src, Seq(
      "Transfer Report" -> (Seq(excelHeaders) ++ jobARows),
      "Overview" -> overviewRows,
      "Summary" -> Seq(Seq("junk"))))

    val out = OverviewExtract.extract(src).get
    assert(out.getName === "Transfer-Overview-Report.xls")

    // re-read with the BIFF reader: exactly one sheet, named Overview,
    // with the original cell content
    val wb = Xls.workbookStream(out)
    assert(Xls.sheetRefs(wb).map(_.name) === Seq("Overview"))
    val got = Xls.scanRows(out, _ => true).toVector
    assert(got.map(_._1).toSet === Set("Overview"))
    got.foreach { case (_, idx, cells) =>
      assert(cells.padTo(3, "").toSeq === overviewRows(idx.toInt), s"row $idx")
    }
    assert(got.size === overviewRows.size)

    // a workbook without an Overview sheet is skipped (reference logs+skips)
    val noOv = new File(dir, "None.xls")
    XlsFixture.write(noOv, Seq("Transfer Report" -> Seq(Seq("x"))))
    assert(OverviewExtract.extract(noOv).isEmpty)
  }
}
