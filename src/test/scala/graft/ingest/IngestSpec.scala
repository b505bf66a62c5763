package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.TransferSchema._
import graft.pipeline.PipelineFixture
import graft.report.Report

class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("ReportFiles: extension case-insensitivity, temp-skip, sorted order") {
    val dir = Files.createTempDirectory("graft-files")
    Seq("B.xlsx", "a.XLSX", "c.xls", "~lock.xlsx", "notes.txt", "d.parquet",
      "Overview-old.xlsx").foreach(n => Files.createFile(dir.resolve(n)))
    Files.createDirectory(dir.resolve("sub.xlsx")) // directories never match
    val names = ReportFiles.list(dir.toString).map(_.getFileName.toString)
    assert(names === Seq("B.xlsx", "Overview-old.xlsx", "a.XLSX", "c.xls", "d.parquet"))
    val skipped = ReportFiles.listSkippingOverviewOutputs(dir.toString)
      .map(_.getFileName.toString)
    assert(!skipped.contains("Overview-old.xlsx"))
  }

  test("SheetExtract: sheet prefix filter + per-source artifact layout") {
    val raw = PipelineFixture.raw(spark)
      // plant an Overview sheet row alongside the Transfer Report rows
      .union(spark.createDataFrame(sc.parallelize(Seq(
        Row.fromSeq(Seq("ov-row", "", "", "", "", "", "", "", "", "", "", "", "",
          "", "", "", "", "", "", "JobA.xlsx", "Overview", 99L, 99L)))), rawSchema))
    assert(SheetExtract.sheet(raw, "Overview").count() === 1)
    assert(SheetExtract.sheet(raw, "Transfer Report").count() === 10)
    val out = Files.createTempDirectory("graft-sheet").toString
    SheetExtract.writePerSource(raw, "Transfer Report", out)
    val back = spark.read.parquet(out)
    assert(back.count() === 10)
    assert(back.select(srcFileCol).distinct().as[String].collect().toSet
      === Set("JobA.xlsx", "JobB.xlsx"))
  }

  test("Quarantine: all-blank-key rows rejected with reason; rest untouched") {
    val raw = PipelineFixture.raw(spark)
      .union(spark.createDataFrame(sc.parallelize(Seq(
        // padded short row: every key cell empty → structurally unusable
        Row.fromSeq(Seq("", "", "", "", "x", "", "", "", "", "", "", "", "",
          "", "", "", "", "", "", "JobA.xlsx", "Transfer Report", 50L, 50L)))), rawSchema))
    val (good, bad) = Quarantine.split(raw)
    assert(bad.count() === 1)
    assert(bad.head.getAs[String]("_quarantine_reason").startsWith("empty_key"))
    // note: fixture row 8 has file_name "" but target_file_id "1007" → keyable → good
    assert(good.count() === 10)
  }

  test("Report: stats + top statuses + quarantine count") {
    val (resolved, bad) = {
      val (g, b) = Quarantine.split(PipelineFixture.raw(spark))
      (graft.pipeline.Pipeline.resolve(
        graft.ops.Enrich(Coerce(g))), b)
    }
    val s = Report.collect(resolved, Some(bad))
    assert(s.totalRecords === 8)
    assert(s.fileCount === 3 && s.folderCount === 5)
    assert(s.topStatuses.head._1 === "success")
    assert(s.quarantined === 0)
    val lines = Report.render(s)
    assert(lines.exists(_.contains("total records : 8")))
  }
}
