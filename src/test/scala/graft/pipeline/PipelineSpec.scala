package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.Coerce
import graft.model.TransferSchema._
import graft.ops.{Enrich, Hierarchy, Parents, Upsert}
import graft.views.Analytic

/** The FIXTURES.md §A synthetic transfer-report fixture — shared by the
  * pipeline and streaming suites.
  */
object PipelineFixture {
  /** (file_name, src_size, tgt_id, file_status, creation_serial) + meta. */
  private def rawRow(fn: String, size: String, id: String, status: String,
      serial: String, src: String, seq: Long): Row =
    Row.fromSeq(Seq(fn, size, "", id, "", "", serial, "", "", "", "", "", "",
      "", "", status, "", "", "", src, "Transfer Report", seq, seq))

  def raw(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val rows = Seq(
      rawRow("Root", "0", "1001", "success", "45000.5", "JobA.xlsx", 1L),
      rawRow("Root/Sub", "", "1002", "success", "0", "JobA.xlsx", 2L),
      rawRow("Root/Sub/a.pdf", "2048", "1003", "match-exists", "45123.25", "JobA.xlsx", 3L),
      rawRow("Root/Sub/b.pdf", "abc", "1004", "filtered", "notadate", "JobA.xlsx", 4L),
      rawRow("/lead/slash.txt", "10", "1005", "success", "", "JobA.xlsx", 5L),
      // dup of row 3: later arrival, different status → must win
      rawRow("Root/Sub/a.pdf", "4096", "1003", "success", "", "JobA.xlsx", 6L),
      rawRow("Orphan/child.txt", "5", "1006", "weird status!", "", "JobA.xlsx", 7L),
      rawRow("", "0", "1007", "", "", "JobA.xlsx", 8L),
      // cross-file re-ship of Root (JobB arrives later) → JobB's row wins
      rawRow("Root", "0", "1001", "resent", "", "JobB.xlsx", 9L),
      rawRow("/lead", "0", "1008", "success", "", "JobB.xlsx", 10L))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), rawSchema)
  }
}

/** End-to-end over the FIXTURES.md §A synthetic transfer-report fixture —
  * the reference's input contract (19 positional strings, empty-never-null),
  * checked against the reference's documented acceptance queries
  * (SCHEMA.sql:92-101).
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val raw: DataFrame = PipelineFixture.raw(spark)

  private lazy val resolved: DataFrame = Pipeline.resolve(Enrich(Coerce(raw))).cache()

  test("coerce: bigint strictness and serial dates") {
    val typed = Coerce(raw)
    val bySeq = typed.orderBy(arrivalSeqCol).collect()
    assert(bySeq(0).getAs[Long]("source_file_size") === 0L)
    assert(bySeq(1).getAs[Any]("source_file_size") === null) // "" → null
    assert(bySeq(3).getAs[Any]("source_file_size") === null) // "abc" → null
    assert(bySeq(0).getAs[java.sql.Timestamp]("creation_time").toString
      === "2023-03-15 12:00:00.0")
    assert(bySeq(1).getAs[Any]("creation_time") === null) // serial 0 → null
    assert(bySeq(3).getAs[Any]("creation_time") === null) // unparsable → null
    // text columns: empty string preserved, never null
    assert(bySeq(1).getAs[String]("source_account") === "")
  }

  test("upsert: last-writer-wins per (file_name, target_file_id)") {
    val r = resolved
    assert(r.count() === 8) // 10 raw rows, 2 dup keys collapse
    val a = r.filter($"file_name" === "Root/Sub/a.pdf").head
    assert(a.getAs[String]("file_status") === "success") // seq 6 beat seq 3
    assert(a.getAs[Long]("source_file_size") === 4096L)  // whole row replaced
    val root = r.filter($"file_name" === "Root").head
    assert(root.getAs[String]("file_status") === "resent") // JobB beat JobA
    assert(root.getAs[String](jobNameCol) === "JobB")
  }

  test("enrich: level, parent_folder, job_name") {
    val m = resolved.select("file_name", "level", "parent_folder", "job_name")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("Root").getAs[Int]("level") === 1)
    assert(m("Root").getAs[Any]("parent_folder") === null)
    assert(m("Root/Sub/a.pdf").getAs[Int]("level") === 3)
    assert(m("Root/Sub/a.pdf").getAs[String]("parent_folder") === "Root/Sub")
    assert(m("/lead/slash.txt").getAs[Int]("level") === 2)
    assert(m("/lead/slash.txt").getAs[String]("parent_folder") === "/lead")
    assert(m("").getAs[Int]("level") === 0)
    assert(m("Root").getAs[String]("job_name") === "JobB") // winning row came from JobB
  }

  test("parents: broadcast self-join fills parent_id; miss stays null") {
    val m = resolved.select("file_name", "parent_id").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(m("Root/Sub") === Some("1001"))
    assert(m("Root/Sub/a.pdf") === Some("1002"))
    assert(m("Root/Sub/b.pdf") === Some("1002"))
    assert(m("/lead/slash.txt") === Some("1008")) // parent "/lead" exists via JobB
    assert(m("Orphan/child.txt") === None) // unmatched parent
    assert(m("Root") === None) // level-1 rows have no parent_folder
  }

  test("status_summary: conditional counts + Unknown coalesce + desc order") {
    val rows = Analytic.statusSummary(resolved).collect()
    val byName = rows.map(r => r.getString(0) -> r).toMap
    // statuses: resent(Root), success(Root/Sub, a.pdf-winner, /lead/slash.txt,
    // /lead), match-exists replaced; filtered, weird status!, "" (empty ≠ NULL)
    assert(byName("success").getAs[Long]("record_count") === 4)
    assert(byName("success").getAs[Long]("file_count") === 2) // a.pdf 4096, slash.txt 10
    assert(byName("success").getAs[Long]("folder_count") === 2) // Root/Sub null-size, /lead 0
    assert(byName("").getAs[Long]("record_count") === 1) // empty string ≠ NULL → no coalesce
    assert(!byName.contains("match-exists"))
    // ordered by record_count desc
    assert(rows.head.getString(0) === "success")
  }

  test("files/folders views partition the table") {
    val files = Analytic.filesView(resolved)
    val folders = Analytic.foldersView(resolved)
    assert(files.count() + folders.count() === resolved.count())
    assert(files.select("file_name").as[String].collect().toSet
      === Set("Root/Sub/a.pdf", "/lead/slash.txt", "Orphan/child.txt"))
    // null-size rows (parse failures) land in folders_view
    assert(folders.filter($"file_name" === "Root/Sub/b.pdf").count() === 1)
  }

  test("dynamic status views: sanitized names; blank status → status_unknown") {
    // "" is NOT NULL, so it passes the reference's DISTINCT filter and its
    // blank-input sanitize yields "unknown" (SQLiteDirectImporter.java:888-899,
    // 921-930) → a fifth view, status_unknown, filtering file_status = ''.
    val views = Analytic.statusViews(resolved).toMap
    assert(views.keySet === Set("status_resent", "status_success", "status_filtered",
      "status_weird_status", "status_unknown"))
    assert(views("status_weird_status").count() === 1)
    assert(views("status_unknown").head.getAs[String]("file_name") === "")
  }

  test("hierarchy: depth, breadcrumb path, path order") {
    val h = Hierarchy(resolved)
    val rows = h.select("file_name", "depth", "path").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val byName = rows.groupBy(_._1)
    assert(byName("Root").head._2 === 0)
    assert(byName("Root/Sub").head._2 === 1)
    assert(byName("Root/Sub/a.pdf").head._3 === "Root > Root/Sub > Root/Sub/a.pdf")
    assert(byName("Root/Sub/b.pdf").head._2 === 2)
    val paths = h.select("path").as[String].collect()
    assert(paths.toSeq === paths.sorted) // ORDER BY path
  }

  test("hierarchy: rows with null parent_id are anchors (reference semantics)") {
    val h = Hierarchy(resolved)
    // Orphan/child.txt: parent unresolved → parent_id NULL → anchor depth 0
    assert(h.filter($"file_name" === "Orphan/child.txt").head.getAs[Int]("depth") === 0)
  }

  test("stats: one-pass totals") {
    val s = Analytic.stats(resolved).head
    assert(s.getAs[Long]("total_records") === 8)
    assert(s.getAs[Long]("file_count") === 3)
    assert(s.getAs[Long]("folder_count") === 5)
  }

  test("upsert idempotence: resolve(resolve(x)) == resolve(x)") {
    val once = Upsert(Enrich(Coerce(raw)))
    val twice = Upsert(once)
    assert(once.count() === twice.count())
  }

  test("upsert: NULL target_file_id rows never conflict (SQLite UNIQUE semantics)") {
    // two rows, same file_name, both with unparsable ("" → NULL) ids: SQLite's
    // UNIQUE(file_name, target_file_id) sees no conflict — both survive
    val rows = Seq(
      Row.fromSeq(Seq("Dup/x.txt", "1", "", "", "", "", "", "", "", "", "", "", "",
        "", "", "s1", "", "", "", "JobA.xlsx", "Transfer Report", 1L, 1L)),
      Row.fromSeq(Seq("Dup/x.txt", "2", "", "", "", "", "", "", "", "", "", "", "",
        "", "", "s2", "", "", "", "JobA.xlsx", "Transfer Report", 2L, 2L)),
      Row.fromSeq(Seq("Dup/y.txt", "3", "", "77", "", "", "", "", "", "", "", "", "",
        "", "", "s3", "", "", "", "JobA.xlsx", "Transfer Report", 3L, 3L)),
      Row.fromSeq(Seq("Dup/y.txt", "4", "", "77", "", "", "", "", "", "", "", "", "",
        "", "", "s4", "", "", "", "JobA.xlsx", "Transfer Report", 4L, 4L)))
    val df = Upsert(Enrich(Coerce(
      spark.createDataFrame(sc.parallelize(rows), rawSchema))))
    assert(df.filter($"file_name" === "Dup/x.txt").count() === 2) // NULL ids: both kept
    val y = df.filter($"file_name" === "Dup/y.txt")
    assert(y.count() === 1) // same non-null id: last wins
    assert(y.head.getAs[String]("file_status") === "s4")
  }
}
