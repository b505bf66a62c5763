package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.views.Analytic

/** Final-statistics report (K6) — the reference's console summary
  * (SQLiteDirectImporter.java:1020-1062): total/file/folder counts and the
  * top-5 statuses, plus our quarantine channel count (A6). One aggregate
  * job + one top-k job; returns structured lines (structured logging
  * replaces the reference's emoji console UX — SURVEY.md §7.6).
  */
object Report {

  case class Stats(totalRecords: Long, fileCount: Long, folderCount: Long,
      topStatuses: Seq[(String, Long)], quarantined: Long)

  def collect(resolved: DataFrame, quarantined: Option[DataFrame] = None): Stats = {
    val s = Analytic.stats(resolved).head()
    val top = Analytic.topStatuses(resolved, 5)
      .select("status_name", "record_count")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    Stats(
      s.getAs[Long]("total_records"), s.getAs[Long]("file_count"),
      s.getAs[Long]("folder_count"), top,
      quarantined.map(_.count()).getOrElse(0L))
  }

  def render(s: Stats): Seq[String] =
    Seq(
      s"Database import completed",
      s"  total records : ${s.totalRecords}",
      s"  files         : ${s.fileCount}",
      s"  folders       : ${s.folderCount}",
      s"  quarantined   : ${s.quarantined}") ++
      (if (s.topStatuses.nonEmpty)
        "  top statuses  :" +: s.topStatuses.map { case (n, c) => f"    $n%-24s $c" }
      else Seq.empty)
}
