package graft.views

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.PathOps
import graft.ops.Hierarchy

/** The reference's analytic surface (SQLiteDirectImporter.java:865-916;
  * SCHEMA.sql:48-101) as pure `DataFrame → DataFrame` functions, plus a
  * `registerAll` that binds them as temp views under the reference's names.
  * The SQLite database's "queryable artifact" role is played by these views
  * (+ Parquet output from the pipeline).
  */
object Analytic {

  /** `files_view`: rows with `source_file_size > 0` (P12,
    * SQLiteDirectImporter.java:869-870).
    */
  def filesView(df: DataFrame): DataFrame =
    df.filter(col("source_file_size") > 0)

  /** `folders_view`: `source_file_size = 0 OR IS NULL` (P13, ibid.:873-874).
    * NULL here means the size cell failed bigint parse — distinct from the
    * never-null empty string of text columns.
    */
  def foldersView(df: DataFrame): DataFrame =
    df.filter(col("source_file_size") === 0 || col("source_file_size").isNull)

  /** `status_summary` (A1/P7/P8/O1, ibid.:877-885): group by
    * `COALESCE(file_status,'Unknown')`, conditional file/folder counts,
    * ordered by record_count desc. One hash-agg shuffle; partial aggregation
    * map-side is automatic.
    */
  def statusSummary(df: DataFrame): DataFrame =
    df.groupBy(coalesce(col("file_status"), lit("Unknown")).as("status_name"))
      .agg(
        count(lit(1)).as("record_count"),
        count(when(col("source_file_size") > 0, 1)).as("file_count"),
        count(when(col("source_file_size") === 0 || col("source_file_size").isNull, 1))
          .as("folder_count"))
      .orderBy(col("record_count").desc)

  /** Distinct non-null statuses (A3, ibid.:888) — drives the dynamic views.
    * Bounded collect: status cardinality is small by construction.
    */
  def distinctStatuses(df: DataFrame): Seq[String] =
    df.filter(col("file_status").isNotNull)
      .select(col("file_status")).distinct()
      .collect().map(_.getString(0)).toSeq

  /** Dynamic per-status frames (P14, ibid.:888-899): `status_<sanitized>` →
    * `WHERE file_status = '<s>'`. Sanitizer collisions resolve FIRST-wins
    * (`CREATE VIEW IF NOT EXISTS`, ibid.:894); empty sanitized names are
    * skipped. Data-dependent plan — SURVEY.md §7.5 item 5.
    */
  /** The view-NAMING law alone: sanitized `status_<s>` per status, FIRST
    * wins on sanitizer collisions, empty names skipped. Single source of
    * truth shared by [[statusViews]] and the registry's metric query —
    * sorted input: distinct().collect() order varies with partitioning,
    * which would make collision winners nondeterministic run-to-run (the
    * reference's winner is SQLite's arbitrary DISTINCT order; we pin
    * lexicographic order and document the divergence).
    */
  def statusViewNames(statuses: Seq[String]): Seq[(String, String)] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    statuses.sorted.foreach { s =>
      val name = PathOps.sanitizeViewName(s)
      if (name.nonEmpty && !out.contains(s"status_$name"))
        out(s"status_$name") = s
    }
    out.toSeq
  }

  def statusViews(df: DataFrame): Seq[(String, DataFrame)] =
    statusViewNames(distinctStatuses(df)).map { case (viewName, s) =>
      (viewName, df.filter(col("file_status") === lit(s)))
    }

  /** `hierarchy_children` (J2), ordered by path — see [[graft.ops.Hierarchy]]. */
  def hierarchyChildren(df: DataFrame): DataFrame = Hierarchy(df)

  /** Top-k statuses by count (O3, ibid.:1052-1057) — `TakeOrderedAndProject`,
    * no global sort.
    */
  def topStatuses(df: DataFrame, k: Int = 5): DataFrame =
    // status_name tiebreak: limit over a non-total order would make the
    // k-th entry nondeterministic under count ties
    statusSummary(df).orderBy(col("record_count").desc, col("status_name")).limit(k)

  /** Count-by-level histogram (A5; SCHEMA.sql:100). */
  def levelCounts(df: DataFrame): DataFrame =
    df.groupBy(col("level")).count().orderBy(col("level"))

  /** Count-by-job (A5; SCHEMA.sql:99). */
  def jobCounts(df: DataFrame): DataFrame =
    df.groupBy(col("job_name")).count().orderBy(col("count").desc)

  /** Global stats (A2, ibid.:1034-1048): total / files / folders in ONE pass
    * (the reference runs three scans; one conditional-count aggregate is the
    * Spark-native shape).
    */
  def stats(df: DataFrame): DataFrame =
    df.agg(
      count(lit(1)).as("total_records"),
      count(when(col("source_file_size") > 0, 1)).as("file_count"),
      count(when(col("source_file_size") === 0 || col("source_file_size").isNull, 1))
        .as("folder_count"))

  /** Bind the whole layer as temp views under the reference's names
    * (K3, ibid.:865-916). The base frame registers as `transfer_data`.
    */
  def registerAll(spark: SparkSession, df: DataFrame): Unit = {
    df.createOrReplaceTempView("transfer_data")
    filesView(df).createOrReplaceTempView("files_view")
    foldersView(df).createOrReplaceTempView("folders_view")
    statusSummary(df).createOrReplaceTempView("status_summary")
    hierarchyChildren(df).createOrReplaceTempView("hierarchy_children")
    statusViews(df).foreach { case (name, frame) => frame.createOrReplaceTempView(name) }
  }
}
