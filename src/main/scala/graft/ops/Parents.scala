package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.TransferSchema._

/** Parent-id resolution (J1): the reference builds an in-memory map
  * `file_name → target_file_id` over rows with non-null id, then updates each
  * row whose `parent_folder` hits the map (SQLiteDirectImporter.java:797-860).
  * That hand-rolled build/probe IS a broadcast hash left-outer equi-join, so
  * here it is one.
  *
  * Two semantic quirks replicated exactly (SURVEY.md §7.5 item 2):
  *   - the build map keeps the LAST `(file_name → target_file_id)` inserted
  *     (map overwrite, SQLiteDirectImporter.java:810) → we reduce the build
  *     side to one row per `file_name` by `max_by` over the arrival order
  *     ([[graft.model.TransferSchema.arrivalOrderAsc]] as an orderable
  *     struct — no global sequence materialized) before joining;
  *   - a miss leaves `parent_id` NULL (left-outer).
  *
  * Scale: the build side is `distinct file_name` of folder-bearing rows —
  * orders of magnitude smaller than the table; `broadcast()` pins the
  * broadcast-hash strategy so the big side never shuffles. If the dimension
  * ever outgrew the driver, dropping the hint degrades gracefully to a
  * shuffled hash join with identical semantics.
  */
object Parents {

  def apply(df: DataFrame): DataFrame = {
    // struct comparison is lexicographic by field → the arrival-order cols
    // wrapped in one struct give max_by a total "latest arrival" order
    val ordered = df.select(col("file_name"), col("target_file_id"),
      struct(arrivalOrderAsc(df.columns.toSeq): _*).as("_ord"))
    // last-write-wins map build: one (file_name → target_file_id) per name
    val parents = ordered
      .filter(col("target_file_id").isNotNull) // null-guard, SQLiteDirectImporter.java:802
      .groupBy(col("file_name").as("_parent_name"))
      .agg(max_by(col("target_file_id"), col("_ord")).as("_resolved_pid"))
    df.drop(parentIdCol)
      .join(broadcast(parents), col(parentFolderCol) === col("_parent_name"), "left")
      .withColumn(parentIdCol, col("_resolved_pid").cast("string"))
      .drop("_parent_name", "_resolved_pid")
  }
}
