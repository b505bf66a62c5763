package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.PathOps
import graft.model.TransferSchema._

/** Recursive hierarchy traversal (J2) — the reference's `hierarchy_children`
  * view (`WITH RECURSIVE`, SQLiteDirectImporter.java:902-912; SCHEMA.sql:71-81):
  * anchor = rows with `parent_id IS NULL` at depth 0 with `path = file_name`;
  * step = child rows joined on `parent_id = parent.target_file_id`, depth+1,
  * path appended with `' > '`; result ordered by path.
  *
  * Spark has no recursive-CTE logical node, so this is an iterative driver
  * fixpoint (SURVEY.md §4): the LOOP lives on the driver but every step is a
  * distributed join — no data ever collects to the driver. Each iteration
  * `localCheckpoint`s the frontier to cut lineage growth (plan size, not
  * data, is the thing that blows up). Depth is capped (the reference's SQLite
  * view would spin forever on a cycle; we stop and return what we have).
  *
  * Scale notes: the child side is the full table re-scanned per level — at
  * 100 TB the scan is cached once (`persist`) and the join key
  * (`parent_id`) is a shuffle-hash join per level; file-system forests are
  * shallow (depth ~10-20), so the iteration count is small and bounded by
  * `maxDepth`. The frontier is usually ≪ table size, so AQE converts the
  * per-level join to broadcast when it fits.
  *
  * Output columns: `file_name, target_file_id, parent_id, level, depth, path`
  * (the reference also carries its SQLite rowid `id`; we have no rowid — see
  * SURVEY.md §1.2).
  */
object Hierarchy {

  def apply(df: DataFrame, maxDepth: Int = 64): DataFrame = {
    val nodes = df.select(
      col("file_name"), col("target_file_id"),
      col(parentIdCol).try_cast("long").as(parentIdCol), // TEXT column, numeric compare (SQLite affinity)
      col(levelCol)).persist()
    // every level's frontier is an EAGER localCheckpoint, so by the time
    // buildTree returns nothing references the cached nodes lazily —
    // unpersisting here is safe and frees executor storage immediately
    try buildTree(nodes, maxDepth).orderBy("path")
    finally nodes.unpersist(blocking = false)
  }

  private def buildTree(nodes: DataFrame, maxDepth: Int): DataFrame = {
    var frontier = nodes
      .filter(col(parentIdCol).isNull)
      .withColumn("depth", lit(0))
      .withColumn("path", col("file_name"))
      .localCheckpoint()
    val children = nodes.filter(col(parentIdCol).isNotNull)
    var acc = frontier
    var depth = 0
    var growing = !frontier.isEmpty
    while (growing && depth < maxDepth) {
      val next = children.as("t")
        .join(frontier.select(col("target_file_id").as("_pid"), col("path").as("_ppath"),
          col("depth").as("_pdepth")),
          col(s"t.$parentIdCol") === col("_pid"))
        .select(col("t.file_name"), col("t.target_file_id"), col(s"t.$parentIdCol"),
          col(s"t.$levelCol"),
          (col("_pdepth") + 1).as("depth"),
          PathOps.breadcrumb(col("_ppath"), col("t.file_name")).as("path"))
        .localCheckpoint()
      if (next.isEmpty) growing = false
      else {
        acc = acc.union(next)
        frontier = next
        depth += 1
      }
    }
    acc
  }
}
