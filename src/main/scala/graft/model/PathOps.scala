package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression implementations of the reference's path/naming laws
  * (SQLiteDirectImporter.java:935-982). All pure `Column → Column` — they
  * compile to built-in Catalyst expressions (split/size/substring/regexp),
  * stay inside whole-stage codegen, and push no UDF into the hot path.
  */
object PathOps {

  /** Path with a single leading '/' removed — the reference's `cleanPath`
    * (SQLiteDirectImporter.java:958).
    */
  private def cleanPath(c: Column): Column = regexp_replace(c, "^/", "")

  /** Depth of a path (SQLiteDirectImporter.java:954-965): strip one leading
    * '/', then count '/'-separated segments; null/blank/empty → 0.
    *
    * Java's `String.split("/")` drops TRAILING empty segments but keeps
    * leading/middle ones ("a//b" → 3, "a///" → 1, "//" → 0); Spark's `split`
    * keeps all, so we strip trailing slashes first and special-case the
    * all-slashes string.
    */
  def level(c: Column): Column = {
    val clean = regexp_replace(cleanPath(c), "/+$", "")
    when(c.isNull || trim(c) === "" || clean === "", lit(0))
      .otherwise(size(split(clean, "/")))
      .cast("int")
  }

  /** Parent folder (SQLiteDirectImporter.java:967-982): null when level ≤ 1;
    * else the substring before the LAST '/' provided its index > 0. The
    * leading '/' is stripped for the level test but KEPT in the returned
    * parent ("/a/b" → "/a"; "//a" → "/").
    */
  def parentFolder(c: Column): Column = {
    // 0-based index of the last '/' = length - position-from-end
    val lastSlashIdx = length(c) - locate("/", reverse(c))
    when(level(c) <= 1, lit(null).cast("string"))
      .otherwise(when(lastSlashIdx > 0, substring(c, lit(1), lastSlashIdx))
        .otherwise(lit(null).cast("string")))
  }

  /** Job name from a workbook file name (SQLiteDirectImporter.java:935-943):
    * strip a lowercase `.xlsx`/`.xls` extension (case-SENSITIVE — `.XLSX`
    * survives, as in the reference), trim; null/blank → "Unknown".
    */
  def jobName(c: Column): Column =
    when(c.isNull || trim(c) === "", lit("Unknown"))
      .otherwise(trim(regexp_replace(c, "\\.(xlsx|xls)$", "")))

  /** Breadcrumb path step used by the hierarchy traversal
    * (SQLiteDirectImporter.java:908): `parentPath || ' > ' || fileName`.
    */
  def breadcrumb(parentPath: Column, fileName: Column): Column =
    concat(parentPath, lit(" > "), fileName)

  /** View-name sanitizer (SQLiteDirectImporter.java:921-930): null/blank input
    * → "unknown"; else lowercase, any char outside [a-z0-9_] → '_', collapse
    * runs of '_', strip edge '_'. The result CAN be empty (e.g. "!!!") — the
    * caller skips view creation for empty names (SQLiteDirectImporter.java:894).
    * Plan-time (driver-side) string function — it names dynamic views, it
    * never runs per-row.
    */
  def sanitizeViewName(s: String): String = {
    if (s == null || s.trim.isEmpty) return "unknown"
    s.toLowerCase
      .replaceAll("[^a-z0-9_]", "_")
      .replaceAll("_+", "_")
      .replaceAll("^_|_$", "")
  }
}
