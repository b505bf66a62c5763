package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.PathOps
import graft.model.TransferSchema._

/** Derived-column stage (P4/P5/P6 + import metadata): adds `level`,
  * `parent_folder`, `job_name`, `import_timestamp`, and a null `parent_id`
  * placeholder (the reference inserts NULL and fills it in a later pass —
  * SQLiteDirectImporter.java:299-303, 544; we fill it in [[Parents]]).
  *
  * All narrow, per-row expressions — no shuffle.
  */
object Enrich {
  def apply(typed: DataFrame): DataFrame =
    typed
      .withColumn(levelCol, PathOps.level(col("file_name")))
      .withColumn(parentFolderCol, PathOps.parentFolder(col("file_name")))
      .withColumn(jobNameCol, PathOps.jobName(col(srcFileCol)))
      .withColumn(parentIdCol, lit(null).cast("string"))
      .withColumn(importTimestampCol, current_timestamp())
}
