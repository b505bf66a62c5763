package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.TransferSchema._

/** Row-level error tolerance (A6 / SURVEY.md §7.5 item 8): the reference
  * skips bad rows and keeps going, logging every failure and a warning each
  * 100 (SQLiteDirectImporter.java:487-507, 620-639). In a declarative
  * engine, value-level failures already degrade to NULL (P2/P3 coercion);
  * what remains are STRUCTURALLY unusable rows. Those go to a quarantine
  * frame — a queryable error channel with a reason column — instead of
  * stderr.
  */
object Quarantine {

  /** A row is structurally unusable when it carries no identity at all:
    * both upsert-key cells empty (the reference would insert it, but it can
    * never be addressed or resolved — and a padded short row
    * (SQLiteDirectImporter.java:460-464) of all-empty cells is exactly this
    * shape).
    */
  def invalidReason: Column =
    when(trim(col("file_name")) === "" && trim(col("target_file_id")) === "",
      lit("empty_key: file_name and target_file_id both blank"))
      .otherwise(lit(null).cast("string"))

  /** (good, quarantined-with-reason). One narrow pass, no shuffle. */
  def split(raw: DataFrame): (DataFrame, DataFrame) = {
    val tagged = raw.withColumn("_quarantine_reason", invalidReason)
    (tagged.filter(col("_quarantine_reason").isNull).drop("_quarantine_reason"),
      tagged.filter(col("_quarantine_reason").isNotNull))
  }
}
