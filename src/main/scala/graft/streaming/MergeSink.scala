package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Upsert

/** Keyed-merge parquet sink: the cross-batch analog of the reference's
  * `INSERT OR REPLACE` into one database — successive batches CONVERGE on
  * one row per key instead of appending (re-ingesting the same report is
  * idempotent, as with the reference's re-runs — SURVEY.md §2.8).
  *
  * Mechanics: union the incoming resolved batch with current state, re-run
  * the keyed last-wins upsert on `_arrival_seq`, write to a staging dir,
  * then atomically swap directories. The swap gives readers
  * all-or-nothing visibility on a filesystem with atomic rename.
  *
  * Scale notes: this is the portable-parquet form of a table-format MERGE —
  * on a real deployment the same call site targets Delta/Iceberg
  * `MERGE INTO`, which replaces the full-state rewrite with file-level
  * upserts. State is re-shuffled once per batch on the upsert key; for
  * drop-folder cadences (bounded batches over a large keyed table) prefer
  * the table-format path.
  */
object MergeSink {

  /** Merge `resolved` (post-pipeline rows carrying `_arrival_seq`) into the
    * keyed state at `statePath`. Returns the new state row count.
    */
  def merge(spark: SparkSession, resolved: DataFrame, statePath: String): Long = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val state = new Path(statePath)
    val fs = state.getFileSystem(hconf)
    val merged =
      if (fs.exists(state)) Upsert(spark.read.parquet(statePath).union(resolved))
      else Upsert(resolved)
    val staging = new Path(statePath + "._staging")
    fs.delete(staging, true)
    merged.write.parquet(staging.toString)
    val n = spark.read.parquet(staging.toString).count()
    val old = new Path(statePath + "._old")
    fs.delete(old, true)
    if (fs.exists(state)) fs.rename(state, old)
    fs.rename(staging, state)
    fs.delete(old, true)
    n
  }
}
