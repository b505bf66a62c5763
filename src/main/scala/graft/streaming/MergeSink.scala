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
    *
    * The incoming batch's `_arrival_seq` is REBASED above the state's max:
    * sequences restart per report batch, so without the epoch bump a stale
    * state row with an equal-or-higher seq would beat the newer arrival and
    * the update would be silently discarded. Within-batch order is
    * preserved; batches become strictly later epochs — matching the
    * reference's wall-clock insert order across runs.
    */
  def merge(spark: SparkSession, resolved: DataFrame, statePath: String): Long = {
    import org.apache.spark.sql.functions.{col, lit, max}
    import graft.model.TransferSchema.arrivalSeqCol
    val hconf = spark.sparkContext.hadoopConfiguration
    val state = new Path(statePath)
    val fs = state.getFileSystem(hconf)
    val merged =
      if (fs.exists(state)) {
        val existing = spark.read.parquet(statePath)
        val epoch = existing.agg(max(col(arrivalSeqCol))).head().getLong(0)
        val rebased = resolved.withColumn(arrivalSeqCol, col(arrivalSeqCol) + lit(epoch))
        Upsert(existing.union(rebased))
      } else Upsert(resolved)
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
