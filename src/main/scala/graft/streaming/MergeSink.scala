package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, hash, lit, max, pmod}

import graft.model.TransferSchema.epochCol
import graft.ops.Upsert

/** Keyed-merge parquet sink: the cross-batch analog of the reference's
  * `INSERT OR REPLACE` into one database — successive batches CONVERGE on
  * one row per key instead of appending (re-ingesting the same report is
  * idempotent, as with the reference's re-runs — SURVEY.md §2.8).
  *
  * State layout: parquet partitioned by `_bucket` = hash(upsert key) mod
  * `numBuckets`. Every row of a given key lands in exactly one bucket, so a
  * per-bucket keyed upsert equals the global one. A merge touches ONLY the
  * buckets the incoming batch hashes into — dynamic partition overwrite
  * replaces just those directories and leaves every other bucket's files
  * untouched (byte-identical). Cost per batch is O(batch + dirty-bucket
  * state), not O(total state): the property a 100 TB keyed table needs from
  * its drop-folder cadence.
  *
  * Cross-batch ordering: each merge stamps the batch with a strictly
  * increasing `_epoch` (persisted in a `_graft_meta` sidecar; underscore
  * files are invisible to Spark's file index). Within the upsert, epoch
  * dominates the arrival order (TransferSchema.arrivalOrderAsc), so a
  * re-shipped key whose per-batch sequence restarted still loses to nothing
  * and beats every earlier epoch — the reference's wall-clock insert order
  * across runs.
  *
  * Visibility: partition overwrite commits per-bucket, so a concurrent
  * reader can observe some buckets new and some old mid-merge (the previous
  * whole-directory swap had its own no-directory window). Crash recovery is
  * re-running the merge: the keyed upsert is idempotent. On a real
  * deployment the same call site targets a table format (Delta/Iceberg
  * `MERGE INTO`) for snapshot-atomic visibility.
  */
object MergeSink {

  private val bucketColName = "_bucket"

  /** Merge `resolved` (post-pipeline rows carrying arrival-order metadata)
    * into the keyed state at `statePath`. Returns the new state row count.
    */
  def merge(spark: SparkSession, resolved: DataFrame, statePath: String,
      numBuckets: Int = 64): Long = {
    val state = new Path(statePath)
    val fs = state.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a flat (pre-bucketing) state directory is MIGRATED, never clobbered
    if (fs.exists(state) && !fs.exists(metaFile(state)) &&
        !fs.listStatus(state).exists(_.getPath.getName.startsWith(bucketColName + "=")) &&
        fs.listStatus(state).exists(_.getPath.getName.startsWith("part-")))
      migrateLegacy(spark, fs, state, statePath, numBuckets)
    // "state exists" = it has the sidecar or at least one bucket dir — a
    // merely-created empty directory is a fresh state, not a crash
    val exists = fs.exists(state) && (fs.exists(metaFile(state)) ||
      fs.listStatus(state).exists(_.getPath.getName.startsWith(bucketColName + "=")))
    val (epoch, prevTotal) = readMeta(fs, state, spark, statePath, exists)
    // RESERVE the new epoch before touching data: if the data write crashes
    // mid-way, the next (different) batch gets a strictly later epoch and
    // can never tie with the crashed batch's partially-written rows. The
    // total in the sidecar is advisory until the post-write update lands —
    // the `reserved` flag makes readMeta recount from data instead of
    // trusting it, so a crash can't make the persisted total drift forever.
    if (exists) writeMeta(fs, state, epoch + 1, prevTotal, finalized = false)

    // bucket by the upsert key's hash: same key → same bucket, always
    val withBucket = resolved
      .withColumn(epochCol, lit(epoch + 1))
      .withColumn(bucketColName,
        pmod(hash(col("file_name"), col("target_file_id")), lit(numBuckets)))

    // buckets this batch touches — bounded by numBuckets, safe to collect
    val dirty = withBucket.select(bucketColName).distinct()
      .collect().map(_.getInt(0)).toSeq

    val merged =
      if (exists) {
        // partition pruning: only the dirty buckets' files are read
        val dirtyState = spark.read.parquet(statePath)
          .filter(col(bucketColName).isin(dirty: _*))
          .persist()
        val prevDirty = dirtyState.count()
        // allowMissingColumns: a legacy-migrated state still carries
        // _arrival_seq while post-r2 batches don't (and vice versa for a
        // seq-carrying input). Safe: _epoch dominates arrivalOrderAsc, so a
        // null _arrival_seq never decides a winner across epochs.
        val m = Upsert(dirtyState.unionByName(withBucket, allowMissingColumns = true)).persist()
        m.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(bucketColName)
          .parquet(statePath)
        val total = prevTotal - prevDirty + m.count()
        dirtyState.unpersist(); m.unpersist()
        total
      } else {
        val m = Upsert(withBucket).persist()
        m.write.mode("overwrite").partitionBy(bucketColName).parquet(statePath)
        val total = m.count()
        m.unpersist()
        total
      }
    writeMeta(fs, state, epoch + 1, merged)
    merged
  }

  /** Current (epoch, total rows). Prefers the sidecar; falls back to a scan
    * with a null-guard (empty-but-existing state ⇒ epoch 0, count 0) so a
    * state directory with zero rows never throws.
    *
    * A `reserved` (non-finalized) sidecar means the previous merge crashed
    * between the epoch reservation and the post-write update: the epoch
    * reservation is still honored (that's its point — no tie with the
    * crashed batch's partial rows), but the advisory total is stale, so the
    * real count comes from a data scan instead.
    */
  private def readMeta(fs: org.apache.hadoop.fs.FileSystem, state: Path,
      spark: SparkSession, statePath: String, exists: Boolean): (Long, Long) = {
    if (!exists) return (0L, 0L)
    val meta = metaFile(state)
    if (fs.exists(meta)) {
      val in = fs.open(meta)
      val line = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      line.split(',') match {
        case Array(e, t) => (e.toLong, t.toLong) // pre-flag format: finalized
        case Array(e, t, "f") => (e.toLong, t.toLong)
        case Array(e, _, "r") =>
          val (scanEpoch, scanCount) = scanMeta(spark, statePath)
          (math.max(e.toLong, scanEpoch), scanCount)
        case _ => scanMeta(spark, statePath)
      }
    } else scanMeta(spark, statePath)
  }

  private def scanMeta(spark: SparkSession, statePath: String): (Long, Long) = {
    val df = spark.read.parquet(statePath)
    val row = df.agg(coalesce(max(col(epochCol)), lit(0L)), org.apache.spark.sql.functions.count(lit(1))).head()
    (row.getLong(0), row.getLong(1))
  }

  private def writeMeta(fs: org.apache.hadoop.fs.FileSystem, state: Path,
      epoch: Long, total: Long, finalized: Boolean = true): Unit = {
    val flag = if (finalized) "f" else "r"
    val out = fs.create(metaFile(state), true)
    try out.write(s"$epoch,$total,$flag".getBytes("UTF-8")) finally out.close()
  }

  private def metaFile(state: Path) = new Path(state, "_graft_meta")

  /** One-time in-place migration of a pre-bucketing (flat parquet) state
    * directory into the bucketed layout: stamp `_epoch` 1, bucket by the
    * upsert-key hash, rewrite via staging + directory swap, then record the
    * sidecar. Without this, the fresh-state branch's `mode(overwrite)`
    * would silently clobber previously merged rows.
    */
  private def migrateLegacy(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, state: Path, statePath: String,
      numBuckets: Int): Unit = {
    val stamped = spark.read.parquet(statePath)
      .withColumn(epochCol, lit(1L))
      .withColumn(bucketColName,
        pmod(hash(col("file_name"), col("target_file_id")), lit(numBuckets)))
      .persist()
    val staging = new Path(statePath + "._migrate")
    fs.delete(staging, true)
    stamped.write.mode("overwrite").partitionBy(bucketColName).parquet(staging.toString)
    val n = stamped.count()
    stamped.unpersist()
    val old = new Path(statePath + "._old")
    fs.delete(old, true)
    fs.rename(state, old)
    fs.rename(staging, state)
    fs.delete(old, true)
    writeMeta(fs, state, 1L, n)
  }
}
