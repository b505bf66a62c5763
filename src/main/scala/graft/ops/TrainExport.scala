package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** JSONL training-data export — the handoff format every trainer reads.
  *
  * One JSON object per line via `to_json(struct(...))` (codegen'd, no UDF),
  * written as text and directory-partitioned by the split/shard columns so a
  * trainer reads `split=train/shard=3/` straight from the layout without
  * scanning the rest. Shard files arrive in [[Splits.shuffleShards]] `pos`
  * order when the input is sorted within partitions, so the on-disk line
  * order IS the deterministic training order.
  *
  * Scale shape: a narrow per-row projection + a write partitioned by
  * low-cardinality columns — no shuffle beyond what the caller's ordering
  * already did. Compression comes from the standard text-sink codec option.
  */
object TrainExport {

  /** Write `df` as JSONL under `outDir`, one directory level per column in
    * `partitionBy` (those columns become directory keys and are NOT repeated
    * inside the JSON payload).
    */
  def writeJsonl(df: DataFrame, outDir: String,
      partitionBy: Seq[String] = Seq("split"), codec: Option[String] = None): Unit = {
    val payloadCols = df.columns.filterNot(partitionBy.contains)
      .map(col).toSeq
    val out = df.select(
      (partitionBy.map(col) :+ to_json(struct(payloadCols: _*)).as("value")): _*)
    val w = out.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*)
    codec.fold(w)(c => w.option("compression", c)).text(outDir)
  }
}
