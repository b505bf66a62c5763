package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins, expressed Spark-first
  * (compositions of union/window/bucket-join — no custom physical operator
  * needed, no cross join anywhere):
  *
  *   - [[asof]]: nearest-prior match per key — ONE keyed shuffle: tag both
  *     sides, union, and let a `last(_, ignoreNulls)` running window carry
  *     the latest right payload forward onto each left row. This is the
  *     scalable form — a per-row probe or a range theta-join would be
  *     O(n·m) or a cartesian; the union-window is O((n+m) log) within
  *     hash partitions.
  *   - [[rangeJoin]]: points joined to intervals via BUCKETIZATION: each
  *     interval explodes to the fixed-width buckets it covers, each point
  *     maps to exactly one bucket, and the join key becomes
  *     (key, bucket) — an equi hash join whose fanout is interval-length /
  *     bucket-width, never |points| × |intervals|.
  */
object TemporalJoin {

  /** For each left row: the single latest right row with `rightTs ≤ leftTs`
    * on the same key (inclusive, like DuckDB/kdb ASOF). Right payload
    * columns arrive as `<prefix><name>`, null when no prior right row
    * exists. `right` must be unique per (key, ts) — pre-dedup a tied side
    * (e.g. keep max event id per timestamp) for a deterministic winner.
    */
  def asof(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val leftStruct = struct(left.columns.map(col): _*)
    val payloadType = right.select(struct(payload.map(col): _*).as("_payload"))
      .schema("_payload").dataType
    val l = left.select(
      key.map(col) ++ Seq(
        col(leftTs).as("_ts"), lit(1).as("_side"),
        lit(null).cast(payloadType).as("_payload"),
        leftStruct.as("_left")): _*)
    val r = right.select(
      key.map(col) ++ Seq(
        col(rightTs).as("_ts"), lit(0).as("_side"),
        struct(payload.map(col): _*).as("_payload"),
        lit(null).cast(l.schema("_left").dataType).as("_left")): _*)
    // right sorts BEFORE left at equal ts → ties are inclusive (ts ≤ ts)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = r.unionByName(l)
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val leftCols = left.columns.map(c => col("_left").getField(c).as(c))
    val matchCols = payload.map(p => col("_match").getField(p).as(prefix + p))
    out.select(leftCols ++ matchCols: _*)
  }

  /** Points joined to half-open intervals `[start, end)` per key. Output:
    * every (point row, interval row) pair in containment, columns from both
    * sides (interval columns prefixed). `bucketSeconds` tunes fanout —
    * each interval is replicated once per covered bucket, so pick it near
    * the typical interval length.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: Seq[String],
      pointTs: String, startCol: String, endCol: String,
      intervalPayload: Seq[String], bucketSeconds: Long,
      prefix: String = "ivl_"): DataFrame = {
    val bucketMicros = bucketSeconds * 1000000L
    val p = points.withColumn("_bucket",
      expr(s"unix_micros($pointTs) div ${bucketMicros}L"))
    val i = intervals
      .filter(col(endCol) > col(startCol)) // empty intervals match nothing
      .withColumn("_bucket", explode(sequence(
        expr(s"unix_micros($startCol) div ${bucketMicros}L"),
        // end is EXCLUSIVE: the last covered bucket holds end - 1µs
        expr(s"(unix_micros($endCol) - 1) div ${bucketMicros}L"))))
      .select((key.map(c => col(c).as(s"_k_$c")) :+ col("_bucket")) ++
        Seq(col(startCol).as("_start"), col(endCol).as("_end")) ++
        intervalPayload.map(c => col(c).as(prefix + c)): _*)
    val joinCond = key.map(c => p(c) === i(s"_k_$c"))
      .reduce(_ && _) && p("_bucket") === i("_bucket") &&
      p(pointTs) >= i("_start") && p(pointTs) < i("_end")
    // a point has exactly ONE bucket, so each containment pair appears once
    p.join(i, joinCond)
      .drop("_bucket").drop(key.map(c => s"_k_$c"): _*)
      .drop("_start", "_end")
  }
}
