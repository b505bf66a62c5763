package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: greedily fill fixed
  * token-budget bins ("packs") with documents, the standard step between
  * dedup/quality filtering and batch assembly — packed sequences waste no
  * padding tokens.
  *
  * Law (deterministic, oracle-checkable): documents are split into RANGES
  * by an integral range key (id boundaries, modulo classes, …); within a
  * range, docs are taken in id order and appended to the current pack
  * until the next doc would exceed `budget`, which starts a new pack. A
  * single doc larger than the budget gets its own pack. Pack identity is
  * `(range_id, pack_no)`.
  *
  * Scale shape: ranges are packed INDEPENDENTLY — one shuffle on the range
  * id, then a per-partition sorted sweep (mapPartitions; the sequential
  * fold is inherently order-dependent, so "globally sequential" would be a
  * single task — ranges are how packing parallelizes in practice, trading
  * at most one partially-filled pack per range). Boundaries are plan-time
  * literals; at 100 TB they come from equi-depth id quantiles.
  */
object Packing {

  /** Assign each doc to a pack: output (idCol, cost, range_id, pack_no,
    * pack_id) with `pack_id = range_id * 1e9 + pack_no` for a flat key.
    * `rangeCol` must be integral in [0, nRanges).
    */
  def packGreedy(df: DataFrame, idCol: String, costCol: Column, budget: Long,
      rangeCol: Column, nRanges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("_id"), costCol.cast("long").as("_cost"),
        rangeCol.cast("int").as("_range"))
      .repartition(nRanges, col("_range"))
      .sortWithinPartitions("_range", "_id")
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        // consecutive range groups within the partition: reset at changes.
        // EXACT fold law (mirrors the recursive-CTE oracle): the range's
        // first doc anchors pack 0; every later doc starts a new pack iff
        // acc + cost > budget — no acc>0 special case, so a zero-cost doc
        // at a pack start does NOT let an over-budget doc join its pack
        var curRange = -1
        var packNo = 0L
        var acc = 0L
        it.map { case (id, cost, range) =>
          if (range != curRange) { curRange = range; packNo = 0L; acc = cost }
          else if (acc + cost > budget) { packNo += 1; acc = cost }
          else acc += cost
          (id, cost, range, packNo, range.toLong * 1000000000L + packNo)
        }
      }
      .toDF("_id", "cost", "range_id", "pack_no", "pack_id")
      .withColumnRenamed("_id", idCol)
  }

  /** Range assignment from ascending id boundaries (plan-time literals; at
    * 100 TB these come from equi-depth id quantiles).
    */
  def packGreedyByBoundaries(df: DataFrame, idCol: String, costCol: Column,
      budget: Long, boundaries: Seq[Long]): DataFrame = {
    require(boundaries == boundaries.sorted, "boundaries must be ascending")
    val rangeId = boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(idCol) >= b, 1).otherwise(0)
    }
    packGreedy(df, idCol, costCol, budget, rangeId, boundaries.size + 1)
  }

  /** Length-bucketed batch assignment — dynamic-batching prep: group
    * similar-length documents so a batch pads to its own bucket's
    * ceiling instead of the corpus maximum (the standard
    * padding-efficiency trick for variable-length training). Bucket =
    * `len DIV bucketWidth` (integer), order within a bucket by the
    * deterministic shuffle key md5(salt‖id) (the [[Sampling]] survival-
    * hash law — reproducible, corpus-order-independent), then
    * `batch_idx = (rn−1) DIV batchSize`, `pos_in_batch = (rn−1) MOD
    * batchSize`. Every law is integer/hash arithmetic — SQL-mirrorable
    * verbatim.
    *
    * Scale shape: ONE hash-partitioned window per bucket (the stratum
    * posture — no global sort, no single-partition funnel); rows with a
    * NULL length are excluded (no length, no bucket).
    */
  def lengthBucketBatches(df: DataFrame, idCol: String, lenCol: String,
      bucketWidth: Long, batchSize: Int, salt: String = "graft"): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0,
      s"bucketWidth=$bucketWidth and batchSize=$batchSize must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket"))
      .orderBy(Sampling.hashKey(col(idCol), salt), col(idCol))
    // the `div` law needs expr() (no Column-API integer division), so the
    // interpolated identifier is backtick-quoted — a column name that
    // needs quoting (spaces, dots) must not break the splice; `_rn` is
    // our own safe name
    val lenQ = "`" + lenCol.replace("`", "``") + "`"
    df.filter(col(lenCol).isNotNull)
      .withColumn("bucket", expr(s"$lenQ div ${bucketWidth}L"))
      .withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("batch_idx", expr(s"(_rn - 1) div $batchSize"))
      .withColumn("pos_in_batch", (col("_rn") - 1) % batchSize)
      .drop("_rn")
  }

  /** Pack-level rollup: docs per pack, total cost, budget utilization. */
  def packStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("cost").as("total_cost"))
      .withColumn("utilization", col("total_cost").cast("double") / budget)
}
