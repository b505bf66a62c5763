package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed two-pass prefix sum over key-distinct tables.
  *
  * The value-frequency scaffolds ([[Eval.rankEffect]],
  * [[Quantiles.lorenzDeciles]], [[Eval.spearman]]) need a running total
  * in key order over a table bounded by DISTINCT metric values. A
  * `Window.orderBy(key)` computes it in ONE task — fine while the value
  * table is tiny, but doc-length-like columns grow their distinct set
  * with the corpus: at 100×, that is a 10⁷–10⁸-row single-partition
  * sort. This is the scale-safe shape instead:
  *
  *   1. range-repartition by the key (all rows of a key co-located,
  *      partition i's keys all below partition i+1's),
  *   2. per-partition running totals via a window PARTITIONED by the
  *      materialized partition id (each partition sorts in its own
  *      task),
  *   3. per-partition grand totals → exclusive offsets via a window over
  *      the ≤`spark.sql.shuffle.partitions`-row totals table (bounded BY
  *      CONFIGURATION, never by data),
  *   4. broadcast the offsets back and add.
  *
  * The result is identical to the single-task window for any
  * partitioning (offsets are exact sums of whole lower ranges), so the
  * rewrite is hash-transparent to the laws built on it.
  */
object PrefixSum {

  /** Inclusive running total of `weight` in ascending `orderCol` order,
    * appended as column `out`. Requires `orderCol` values to be DISTINCT
    * across rows (the value-frequency-table contract: rows of a tied key
    * would order arbitrarily WITHIN the key, making an inclusive prefix
    * ill-defined) and non-NULL. The sum's type follows Spark's `sum`
    * over `weight` (long for integrals, decimal(38,0) for decimal
    * inputs).
    */
  def inclusive(df: DataFrame, orderCol: String, weight: Column,
      out: String): DataFrame = {
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val parts = df.repartitionByRange(nParts, col(orderCol))
      .withColumn("_ps_pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("_ps_pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parts.withColumn("_ps_local", sum(weight).over(wLocal))
    // per-partition totals: ≤ nParts rows, so the single-partition window
    // below is bounded by configuration, not data
    val wOff = Window.orderBy(col("_ps_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("_ps_pid"))
      .agg(sum(weight).as("_ps_tot"))
      .withColumn("_ps_off", sum(col("_ps_tot")).over(wOff))
      .select(col("_ps_pid"), col("_ps_off"))
    local.join(broadcast(offsets), Seq("_ps_pid"))
      .withColumn(out,
        when(col("_ps_off").isNull, col("_ps_local"))
          .otherwise(col("_ps_local") + col("_ps_off")))
      .drop("_ps_pid", "_ps_local")
  }
}
