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
      out: String): DataFrame =
    inclusiveAll(df, orderCol, Seq(weight -> out))

  /** [[inclusive]] for SEVERAL weights over ONE key order, sharing a
    * single range shuffle (two independent `inclusive` calls would
    * range-repartition the frame twice), plus — when `withTotals` —
    * each weight's GRAND total appended as `<out>_total`. The totals
    * ride the same ≤`spark.sql.shuffle.partitions`-row per-partition
    * totals table the offsets come from (one more bounded window over
    * it, one shared broadcast back), so a consumer needing cumulative ×
    * total per row (the KS cross-multiplication) gets both in ONE pass
    * over the input lineage — no second corpus-deriving aggregate, no
    * unpartitioned window over the data-sized frame.
    */
  def inclusiveAll(df: DataFrame, orderCol: String,
      weights: Seq[(Column, String)], withTotals: Boolean = false): DataFrame = {
    require(weights.nonEmpty, "inclusiveAll needs at least one weight")
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    // LAZY localCheckpoint — the law's soundness depends on it, not just
    // perf: the ranged frame feeds BOTH the per-row window branch and
    // the per-partition offsets branch. RangePartitioning SAMPLES its
    // boundaries per physical instantiation, so if the optimizer ever
    // fails to reuse the exchange between the two branches (observed
    // under AQE with a projected aggregate upstream), the branches
    // disagree on pid assignment near boundaries and the joined offsets
    // silently corrupt the cumulative. One materialized RDD = one
    // boundary set, by construction. Lazy (eager=false) so plan-only
    // consumers never trigger a job; both branches share the first
    // action's materialization.
    val parts = df.repartitionByRange(nParts, col(orderCol))
      .withColumn("_ps_pid", spark_partition_id())
      .localCheckpoint(false)
    val wLocal = Window.partitionBy(col("_ps_pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = weights.zipWithIndex.foldLeft(parts) {
      case (acc, ((w, _), i)) => acc.withColumn(s"_ps_local$i", sum(w).over(wLocal))
    }
    // per-partition totals: ≤ nParts rows, so the single-partition windows
    // below are bounded by configuration, not data
    val wOff = Window.orderBy(col("_ps_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("_ps_pid"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val totsAgg = local.groupBy(col("_ps_pid"))
      .agg(sum(weights.head._1).as("_ps_tot0"),
        weights.zipWithIndex.tail.map { case ((w, _), i) =>
          sum(w).as(s"_ps_tot$i") }: _*)
    val offsets0 = weights.indices.foldLeft(totsAgg) { (acc, i) =>
      acc.withColumn(s"_ps_off$i", sum(col(s"_ps_tot$i")).over(wOff))
    }
    val offsets = (if (withTotals)
      weights.indices.foldLeft(offsets0) { (acc, i) =>
        acc.withColumn(s"_ps_grand$i", sum(col(s"_ps_tot$i")).over(wAll))
      } else offsets0)
      .select(col("_ps_pid") +:
        (weights.indices.map(i => col(s"_ps_off$i")) ++
          (if (withTotals) weights.indices.map(i => col(s"_ps_grand$i"))
           else Nil)): _*)
    val joined = local.join(broadcast(offsets), Seq("_ps_pid"))
    val named = weights.zipWithIndex.foldLeft(joined) {
      case (acc, ((_, out), i)) =>
        val cum = acc.withColumn(out,
          when(col(s"_ps_off$i").isNull, col(s"_ps_local$i"))
            .otherwise(col(s"_ps_local$i") + col(s"_ps_off$i")))
        if (withTotals) cum.withColumn(s"${out}_total", col(s"_ps_grand$i"))
        else cum
    }
    named.drop("_ps_pid" +:
      weights.indices.flatMap(i =>
        Seq(s"_ps_local$i", s"_ps_off$i") ++
          (if (withTotals) Seq(s"_ps_grand$i") else Nil)): _*)
  }
}
