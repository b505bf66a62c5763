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
  *   1. assign each row a range BUCKET id — a deterministic expression
  *      of the key over driver-collected approx-quantile boundaries
  *      (bucket i's keys all ≤ bucket i+1's) — and hash-repartition by
  *      it (ONE exchange; each bucket sorts in its own task),
  *   2. per-bucket running totals via a window PARTITIONED by the
  *      bucket id,
  *   3. per-bucket grand totals → exclusive offsets via a window over
  *      the ≤4×`spark.sql.shuffle.partitions`-row totals table (bounded
  *      BY CONFIGURATION, never by data),
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
    * single shuffle (two independent `inclusive` calls would
    * repartition the frame twice), plus — when `withTotals` — each
    * weight's GRAND total appended as `<out>_total`. The totals ride
    * the same bounded per-bucket totals table the offsets come from
    * (one more bounded window over it, one shared broadcast back), so a
    * consumer needing cumulative × total per row (the KS
    * cross-multiplication) gets both in ONE pass over the input lineage
    * — no second corpus-deriving aggregate, no unpartitioned window
    * over the data-sized frame.
    *
    * Bucketing (r19 optimization round): buckets are assigned by a PURE
    * EXPRESSION of the key — boundary values collected ONCE on the
    * driver via one approx-quantile aggregate over the ALREADY
    * MATERIALIZED checkpoint blocks (skew-robust like the range
    * partitioner's sample, 4×parallelism buckets so the hash spreads
    * them evenly) — instead of `repartitionByRange` +
    * `spark_partition_id()`. Measured wins (r19 bench, plan diffs in
    * plans/r19):
    *   1. The caller's value-table upstream computes ONCE, not twice:
    *      `repartitionByRange` ran a boundary-SAMPLING job over the full
    *      upstream before the materialization job recomputed it; the
    *      quantile collect here reads the checkpointed blocks.
    *   2. ONE full exchange instead of two: under AQE the checkpoint
    *      scan reports UnknownPartitioning, so the old shape paid the
    *      range exchange INSIDE the materialization and then ANOTHER
    *      full hashpartitioning(_ps_pid) exchange for the window; now
    *      the window's auto-inserted exchange is the only data-sized
    *      shuffle in the whole pass.
    *   3. SOUNDNESS BY CONSTRUCTION, not by materialization: range
    *      partitioning SAMPLES its boundaries per physical
    *      instantiation, so the r18 fix had to pin ONE boundary set via
    *      the checkpoint. Here the bucket id is a deterministic
    *      projection over frozen checkpoint data — plan branches cannot
    *      disagree, ever.
    * The checkpoint stays (lazy): it computes the caller's value-table
    * aggregation once for every branch and probe pass, and truncates
    * plan growth for iterating consumers ([[Eval]]'s rank searches).
    * Keys must be NUMERIC (every caller quantizes to longs — the
    * approx-quantile boundary collect needs an ordered numeric axis).
    */
  def inclusiveAll(df: DataFrame, orderCol: String,
      weights: Seq[(Column, String)], withTotals: Boolean = false): DataFrame = {
    require(weights.nonEmpty, "inclusiveAll needs at least one weight")
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val nBuckets = 4 * nParts
    val cp = df.localCheckpoint(false)
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val bounds: Array[Double] =
      cp.stat.approxQuantile(orderCol, probs, 0.001).distinct.sorted
    // bucket id = #boundaries strictly below the (double-cast) key:
    // monotone in the key (bucket i's keys all ≤ bucket i+1's — the
    // long→double cast is order-preserving, collapsing at most some
    // >2^53 neighbors into ONE bucket) and identical for tied keys, so
    // per-bucket running totals + bucket-offset sums compose to the
    // exact global prefix sum for ANY boundary choice. A ScalaUDF doing
    // binary search, NOT a when()-chain or HOF: n-term expression trees
    // cost the optimizer O(n²) per pass (a 127-term chain measured +5 s
    // of pure planning on q_taub_corr) and HOF lambdas interpret per
    // element; the udf is one plan node and log₂(buckets) long
    // comparisons per row. (One of the sanctioned udf sites — no
    // built-in binary-searches a literal array.)
    val bucketOf = udf((x: java.lang.Double) =>
      if (x == null || bounds.isEmpty) 0
      else {
        val r = java.util.Arrays.binarySearch(bounds, x.doubleValue)
        if (r >= 0) r else -r - 1
      })
    fromBuckets(cp.withColumn("_ps_pid",
      bucketOf(col(orderCol).cast("double"))), orderCol, weights, withTotals)
  }

  /** [[inclusiveAll]] with CALLER-SUPPLIED key bounds and UNIFORM
    * buckets — the rank-search fast path (r19 optimization round): no
    * checkpoint and no quantile job, so a probe pass costs ONE driver
    * action instead of three. Sound unconditionally (the bucket id is a
    * pure integer expression of the key over constants — exact-division
    * monotone, so bucket i's keys all precede bucket i+1's); BALANCE is
    * the caller's contract (use it on quantized near-uniform axes whose
    * true [lo, hi] the caller already knows — the Hodges–Lehmann
    * estimators' candidate-scaled keys). Falls back to the general
    * quantile path when the span cannot scale by the bucket count
    * without overflow. Keys must be integral and inside [lo, hi].
    */
  def inclusiveAllUniform(df: DataFrame, orderCol: String,
      weights: Seq[(Column, String)], lo: Long, hi: Long,
      withTotals: Boolean = false): DataFrame = {
    require(weights.nonEmpty, "inclusiveAllUniform needs at least one weight")
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val nBuckets = 4L * nParts
    val span = hi - lo + 1L
    if (span <= 0L || span > Long.MaxValue / nBuckets ||
        lo < -(Long.MaxValue / nBuckets) || hi > Long.MaxValue / nBuckets)
      inclusiveAll(df, orderCol, weights, withTotals)
    else {
      val bucket = expr(
        s"int(least(greatest(((`$orderCol` - ${lo}L) * ${nBuckets}L) " +
          s"div ${span}L, 0L), ${nBuckets - 1L}L))")
      fromBuckets(df.withColumn("_ps_pid", bucket), orderCol, weights,
        withTotals)
    }
  }

  /** Single-weight convenience of [[inclusiveAllUniform]]. */
  def inclusiveUniform(df: DataFrame, orderCol: String, weight: Column,
      out: String, lo: Long, hi: Long): DataFrame =
    inclusiveAllUniform(df, orderCol, Seq(weight -> out), lo, hi)

  /** Shared core over a bucket-tagged frame (`_ps_pid` already
    * assigned, monotone in the key): per-bucket running totals, bounded
    * offsets table, broadcast add-back.
    */
  private def fromBuckets(parts: DataFrame, orderCol: String,
      weights: Seq[(Column, String)], withTotals: Boolean): DataFrame = {
    val wLocal = Window.partitionBy(col("_ps_pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = weights.zipWithIndex.foldLeft(parts) {
      case (acc, ((w, _), i)) => acc.withColumn(s"_ps_local$i", sum(w).over(wLocal))
    }
    // per-bucket totals: ≤ nBuckets rows, so the single-partition windows
    // below are bounded by configuration, not data; aggregated straight
    // off the checkpointed frame (map-side partial aggregation — only
    // the ≤nBuckets-per-task partials cross the tiny exchange)
    val wOff = Window.orderBy(col("_ps_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("_ps_pid"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val totsAgg = parts.groupBy(col("_ps_pid"))
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
