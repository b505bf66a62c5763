package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile-based selection at corpus scale.
  *
  * The exact form of "keep the top decile per language"
  * (Registry.qQualityDecile) ranks each stratum with `percent_rank`, which
  * sorts each stratum in ONE task — fine for correctness checking, wrong at
  * 100 TB where a single language is most of the corpus. The scale shape is
  * the two-pass sketch form:
  *
  *   1. one aggregation computes a per-stratum threshold with
  *      `approx_percentile` (a Greenwald-Khanna sketch: partial-aggregatable
  *      and mergeable, so the pass is map-side-combined like any count), and
  *   2. the tiny (stratum, threshold) frame broadcasts back onto the corpus
  *      as a per-row filter — no data shuffle at all.
  *
  * Selection near the boundary is approximate exactly where the sketch is
  * (rank error ≤ 1/accuracy · n per stratum); everything clearly above the
  * cut is kept deterministically. For small strata the sketch degenerates to
  * exact (it holds all values until compression kicks in).
  */
object Quantiles {

  /** Per-stratum value threshold at quantile `q` (0..1): one mergeable
    * sketch aggregation → |strata| rows.
    */
  def stratumThresholds(df: DataFrame, valueCol: String, stratumCol: String,
      q: Double, accuracy: Int = 10000): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"quantile $q outside [0,1]")
    df.groupBy(col(stratumCol).as("_stratum"))
      .agg(percentile_approx(col(valueCol), lit(q), lit(accuracy)).as("_thr"))
  }

  /** Keep rows in the top `fraction` of `valueCol` within their stratum:
    * threshold at (1 - fraction), broadcast, filter `value >= threshold`.
    * Rows tying the threshold value are kept (inclusive boundary).
    * NULL-stratum rows are EXCLUDED (see [[Mixture.upsampleEpochs]] for the
    * shared contract); coalesce a sentinel upstream to include them.
    */
  def topFractionByStratum(df: DataFrame, valueCol: String, stratumCol: String,
      fraction: Double, accuracy: Int = 10000): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, s"fraction $fraction outside (0,1]")
    val thr = stratumThresholds(df, valueCol, stratumCol, 1.0 - fraction, accuracy)
    df.join(broadcast(thr), col(stratumCol) === col("_stratum"))
      .filter(col(valueCol) >= col("_thr"))
      .drop("_stratum", "_thr")
  }

  /** Winsorization at corpus scale: clamp `valueCol` into its per-stratum
    * [loQ, hiQ] percentile band. The thresholds come from ONE mergeable
    * `approx_percentile` sketch aggregation (map-side combinable — the same
    * two-pass shape as [[topFractionByStratum]]) and broadcast back onto the
    * stream as a row-local clip, so the corpus itself never shuffles. This
    * is the 100 TB form of the exact-percentile winsorize
    * (Registry.qWinsorize), which sorts each stratum in one task.
    *
    * The sketch returns an ACTUAL data value (a discrete percentile — the
    * smallest value with cumulative frequency ≥ q; DuckDB `quantile_disc`),
    * not the interpolated `quantile_cont`, so the two forms agree except on
    * rows between an interpolated threshold and its nearest data value.
    *
    * NULL law (pinned, unlike a bare least/greatest which silently clamps
    * NULL to the low band): a NULL value stays NULL in `winsorized` and
    * contributes nothing to the band. NULL strata follow the family
    * contract (excluded by the equi-join).
    *
    * Output: all input columns + `band_lo`, `band_hi`, `winsorized`.
    */
  def winsorizeApprox(df: DataFrame, valueCol: String, stratumCol: String,
      loQ: Double = 0.05, hiQ: Double = 0.95, accuracy: Int = 10000): DataFrame = {
    require(loQ >= 0.0 && loQ <= hiQ && hiQ <= 1.0,
      s"need 0 <= loQ <= hiQ <= 1, got [$loQ, $hiQ]")
    val bands = df.groupBy(col(stratumCol).as("_stratum"))
      .agg(percentile_approx(col(valueCol), lit(loQ), lit(accuracy)).as("band_lo"),
        percentile_approx(col(valueCol), lit(hiQ), lit(accuracy)).as("band_hi"))
    df.join(broadcast(bands), col(stratumCol) === col("_stratum"))
      .withColumn("winsorized", when(col(valueCol).isNotNull,
        least(greatest(col(valueCol), col("band_lo")), col("band_hi"))))
      .drop("_stratum")
  }
}
