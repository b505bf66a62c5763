package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series structure screens over event streams — the seasonality /
  * self-similarity complement to the distributional drift family
  * ([[Drift]]) and the dispersion screen (q_burstiness): drift asks "did
  * the histogram move?", the autocorrelogram asks "does the traffic
  * repeat itself?" (daily periodicity shows as a lag-24 peak; a bot
  * replaying a fixed schedule as near-1 at its period; white noise decays
  * immediately). The reference has no analog; this extends the engine the
  * same way [[Drift]] does (SURVEY.md §8).
  */
object Timeseries {

  /** Sample autocorrelation of the per-bin event-count series at lags
    * 1..`maxLag`, over the DENSE bin grid [min bin, max bin] with
    * missing bins counted as 0 events (the law — an observed-bins-only
    * ACF would silently treat gaps as adjacency). Bins are the
    * floor-division law shared with q_burstiness:
    * `(unix_micros(ts) − pmod(unix_micros(ts), binMicros)) div binMicros`.
    *
    * Exact law: with N grid bins, S1 = Σy, S2 = Σy², per-lag cross term
    * C_L = Σ y_t·y_{t+L} and boundary sums head_L/tail_L (first/last L
    * bins), the mean-centered ACF multiplies through by N² so BOTH sides
    * of the ratio are exact integers in DECIMAL(38,0)/HUGEINT:
    *
    *   num_L = N²·C_L − N·S1·(2·S1 − head_L − tail_L) + (N−L)·S1²
    *   den   = N²·S2 − N·S1²
    *   acf_pico = round(num_L/den · 1e12)   — ONE double division total.
    *
    * NULL when the grid has no pairs at the lag (N ≤ L) or the series is
    * constant on the grid (den = 0 — ACF undefined, visible NULL).
    *
    * Scale shape: one bin hash aggregate over the events (map-side
    * combine); everything after is bounded by OBSERVED BINS × maxLag —
    * the cross-term join keys on the shifted bin, the 1-row moment frame
    * broadcasts. Never a corpus-sized join; the dense grid is arithmetic
    * (N = max − min + 1), never materialized.
    *
    * Output: (lag, n_pairs, acf_pico) — one row per lag, n_pairs = N−L
    * (0 when the grid is shorter than the lag).
    */
  def binnedAcf(events: DataFrame, tsCol: String, maxLag: Int,
      binMicros: Long = 3600L * 1000000L): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    require(binMicros >= 1L, s"binMicros must be >= 1, got $binMicros")
    val spark = events.sparkSession
    val dec = "decimal(38,0)"
    val o = events.filter(col(tsCol).isNotNull)
      .select(expr(s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), " +
        s"${binMicros}L)) div ${binMicros}L").as("_h"))
      .groupBy(col("_h")).agg(count(lit(1)).as("_y"))
    val stats = o.agg(min(col("_h")).as("_hmin"), max(col("_h")).as("_hmax"),
      coalesce(sum(col("_y")), lit(0L)).as("_s1"),
      coalesce(sum((col("_y") * col("_y")).cast(dec)),
        lit(java.math.BigDecimal.ZERO).cast(dec)).as("_s2"))
    val lags = spark.range(1, maxLag + 1L).select(col("id").as("lag"))
    val a = o.select(col("_h").as("_ha"), col("_y").as("_ya"))
      .crossJoin(broadcast(lags))
    val cl = a.join(o.select(col("_h").as("_hb"), col("_y").as("_yb")),
        col("_hb") === col("_ha") + col("lag"))
      .groupBy(col("lag"))
      .agg(sum((col("_ya") * col("_yb")).cast(dec)).as("_cl"))
    val ht = a.crossJoin(broadcast(stats))
      .groupBy(col("lag"))
      .agg(sum(when(col("_ha") < col("_hmin") + col("lag"), col("_ya"))
          .otherwise(0L)).as("_head"),
        sum(when(col("_ha") > col("_hmax") - col("lag"), col("_ya"))
          .otherwise(0L)).as("_tail"))
    val n = col("_hmax") - col("_hmin") + lit(1L)
    val nD = n.cast(dec)
    val s1D = col("_s1").cast(dec)
    val clD = coalesce(col("_cl"), lit(java.math.BigDecimal.ZERO).cast(dec))
    val hdD = coalesce(col("_head"), lit(0L)).cast(dec)
    val tlD = coalesce(col("_tail"), lit(0L)).cast(dec)
    val num = nD * nD * clD - nD * s1D *
      (lit(2L).cast(dec) * s1D - hdD - tlD) +
      (n - col("lag")).cast(dec) * s1D * s1D
    val den = nD * nD * col("_s2") - nD * s1D * s1D
    lags.join(cl, Seq("lag"), "left").join(ht, Seq("lag"), "left")
      .crossJoin(broadcast(stats))
      .select(col("lag"),
        when(n > col("lag"), n - col("lag")).otherwise(lit(0L)).as("n_pairs"),
        when(n > col("lag") && den =!= lit(java.math.BigDecimal.ZERO).cast(dec),
          round((num.cast("double") / den.cast("double")) * 1000000000000.0)
            .cast("long")).as("acf_pico"))
      .orderBy(col("lag"))
  }
}
