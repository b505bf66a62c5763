package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-user event-type transition counts — the first-order Markov
    * matrix of the event stream (the session-structure screen beside
    * [[binnedAcf]]'s periodicity: which action follows which, the
    * empirical transition kernel a bot's fixed script or a broken
    * funnel shows up in immediately).
    *
    * Law: events order per user by (ts, idCol) — the idCol suffix makes
    * the order total under timestamp ties — NULL-type and NULL-ts rows
    * assert nothing and drop BEFORE pairing (a transition never spans
    * an excluded row); counts are exact integers and
    * `prob_micro = round(n / row_total · 10⁶)` is one double division
    * per cell.
    *
    * Scale shape: one per-user window (partitioned by user — never
    * global), one (from, to) hash aggregate, one from-total window over
    * the CELL table (bounded by |types|², never events).
    *
    * Output: (from_type, to_type, n_pairs, row_total, prob_micro), one
    * row per observed transition.
    */
  def markovTransitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val pairs = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull && col(idCol).isNotNull)
      .select(col(userCol), col(tsCol), col(idCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(perUser))
      .filter(col("to_type").isNotNull)
    val cells = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_pairs"))
    cells
      .withColumn("row_total",
        sum(col("n_pairs")).over(Window.partitionBy(col("from_type"))))
      .withColumn("prob_micro",
        round(col("n_pairs").cast("double") / col("row_total").cast("double")
          * 1000000.0).cast("long"))
  }

  /** First-order entropy rate of the event stream, from the SAME
    * transition law as [[markovTransitions]]: H(next | prev) =
    * Σ_ab p(ab)·log₂(c_a / c_ab) — the predictability one-number (a
    * scripted bot's stream approaches 0 bits; organic traffic sits
    * high). Per-cell terms quantize to picos BEFORE the integer Σ (the
    * KL/RBO discipline: `n_ab · round(log₂(c_a/c_ab)·10¹²)` — exact
    * integers into DECIMAL(38,0)), then ONE double division by the
    * transition total.
    *
    * Output: ONE row (n_transitions, n_states, entropy_rate_pico) —
    * no rows on an input with no transitions.
    */
  def entropyRate(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = markovTransitions(events, userCol, tsCol, typeCol, idCol)
    cells
      .select(col("from_type"), col("n_pairs"),
        (col("n_pairs").cast(dec) *
          round(log2(col("row_total").cast("double")
              / col("n_pairs").cast("double")) * 1000000000000.0)
            .cast("long").cast(dec)).as("_term"))
      .agg(sum(col("n_pairs")).as("n_transitions"),
        countDistinct(col("from_type")).as("n_states"),
        sum(col("_term")).as("_ts"))
      .filter(col("n_transitions").isNotNull)
      .select(col("n_transitions"), col("n_states"),
        round(col("_ts").cast("double") / col("n_transitions").cast("double"))
          .cast("long").as("entropy_rate_pico"))
  }

  /** CUSUM changepoint estimate over the per-bin event-count series (Page,
    * Biometrika '54 — the classic mean-shift detector; argmax |CUSUM| is
    * the standard single-changepoint location estimator): the bin where
    * the cumulative deviation from the global mean peaks — the screen
    * that finds WHEN ingest volume shifted, complementing [[Drift]]'s
    * "did the distribution move" and [[binnedAcf]]'s "does it repeat".
    *
    * The law runs over the DENSE bin grid [min bin, max bin] with missing
    * bins as 0 (the [[binnedAcf]] grid law), exactly and WITHOUT
    * materializing the grid: with N grid bins and total events Y, the
    * grid CUSUM at bin t is S(t) = Σ_{i≤t} y_i − (t−tmin+1)·Y/N, scaled
    * by N to stay integral:
    *
    *   s_scaled(t) = N·P(t) − (t−tmin+1)·Y     (P = inclusive prefix sum)
    *
    * Between observed bins S moves LINEARLY (slope −Y/N < 0), so over any
    * gap the extrema sit at the gap's endpoints: it suffices to evaluate
    * every OBSERVED bin and, per gap, the bin just before the next
    * observed one — ≤ 2× observed bins candidate rows, each an exact
    * DECIMAL(38,0) value. The argmax orders by (|s| desc, bin asc) —
    * total and deterministic.
    *
    * Scale shape: one bin hash aggregate over the events (map-side
    * combine), then ONE window pass over the observed-bin table (bounded
    * by observed bins, never events — the [[binnedAcf]] posture), one
    * 1-row argmax aggregate. Output scaled values cast BIGINT (the
    * hash-portability law; exact while N·Y < 9.2·10¹⁸ — e.g. a decade of
    * hourly bins times 10¹³ events overflows first at 8.8·10¹⁸).
    *
    * Output: ONE row (change_ts, cusum_scaled, n_bins, total_events) —
    * `change_ts` the dense-grid bin where |CUSUM| peaks, `cusum_scaled`
    * the signed N-scaled value there, `n_bins` the DENSE grid length.
    * No rows when the input has no non-NULL timestamps.
    */
  def cusumChangepoint(events: DataFrame, tsCol: String,
      binMicros: Long = 3600L * 1000000L): DataFrame = {
    require(binMicros >= 1L, s"binMicros must be >= 1, got $binMicros")
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    // ONE row-level pass: the bin hash aggregate is the only thing that
    // touches the events; min/max/total ride the SAME single-partition
    // sort as the prefix sum (unbounded-frame window aggregates over the
    // bounded observed-bin table) instead of a second scan + crossJoin,
    // and the gap candidates come from an explode instead of a union —
    // the plan scans the corpus exactly once
    val o = events.filter(col(tsCol).isNotNull)
      .select(expr(s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), " +
        s"${binMicros}L)) div ${binMicros}L").as("_h"))
      .groupBy(col("_h")).agg(count(lit(1)).as("_y"))
    val ord = Window.orderBy(col("_h"))
    val wPre = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = ord.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val pre = o.select(col("_h"),
      sum(col("_y").cast(dec)).over(wPre).as("_p"),
      lead(col("_h"), 1).over(ord).as("_hn"),
      min(col("_h")).over(wAll).as("_hmin"),
      max(col("_h")).over(wAll).as("_hmax"),
      sum(col("_y")).over(wAll).as("_yt"))
    val n = (col("_hmax") - col("_hmin") + lit(1L)).cast(dec)
    val yt = col("_yt").cast(dec)
    def sAt(bin: Column) =
      n * col("_p") - (bin - col("_hmin") + lit(1L)).cast(dec) * yt
    // candidates: each observed bin, plus (next observed − 1) across gaps
    // (NULL second struct when there is no gap — dropped by the filter)
    val cand = pre.select(col("_hmin"), col("_hmax"), col("_yt"),
        explode(array(
          struct(col("_h").as("_b"), sAt(col("_h")).as("_s")),
          when(col("_hn").isNotNull && col("_hn") > col("_h") + 1L,
            struct((col("_hn") - 1L).as("_b"),
              sAt(col("_hn") - 1L).as("_s"))))).as("_c"))
      .filter(col("_c._b").isNotNull)
    val zero = lit(java.math.BigDecimal.ZERO).cast(dec)
    cand
      .select(col("_c._b").as("_b"), col("_c._s").as("_s"),
        when(col("_c._s") < zero, -col("_c._s")).otherwise(col("_c._s"))
          .as("_abs"),
        col("_hmin"), col("_hmax"), col("_yt"))
      .agg(max(struct(col("_abs").as("_abs"),
        bitwise_not(col("_b")).as("_nb"), col("_s").as("_s"),
        (col("_hmax") - col("_hmin") + lit(1L)).as("_n"),
        col("_yt").as("_t"))).as("_m"))
      .filter(col("_m").isNotNull)
      .select(
        expr(s"timestamp_micros((~ _m._nb) * ${binMicros}L)")
          .as("change_ts"),
        col("_m._s").cast("long").as("cusum_scaled"),
        col("_m._n").as("n_bins"),
        col("_m._t").as("total_events"))
  }

  /** Permutation entropy (Bandt & Pompe, PRL '02) — ordinal-pattern
    * complexity of the per-stream value series: each consecutive triple
    * maps to its order pattern (one of 3! = 6), and the Shannon entropy
    * of the pattern distribution, normalized by ln 6, scores the stream
    * in [0, 1] — ~0 for monotone/scripted value streams, ~1 for
    * white-noise ones. The standard "is this telemetry organic"
    * complexity screen: it sees ORDER structure that [[binnedAcf]]'s
    * linear correlations miss, and is invariant to any monotone
    * transform of the values.
    *
    * Exact law: triples are (x₀, x₁, x₂) = (value, lead₁, lead₂)
    * within a (user, event_type) stream ordered by (ts, event_id);
    * each element's pattern rank counts strictly-smaller peers plus
    * EQUAL peers at earlier positions (the Bandt–Pompe stable
    * tie-break), so the pattern code r₀·9 + r₁·3 + r₂ is pure integer
    * comparisons; entropy per event_type follows the [[entropyRate]]
    * pico discipline (per-cell `c·round(ln(n/c)·10¹²)` in DECIMAL, one
    * double division), `pe_micro = round(h_pico / ln6 / 10⁶)` with the
    * SAME ln 6 literal injected into both engines.
    *
    * Scale shape: one lead window per (user, type) stream — bounded by
    * the per-stream event count, the [[markovTransitions]] posture —
    * then a ≤ 6·|types|-cell aggregate.
    *
    * Output: (event_type, n_triples, n_patterns, h_pico, pe_micro),
    * one row per event_type with ≥ 1 triple, ordered by event_type.
    */
  def permutationEntropy(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, typeCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val perStream = Window.partitionBy(col(userCol), col(typeCol))
      .orderBy(col(tsCol), col(idCol))
    val tri = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull && col(typeCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(typeCol).as("event_type"), col(userCol), col(tsCol),
        col(idCol), col(valueCol).as("_x0"))
      .withColumn("_x1", lead(col("_x0"), 1).over(perStream))
      .withColumn("_x2", lead(col("_x0"), 2).over(perStream))
      .filter(col("_x1").isNotNull && col("_x2").isNotNull)
    def i(c: org.apache.spark.sql.Column) = when(c, 1L).otherwise(0L)
    val r0 = i(col("_x1") < col("_x0")) + i(col("_x2") < col("_x0"))
    val r1 = i(col("_x0") <= col("_x1")) + i(col("_x2") < col("_x1"))
    val r2 = i(col("_x0") <= col("_x2")) + i(col("_x1") <= col("_x2"))
    val cells = tri
      .select(col("event_type"), (r0 * 9L + r1 * 3L + r2).as("_pat"))
      .groupBy(col("event_type"), col("_pat"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_n",
        sum(col("_c")).over(Window.partitionBy(col("event_type"))))
    val lnSix = math.log(6.0)
    cells
      .select(col("event_type"), col("_n"),
        (col("_c").cast(dec) *
          round(log(col("_n").cast("double") / col("_c").cast("double"))
            * 1000000000000.0).cast("long").cast(dec)).as("_term"))
      .groupBy(col("event_type"))
      .agg(max(col("_n")).as("n_triples"), count(lit(1)).as("n_patterns"),
        sum(col("_term")).as("_ts"))
      .select(col("event_type"), col("n_triples"), col("n_patterns"),
        round(col("_ts").cast("double") / col("n_triples").cast("double"))
          .cast("long").as("h_pico"))
      .withColumn("pe_micro",
        round(col("h_pico").cast("double") / lit(lnSix) / 1.0e6)
          .cast("long"))
      .orderBy(col("event_type"))
  }

  /** Wald–Wolfowitz runs test ('40) per event_type — is the
    * above/below-median pattern of each stream RANDOM, or does it
    * clump (regime persistence) / alternate (oscillation)? The
    * randomness screen beside [[permutationEntropy]]'s complexity one:
    * a scripted load generator clumps (few long runs, z ≪ 0); a
    * ping-pong retry loop alternates (z ≫ 0).
    *
    * Law: binarize by the event_type's exact interpolated MEDIAN (the
    * `percentile`/`quantile_cont` parity law; x = value > median);
    * runs count per (user, type) stream ordered by (ts, event_id);
    * streams with both classes present qualify, and because runs in
    * DISJOINT streams are independent the per-type null model is the
    * exact sum of the per-stream moments:
    *
    *   μ_s = 2·n₁n₂/n + 1,   σ²_s = 2n₁n₂(2n₁n₂−n) / (n²(n−1))
    *
    * each micro-quantized BEFORE the exact DECIMAL Σ (the pico
    * discipline), then ONE double chain renders
    * z = (R − Σμ)/√(Σσ²). NULL z when no stream qualifies or the
    * variance sum is 0.
    *
    * Scale shape: one bounded per-type median aggregate (broadcast
    * back), one lag window per (user, type) stream — the
    * [[markovTransitions]] posture — then bounded per-type aggregates.
    *
    * Output: (event_type, n_streams, n_runs, mu_sum_micro,
    * var_sum_micro, z_pico), one row per type with ≥ 1 qualifying
    * stream, ordered by event_type.
    */
  def runsTest(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, typeCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val base = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
      col(valueCol).isNotNull && col(typeCol).isNotNull &&
      col(idCol).isNotNull)
    val med = base.groupBy(col(typeCol).as("event_type"))
      .agg(expr(s"percentile($valueCol, 0.5)").as("_med"))
    val perStream = Window.partitionBy(col("_u"), col("event_type"))
      .orderBy(col("_ts"), col("_id"))
    val flagged = base
      .select(col(typeCol).as("event_type"), col(userCol).as("_u"),
        col(tsCol).as("_ts"), col(idCol).as("_id"), col(valueCol).as("_v"))
      .join(broadcast(med), Seq("event_type"))
      .withColumn("_x", col("_v") > col("_med"))
      .withColumn("_prev", lag(col("_x"), 1).over(perStream))
    val streams = flagged.groupBy(col("event_type"), col("_u"))
      .agg(count(lit(1)).as("_n"),
        sum(when(col("_x"), 1L).otherwise(0L)).as("_n1"),
        (lit(1L) + sum(when(col("_prev").isNotNull &&
          (col("_x") =!= col("_prev")), 1L).otherwise(0L))).as("_r"))
      .withColumn("_n2", col("_n") - col("_n1"))
      .filter(col("_n1") > 0L && col("_n2") > 0L)
    def d(c: String) = col(c).cast("double")
    val muMicro = round((lit(2.0) * d("_n1") * d("_n2") / d("_n") + lit(1.0))
      * lit(1.0e6)).cast("long")
    val varMicro = round(lit(2.0) * d("_n1") * d("_n2")
      * (lit(2.0) * d("_n1") * d("_n2") - d("_n"))
      / (d("_n") * d("_n") * (d("_n") - lit(1.0))) * lit(1.0e6)).cast("long")
    val perType = streams
      .select(col("event_type"), col("_r"),
        muMicro.cast(dec).as("_mu"), varMicro.cast(dec).as("_var"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_streams"), sum(col("_r")).as("n_runs"),
        sum(col("_mu")).cast("long").as("mu_sum_micro"),
        sum(col("_var")).cast("long").as("var_sum_micro"))
    // the when(>0) clamp keeps ANSI's hoisted division off a 0 variance
    val sigma = sqrt(when(col("var_sum_micro") > 0L, col("var_sum_micro"))
      .otherwise(lit(1000000L)).cast("double") / lit(1.0e6))
    perType.select(col("event_type"), col("n_streams"), col("n_runs"),
        col("mu_sum_micro"), col("var_sum_micro"),
        when(col("var_sum_micro") > 0L,
          round((col("n_runs").cast("double")
            - col("mu_sum_micro").cast("double") / lit(1.0e6)) / sigma
            * lit(1.0e12)).cast("long")).as("z_pico"))
      .orderBy(col("event_type"))
  }

  /** Theil–Sen robust trend of the daily event-count series (Theil '50 /
    * Sen '68): the median of all pairwise slopes, with the median
    * residual intercept — the volume-trend estimate one anomalous day
    * cannot move (an OLS slope through daily counts is owned by its
    * biggest outage/spike; the breakdown point here is ~29%). The
    * robust companion of [[cusumChangepoint]]'s "when did it shift".
    *
    * Exact law: daily counts from floor-division bins (the file's
    * `(x − pmod(x, b)) div b` law — DuckDB `//` floors while Spark
    * `div` truncates toward zero, so pre-1970 timestamps bin
    * identically engine-vs-oracle only under the pmod form); one
    * corpus hash aggregate — the bounded day grid; slopes over all C(d, 2) day
    * pairs of the OBSERVED-day table (bounded BY LAW: pairs of days,
    * never events — the self-join is a broadcast over the day table);
    * slope and intercept are exact interpolated medians
    * (`percentile`/`quantile_cont` parity) of identically-computed
    * doubles. No rows when fewer than 2 observed days.
    *
    * Output (1 row): (n_days, n_pairs, slope_per_day, intercept).
    */
  def theilSenDaily(events: DataFrame, tsCol: String,
      binMicros: Long = 86400L * 1000000L): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    val d = events.filter(col(tsCol).isNotNull)
      .groupBy(expr(s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), " +
        s"${binMicros}L)) div ${binMicros}L").as("_x"))
      .agg(count(lit(1)).as("_y"))
    val a = d.select(col("_x").as("_xa"), col("_y").as("_ya"))
    val b = d.select(col("_x").as("_xb"), col("_y").as("_yb"))
    val slopes = a.join(b, col("_xb") > col("_xa"))
      .select(((col("_yb") - col("_ya")).cast("double")
        / (col("_xb") - col("_xa")).cast("double")).as("_s"))
    val fit = slopes.agg(count(lit(1)).as("n_pairs"),
        expr("percentile(_s, 0.5)").as("slope_per_day"))
      .filter(col("n_pairs") > 0L)
    val days = d.agg(count(lit(1)).as("n_days"))
    d.crossJoin(broadcast(fit)).crossJoin(broadcast(days))
      .select(col("n_days"), col("n_pairs"), col("slope_per_day"),
        (col("_y").cast("double")
          - col("slope_per_day") * col("_x").cast("double")).as("_r"))
      .groupBy(col("n_days"), col("n_pairs"), col("slope_per_day"))
      .agg(expr("percentile(_r, 0.5)").as("intercept"))
      .select(col("n_days"), col("n_pairs"), col("slope_per_day"),
        col("intercept"))
  }

  /** Mann–Kendall trend test of the daily event-count series (Mann '45 /
    * Kendall '75) — [[theilSenDaily]]'s significance companion: the
    * slope says HOW FAST volume drifts, S and its normal score say
    * whether the monotone trend is real or noise. The nonparametric
    * test one outlier day cannot own (it reads only sign comparisons).
    *
    * Exact law: daily counts from the file's `(x − pmod(x, b)) div b`
    * floor bins (one corpus hash aggregate — the bounded day grid);
    *
    *   S = Σ_{i<j} sgn(y_j − y_i)  over all C(d, 2) ordered day pairs
    *
    * (bounded BY LAW: pairs of days, never events — the theilSenDaily
    * broadcast pair join — and since r19 ENFORCED in-plan via
    * [[Guards.boundedDomain]] at 3·10⁴ days ≈ 82 years — ≤ 4.5·10⁸
    * pairs; past that, aggregate to a coarser grain first: the pair
    * join is O(days²) and the qErrorTrend posture says fail loudly
    * BEFORE it materializes). Tie-corrected variance stays EXACT integer:
    * 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) over tied-count runs;
    * the continuity-corrected z = (S ∓ 1)/√(var18/18) is one pinned
    * double chain, pico-rounded (0 when S = 0, the test's convention;
    * NULL when var18 = 0 — fewer than 2 days or all counts equal, no
    * trend information).
    *
    * Output (1 row): (n_days, s_stat, var_s18, z_pico).
    */
  /** Pettitt's rank-based change-point test (Pettitt, Appl. Stat. '79)
    * — WHEN did the distribution shift, where [[mannKendallDaily]] asks
    * only WHETHER it trends: K = max_t |U_t| over every candidate split
    * after bin t, with U_t = Σ_{i≤t} Σ_{j>t} sgn(x_j − x_i) — the
    * Mann–Whitney statistic of "first t bins vs the rest", maximized
    * over t. The corpus-drift monitor's "which day did the corpus
    * change" report.
    *
    * Exact law — the pair double-sum REDUCES to ranks (within-split
    * pairs cancel by antisymmetry, so Σ_{i≤t} over ALL j equals the
    * j>t sum): with pooled doubled midranks mr2 off the value table's
    * [[graft.ops.PrefixSum]] pass, per-bin rank masses Σmr2 and counts
    * cumulate over bins in a SECOND distributed prefix-sum pass
    * (observed bins are unbounded by contract — never a one-task
    * sort), and
    *
    *   U_t = n_t·(N+1) − Σ_{bins ≤ t} mr2   (exact integers),
    *
    * midrank ties carrying their own correction. K = max|U_t|; the
    * change bin is the EARLIEST bin attaining it (the last bin of the
    * first segment, U_T = 0 by construction); the standard
    * approximation p ≈ min(1, 2·exp(−6K²/(N³+N²))) is one pinned
    * double chain, pico-rounded. NULL p when N < 2.
    *
    * Scale shape: two hash aggregates (value table, (bin, value)
    * cells), two prefix-sum passes, one 1-row fold with a 1-row max
    * broadcast. INTEGRAL-VALUE CONTRACT as
    * [[graft.ops.Eval.moodMedianTest]].
    *
    * Output (1 row): (n_rows, n_bins, k_stat, change_bin, p_pico).
    */
  def pettittDaily(events: DataFrame, tsCol: String, valueCol: String,
      binMicros: Long = 86400L * 1000000L): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    val dec = "decimal(38,0)"
    val base = events.filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(expr(s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), " +
        s"${binMicros}L)) div ${binMicros}L").as("_t"),
        col(valueCol).cast("long").as("_v"))
    val vt = base.groupBy(col("_v")).agg(count(lit(1)).as("_m"))
    val mr = graft.ops.PrefixSum.inclusive(vt, "_v", col("_m"), "_cum")
      .select(col("_v"),
        (lit(2L) * col("_cum") - col("_m") + lit(1L)).as("_mr2"))
    val cells = base.groupBy(col("_t"), col("_v")).agg(count(lit(1)).as("_c"))
    val perBin = cells.join(mr, "_v").groupBy(col("_t"))
      .agg(sum(col("_c")).as("_nb"),
        sum(col("_c").cast(dec) * col("_mr2").cast(dec)).as("_sr2"))
    val cum = graft.ops.PrefixSum.inclusiveAll(perBin, "_t",
      Seq(col("_nb") -> "_cn", col("_sr2") -> "_csr"), withTotals = true)
    val u = cum.select(col("_t"),
      (col("_cn").cast(dec) * (col("_cn_total") + lit(1L)).cast(dec)
        - col("_csr")).as("_u"),
      col("_cn_total").as("_n"))
    val kMax = u.agg(max(abs(col("_u"))).as("_k"))
    val agg = u.crossJoin(broadcast(kMax))
      .agg(coalesce(max(col("_n")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_bins"),
        coalesce(max(col("_k")),
          lit(java.math.BigDecimal.ZERO).cast(dec)).as("_kst"),
        min(when(abs(col("_u")) === col("_k"), col("_t")))
          .as("change_bin"))
    // greatest clamps: identity whenever the matching when() fires
    val nD = greatest(col("n_rows"), lit(1L)).cast("double")
    val kD = col("_kst").cast("double")
    val p = lit(2.0) * exp(lit(-6.0) * kD * kD / (nD * nD * nD + nD * nD))
    agg.select(col("n_rows"), col("n_bins"),
      col("_kst").cast("long").as("k_stat"), col("change_bin"),
      when(col("n_rows") >= 2L,
        round(least(lit(1.0), p) * lit(1.0e12)).cast("long")).as("p_pico"))
  }

  /** Buishand range change-point screens (Buishand, J. Hydrology '82)
    * — [[pettittDaily]]'s CUMULATIVE-DEVIATION companion: Pettitt asks
    * WHEN the value distribution shifted via rank double-sums; this
    * reads the per-bin series' partial sums directly — S_k =
    * Σ_{t≤k}(y_t − ȳ) — and reports both the rescaled RANGE
    * R/√T = (max S − min S)/(s√T) (a shift ANYWHERE bulges the
    * cumulative away from zero) and the rescaled max excursion
    * Q/√T = max|S_k|/(s√T), with the earliest bin attaining the max
    * excursion as the change candidate. Mean-level shifts that rank
    * tests dilute (a small persistent drift) accumulate linearly here.
    *
    * Exact law off ONE [[graft.ops.PrefixSum]] pass over the per-bin
    * totals (bins unbounded by contract — never a one-task sort):
    * T·S_k = T·C_k − k·C_T is an EXACT integer (C = cumulative bin
    * sums, k = bin index off the same pass), so the max/min/argmax
    * fold reads exact DECIMAL(38,0); s² = (Σy² − C_T²/T)/(T−1) off
    * exact cumulants, and R/√T, Q/√T are ONE pinned double chain each,
    * pico-rounded. NULL both when T < 2 or s² ≤ 0 (a constant series —
    * no deviation scale). The ts_max/ts_min diagnostics surface as
    * DOUBLES (T·C-scale — the [[graft.ops.Eval.quadeTest]] posture).
    *
    * Scale shape: one bin hash aggregate → one two-weight prefix-sum
    * pass → a 1-row fold with a 1-row max broadcast. INTEGRAL-VALUE
    * CONTRACT as [[graft.ops.Eval.moodMedianTest]].
    *
    * Output (1 row): (n_bins, ts_max, ts_min, change_bin, rb_pico,
    * qb_pico).
    */
  def buishandDaily(events: DataFrame, tsCol: String, valueCol: String,
      binMicros: Long = 86400L * 1000000L): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    val dec = "decimal(38,0)"
    val perBin = events
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(expr(s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), " +
        s"${binMicros}L)) div ${binMicros}L").as("_t"))
      .agg(sum(col(valueCol).cast("long")).as("_y"))
    val cum = graft.ops.PrefixSum.inclusiveAll(perBin, "_t",
      Seq(col("_y") -> "_cy", lit(1L) -> "_ck"), withTotals = true)
    val ts = cum.select(col("_t"), col("_y"),
      (col("_ck_total").cast(dec) * col("_cy").cast(dec)
        - col("_ck").cast(dec) * col("_cy_total").cast(dec)).as("_ts"),
      col("_ck_total").as("_tn"), col("_cy_total").as("_cyt"))
    val zero = lit(java.math.BigDecimal.ZERO).cast(dec)
    val mx = ts.agg(
      coalesce(max(col("_ts")), zero).as("_tsmax"),
      coalesce(min(col("_ts")), zero).as("_tsmin"))
    val km = greatest(abs(col("_tsmax")), abs(col("_tsmin")))
    val agg = ts.crossJoin(broadcast(mx)).agg(
      coalesce(max(col("_tn")), lit(0L)).as("n_bins"),
      coalesce(max(col("_cyt")), lit(0L)).as("_cy"),
      coalesce(sum(col("_y").cast(dec) * col("_y").cast(dec)), zero)
        .as("_qy"),
      max(col("_tsmax")).as("_tsmax"), max(col("_tsmin")).as("_tsmin"),
      min(when(abs(col("_ts")) === km, col("_t"))).as("change_bin"))
    // greatest clamps: identity whenever the matching when() fires
    val tD = greatest(col("n_bins"), lit(1L)).cast("double")
    val t1D = greatest(col("n_bins") - lit(1L), lit(1L)).cast("double")
    val sVar = (col("_qy").cast("double") -
      col("_cy").cast("double") * col("_cy").cast("double") / tD) / t1D
    val sden = sqrt(greatest(sVar, lit(1.0e-300))) * sqrt(tD)
    // _ts is the ×T-scaled partial sum: one /T recovers S_k, then /s√T
    val rb = (col("_tsmax") - col("_tsmin")).cast("double") / tD / sden
    val qb = greatest(abs(col("_tsmax")), abs(col("_tsmin")))
      .cast("double") / tD / sden
    agg.select(col("n_bins"),
      col("_tsmax").cast("double").as("ts_max"),
      col("_tsmin").cast("double").as("ts_min"),
      col("change_bin"),
      when(col("n_bins") >= 2L && sVar > 0.0,
        round(rb * lit(1.0e12)).cast("long")).as("rb_pico"),
      when(col("n_bins") >= 2L && sVar > 0.0,
        round(qb * lit(1.0e12)).cast("long")).as("qb_pico"))
  }

  /** KPSS level-stationarity statistic (Kwiatkowski, Phillips, Schmidt
    * & Shin, J. Econometrics '92) — the drift tier's STATIONARITY
    * member: [[pettittDaily]] locates WHEN a level shifted and
    * [[buishandDaily]] how far the cumulative wandered; KPSS tests
    * whether the series is level-stationary AT ALL (H₀: stationary
    * around a constant — large η rejects), with the Newey–West
    * Bartlett-kernel long-run variance at lag ℓ.
    *
    * EXACT LAW, no quantization anywhere: over the observed-bin
    * sequence k = 1..T (dense prefix-sum rank — gaps in the calendar
    * axis do not break the lag join), the T-scaled partial sums
    * ts_k = T·cum_k − k·Y and residuals e_k = T·y_k − Y are exact
    * integers off ONE [[graft.ops.PrefixSum.inclusiveAll]] pass (the
    * [[buishandDaily]] frame), the lag products ride ONE equi-join on
    * the dense rank (explode of j = 1..ℓ — never a range join), and
    * with G_j = Σ e_k·e_{k+j} (scaled autocovariances) the Bartlett
    * weights 1 − j/(ℓ+1) clear denominators exactly:
    *
    *   S2 = (ℓ+1)·G₀ + 2·Σ_j ((ℓ+1) − j)·G_j,
    *   η  = Σ ts_k² · (ℓ+1) / (T · S2)
    *
    * — every factor an exact DECIMAL, η ONE pinned double chain
    * (pico-rounded). NULL when T < 2 or S2 ≤ 0 (constant series; for
    * strongly negatively autocorrelated series the truncated kernel
    * can also drive S2 ≤ 0 — surfaced as NULL, the variant's
    * documented behavior). Overflow domain: Σts² ≤ T³·Y² must fit
    * DECIMAL(38) — ~10⁵ bins × Y ≈ 10¹¹ reaches 10³⁷; the error-trend
    * day-axis guard bounds T physically.
    *
    * Scale shape: one per-bin hash aggregate, one prefix-sum pass, one
    * rank equi-join inflated ×ℓ, two 1-row folds.
    *
    * Output (1 row): (n_bins, sum_ts2, s2_scaled, kpss_pico); the two
    * diagnostics are doubles ([[graft.ops.Eval.quadeTest]] posture).
    */
  def kpssDaily(events: DataFrame, tsCol: String, valueCol: String,
      lag: Int = 4, binMicros: Long = 86400L * 1000000L): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    require(lag >= 0 && lag <= 32, s"lag must be in [0, 32], got $lag")
    val dec = "decimal(38,0)"
    val perBin = events
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(expr(s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), " +
        s"${binMicros}L)) div ${binMicros}L").as("_t"))
      .agg(sum(col(valueCol).cast("long")).as("_y"))
    val cum = graft.ops.PrefixSum.inclusiveAll(perBin, "_t",
      Seq(col("_y") -> "_cy", lit(1L) -> "_ck"), withTotals = true)
    val ts = cum.select(col("_ck"),
      (col("_ck_total").cast(dec) * col("_cy").cast(dec)
        - col("_ck").cast(dec) * col("_cy_total").cast(dec)).as("_ts"),
      (col("_ck_total").cast(dec) * col("_y").cast(dec)
        - col("_cy_total").cast(dec)).as("_es"),
      col("_ck_total").as("_tn"))
    val zero = lit(java.math.BigDecimal.ZERO).cast(dec)
    val agg0 = ts.agg(
      coalesce(max(col("_tn")), lit(0L)).as("n_bins"),
      coalesce(sum(col("_ts") * col("_ts")), zero).as("_sts"),
      coalesce(sum(col("_es") * col("_es")), zero).as("_g0"))
    val gw =
      if (lag == 0) agg0.sparkSession.range(1).select(zero.as("_gw"))
      else {
        val js = array((1 to lag).map(j => lit(j.toLong)): _*)
        val left = ts.select(col("_ck"), col("_es").as("_esa"))
          .withColumn("_j", explode(js))
          .select((col("_ck") + col("_j")).as("_ckb"), col("_j"),
            col("_esa"))
        left.join(ts.select(col("_ck").as("_ckb"),
            col("_es").as("_esb")), "_ckb")
          .agg(coalesce(sum((lit(lag.toLong + 1L) - col("_j")).cast(dec)
            * col("_esa") * col("_esb")), zero).as("_gw"))
      }
    val agg = agg0.crossJoin(broadcast(gw))
    val s2sc = lit(lag.toLong + 1L).cast(dec) * col("_g0") +
      lit(2L).cast(dec) * col("_gw")
    val eta = col("_sts").cast("double") * lit(lag + 1.0) /
      (greatest(col("n_bins"), lit(1L)).cast("double") *
        greatest(s2sc, lit(java.math.BigDecimal.ONE).cast(dec))
          .cast("double"))
    agg.select(col("n_bins"),
      col("_sts").cast("double").as("sum_ts2"),
      s2sc.cast("double").as("s2_scaled"),
      when(col("n_bins") >= 2L &&
        s2sc > lit(java.math.BigDecimal.ZERO).cast(dec),
        round(eta * lit(1.0e12)).cast("long")).as("kpss_pico"))
  }

  /** Bartels' rank von Neumann ratio test of randomness (Bartels,
    * JASA '82) — the RANK-ROBUST serial-correlation screen beside the
    * sign-based runs test: RVN = Σ(R_k − R_{k+1})² / Σ(R_k − R̄)² over
    * the per-bin value RANKS in sequence order (≈2 under randomness,
    * <2 positive serial correlation, >2 alternation), with far better
    * power than runs against trending data and none of the mean's
    * outlier exposure.
    *
    * EXACT LAW on doubled midranks (mr2 = 2·cum − m + 1, integers off
    * ONE value-table [[graft.ops.PrefixSum.inclusiveAll]] pass): the
    * uniform ×2 cancels in the ratio, so with NM = Σ(mr2_k −
    * mr2_{k+1})² (consecutive OBSERVED bins via the dense-rank
    * equi-join — the [[kpssDaily]] discipline, calendar gaps
    * harmless) and SR/SRR the rank cumulants,
    *
    *   RVN = T·NM / (T·SRR − SR²)
    *
    * — every factor an exact DECIMAL, RVN one double division. The
    * null moments are Bartels' E = 2 and Var = 4(T−2)(5T²−2T−9) /
    * (5T(T+1)(T−1)²) (exact-in-double factors under the bounded day
    * axis), z one pinned chain. NULL when T < 3 or all values tied.
    *
    * Scale shape: one per-bin aggregate, two prefix-sum passes (value
    * table + sequence index), one value equi-join, one dense-rank
    * equi-join, a 1-row fold.
    *
    * Output (1 row): (n_bins, rvn_pico, z_pico); rvn ∈ [0, 4] keeps
    * the pico long safe at any T.
    */
  def bartelsRvn(events: DataFrame, tsCol: String, valueCol: String,
      binMicros: Long = 86400L * 1000000L): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    val dec = "decimal(38,0)"
    val perBin = events
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(expr(s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), " +
        s"${binMicros}L)) div ${binMicros}L").as("_t"))
      .agg(sum(col(valueCol).cast("long")).as("_y"))
    val seq0 = graft.ops.PrefixSum.inclusiveAll(perBin, "_t",
      Seq(lit(1L) -> "_ck"), withTotals = true)
      .select(col("_t"), col("_y"), col("_ck"),
        col("_ck_total").as("_tn"))
    val vt = perBin.groupBy(col("_y")).agg(count(lit(1)).as("_m"))
    val mr = graft.ops.PrefixSum.inclusiveAll(vt, "_y",
      Seq(col("_m") -> "_cum"))
      .select(col("_y"),
        (lit(2L) * col("_cum") - col("_m") + lit(1L)).as("_mr2"))
    val ranked = seq0.join(mr, "_y")
    val zero = lit(java.math.BigDecimal.ZERO).cast(dec)
    val agg0 = ranked.agg(
      coalesce(max(col("_tn")), lit(0L)).as("n_bins"),
      coalesce(sum(col("_mr2").cast(dec)), zero).as("_sr"),
      coalesce(sum(col("_mr2").cast(dec) * col("_mr2").cast(dec)), zero)
        .as("_srr"))
    val nm = ranked.select((col("_ck") + lit(1L)).as("_ckb"),
        col("_mr2").as("_ra"))
      .join(ranked.select(col("_ck").as("_ckb"), col("_mr2").as("_rb")),
        "_ckb")
      .agg(coalesce(sum((col("_ra").cast(dec) - col("_rb").cast(dec)) *
        (col("_ra").cast(dec) - col("_rb").cast(dec))), zero).as("_nm"))
    val agg = agg0.crossJoin(broadcast(nm))
    val t = col("n_bins").cast(dec)
    val dn = t * col("_srr") - col("_sr") * col("_sr")
    val tD = greatest(col("n_bins"), lit(1L)).cast("double")
    val rvn = t.cast("double") * col("_nm").cast("double") /
      greatest(dn.cast("double"), lit(1.0e-300))
    val vr = lit(4.0) * (tD - lit(2.0)) *
      (lit(5.0) * tD * tD - lit(2.0) * tD - lit(9.0)) /
      (lit(5.0) * tD * (tD + lit(1.0)) * (tD - lit(1.0)) *
        (tD - lit(1.0)))
    val z = (rvn - lit(2.0)) / sqrt(greatest(vr, lit(1.0e-300)))
    val ok = col("n_bins") >= 3L && dn.cast("double") > 0.0
    agg.select(col("n_bins"),
      when(ok, round(rvn * lit(1.0e12)).cast("long")).as("rvn_pico"),
      when(ok, round(z * lit(1.0e12)).cast("long")).as("z_pico"))
  }

  /** Durbin–Watson first-order autocorrelation statistic (Durbin &
    * Watson, Biometrika '50) — the classic residual-independence
    * screen on the VALUES themselves, the parametric sibling of
    * [[bartelsRvn]]'s rank form: DW = Σ(e_k − e_{k+1})² / Σe_k² over
    * mean-centered per-bin values (≈2 independent, →0 positive
    * autocorrelation, →4 alternation).
    *
    * EXACT LAW: the T-scaled residuals e_k = T·y_k − Y are exact
    * integers off ONE [[graft.ops.PrefixSum.inclusiveAll]] pass (the
    * [[kpssDaily]] frame; the T² scale cancels in the ratio),
    * consecutive OBSERVED bins via the dense-rank equi-join, DW one
    * double division of exact DECIMALs (pico-rounded — DW ∈ [0, 4]).
    * NULL when T < 2 or the series is constant.
    *
    * Scale shape: one per-bin aggregate, one prefix-sum pass, one
    * dense-rank equi-join, a 1-row fold.
    *
    * Output (1 row): (n_bins, dw_pico).
    */
  def durbinWatsonDaily(events: DataFrame, tsCol: String,
      valueCol: String, binMicros: Long = 86400L * 1000000L): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    val dec = "decimal(38,0)"
    val perBin = events
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(expr(s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), " +
        s"${binMicros}L)) div ${binMicros}L").as("_t"))
      .agg(sum(col(valueCol).cast("long")).as("_y"))
    val seq0 = graft.ops.PrefixSum.inclusiveAll(perBin, "_t",
      Seq(col("_y") -> "_cy", lit(1L) -> "_ck"), withTotals = true)
      .select(col("_ck"),
        (col("_ck_total").cast(dec) * col("_y").cast(dec)
          - col("_cy_total").cast(dec)).as("_es"),
        col("_ck_total").as("_tn"))
    val zero = lit(java.math.BigDecimal.ZERO).cast(dec)
    val agg0 = seq0.agg(
      coalesce(max(col("_tn")), lit(0L)).as("n_bins"),
      coalesce(sum(col("_es") * col("_es")), zero).as("_g0"))
    val nm = seq0.select((col("_ck") + lit(1L)).as("_ckb"),
        col("_es").as("_ea"))
      .join(seq0.select(col("_ck").as("_ckb"), col("_es").as("_eb")),
        "_ckb")
      .agg(coalesce(sum((col("_ea") - col("_eb")) *
        (col("_ea") - col("_eb"))), zero).as("_nm"))
    val agg = agg0.crossJoin(broadcast(nm))
    val dw = col("_nm").cast("double") /
      greatest(col("_g0").cast("double"), lit(1.0e-300))
    agg.select(col("n_bins"),
      when(col("n_bins") >= 2L && col("_g0").cast("double") > 0.0,
        round(dw * lit(1.0e12)).cast("long")).as("dw_pico"))
  }

  /** Seasonal Mann–Kendall trend test (Hirsch & Slack, Water Resour.
    * Res. '84) — [[mannKendallDaily]] misreads SEASONAL series (every
    * summer-vs-winter pair votes for a spurious "trend"); the seasonal
    * form compares days only WITHIN the same calendar month-of-year,
    * then pools: S = Σ_m S_m, Var = Σ_m Var_m (χ/normal with the
    * standard continuity correction).
    *
    * The month key turns the day-pair join into an EQUI join with an
    * inequality residual — a real hash join, and the pair count drops
    * ×12 vs the unconditioned form. Ties correct per (month, value);
    * every cumulant is an exact long. Same 30k-day
    * [[Guards.boundedDomain]] ceiling as the plain form.
    *
    * Output (1 row): (n_days, n_seasons, s_stat, var_s18, z_pico).
    */
  def seasonalMannKendall(events: DataFrame, tsCol: String,
      binMicros: Long = 86400L * 1000000L): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    val d = Guards.boundedDomain(
      events.filter(col(tsCol).isNotNull)
        .groupBy(expr(s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), " +
          s"${binMicros}L)) div ${binMicros}L").as("_x"),
          month(col(tsCol)).as("_m"))
        .agg(count(lit(1)).as("_y")),
      maxRows = 30000L, op = "seasonalMannKendall",
      hint = "the bin axis grew past 82 years of daily bins (the within-" +
        "season day-pair join is O(days^2/seasons)) — aggregate to a " +
        "coarser time grain first")
    val a = d.select(col("_x").as("_xa"), col("_m").as("_ma"),
      col("_y").as("_ya"))
    val b = d.select(col("_x").as("_xb"), col("_m").as("_mb"),
      col("_y").as("_yb"))
    val s = a.join(b, col("_ma") === col("_mb") &&
        col("_xb") > col("_xa"))
      .agg(coalesce(sum(
        when(col("_yb") > col("_ya"), 1L)
          .when(col("_yb") < col("_ya"), -1L).otherwise(0L)), lit(0L))
        .as("s_stat"))
    val perM = d.groupBy(col("_m")).agg(count(lit(1)).as("_n"))
    val ties = d.groupBy(col("_m"), col("_y"))
      .agg(count(lit(1)).as("_t"))
      .agg(coalesce(sum(col("_t") * (col("_t") - lit(1L))
        * (lit(2L) * col("_t") + lit(5L))), lit(0L)).as("_tt"))
    val vsum = perM.agg(
      coalesce(sum(col("_n")), lit(0L)).as("n_days"),
      count(lit(1)).as("n_seasons"),
      coalesce(sum(col("_n") * (col("_n") - lit(1L))
        * (lit(2L) * col("_n") + lit(5L))), lit(0L)).as("_vv"))
    val var18 = col("_vv") - col("_tt")
    val zNum = when(col("s_stat") > 0L,
        (col("s_stat") - lit(1L)).cast("double"))
      .when(col("s_stat") < 0L, (col("s_stat") + lit(1L)).cast("double"))
      .otherwise(lit(0.0))
    vsum.crossJoin(broadcast(s)).crossJoin(broadcast(ties))
      .select(col("n_days"), col("n_seasons"), col("s_stat"),
        var18.as("var_s18"),
        // greatest clamp: identity whenever the when() fires
        when(var18 > 0L,
          round(zNum / sqrt(greatest(var18, lit(1L)).cast("double")
            / lit(18.0)) * lit(1.0e12)).cast("long")).as("z_pico"))
  }

  /** Cox–Stuart trend test (Cox & Stuart, Biometrika '55) — the
    * LINEAR-COST trend screen: [[mannKendallDaily]] reads all O(days²)
    * pairs; Cox–Stuart is the sign test on the (x_i, x_{i+c}) pairs of
    * the series' two halves, c = ⌈T/2⌉ (odd length drops the middle),
    * one O(T) pass — the test to reach for FIRST on a long axis.
    *
    * EXACT LAW over the observed-bin sequence (dense prefix-sum rank;
    * calendar gaps harmless — the [[kpssDaily]] discipline): the
    * half-offset join key _ck + (T+1) div 2 is column arithmetic off
    * the in-frame total, so no driver collect anywhere; S⁺/S⁻ are
    * exact counts (ties drop, the test's definition) and
    * z = (2S⁺ − n′)/√n′ is ONE pinned chain. NULL when n′ = 0.
    *
    * Scale shape: one per-bin aggregate, one prefix-sum pass, one
    * dense-rank equi-join, a 1-row fold.
    *
    * Output (1 row): (n_bins, n_pairs, s_plus, z_pico).
    */
  def coxStuartDaily(events: DataFrame, tsCol: String, valueCol: String,
      binMicros: Long = 86400L * 1000000L): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    val perBin = events
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(expr(s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), " +
        s"${binMicros}L)) div ${binMicros}L").as("_t"))
      .agg(sum(col(valueCol).cast("long")).as("_y"))
    val seq0 = graft.ops.PrefixSum.inclusiveAll(perBin, "_t",
      Seq(lit(1L) -> "_ck"), withTotals = true)
      .select(col("_y"), col("_ck"), col("_ck_total").as("_tn"))
    val half = expr("(_tn + 1L) div 2")
    val pairAgg = seq0
      .select((col("_ck") + half).as("_ckb"), col("_y").as("_ya"))
      .join(seq0.select(col("_ck").as("_ckb"), col("_y").as("_yb")),
        "_ckb")
      .agg(
        coalesce(sum(when(col("_yb") > col("_ya"), 1L).otherwise(0L)),
          lit(0L)).as("s_plus"),
        coalesce(sum(when(col("_yb") < col("_ya"), 1L).otherwise(0L)),
          lit(0L)).as("_sm"))
    val agg = seq0.agg(coalesce(max(col("_tn")), lit(0L)).as("n_bins"))
      .crossJoin(broadcast(pairAgg))
    val np = col("s_plus") + col("_sm")
    val z = (lit(2L) * col("s_plus") - np).cast("double") /
      sqrt(greatest(np.cast("double"), lit(1.0e-300)))
    agg.select(col("n_bins"), np.as("n_pairs"), col("s_plus"),
      when(np > 0L, round(z * lit(1.0e12)).cast("long")).as("z_pico"))
  }

  def mannKendallDaily(events: DataFrame, tsCol: String,
      binMicros: Long = 86400L * 1000000L): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    val d = Guards.boundedDomain(
      events.filter(col(tsCol).isNotNull)
        .groupBy(expr(s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), " +
          s"${binMicros}L)) div ${binMicros}L").as("_x"))
        .agg(count(lit(1)).as("_y")),
      maxRows = 30000L, op = "mannKendallDaily",
      hint = "the bin axis grew past 82 years of daily bins (the day-pair " +
        "join is O(days^2)) — aggregate to a coarser time grain first")
    val a = d.select(col("_x").as("_xa"), col("_y").as("_ya"))
    val b = d.select(col("_x").as("_xb"), col("_y").as("_yb"))
    val s = a.join(b, col("_xb") > col("_xa"))
      .agg(coalesce(sum(
        when(col("_yb") > col("_ya"), 1L)
          .when(col("_yb") < col("_ya"), -1L).otherwise(0L)), lit(0L))
        .as("s_stat"))
    val n = d.agg(count(lit(1)).as("n_days"))
    val ties = d.groupBy(col("_y")).agg(count(lit(1)).as("_t"))
      .agg(coalesce(sum(col("_t") * (col("_t") - lit(1L))
        * (lit(2L) * col("_t") + lit(5L))), lit(0L)).as("_tt"))
    val var18 = col("n_days") * (col("n_days") - lit(1L)) *
      (lit(2L) * col("n_days") + lit(5L)) - col("_tt")
    val zNum = when(col("s_stat") > 0L, (col("s_stat") - lit(1L)).cast("double"))
      .when(col("s_stat") < 0L, (col("s_stat") + lit(1L)).cast("double"))
      .otherwise(lit(0.0))
    n.crossJoin(broadcast(s)).crossJoin(broadcast(ties))
      .select(col("n_days"), col("s_stat"), var18.as("var_s18"),
        // greatest(·, 1): identity whenever the when() fires (var18 ≥ 1
        // there) — keeps a CSE-hoisted division off 0/0 → NaN → ANSI
        // long-cast failure (Timeseries.scala:22's clamp discipline)
        when(var18 > 0L,
          round(zNum / sqrt(greatest(var18, lit(1L)).cast("double")
            / lit(18.0)) * lit(1.0e12)).cast("long")).as("z_pico"))
  }
}
