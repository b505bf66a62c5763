package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ExcelSerial
import graft.model.PathOps
import graft.ops.{Hierarchy, Parents, Upsert}
import graft.views.Analytic

/** Event-stream laws: sessions, windows, ACF, CUSUM, Markov kernels, funnels, retention, decay.
  *
  * Split from the monolithic `Registry` object (round 15): members are
  * unchanged; `Registry` mixes every family trait in, so the public
  * surface (`Registry.queries` / `Registry.oracle` / each q* member) is
  * identical. Cross-family helpers are `private[queries]`; vals are lazy
  * so trait-linearization order can never null-init a shared fragment.
  */
trait TimeseriesQueries { self: RegistryAll =>

  // Event-time tumbling window aggregate (batch semantics == streaming agg)
  def qEventWindows(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        // decimal-exact sum, DOUBLE on the wire (driver comparator can't
        // hash Decimal consistently — see qLineitemAgg note)
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
          .cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total_value"))
      .orderBy("window_start", "event_type")

  lazy val qEventWindowsSql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type, COUNT(*) AS n,
      | CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_value
      | FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin.replace("\n", " ")

  // Gap-based session windows (30 min): the oracle derives sessions
  // independently via gaps-and-islands (lag + cumulative break-sum), so this
  // cross-checks Spark's session_window semantics, not just our arithmetic.
  // Session break law: a gap ≥ the duration starts a new session (Spark's
  // window is half-open [start, last+gap)).
  def qUserSessions(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamIngest.userSessions(t(spark, dir, "events"), gap = "30 minutes")
      .orderBy("user_id", "session_start")

  lazy val qUserSessionsSql: String =
    """WITH g AS (
      | SELECT user_id, event_id, ts, value,
      |  CASE WHEN lag(ts) OVER w IS NULL
      |       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), s AS (
      | SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS UNBOUNDED PRECEDING) AS sid FROM g)
      | SELECT min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  user_id, COUNT(*) AS n_events,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_value
      | FROM s GROUP BY user_id, sid
      | ORDER BY user_id, session_start""".stripMargin.replace("\n", " ")

  /** Event-time range-join attribution ([[graft.streaming.StreamIngest
    * .correlatedEvents]] run on BATCH frames — the analyzer's
    * EliminateEventTimeWatermark drops the watermark nodes, leaving the
    * identical join plan): every view attributed to same-user purchases
    * inside the following 60 minutes. This row is the DuckDB-ORACLED
    * anchor of the stream-stream join tier — StreamIngestSpec asserts the
    * STREAMING emission equals exactly this frame, so the watermarked
    * state-store path is transitively hash-gated. Timestamp arithmetic is
    * exact integer micros on both engines (timestamp + INTERVAL).
    *
    * Scale shape: user-keyed equi join with a range residual — shuffles
    * on user_id, never a time-cross product; at stream scale the range
    * condition is what bounds the state store (the operator's scaladoc).
    */
  def qEventAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    graft.streaming.StreamIngest.correlatedEvents(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "purchase"), rangeMinutes = 60)
      .orderBy("user_id", "l_event", "r_event")
  }

  lazy val qEventAttributionSql: String =
    """SELECT a.user_id, a.event_id AS l_event, a.event_type AS l_type,
      |  b.event_id AS r_event, b.event_type AS r_type,
      |  a.ts AS l_ts, b.ts AS r_ts
      | FROM events a JOIN events b ON a.user_id = b.user_id
      |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 60 MINUTE
      |  AND a.event_id <> b.event_id
      | WHERE a.event_type = 'view' AND b.event_type = 'purchase'
      | ORDER BY a.user_id, l_event, r_event""".stripMargin.replace("\n", " ")

  /** Per-user lifetime totals — the DuckDB-oracled BATCH ANCHOR of the
    * `mapGroupsWithState` running-totals operator
    * ([[graft.streaming.StreamIngest.runningUserTotals]]): the stream's
    * final state per user must converge to exactly this aggregate
    * (StreamIngestSpec pins the equivalence), which is what makes the
    * custom-state path hash-gated rather than spec-only. Sum discipline:
    * decimal-exact Σ, DOUBLE on the wire (the qEventWindows note).
    */
  def qUserTotals(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
          .cast("double").as("total_value"))
      .orderBy("user_id")

  lazy val qUserTotalsSql: String =
    """SELECT user_id, COUNT(*) AS n_events,
      | CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_value
      | FROM events GROUP BY user_id ORDER BY user_id""".stripMargin.replace("\n", " ")

  /** Per-user lag/lead event features: microsecond gap since the previous
    * event plus neighboring event types — the feature-engineering window
    * pattern (sessionization inputs, inter-arrival models). Gaps are exact
    * integer micros (`unix_micros` vs DuckDB `epoch_us`), never interval or
    * float arithmetic, so the law is engine-independent. The window is
    * hash-partitioned by user — no global sort.
    */
  def qEventDeltas(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
          .as("gap_us"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .orderBy("user_id", "event_id")
  }

  lazy val qEventDeltasSql: String =
    """SELECT user_id, event_id, ts,
      | epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us,
      | lag(event_type) OVER w AS prev_type,
      | lead(event_type) OVER w AS next_type
      | FROM events
      | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      | ORDER BY user_id, event_id""".stripMargin.replace("\n", " ")

  /** RANGE-frame rolling aggregate: per-user trailing 1-HOUR event total —
    * the time-based sibling of [[qMovingWindow]]'s ROWS frame (a RANGE frame
    * bounds by ordering VALUE, so co-timed events aggregate together no
    * matter how many there are). The frame is defined on exact integer
    * micros (`unix_micros` / `epoch_us`), not intervals, so the boundary
    * arithmetic is engine-identical; sums stay decimal-exact and ship as
    * DOUBLE.
    */
  def qRollingHour(spark: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-(hourUs - 1), 0) // inclusive trailing hour: (ts-1h, ts]
    t(spark, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts")))
      .select(col("user_id"), col("event_id"), col("ts"),
        sum(col("value").cast("decimal(18,2)")).over(w)
          .cast("decimal(18,2)").cast("double").as("hour_total"),
        count(lit(1)).over(w).as("hour_n"))
      .orderBy("user_id", "event_id")
  }

  lazy val qRollingHourSql: String =
    """SELECT user_id, event_id, ts,
      | CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DECIMAL(18,2)) AS DOUBLE) AS hour_total,
      | COUNT(*) OVER w AS hour_n
      | FROM events
      | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |   RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
      | ORDER BY user_id, event_id""".stripMargin.replace("\n", " ")

  /** Hourly autocorrelogram of event traffic at lags 1..24
    * ([[graft.ops.Timeseries.binnedAcf]]): the seasonality /
    * self-similarity screen beside q_burstiness's dispersion — daily
    * periodicity shows as a lag-24 peak, a scheduled bot as near-1 at
    * its period. Dense-grid law (missing hours are 0), every moment and
    * cross term an exact integer, the ratio multiplied through by N² so
    * ONE double division ends the chain.
    */
  def qAcfHourly(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Timeseries.binnedAcf(t(spark, dir, "events"), "ts", maxLag = 24)

  lazy val qAcfHourlySql: String = {
    val us = 3600000000L
    // all-integer numerator/denominator in HUGEINT (the engine's
    // DECIMAL(38,0) twin): num = N^2*C - N*S1*(2*S1-hd-tl) + (N-L)*S1^2,
    // den = N^2*S2 - N*S1^2 — exact, so term order is free; the single
    // double division is the only float
    s"""WITH hb AS (SELECT (epoch_us(ts) - (((epoch_us(ts) % $us) + $us) % $us)) // $us AS h
      |  FROM events WHERE ts IS NOT NULL),
      | o AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS y FROM hb GROUP BY 1),
      | st AS (SELECT MIN(h) AS hmin, MAX(h) AS hmax,
      |   CAST(SUM(y) AS HUGEINT) AS s1,
      |   CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS s2 FROM o),
      | lg AS (SELECT CAST(unnest(generate_series(1, 24)) AS BIGINT) AS lag),
      | cl AS (SELECT lag, CAST(SUM(CAST(a.y AS HUGEINT) * b.y) AS HUGEINT) AS clv
      |  FROM o a CROSS JOIN lg JOIN o b ON b.h = a.h + lag GROUP BY 1),
      | ht AS (SELECT lag,
      |   CAST(SUM(CASE WHEN a.h < st.hmin + lag THEN a.y ELSE 0 END) AS HUGEINT) AS hd,
      |   CAST(SUM(CASE WHEN a.h > st.hmax - lag THEN a.y ELSE 0 END) AS HUGEINT) AS tl
      |  FROM o a CROSS JOIN lg CROSS JOIN st GROUP BY 1)
      | SELECT lg.lag AS lag,
      |  CASE WHEN (st.hmax - st.hmin + 1) > lg.lag
      |   THEN (st.hmax - st.hmin + 1) - lg.lag ELSE 0 END AS n_pairs,
      |  CASE WHEN (st.hmax - st.hmin + 1) > lg.lag AND
      |    (CAST(st.hmax - st.hmin + 1 AS HUGEINT) * (st.hmax - st.hmin + 1) * st.s2
      |     - (st.hmax - st.hmin + 1) * st.s1 * st.s1) <> 0
      |   THEN CAST(round(CAST(
      |     CAST(st.hmax - st.hmin + 1 AS HUGEINT) * (st.hmax - st.hmin + 1) * COALESCE(cl.clv, 0)
      |     - (st.hmax - st.hmin + 1) * st.s1 * (2 * st.s1 - COALESCE(ht.hd, 0) - COALESCE(ht.tl, 0))
      |     + ((st.hmax - st.hmin + 1) - lg.lag) * st.s1 * st.s1
      |    AS DOUBLE) / CAST(
      |     CAST(st.hmax - st.hmin + 1 AS HUGEINT) * (st.hmax - st.hmin + 1) * st.s2
      |     - (st.hmax - st.hmin + 1) * st.s1 * st.s1
      |    AS DOUBLE) * 1000000000000.0) AS BIGINT)
      |  END AS acf_pico
      | FROM lg LEFT JOIN cl ON cl.lag = lg.lag LEFT JOIN ht ON ht.lag = lg.lag
      | CROSS JOIN st ORDER BY lag""".stripMargin.replace("\n", " ")
  }

  /** CUSUM changepoint of hourly event volume
    * ([[graft.ops.Timeseries.cusumChangepoint]], Page '54): the dense-
    * grid bin where cumulative deviation from the global mean peaks —
    * WHEN traffic shifted, beside q_acf_hourly's "does it repeat" and
    * the drift family's "did the histogram move". The N-scaled CUSUM is
    * exact integers end to end; gap extrema are evaluated at gap
    * endpoints (the CUSUM is linear across missing bins), so the dense
    * grid is never materialized.
    */
  def qCusumChange(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Timeseries.cusumChangepoint(t(spark, dir, "events"), "ts")

  lazy val qCusumChangeSql: String = {
    val us = 3600000000L
    s"""WITH hb AS (SELECT (epoch_us(ts) - (((epoch_us(ts) % $us) + $us) % $us)) // $us AS h
      |  FROM events WHERE ts IS NOT NULL),
      | o AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS y FROM hb GROUP BY 1),
      | st AS (SELECT MIN(h) AS hmin, MAX(h) AS hmax,
      |   CAST(SUM(y) AS HUGEINT) AS yt FROM o),
      | pre AS (SELECT h, CAST(SUM(y) OVER (ORDER BY h) AS HUGEINT) AS p,
      |   lead(h) OVER (ORDER BY h) AS hn FROM o),
      | cand AS (
      |  SELECT h AS b, CAST(st.hmax - st.hmin + 1 AS HUGEINT) * p
      |    - (h - st.hmin + 1) * st.yt AS s FROM pre CROSS JOIN st
      |  UNION ALL
      |  SELECT hn - 1 AS b, CAST(st.hmax - st.hmin + 1 AS HUGEINT) * p
      |    - (hn - 1 - st.hmin + 1) * st.yt AS s
      |  FROM pre CROSS JOIN st WHERE hn IS NOT NULL AND hn > h + 1),
      | best AS (SELECT b, s FROM cand ORDER BY ABS(s) DESC, b ASC LIMIT 1)
      | SELECT make_timestamp(b * $us) AS change_ts,
      |  CAST(s AS BIGINT) AS cusum_scaled,
      |  CAST(st.hmax - st.hmin + 1 AS BIGINT) AS n_bins,
      |  CAST(st.yt AS BIGINT) AS total_events
      | FROM best CROSS JOIN st WHERE st.yt > 0""".stripMargin.replace("\n", " ")
  }

  /** Event-type Markov transition matrix per user stream
    * ([[graft.ops.Timeseries.markovTransitions]]): the empirical
    * transition kernel — which action follows which — with exact pair
    * counts ordered totally by (ts, event_id) and one double division
    * per cell. Bot scripts and broken funnels show as degenerate rows.
    */
  def qMarkovTransition(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Timeseries.markovTransitions(t(spark, dir, "events"),
        "user_id", "ts", "event_type", "event_id")
      .orderBy("from_type", "to_type")

  private[queries] lazy val markovCellCtes: String =
    """p AS (SELECT event_type AS ft,
      |   lead(event_type) OVER (PARTITION BY user_id
      |     ORDER BY ts, event_id) AS tt
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |   AND event_type IS NOT NULL AND event_id IS NOT NULL),
      | c AS (SELECT ft AS from_type, tt AS to_type,
      |   CAST(COUNT(*) AS BIGINT) AS n_pairs
      |  FROM p WHERE tt IS NOT NULL GROUP BY 1, 2),
      | r AS (SELECT from_type, to_type, n_pairs,
      |   CAST(SUM(n_pairs) OVER (PARTITION BY from_type) AS BIGINT)
      |    AS row_total FROM c)""".stripMargin

  lazy val qMarkovTransitionSql: String =
    s"""WITH $markovCellCtes
      | SELECT from_type, to_type, n_pairs, row_total,
      |  CAST(round(CAST(n_pairs AS DOUBLE) / CAST(row_total AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS prob_micro
      | FROM r ORDER BY from_type, to_type""".stripMargin.replace("\n", " ")

  /** First-order entropy rate of the event stream
    * ([[graft.ops.Timeseries.entropyRate]]): H(next | prev) over the
    * same transition law — the predictability one-number (scripted
    * replay → 0 bits). Per-cell log₂ terms pico-quantized before the
    * DECIMAL Σ, one closing double division.
    */
  def qEntropyRate(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Timeseries.entropyRate(t(spark, dir, "events"),
      "user_id", "ts", "event_type", "event_id")

  lazy val qEntropyRateSql: String =
    s"""WITH $markovCellCtes,
      | tm AS (SELECT n_pairs, from_type,
      |   CAST(n_pairs AS HUGEINT) * CAST(round(
      |     log2(CAST(row_total AS DOUBLE) / CAST(n_pairs AS DOUBLE))
      |     * 1000000000000.0) AS BIGINT) AS term FROM r)
      | SELECT CAST(SUM(n_pairs) AS BIGINT) AS n_transitions,
      |  CAST(COUNT(DISTINCT from_type) AS BIGINT) AS n_states,
      |  CAST(round(CAST(SUM(term) AS DOUBLE) / CAST(SUM(n_pairs) AS DOUBLE))
      |   AS BIGINT) AS entropy_rate_pico
      | FROM tm HAVING SUM(n_pairs) IS NOT NULL"""
      .stripMargin.replace("\n", " ")

  /** Ordered conversion funnel view → click → purchase: per user, the
    * first view, the first click AFTER it, the first purchase after THAT
    * — strictly ordered (the funnel semantics dashboards mean, not mere
    * event presence). Stage counts + two conversion fractions; all
    * timestamp comparisons are exact micros on both engines.
    */
  def qEventFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    def firstAfter(tpe: String, lower: DataFrame, lowerCol: String, as: String) =
      ev.filter(col("event_type") === tpe)
        .join(lower, "user_id")
        .filter(col("ts") > col(lowerCol))
        .groupBy(col("user_id")).agg(min(col("ts")).as(as))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = firstAfter("click", v, "t_view", "t_click")
    val p = firstAfter("purchase", c.select(col("user_id"), col("t_click")),
      "t_click", "t_purchase")
    val nu = ev.select(countDistinct(col("user_id")).as("n_users"))
    nu.crossJoin(v.agg(count(lit(1)).as("n_view")))
      .crossJoin(c.agg(count(lit(1)).as("n_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
      .withColumn("view_to_click",
        col("n_click").cast("double") / col("n_view").cast("double"))
      .withColumn("click_to_purchase",
        col("n_purchase").cast("double") / col("n_click").cast("double"))
  }

  lazy val qEventFunnelSql: String =
    """WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      | c AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM events e
      |  JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
      | p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase FROM events e
      |  JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
      | SELECT
      |  CAST((SELECT COUNT(DISTINCT user_id) FROM events) AS BIGINT) AS n_users,
      |  CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
      |  CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click,
      |  CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase,
      |  CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
      |    / CAST((SELECT COUNT(*) FROM v) AS DOUBLE) AS view_to_click,
      |  CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
      |    / CAST((SELECT COUNT(*) FROM c) AS DOUBLE) AS click_to_purchase"""
      .stripMargin.replace("\n", " ")

  /** Weekly retention cohorts: users cohort by first-seen week (fixed
    * origin 2024-01-01, integer micros FLOOR-divided by a week), the
    * matrix counts users from cohort w active in week a ≥ w, and
    * `retention` divides by the cohort size — the standard
    * product-analytics triangle, exact integers end to end. Week numbers
    * use explicit floor division (`(d − pmod(d, w)) div w` — the pmod
    * makes the numerator an exact multiple of w, so the engine's
    * truncate-vs-floor division semantics cannot matter): Spark's `div`
    * truncates toward zero while DuckDB's `//` floors, so a bare `div`
    * would diverge (and merge weeks −1 and 0) for any event BEFORE the
    * origin — the law is engine-exact for all timestamps, not just the
    * post-origin ones the fixture happens to hold.
    */
  def qCohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val weekMicros = 604800000000L
    val origin = 1704067200000000L // 2024-01-01T00:00:00Z in micros
    val ev = t(spark, dir, "events")
      .select(col("user_id"),
        expr(s"(unix_micros(ts) - ${origin}L - pmod(unix_micros(ts) - ${origin}L, " +
          s"${weekMicros}L)) div ${weekMicros}L").as("wk"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_week"))
    val active = ev.select(col("user_id"), col("wk")).distinct()
    val cells = active.join(cohort, "user_id")
      .groupBy(col("cohort_week"), col("wk").as("active_week"))
      .agg(count(lit(1)).as("n_users"))
    val sizes = cohort.groupBy(col("cohort_week")).agg(count(lit(1)).as("cohort_size"))
    cells.join(sizes, "cohort_week")
      .withColumn("retention",
        col("n_users").cast("double") / col("cohort_size").cast("double"))
      .select(col("cohort_week"), col("active_week"), col("n_users"),
        col("cohort_size"), col("retention"))
      .orderBy("cohort_week", "active_week")
  }

  lazy val qCohortRetentionSql: String =
    """WITH w AS (SELECT user_id,
      |   (epoch_us(ts) - 1704067200000000
      |    - ((((epoch_us(ts) - 1704067200000000) % 604800000000)
      |        + 604800000000) % 604800000000)) // 604800000000 AS wk FROM events),
      | cohort AS (SELECT user_id, CAST(MIN(wk) AS BIGINT) AS cohort_week
      |  FROM w GROUP BY 1),
      | active AS (SELECT DISTINCT user_id, CAST(wk AS BIGINT) AS wk FROM w),
      | cells AS (SELECT c.cohort_week, a.wk AS active_week,
      |   CAST(COUNT(*) AS BIGINT) AS n_users
      |  FROM active a JOIN cohort c USING (user_id) GROUP BY 1, 2),
      | sizes AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
      |  FROM cohort GROUP BY 1)
      | SELECT cohort_week, active_week, n_users, cohort_size,
      |  CAST(n_users AS DOUBLE) / CAST(cohort_size AS DOUBLE) AS retention
      | FROM cells JOIN sizes USING (cohort_week)
      | ORDER BY cohort_week, active_week""".stripMargin.replace("\n", " ")

  /** Exponentially-decayed engagement mass per user (λ = 0.1/day against
    * the corpus max timestamp): each event contributes
    * `round(exp(−0.1·Δdays)·1e6)` micro-units — per-term ln/exp
    * quantization (the DSIR discipline), so the Σ is an exact integer and
    * the top-20 ranking is engine-exact. The standard recency-weighted
    * activity score.
    */
  def qDecayCounts(spark: SparkSession, dir: String): DataFrame =
    decayMass(spark, dir)
      .orderBy(col("decay_micro").desc, col("user_id"))
      .limit(20)

  /** Full per-user decay-mass table behind [[qDecayCounts]] — also the
    * plateau probe's surface.
    */
  private[queries] def decayMass(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val mx = ev.agg(max(unix_micros(col("ts"))).as("_mx"))
    ev.select(col("user_id"), unix_micros(col("ts")).as("_tm"))
      .crossJoin(broadcast(mx))
      .withColumn("_term",
        round(exp(lit(-0.1) *
          ((col("_mx") - col("_tm")).cast("double") / lit(86400000000.0)))
          * 1000000.0).cast("long"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("_term")).as("decay_micro"))
  }

  lazy val qDecayCountsSql: String =
    """WITH mx AS (SELECT MAX(epoch_us(ts)) AS m FROM events),
      | t AS (SELECT user_id,
      |   CAST(round(exp(-0.1 * (CAST(mx.m - epoch_us(ts) AS DOUBLE)
      |     / 86400000000.0)) * 1000000.0) AS BIGINT) AS term
      |  FROM events CROSS JOIN mx)
      | SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(term) AS BIGINT) AS decay_micro
      | FROM t GROUP BY 1 ORDER BY decay_micro DESC, user_id LIMIT 20"""
      .stripMargin.replace("\n", " ")

  /** Daily error-rate trend over the event stream: per-day counts, the
    * exact error fraction, and its 7-day trailing moving average (ROWS
    * frame over the ordered day axis — the q_moving_window accumulation
    * law) — the ops-monitoring staple.
    *
    * The unpartitioned `Window.orderBy(day)` is BOUNDED BY LAW: its
    * input is the per-day aggregate, so it grows with the TIME SPAN of
    * the stream (10⁵ days ≈ 274 years), never with event volume — and
    * that bound is ENFORCED in-plan via [[graft.ops.Guards.boundedDomain]]
    * upstream of the window, the waterfill posture. Day bins use the
    * file's `(x − pmod(x, b)) div b` floor law (DuckDB `//` parity for
    * pre-1970 timestamps).
    */
  def qErrorTrend(spark: SparkSession, dir: String): DataFrame = {
    val dayMicros = 86400000000L
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rowsBetween(-6, 0)
    graft.ops.Guards.boundedDomain(
      t(spark, dir, "events")
        .groupBy(expr(s"(unix_micros(ts) - pmod(unix_micros(ts), " +
          s"${dayMicros}L)) div ${dayMicros}L").as("day"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("n_errors")),
      maxRows = 100000L, op = "qErrorTrend",
      hint = "the day axis grew past 274 years — aggregate to a coarser " +
        "time grain before the moving average")
      .withColumn("err_frac",
        col("n_errors").cast("double") / col("n_events").cast("double"))
      .withColumn("ma7", avg(col("err_frac")).over(w))
      .orderBy("day")
  }

  lazy val qErrorTrendSql: String =
    """WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
      |   CAST(COUNT(*) AS BIGINT) AS n_events,
      |   CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_errors
      |  FROM events GROUP BY 1)
      | SELECT CAST(day AS BIGINT) AS day, n_events, n_errors,
      |  CAST(n_errors AS DOUBLE) / CAST(n_events AS DOUBLE) AS err_frac,
      |  AVG(CAST(n_errors AS DOUBLE) / CAST(n_events AS DOUBLE))
      |    OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma7
      | FROM d ORDER BY day""".stripMargin.replace("\n", " ")

  /** Permutation entropy per event_type
    * ([[graft.ops.Timeseries.permutationEntropy]], Bandt & Pompe '02):
    * ordinal-pattern complexity of the per-(user, type) value streams —
    * the "is this telemetry organic" screen that sees order structure
    * q_acf_hourly's linear correlations miss. Pattern codes are pure
    * integer comparisons; entropy follows the q_entropy_rate pico
    * discipline with the ln 6 normalizer interpolated from the
    * engine's own constant.
    */
  def qPermEntropy(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Timeseries.permutationEntropy(t(spark, dir, "events"),
      "user_id", "ts", "value", "event_type", "event_id")

  lazy val qPermEntropySql: String = {
    val lnSix = math.log(6.0)
    s"""WITH base AS (SELECT event_type, value AS x0,
      |   lead(value, 1) OVER w AS x1, lead(value, 2) OVER w AS x2
      |  FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
      |   AND event_type IS NOT NULL AND event_id IS NOT NULL
      |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
      | tri AS (SELECT event_type,
      |   ((CASE WHEN x1 < x0 THEN 1 ELSE 0 END)
      |    + (CASE WHEN x2 < x0 THEN 1 ELSE 0 END)) * 9
      |   + ((CASE WHEN x0 <= x1 THEN 1 ELSE 0 END)
      |    + (CASE WHEN x2 < x1 THEN 1 ELSE 0 END)) * 3
      |   + (CASE WHEN x0 <= x2 THEN 1 ELSE 0 END)
      |   + (CASE WHEN x1 <= x2 THEN 1 ELSE 0 END) AS pat
      |  FROM base WHERE x1 IS NOT NULL AND x2 IS NOT NULL),
      | cells AS (SELECT event_type, pat, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM tri GROUP BY 1, 2),
      | wn AS (SELECT event_type, c,
      |   CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM cells),
      | terms AS (SELECT event_type, n, CAST(c AS HUGEINT)
      |   * CAST(round(ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE))
      |     * 1000000000000.0) AS BIGINT) AS term FROM wn),
      | ag AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_triples,
      |   CAST(COUNT(*) AS BIGINT) AS n_patterns,
      |   CAST(SUM(term) AS HUGEINT) AS tsum FROM terms GROUP BY 1),
      | h AS (SELECT event_type, n_triples, n_patterns,
      |   CAST(round(CAST(tsum AS DOUBLE) / CAST(n_triples AS DOUBLE))
      |    AS BIGINT) AS h_pico FROM ag)
      | SELECT event_type, n_triples, n_patterns, h_pico,
      |  CAST(round(CAST(h_pico AS DOUBLE) / $lnSix / 1000000.0) AS BIGINT)
      |   AS pe_micro
      | FROM h ORDER BY event_type""".stripMargin.replace("\n", " ")
  }

  /** Wald–Wolfowitz runs test per event_type
    * ([[graft.ops.Timeseries.runsTest]]): is each stream's
    * above/below-median pattern random, or does it clump/alternate?
    * Per-stream exact moments summed (independent streams), one double
    * chain for z.
    */
  def qRunsTest(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Timeseries.runsTest(t(spark, dir, "events"),
      "user_id", "ts", "value", "event_type", "event_id")

  lazy val qRunsTestSql: String =
    """WITH base AS (SELECT event_type, user_id, ts, event_id, value
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |   AND value IS NOT NULL AND event_type IS NOT NULL
      |   AND event_id IS NOT NULL),
      | med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM base GROUP BY 1),
      | fl AS (SELECT b.event_type, b.user_id, (b.value > m.med) AS x,
      |   lag(b.value > m.med) OVER (PARTITION BY b.user_id, b.event_type
      |    ORDER BY b.ts, b.event_id) AS prev
      |  FROM base b JOIN med m USING (event_type)),
      | st AS (SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n,
      |   CAST(SUM(CASE WHEN x THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |   1 + CAST(SUM(CASE WHEN prev IS NOT NULL AND x <> prev
      |     THEN 1 ELSE 0 END) AS BIGINT) AS r
      |  FROM fl GROUP BY 1, 2),
      | q AS (SELECT event_type, n, n1, n - n1 AS n2, r FROM st
      |  WHERE n1 > 0 AND n - n1 > 0),
      | mm AS (SELECT event_type, r,
      |   CAST(round((2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
      |     / CAST(n AS DOUBLE) + 1.0) * 1.0e6) AS BIGINT) AS mu,
      |   CAST(round(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
      |     * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
      |        - CAST(n AS DOUBLE))
      |     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
      |        * (CAST(n AS DOUBLE) - 1.0)) * 1.0e6) AS BIGINT) AS vv
      |  FROM q),
      | ag AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_streams,
      |   CAST(SUM(r) AS BIGINT) AS n_runs,
      |   CAST(SUM(CAST(mu AS HUGEINT)) AS BIGINT) AS mu_sum_micro,
      |   CAST(SUM(CAST(vv AS HUGEINT)) AS BIGINT) AS var_sum_micro
      |  FROM mm GROUP BY 1)
      | SELECT event_type, n_streams, n_runs, mu_sum_micro, var_sum_micro,
      |  CASE WHEN var_sum_micro > 0 THEN
      |   CAST(round((CAST(n_runs AS DOUBLE)
      |     - CAST(mu_sum_micro AS DOUBLE) / 1.0e6)
      |    / sqrt(CAST(var_sum_micro AS DOUBLE) / 1.0e6) * 1.0e12) AS BIGINT)
      |  END AS z_pico
      | FROM ag ORDER BY event_type""".stripMargin.replace("\n", " ")

  /** Theil–Sen robust daily-volume trend
    * ([[graft.ops.Timeseries.theilSenDaily]]): the median pairwise
    * slope over the bounded observed-day table with the median-residual
    * intercept — the trend one outage day cannot own.
    */
  def qTheilSen(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Timeseries.theilSenDaily(t(spark, dir, "events"), "ts")

  lazy val qTheilSenSql: String =
    """WITH d AS (SELECT epoch_us(ts) // 86400000000 AS x,
      |   CAST(COUNT(*) AS BIGINT) AS y
      |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
      | s AS (SELECT CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE)
      |   AS sl FROM d a JOIN d b ON b.x > a.x),
      | f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |   quantile_cont(sl, 0.5) AS slope_per_day FROM s
      |  HAVING COUNT(*) > 0),
      | nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM d),
      | r AS (SELECT n_days, n_pairs, slope_per_day,
      |   CAST(y AS DOUBLE) - slope_per_day * CAST(x AS DOUBLE) AS res
      |  FROM d CROSS JOIN f CROSS JOIN nd)
      | SELECT n_days, n_pairs, slope_per_day,
      |  quantile_cont(res, 0.5) AS intercept
      | FROM r GROUP BY 1, 2, 3""".stripMargin.replace("\n", " ")

  /** Pettitt change-point test over daily event values
    * ([[graft.ops.Timeseries.pettittDaily]]): WHICH day did the event-
    * value distribution shift — q_mann_kendall's change-point
    * companion, the max-over-splits Mann–Whitney off two prefix-sum
    * passes (pooled value midranks, then the bin cumulative).
    */
  def qPettitt(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Timeseries.pettittDaily(
      t(spark, dir, "events")
        .select(col("ts"), floor(col("value") * lit(100.0)).as("cents")),
      "ts", "cents")

  lazy val qPettittSql: String =
    """WITH base AS (SELECT epoch_us(ts) // 86400000000 AS t,
      |   CAST(floor(value * 100.0) AS BIGINT) AS v
      |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      | vt AS (SELECT v, CAST(COUNT(*) AS HUGEINT) AS m
      |  FROM base GROUP BY 1),
      | mr AS (SELECT v, 2 * SUM(m) OVER (ORDER BY v
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - m + 1 AS mr2
      |  FROM vt),
      | cells AS (SELECT t, v, CAST(COUNT(*) AS HUGEINT) AS c
      |  FROM base GROUP BY 1, 2),
      | pb AS (SELECT t, CAST(SUM(c) AS HUGEINT) AS nb,
      |   CAST(SUM(c * mr2) AS HUGEINT) AS sr2
      |  FROM cells JOIN mr USING (v) GROUP BY 1),
      | cumb AS (SELECT t, SUM(nb) OVER w AS cn, SUM(sr2) OVER w AS csr,
      |   SUM(nb) OVER () AS n
      |  FROM pb WINDOW w AS (ORDER BY t
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      | u AS (SELECT t, cn * (n + 1) - csr AS uu, n FROM cumb),
      | kx AS (SELECT COALESCE(MAX(abs(uu)), 0) AS k FROM u),
      | ag AS (SELECT COALESCE(CAST(MAX(n) AS BIGINT), 0) AS n_rows,
      |   CAST(COUNT(*) AS BIGINT) AS n_bins,
      |   COALESCE(CAST(MAX(kx.k) AS BIGINT), 0) AS k_stat,
      |   MIN(CASE WHEN abs(uu) = kx.k THEN t END) AS change_bin
      |  FROM u, kx)
      | SELECT n_rows, n_bins, k_stat,
      |  CAST(change_bin AS BIGINT) AS change_bin,
      |  CASE WHEN n_rows >= 2 THEN
      |   CAST(round(least(1.0, 2.0 * exp(-6.0 * CAST(k_stat AS DOUBLE)
      |    * CAST(k_stat AS DOUBLE)
      |    / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)
      |       * CAST(n_rows AS DOUBLE)
      |       + CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE))))
      |    * 1.0e12) AS BIGINT) END AS p_pico
      | FROM ag""".stripMargin.replace("\n", " ")

  /** Buishand range/Q change-point of daily event-value totals
    * ([[graft.ops.Timeseries.buishandDaily]]): does the cumulative
    * daily value mass bulge away from its mean line, and WHERE — the
    * partial-sum companion of q_pettitt (mean-level drifts accumulate
    * linearly here where rank statistics dilute them), off one
    * prefix-sum pass over the bin axis.
    */
  def qBuishand(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Timeseries.buishandDaily(
      t(spark, dir, "events")
        .select(col("ts"), floor(col("value") * lit(100.0)).as("cents")),
      "ts", "cents")

  lazy val qBuishandSql: String =
    """WITH base AS (SELECT epoch_us(ts) // 86400000000 AS t,
      |   CAST(floor(value * 100.0) AS BIGINT) AS v
      |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      | pb AS (SELECT t, CAST(SUM(v) AS HUGEINT) AS y
      |  FROM base GROUP BY 1),
      | cumb AS (SELECT t, y, SUM(y) OVER w AS cy,
      |   CAST(SUM(1) OVER w AS HUGEINT) AS ck,
      |   SUM(y) OVER () AS cyt, CAST(COUNT(*) OVER () AS HUGEINT) AS tn
      |  FROM pb WINDOW w AS (ORDER BY t
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      | u AS (SELECT t, y, tn * cy - ck * cyt AS ts2, tn, cyt FROM cumb),
      | mx AS (SELECT COALESCE(MAX(ts2), 0) AS tsmax,
      |   COALESCE(MIN(ts2), 0) AS tsmin FROM u),
      | ag AS (SELECT COALESCE(CAST(MAX(tn) AS BIGINT), 0) AS n_bins,
      |   COALESCE(CAST(MAX(cyt) AS HUGEINT), 0) AS cy,
      |   COALESCE(SUM(y * y), 0) AS qy,
      |   MAX(mx.tsmax) AS tsmax, MAX(mx.tsmin) AS tsmin,
      |   MIN(CASE WHEN abs(ts2) = greatest(abs(mx.tsmax), abs(mx.tsmin))
      |     THEN t END) AS change_bin
      |  FROM u, mx),
      | w AS (SELECT n_bins, tsmax, tsmin, change_bin,
      |   (CAST(qy AS DOUBLE) - CAST(cy AS DOUBLE) * CAST(cy AS DOUBLE)
      |      / CAST(n_bins AS DOUBLE)) / CAST(n_bins - 1 AS DOUBLE) AS svar
      |  FROM ag)
      | SELECT n_bins, CAST(tsmax AS DOUBLE) AS ts_max,
      |  CAST(tsmin AS DOUBLE) AS ts_min,
      |  CAST(change_bin AS BIGINT) AS change_bin,
      |  CASE WHEN n_bins >= 2 AND svar > 0.0 THEN
      |   CAST(round(CAST(tsmax - tsmin AS DOUBLE) / CAST(n_bins AS DOUBLE)
      |    / (sqrt(svar) * sqrt(CAST(n_bins AS DOUBLE))) * 1.0e12)
      |    AS BIGINT) END AS rb_pico,
      |  CASE WHEN n_bins >= 2 AND svar > 0.0 THEN
      |   CAST(round(CAST(greatest(abs(tsmax), abs(tsmin)) AS DOUBLE)
      |    / CAST(n_bins AS DOUBLE)
      |    / (sqrt(svar) * sqrt(CAST(n_bins AS DOUBLE))) * 1.0e12)
      |    AS BIGINT) END AS qb_pico
      | FROM w""".stripMargin.replace("\n", " ")

  /** KPSS level-stationarity of daily event revenue
    * ([[graft.ops.Timeseries.kpssDaily]], lag-4 Newey–West): is the
    * daily cents series stationary around a constant level at all? —
    * completing the change-point pair (q_pettitt locates the shift,
    * q_buishand sizes the excursion) with the stationarity H₀ itself;
    * every cumulant exact off the same prefix-sum frame, lag products
    * via one dense-rank equi-join.
    */
  def qKpss(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Timeseries.kpssDaily(
      t(spark, dir, "events")
        .select(col("ts"), floor(col("value") * lit(100.0)).as("cents")),
      "ts", "cents", lag = 4)

  lazy val qKpssSql: String =
    """WITH base AS (SELECT epoch_us(ts) // 86400000000 AS t,
      |   CAST(floor(value * 100.0) AS BIGINT) AS v
      |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      | pb AS (SELECT t, CAST(SUM(v) AS HUGEINT) AS y
      |  FROM base GROUP BY 1),
      | cumb AS (SELECT t, y, SUM(y) OVER w AS cy,
      |   CAST(SUM(1) OVER w AS HUGEINT) AS ck,
      |   SUM(y) OVER () AS cyt, CAST(COUNT(*) OVER () AS HUGEINT) AS tn
      |  FROM pb WINDOW w AS (ORDER BY t
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      | tsf AS (SELECT ck, tn * cy - ck * cyt AS ts2,
      |   tn * y - cyt AS es, tn FROM cumb),
      | a0 AS (SELECT COALESCE(CAST(MAX(tn) AS BIGINT), 0) AS n_bins,
      |   COALESCE(SUM(ts2 * ts2), 0) AS sts,
      |   COALESCE(SUM(es * es), 0) AS g0 FROM tsf),
      | js AS (SELECT CAST(j AS HUGEINT) AS j
      |  FROM (VALUES (1), (2), (3), (4)) v(j)),
      | gw AS (SELECT COALESCE(SUM((5 - j) * a.es * b.es), 0) AS gwv
      |  FROM tsf a, js, tsf b WHERE b.ck = a.ck + j),
      | fin AS (SELECT n_bins, sts, 5 * g0 + 2 * gwv AS s2sc
      |  FROM a0, gw)
      | SELECT n_bins, CAST(sts AS DOUBLE) AS sum_ts2,
      |  CAST(s2sc AS DOUBLE) AS s2_scaled,
      |  CASE WHEN n_bins >= 2 AND s2sc > 0 THEN
      |   CAST(round(CAST(sts AS DOUBLE) * 5.0
      |    / (CAST(n_bins AS DOUBLE) * CAST(s2sc AS DOUBLE)) * 1.0e12)
      |    AS BIGINT) END AS kpss_pico
      | FROM fin""".stripMargin.replace("\n", " ")

  /** Bartels rank von Neumann randomness of daily event revenue
    * ([[graft.ops.Timeseries.bartelsRvn]]): is the daily cents series
    * serially random at all? — the rank-robust screen beside
    * q_runs_test on the same axis, exact doubled-midrank cumulants
    * with the uniform scaling cancelling in RVN.
    */
  def qBartels(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Timeseries.bartelsRvn(
      t(spark, dir, "events")
        .select(col("ts"), floor(col("value") * lit(100.0)).as("cents")),
      "ts", "cents")

  lazy val qBartelsSql: String =
    """WITH base AS (SELECT epoch_us(ts) // 86400000000 AS t,
      |   CAST(floor(value * 100.0) AS BIGINT) AS v
      |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      | pb AS (SELECT t, CAST(SUM(v) AS HUGEINT) AS y
      |  FROM base GROUP BY 1),
      | rk AS (SELECT t, y, ROW_NUMBER() OVER (ORDER BY t) AS ck,
      |   CAST(COUNT(*) OVER () AS BIGINT) AS tn FROM pb),
      | vt AS (SELECT y, CAST(COUNT(*) AS HUGEINT) AS m
      |  FROM pb GROUP BY 1),
      | mr AS (SELECT y, 2 * SUM(m) OVER (ORDER BY y
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - m + 1
      |   AS mr2 FROM vt),
      | rj AS (SELECT rk.ck, rk.tn, mr.mr2 FROM rk JOIN mr USING (y)),
      | a0 AS (SELECT CAST(MAX(tn) AS BIGINT) AS t,
      |   COALESCE(SUM(CAST(mr2 AS HUGEINT)), 0) AS sr,
      |   COALESCE(SUM(CAST(mr2 AS HUGEINT) * mr2), 0) AS srr FROM rj),
      | nmx AS (SELECT COALESCE(SUM((CAST(a.mr2 AS HUGEINT) - b.mr2)
      |    * (CAST(a.mr2 AS HUGEINT) - b.mr2)), 0) AS nm
      |  FROM rj a JOIN rj b ON b.ck = a.ck + 1),
      | fin AS (SELECT t, nm,
      |   CAST(t AS HUGEINT) * srr - sr * sr AS dn FROM a0, nmx),
      | ch AS (SELECT t, dn,
      |   CAST(t AS DOUBLE) * CAST(nm AS DOUBLE)
      |     / GREATEST(CAST(dn AS DOUBLE), 1.0e-300) AS rvn,
      |   4.0 * (CAST(t AS DOUBLE) - 2.0)
      |     * (5.0 * CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
      |        - 2.0 * CAST(t AS DOUBLE) - 9.0)
      |     / (5.0 * CAST(t AS DOUBLE) * (CAST(t AS DOUBLE) + 1.0)
      |        * (CAST(t AS DOUBLE) - 1.0) * (CAST(t AS DOUBLE) - 1.0))
      |     AS vr
      |  FROM fin)
      | SELECT t AS n_bins,
      |  CASE WHEN t >= 3 AND CAST(dn AS DOUBLE) > 0.0 THEN
      |   CAST(round(rvn * 1.0e12) AS BIGINT) END AS rvn_pico,
      |  CASE WHEN t >= 3 AND CAST(dn AS DOUBLE) > 0.0 THEN
      |   CAST(round((rvn - 2.0) / sqrt(GREATEST(vr, 1.0e-300))
      |     * 1.0e12) AS BIGINT) END AS z_pico
      | FROM ch""".stripMargin.replace("\n", " ")

  /** Cox–Stuart trend of daily event revenue
    * ([[graft.ops.Timeseries.coxStuartDaily]]): the LINEAR-cost trend
    * screen — sign test on the series' two halves — beside
    * q_mann_kendall's O(days²) pair law on the same axis.
    */
  def qCoxStuart(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Timeseries.coxStuartDaily(
      t(spark, dir, "events")
        .select(col("ts"), floor(col("value") * lit(100.0)).as("cents")),
      "ts", "cents")

  lazy val qCoxStuartSql: String =
    """WITH base AS (SELECT epoch_us(ts) // 86400000000 AS t,
      |   CAST(floor(value * 100.0) AS BIGINT) AS v
      |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      | pb AS (SELECT t, CAST(SUM(v) AS HUGEINT) AS y
      |  FROM base GROUP BY 1),
      | rk AS (SELECT y, ROW_NUMBER() OVER (ORDER BY t) AS ck,
      |   CAST(COUNT(*) OVER () AS BIGINT) AS tn FROM pb),
      | pr AS (SELECT a.y AS ya, b.y AS yb
      |  FROM rk a JOIN rk b ON b.ck = a.ck + (a.tn + 1) // 2),
      | ag AS (SELECT
      |   CAST(COALESCE(SUM(CASE WHEN yb > ya THEN 1 ELSE 0 END), 0)
      |     AS BIGINT) AS sp,
      |   CAST(COALESCE(SUM(CASE WHEN yb < ya THEN 1 ELSE 0 END), 0)
      |     AS BIGINT) AS sm FROM pr),
      | tb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bins FROM pb)
      | SELECT n_bins, sp + sm AS n_pairs, sp AS s_plus,
      |  CASE WHEN sp + sm > 0 THEN
      |   CAST(round(CAST(2 * sp - (sp + sm) AS DOUBLE)
      |    / sqrt(GREATEST(CAST(sp + sm AS DOUBLE), 1.0e-300))
      |    * 1.0e12) AS BIGINT) END AS z_pico
      | FROM tb, ag""".stripMargin.replace("\n", " ")

  /** Durbin–Watson autocorrelation of daily event revenue
    * ([[graft.ops.Timeseries.durbinWatsonDaily]]): the parametric
    * serial-correlation screen beside q_bartels' rank form on the same
    * axis — exact T-scaled residuals, the T² scale cancelling in DW.
    */
  def qDurbinWatson(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Timeseries.durbinWatsonDaily(
      t(spark, dir, "events")
        .select(col("ts"), floor(col("value") * lit(100.0)).as("cents")),
      "ts", "cents")

  lazy val qDurbinWatsonSql: String =
    """WITH base AS (SELECT epoch_us(ts) // 86400000000 AS t,
      |   CAST(floor(value * 100.0) AS BIGINT) AS v
      |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      | pb AS (SELECT t, CAST(SUM(v) AS HUGEINT) AS y
      |  FROM base GROUP BY 1),
      | rk AS (SELECT y, ROW_NUMBER() OVER (ORDER BY t) AS ck,
      |   CAST(COUNT(*) OVER () AS BIGINT) AS tn,
      |   SUM(y) OVER () AS cyt FROM pb),
      | rj AS (SELECT ck, tn, CAST(tn AS HUGEINT) * y - cyt AS es
      |  FROM rk),
      | a0 AS (SELECT CAST(MAX(tn) AS BIGINT) AS n_bins,
      |   COALESCE(SUM(es * es), 0) AS g0 FROM rj),
      | nmx AS (SELECT COALESCE(SUM((a.es - b.es) * (a.es - b.es)), 0)
      |   AS nm FROM rj a JOIN rj b ON b.ck = a.ck + 1)
      | SELECT n_bins,
      |  CASE WHEN n_bins >= 2 AND CAST(g0 AS DOUBLE) > 0.0 THEN
      |   CAST(round(CAST(nm AS DOUBLE)
      |    / GREATEST(CAST(g0 AS DOUBLE), 1.0e-300) * 1.0e12) AS BIGINT)
      |  END AS dw_pico
      | FROM a0, nmx""".stripMargin.replace("\n", " ")

  /** Seasonal Mann–Kendall trend of daily event volume
    * ([[graft.ops.Timeseries.seasonalMannKendall]]): the
    * Hirsch–Slack form — day pairs compared only WITHIN the same
    * calendar month, so seasonality cannot masquerade as trend; the
    * month key turns the pair stage into a real hash join at 1/12 the
    * pairs of q_mann_kendall.
    */
  def qSeasonalMk(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Timeseries.seasonalMannKendall(
      t(spark, dir, "events").select(col("ts")), "ts")

  lazy val qSeasonalMkSql: String =
    """WITH base AS (SELECT epoch_us(ts) // 86400000000 AS x,
      |   EXTRACT(month FROM ts) AS m
      |  FROM events WHERE ts IS NOT NULL),
      | d AS (SELECT x, m, CAST(COUNT(*) AS BIGINT) AS y
      |  FROM base GROUP BY 1, 2),
      | s AS (SELECT COALESCE(SUM(CASE WHEN b.y > a.y THEN 1
      |    WHEN b.y < a.y THEN -1 ELSE 0 END), 0) AS s_stat
      |  FROM d a JOIN d b ON a.m = b.m AND b.x > a.x),
      | pm AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
      | tt AS (SELECT COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS tt
      |  FROM (SELECT m, y, CAST(COUNT(*) AS BIGINT) AS t
      |        FROM d GROUP BY 1, 2)),
      | vs AS (SELECT CAST(SUM(n) AS BIGINT) AS n_days,
      |   CAST(COUNT(*) AS BIGINT) AS n_seasons,
      |   COALESCE(SUM(n * (n - 1) * (2 * n + 5)), 0) AS vv FROM pm)
      | SELECT n_days, n_seasons, CAST(s_stat AS BIGINT) AS s_stat,
      |  CAST(vv - tt AS BIGINT) AS var_s18,
      |  CASE WHEN vv - tt > 0 THEN
      |   CAST(round((CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
      |     WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
      |     ELSE 0.0 END)
      |    / sqrt(CAST(GREATEST(vv - tt, 1) AS DOUBLE) / 18.0)
      |    * 1.0e12) AS BIGINT) END AS z_pico
      | FROM vs, s, tt""".stripMargin.replace("\n", " ")

  /** Mann–Kendall trend test of daily event volume
    * ([[graft.ops.Timeseries.mannKendallDaily]]): is q_theil_sen's
    * slope a real monotone trend or noise? — sign-pair statistic S over
    * the bounded observed-day table, exact tie-corrected 18·Var(S), one
    * continuity-corrected z chain.
    */
  def qMannKendall(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Timeseries.mannKendallDaily(t(spark, dir, "events"), "ts")

  lazy val qMannKendallSql: String =
    """WITH d AS (SELECT epoch_us(ts) // 86400000000 AS x,
      |   CAST(COUNT(*) AS BIGINT) AS y
      |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
      | p AS (SELECT COALESCE(CAST(SUM(CASE WHEN b.y > a.y THEN 1
      |    WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT), 0) AS s
      |  FROM d a JOIN d b ON b.x > a.x),
      | n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM d),
      | t AS (SELECT COALESCE(CAST(SUM(c * (c - 1) * (2 * c + 5))
      |    AS BIGINT), 0) AS tt
      |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY y)),
      | w AS (SELECT nd, s, nd * (nd - 1) * (2 * nd + 5) - tt AS v18
      |  FROM n, p, t)
      | SELECT nd AS n_days, s AS s_stat, v18 AS var_s18,
      |  CASE WHEN v18 > 0 THEN
      |   CAST(round((CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
      |     WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) ELSE 0.0 END)
      |    / sqrt(CAST(v18 AS DOUBLE) / 18.0) * 1.0e12) AS BIGINT)
      |  END AS z_pico
      | FROM w""".stripMargin.replace("\n", " ")
}
