package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling for training-data pipelines.
  *
  * `rand()`-based sampling is not reproducible across runs, partitionings,
  * or engines; pipeline sampling must be a PURE FUNCTION of the row so the
  * same corpus always yields the same subset (and a re-run after a failure
  * doesn't silently change the training set). The law: a row survives iff
  * the first 4 hex digits of `md5(salt || id)` sort lexicographically
  * below the 4-hex-digit threshold `floor(rate · 65536)` — hex digits
  * order lexicographically exactly as numerically, md5 renders identically
  * on every engine, so the exact subset is oracle-checkable; changing
  * `salt` draws an independent subset.
  *
  * Scale shape: a narrow per-row filter — no shuffle, no state; pushes
  * into the scan like any predicate.
  */
object Sampling {

  /** Lowercase threshold for a rate in [0, 1]: a 4-hex-digit string, except
    * rate ≥ 1 → "g", which sorts above every hex digit so ALL keys survive
    * (a 5-digit "10000" would sort BELOW most 4-char keys and silently keep
    * ~1/16 — the lexicographic trap the unit test pins).
    */
  def rateThreshold(rate: Double): String = {
    val v = (rate * 65536).toInt
    if (v >= 65536) "g" else f"${math.max(0, v)}%04x"
  }

  /** The survival key: first 4 hex digits of md5(salt || id). */
  def hashKey(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt), id.cast("string"))), 1, 4)

  /** Uniform deterministic sample at `rate` (0..1). */
  def deterministicSample(df: DataFrame, idCol: String, rate: Double,
      salt: String = "graft"): DataFrame =
    df.filter(hashKey(col(idCol), salt) < rateThreshold(rate))

  /** Stratified deterministic sample: per-stratum rates (strata absent from
    * the map are dropped — an explicit quota list is the common contract:
    * e.g. keep 100% of rare languages, 5% of English).
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], salt: String = "graft"): DataFrame = {
    val key = hashKey(col(idCol), salt)
    val keep = rates.foldLeft(lit(false)) { case (acc, (stratum, rate)) =>
      acc || (col(stratumCol) === stratum && key < rateThreshold(rate))
    }
    df.filter(keep)
  }

  /** Temperature-scaled domain sampling (α = 1/2): down-weights dominant
    * strata so the mixture flattens toward uniform — the standard rebalance
    * for web-crawl training mixes where the head language/domain would
    * otherwise drown the tail. Keep probability per stratum g:
    *
    *   rate_g = min(1, base · sqrt(n_max / n_g))
    *
    * so the LARGEST stratum keeps `base` of its rows and smaller strata
    * keep proportionally more (a stratum at n_max/4 keeps 2·base), i.e.
    * expected post-sample counts ∝ sqrt(n_g) — exactly n_g^α with α = 1/2.
    *
    * Every arithmetic step is cross-engine deterministic: one integer-count
    * division, an IEEE-exact sqrt, a power-of-two scale (base defaults to
    * 0.5), and the md5-prefix survival compare of [[hashKey]] — so the
    * exact surviving subset is oracle-checkable, and re-runs reproduce it.
    *
    * Scale shape: one tiny count aggregate (|strata| rows) broadcast back
    * onto the corpus; the survival filter itself is a narrow per-row
    * predicate — no shuffle of the data.
    *
    * NULL-stratum rows are EXCLUDED by the keyed join (see
    * [[Mixture.upsampleEpochs]] for the shared contract); coalesce a
    * sentinel upstream to include them.
    */
  def temperatureSample(df: DataFrame, idCol: String, stratumCol: String,
      base: Double = 0.5, salt: String = "graft"): DataFrame = {
    val counts = df.groupBy(col(stratumCol).as("_stratum"))
      .agg(count(lit(1)).as("_n"))
    val rate = least(lit(1.0),
      lit(base) * sqrt(col("_nmax").cast("double") / col("_n").cast("double")))
    // 4-hex-digit threshold, same law as rateThreshold: floor(rate · 65536),
    // 'g' (sorts above every hex digit) for the keep-everything case
    val v = floor(rate * 65536).cast("int")
    val thresholds = counts
      .crossJoin(broadcast(counts.agg(max(col("_n")).as("_nmax"))))
      .select(col("_stratum"),
        when(v >= 65536, lit("g")).otherwise(format_string("%04x", v)).as("_thr"))
    df.join(broadcast(thresholds), col(stratumCol) === col("_stratum"))
      .filter(hashKey(col(idCol), salt) < col("_thr"))
      .drop("_stratum", "_thr")
  }

  /** Deterministic EXACT-size sample: the k rows per stratum whose
    * md5(salt||id) hashes sort lowest (full hash, then id as the total-order
    * tiebreak). Rate-based sampling gives binomial sizes; eval sets and
    * per-domain quota draws need exactly k. Being a pure hash order, the
    * selection is engine-independent and stable under corpus REORDERING —
    * though unlike rate sampling, membership can shift when rows are added
    * (a new row can displace the k-th).
    *
    * Scale shape: one hash-partitioned window (shuffle by stratum) with a
    * rank pre-filter — Spark's WindowGroupLimit pushes the `rk <= k` cut
    * into the sort, so per-partition state is O(k), not O(stratum). For
    * very hot strata, pre-thin with [[deterministicSample]] at a rate that
    * keeps ≥ k expected survivors, then take the exact k from the residue.
    *
    * NULL-stratum note: unlike the join-keyed siblings
    * ([[temperatureSample]], [[Mixture.upsampleEpochs]]), which EXCLUDE
    * NULL strata, window partitioning groups NULLs together — so NULL
    * forms its own stratum and contributes k rows (SQL window semantics,
    * identical in the oracle). Coalesce a sentinel upstream if the
    * exclusion contract is wanted.
    */
  def fixedKPerStratum(df: DataFrame, idCol: String, stratumCol: String,
      k: Int, salt: String = "graft"): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(concat(lit(salt), col(idCol).cast("string"))), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("bigint"))
      .filter(col("sample_rank") <= k)
  }

  /** Deterministic WEIGHTED sample without replacement, exactly k rows:
    * the Efraimidis–Spirakis one-pass reservoir law (Efraimidis &
    * Spirakis, IPL 2006) with the family's hash-derived uniform in place
    * of an RNG — the quality-weighted draw a curation pipeline uses when
    * "sample 50k documents, preferring high-quality ones" must be
    * reproducible across runs, partitionings, and engines.
    *
    * Law: u = (h + 0.5) / 65536 where h is the integer value of the first
    * 4 hex digits of `md5(salt || id)` (strictly inside (0,1) — no ln(0));
    * the E–S key is `u^(1/w)`, maximized, ranked here by the monotone
    * twin `ln(u) / w` (one fixed IEEE chain from the exact integer h and
    * the integer weight, so any engine replays the ranking bit-for-bit;
    * ties break on id). A row's survival probability rises with its
    * weight exactly as E–S proves; rows with NULL or non-positive weight
    * are excluded (a zero weight must never be drawn, and the reciprocal
    * law has no home for it). Weights are INTEGER by law — the output
    * column and the exclusion gate both cast through long, so fractional
    * weights truncate (scale a fractional score to integer units
    * upstream: micro-units keep six figures).
    *
    * Scale shape: narrow per-row key computation + a global top-k —
    * TakeOrderedAndProject, never a full sort. Output: the sampled rows'
    * (id, weight, key_nano), key_nano = round(ln(u)/w · 1e9) riding along
    * so downstream audits can re-check the draw.
    */
  /** The Poisson(1) CDF thresholds for the bootstrap weight draw —
    * JVM-computed once and inlined into BOTH the engine expression and
    * the oracle SQL (the class-balance ln β / NDCG discount-table
    * discipline: a shared constant, not two independent libm chains).
    * P(0)=e⁻¹, then cumulative /k! terms; weights cap at 5 (P > 5 is
    * 1−0.9994 — the truncation is part of the law).
    */
  private[graft] val poissonCdf: Array[Double] = {
    val e1 = math.exp(-1.0)
    val terms = Array(1.0, 1.0, 0.5, 1.0 / 6.0, 1.0 / 24.0)
    terms.scanLeft(0.0)(_ + _).tail.map(_ * e1)
  }

  /** The CDF quantized onto the family's 16-bit md5 grid: weight k is
    * drawn iff h ≤ thresholds(k) (h the integer value of the first 4
    * md5 hex digits; `(h+0.5)/65536 < cdf(k)` ⟺ `h < 65536·cdf(k) −
    * 0.5`). The LAW is this integer table — both engines compare plain
    * integers, so no float-literal parsing or libm chain can diverge.
    */
  private[graft] val poissonHThresholds: Array[Long] =
    poissonCdf.map(c => (65536.0 * c - 0.5).floor.toLong)

  /** Deterministic Poisson-bootstrap confidence interval for the mean of
    * a corpus metric (Poisson bootstrap: each replica reweights every
    * row by an independent Poisson(1) count — the single-pass,
    * partition-agnostic bootstrap used at web scale where the classic
    * multinomial resample is impossible; Chamandy et al., 'Estimating
    * Uncertainty for Massive Data Streams', Google TR '12): B replica
    * means from ONE corpus pass, the CI read off their order statistics
    * (2nd and (B−1)-th — central ~93.75% at B = 32).
    *
    * Exact, engine-replayable law: the per-(replica, row) weight draws
    * from the family's md5 integer (h = first 4 hex digits of
    * md5(salt || rep || ':' || id)) against the FIXED integer
    * thresholds of [[poissonHThresholds]] (the Poisson(1) CDF quantized
    * onto the 16-bit grid — inlined identically on both engines, pure
    * integer compares, weights 0..5); replica sums run Σw·x in
    * DECIMAL(38,0) and Σw in BIGINT; each replica mean quantizes to
    * micros in ONE double division; the pseudo-replica rep = −1 carries
    * weight 1 everywhere and IS the point estimate (no second corpus
    * pass). Replicas that draw an all-zero weight vector have no mean
    * and drop from the ranking (n_replicas reports the effective
    * count) — vanishing probability beyond toy corpora.
    *
    * Scale shape: one column-pruned scan fanned out ×(B+1) by an
    * explode BEFORE the hash aggregate (map-side combine folds each
    * partition to B+1 partial rows — the corpus is READ once; CPU cost
    * is linear in B by construction), then a (B+1)-row window. No
    * driver state.
    *
    * Output: ONE row (n_rows, n_replicas, mean_micro, boot_lo_micro,
    * boot_hi_micro); no rows on an empty input.
    */
  def poissonBootstrapCi(df: DataFrame, idCol: String, valueCol: String,
      replicas: Int = 32, salt: String = "graft"): DataFrame = {
    require(replicas >= 4, s"need >= 4 replicas for order stats, got $replicas")
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val t = poissonHThresholds
    val h = conv(substring(md5(concat(lit(salt), col("_rep").cast("string"),
      lit(":"), col(idCol).cast("string"))), 1, 4), 16, 10).cast("long")
    val w = when(col("_rep") === -1, lit(1L)).otherwise(
      when(h <= t(0), 0L).when(h <= t(1), 1L).when(h <= t(2), 2L)
        .when(h <= t(3), 3L).when(h <= t(4), 4L).otherwise(5L))
    val per = df.filter(col(valueCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol), col(valueCol).cast("long").as("_x"),
        explode(array((-1 to (replicas - 1)).map(r => lit(r)): _*)).as("_rep"))
      .withColumn("_w", w)
      .groupBy(col("_rep"))
      .agg(sum((col("_w") * col("_x")).cast(dec)).as("_swx"),
        sum(col("_w")).as("_sw"), count(lit(1)).as("_n"))
      .select(col("_rep"), col("_n"),
        when(col("_sw") > 0L,
          round(col("_swx").cast("double") / col("_sw").cast("double")
            * 1000000.0).cast("long")).as("_mean"))
    // rank the real replicas' means ascending AND descending (lo = 2nd
    // smallest, hi = 2nd largest); rep −1 and degenerate no-mean
    // replicas sort AFTER every ranked row so rank 2 is always a real
    // replica once n_replicas ≥ 3
    val unranked = col("_rep") === -1 || col("_mean").isNull
    val ranked = per
      .withColumn("_unr", unranked)
      .withColumn("_rn", row_number().over(Window.orderBy(
        col("_unr"), col("_mean").asc_nulls_last, col("_rep"))))
      .withColumn("_rnd", row_number().over(Window.orderBy(
        col("_unr"), col("_mean").desc_nulls_last, col("_rep").desc)))
    ranked.agg(
        max(when(col("_rep") === -1, col("_n"))).as("n_rows"),
        sum(when(!col("_unr"), 1L).otherwise(0L)).as("n_replicas"),
        max(when(col("_rep") === -1, col("_mean"))).as("mean_micro"),
        max(when(!col("_unr") && col("_rn") === 2, col("_mean"))).as("_lo"),
        max(when(!col("_unr") && col("_rnd") === 2, col("_mean"))).as("_hi"))
      .filter(col("n_rows").isNotNull)
      .select(col("n_rows"), col("n_replicas"), col("mean_micro"),
        when(col("n_replicas") >= 3L, col("_lo")).as("boot_lo_micro"),
        when(col("n_replicas") >= 3L, col("_hi")).as("boot_hi_micro"))
  }

  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "graft"): DataFrame = {
    require(k > 0, "k must be positive")
    val h = conv(substring(md5(concat(lit(salt), col(idCol).cast("string"))), 1, 4),
      16, 10).cast("double")
    val u = (h + 0.5) / 65536.0
    // the long cast IS the weight law (see scaladoc) — key, gate and
    // output all read the same integer
    val key = log(u) / col(weightCol).cast("long").cast("double")
    df.filter(col(weightCol).isNotNull && col(weightCol).cast("long") > 0L)
      .select(col(idCol).as("id"), col(weightCol).cast("long").as("weight"),
        key.as("_key"))
      .orderBy(col("_key").desc, col("id"))
      .limit(k)
      .select(col("id"), col("weight"),
        round(col("_key") * 1000000000.0).cast("long").as("key_nano"))
  }
}
