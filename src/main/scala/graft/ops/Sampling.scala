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
