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
}
