package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy risk screens for training-data release — the structured-data
  * complement to the text-side PII scrub (`TextFns.scrubPii` /
  * q_pii_scrub): before a corpus with user attributes ships, the release
  * gate asks how identifiable each row is from its QUASI-IDENTIFIERS
  * (the attribute combination an adversary can link to external data —
  * Sweeney, IJUFKS '02). The reference has no analog; this extends the
  * engine the same way [[Eval]] does (SURVEY.md §8).
  */
object Privacy {

  /** k-anonymity cell report (Sweeney '02): group the frame by its
    * quasi-identifier columns and flag every equivalence class smaller
    * than `k` — rows in a flagged cell are re-identifiable to fewer than
    * k candidates and must be suppressed or generalized before release.
    * NULL QI values form their own equivalence class (SQL GROUP BY law,
    * identical in the oracle) — a NULL is itself a linkable value, not
    * an exemption.
    *
    * Exact law: cell sizes are exact integer counts; `at_risk` is the
    * strict `n_rows < k` comparison. Output is bounded by the number of
    * DISTINCT QI combinations, never |rows|.
    *
    * Scale shape: ONE hash aggregate (map-side combine) + a narrow
    * projection. No join, no window, no driver state — the 100 TB shape
    * is the same one shuffle.
    *
    * Output: (qi columns…, n_rows, at_risk).
    */
  def kAnonymityCells(df: DataFrame, qiCols: Seq[String],
      k: Long): DataFrame = {
    require(qiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 1L, s"k must be >= 1, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("at_risk", col("n_rows") < k)
  }

  /** Distinct l-diversity cell report (Machanavajjhala et al., ICDE '06
    * — the attack k-anonymity misses: a k-sized cell whose SENSITIVE
    * attribute is homogeneous still discloses it; every member of a
    * 50-person cell that is all 'oncology' has their diagnosis leaked):
    * per QI equivalence class, the distinct count of the sensitive
    * column, flagged when below `l`. NULL sensitive values are excluded
    * from the distinct count (they assert no value — COUNT(DISTINCT)
    * law, identical in the oracle); NULL QI values form their own class
    * as in [[kAnonymityCells]].
    *
    * Exact law: cell size and distinct-sensitive counts are exact
    * integers; `at_risk` is strict `< l`. Output bounded by distinct QI
    * combinations.
    *
    * Scale shape: one hash aggregate with a distinct-count (Spark
    * expands to the standard two-phase partial aggregate). No join, no
    * window.
    *
    * Output: (qi columns…, n_rows, n_sensitive, at_risk).
    */
  def lDiversityCells(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(qiCols.nonEmpty, "at least one quasi-identifier column")
    require(!qiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    require(l >= 1L, s"l must be >= 1, got $l")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("at_risk", col("n_sensitive") < l)
  }
}
