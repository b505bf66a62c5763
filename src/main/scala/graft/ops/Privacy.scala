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
}
