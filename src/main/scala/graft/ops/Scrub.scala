package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data pipelines: deterministic regex masking of
  * emails / phone numbers (the minimum a text corpus needs before leaving a
  * trust boundary). Pure `regexp_replace`/`regexp_count` expression trees —
  * codegen'd, narrow, zero shuffles: the scrub rides whatever scan produced
  * the text column, so it costs one pass at any scale.
  *
  * Regex dialect note: the patterns deliberately stay inside the common
  * subset of Java regex (Spark) and RE2 (DuckDB oracle) — character
  * classes, bounded repetition, `\b` word boundaries; no lookbehind, no
  * backreferences — so the oracle can apply the IDENTICAL pattern strings.
  */
object Scrub {

  /** Common-subset patterns (Java regex ∩ RE2). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  val emailMask = "[EMAIL]"
  val phoneMask = "[PHONE]"

  /** Text with emails and phone numbers masked. Email first: the email
    * local-part may contain digit runs a phone pattern could nibble at,
    * while `[EMAIL]`/`[PHONE]` tokens match neither pattern, so the two
    * passes compose without interference.
    */
  def maskPii(c: Column): Column =
    regexp_replace(regexp_replace(c, emailPattern, emailMask), phonePattern, phoneMask)

  def emailCount(c: Column): Column = regexp_count(c, lit(emailPattern))

  def phoneCount(c: Column): Column = regexp_count(c, lit(phonePattern))

  /** Per-stratum PII exposure report — the governance dashboard row set:
    * which sources carry identifiable contact info, at what rate, BEFORE
    * the corpus ships (per-document masking is [[maskPii]]; this is the
    * aggregate that decides whether a source needs it at all, and audits
    * the residue after). Exact integer counts from the same regex laws;
    * the two rates are one double division each (docs-with-PII fraction,
    * PII hits per 1000 docs — the compliance-reporting convention).
    *
    * Scale shape: one narrow regex-count pass + one hash aggregate to
    * |strata| rows. No join, no window.
    *
    * Output: (stratum, n_docs, n_pii_docs, n_emails, n_phones, pii_frac,
    * hits_per_1k).
    */
  def piiDensity(df: org.apache.spark.sql.DataFrame, stratumCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    df.filter(col(stratumCol).isNotNull)
      .select(col(stratumCol).as("stratum"),
        emailCount(col(textCol)).cast("long").as("_e"),
        phoneCount(col(textCol)).cast("long").as("_p"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("_e") + col("_p") > 0L, 1L).otherwise(0L)).as("n_pii_docs"),
        sum(col("_e")).as("n_emails"),
        sum(col("_p")).as("n_phones"))
      .withColumn("pii_frac",
        col("n_pii_docs").cast("double") / col("n_docs").cast("double"))
      .withColumn("hits_per_1k",
        ((col("n_emails") + col("n_phones")) * 1000L).cast("double") /
          col("n_docs").cast("double"))
  }
}
