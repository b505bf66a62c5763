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
}
