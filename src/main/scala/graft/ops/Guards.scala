package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-plan cardinality guards for operators whose law INHERENTLY needs a
  * global order over a data-growing key.
  *
  * Most cumulative shapes in this tree distribute ([[PrefixSum]]) or
  * partition by a bounded key; a few laws genuinely require one totally
  * ordered pass whose supporting frame is expected-small but grows with
  * the data (e.g. [[Mixture.waterfillAllocations]]'s waterline sort over
  * the per-domain stats table). For those, the honest posture — the r14/
  * r15 KS-family precedent, generalized here after the KS windows moved
  * onto [[PrefixSum]] — is an ENFORCED bound: assert the frame's row
  * count in-plan, so a frame that outgrew its contract fails the job
  * with an actionable message BEFORE the single-task sort materializes,
  * instead of silently funneling.
  */
object Guards {

  /** Pass `df` through unchanged, failing the job when it holds more
    * than `maxRows` rows. The check stays IN the plan (a 1-row broadcast
    * count + an `assert_true` filter) so no extra driver job runs and
    * the frame's upstream exchange is reused; it sits UPSTREAM of
    * whatever global-order window consumes the frame, so the failure
    * fires before that window's single-task sort runs. `hint` tells the
    * operator's caller what to do about it.
    */
  def boundedDomain(df: DataFrame, maxRows: Long, op: String,
      hint: String): DataFrame = {
    val nv = df.agg(count(lit(1)).as("_guard_n"))
    df.crossJoin(broadcast(nv))
      .filter(coalesce(
        assert_true(col("_guard_n") <= maxRows,
          lit(s"$op: frame exceeds $maxRows rows — the global-order window " +
            s"would sort it in one task; $hint"))
          .cast("boolean"),
        lit(true)))
      .drop("_guard_n")
  }
}
