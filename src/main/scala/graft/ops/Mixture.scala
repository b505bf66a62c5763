package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-mixture rebalancing by epoch upsampling.
  *
  * [[Sampling.temperatureSample]] flattens a skewed mixture by DOWN-sampling
  * dominant strata; the complementary lever — when tail data is too precious
  * to drop — is UP-sampling: small sources are repeated for multiple epochs
  * within one training pass. The law here targets the head stratum:
  *
  *   epochs_g = min(maxEpochs, ceil(n_max / n_g))
  *
  * so the largest source runs once and a source 1/3 its size runs 3 times,
  * capped (repeating a tiny source dozens of times burns compute and
  * overfits it — the cap is the standard guard).
  *
  * Every step is cross-engine exact: integer counts, one IEEE double
  * division + ceil, an integer `sequence` explode — so the exact multiset of
  * (doc, epoch) rows is oracle-checkable.
  *
  * Scale shape: the counts frame is |sources| rows broadcast onto the
  * corpus; the explode is narrow (each row expands in place, no shuffle).
  * Output size is bounded by maxEpochs × |corpus|.
  */
object Mixture {

  /** Per-stratum epoch counts: (stratum, epochs). */
  def epochCounts(df: DataFrame, stratumCol: String, maxEpochs: Int = 4): DataFrame = {
    require(maxEpochs >= 1, "maxEpochs must be at least 1")
    val counts = df.groupBy(col(stratumCol).as("_stratum"))
      .agg(count(lit(1)).as("_n"))
    counts
      .crossJoin(broadcast(counts.agg(max(col("_n")).as("_nmax"))))
      .select(col("_stratum"),
        least(lit(maxEpochs.toLong),
          ceil(col("_nmax").cast("double") / col("_n").cast("double")).cast("long"))
          .as("epochs"))
  }

  /** One output row per (input row, epoch), epoch in 1..epochs_stratum.
    *
    * NULL-stratum contract (shared with [[Sampling.temperatureSample]] and
    * [[Quantiles.topFractionByStratum]]): rows whose stratum is NULL are
    * EXCLUDED — the keyed join never matches them. Coalesce a sentinel
    * stratum upstream (e.g. `'und'` for unknown language) if NULL rows must
    * participate in the mixture.
    */
  def upsampleEpochs(df: DataFrame, stratumCol: String, maxEpochs: Int = 4): DataFrame =
    df.join(broadcast(epochCounts(df, stratumCol, maxEpochs)),
        col(stratumCol) === col("_stratum"))
      .withColumn("epoch", explode(sequence(lit(1L), col("epochs"))))
      .drop("_stratum", "epochs")
}
