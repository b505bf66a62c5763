package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation metrics for curation pipelines: a quality/toxicity
  * filter is a scoring model, and before its threshold gates a 100 TB
  * corpus you measure how well the score separates labeled positives from
  * negatives. AUC here is the exact Mann-Whitney rank statistic
  * (probability a random positive outscores a random negative, ties at
  * half credit) — not a trapezoid approximation over binned thresholds —
  * so the oracle can replay it bit-for-bit with window functions.
  *
  * Scale shape: one rank window per group (the same partitioned-sort any
  * percentile query pays) + one aggregate; no join, no collect. Scores
  * with NULL value or NULL label are excluded (they carry no ordering /
  * no truth); groups with no positives or no negatives return NULL AUC
  * (undefined — better a visible NULL than a fake 0.5).
  */
object Eval {

  /** Per-group AUC of `scoreCol` against boolean `labelCol`:
    * (groupCol, n_pos, n_neg, auc). Average ranks for ties:
    * avg_rank = min_rank + (tie_count - 1)/2, the standard Mann-Whitney
    * tie correction.
    */
  def aucByGroup(df: DataFrame, scoreCol: String, labelCol: String,
      groupCol: String): DataFrame = {
    // filter on the CASTED label: a non-NULL value that casts to NULL
    // (e.g. the string "unknown") must not occupy a rank — it would be
    // excluded from n_pos/n_neg yet shift every higher-scored row's rank
    val base = df
      .select(col(groupCol).as("_g"), col(scoreCol).as("_s"),
        col(labelCol).cast("boolean").as("_y"))
      .filter(col("_s").isNotNull && col("_y").isNotNull)
    val wRank = Window.partitionBy("_g").orderBy("_s")
    val wTies = Window.partitionBy("_g", "_s")
    val ranked = base
      .withColumn("_avg_rank",
        rank().over(wRank) + (count(lit(1)).over(wTies) - 1) / 2.0)
    ranked.groupBy(col("_g").as(groupCol))
      .agg(
        count(when(col("_y"), 1)).as("n_pos"),
        count(when(!col("_y"), 1)).as("n_neg"),
        sum(when(col("_y"), col("_avg_rank"))).as("_rpos"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("_rpos") - col("n_pos") * (col("n_pos") + 1) / 2.0) /
            (col("n_pos") * col("n_neg"))))
      .drop("_rpos")
  }

  /** Whole-frame AUC as a single row (group = a constant). */
  def auc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame =
    aucByGroup(df.withColumn("_all", lit(1)), scoreCol, labelCol, "_all")
      .drop("_all")
}
