package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Term-weighting operators for corpus analysis: per-document salient terms
  * by TF-IDF — the keyword/topic signal quality pipelines attach to each
  * document before mixing or routing.
  *
  * The idf here is the RATIONAL form (N - df) / df rather than the textbook
  * log((N+1)/(df+1)): it is order-isomorphic to the log form for ranking
  * (both strictly decrease in df), and — unlike log, whose last-ulp rounding
  * is libm-specific — it is one integer subtraction and ONE double division,
  * bit-identical on every IEEE engine, so the scores themselves are
  * oracle-checkable, not just the ranks.
  */
object Relevance {

  /** Top-k terms per document by tf·idf, deterministic tiebreak (score
    * desc, then token asc). Returns (doc_id, rk, token, tf, doc_freq,
    * score); documents with no tokens yield no rows.
    *
    * `nDocs` is the corpus size the idf is computed against — callers pass
    * a cached `df.count()` (one scalar aggregate, not a driver loop).
    *
    * Scale shape: explode → two hash-aggregate shuffles (term frequency per
    * (doc, token), then document frequency per token) → a shuffle equi-join
    * of tf against the one-row-per-token df frame (no fanout) → a window
    * partitioned by document. Every stage is keyed and partition-parallel;
    * the vocabulary never sits on the driver.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int, nDocs: Long): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(TextFns.tokens(col(textCol))).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    // tf already holds one row per (doc, token), so doc frequency is a
    // plain count — no second distinct pass
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("doc_freq"))
    val scored = tf.join(dfreq, "token")
      .withColumn("score", col("tf").cast("double") *
        ((lit(nDocs) - col("doc_freq")).cast("double") /
          col("doc_freq").cast("double")))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("token"))
    scored.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("token"), col("tf"),
        col("doc_freq"), col("score"))
  }
}
