package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Vocabulary-construction counting for tokenizer training: the corpus-wide
  * adjacent-pair frequency table that drives BPE/WordPiece merge selection
  * (Sennrich et al., "Neural Machine Translation of Rare Words with Subword
  * Units", ACL'16 — each merge round picks the most frequent adjacent pair).
  * This is the counting round at corpus scale; the merge loop itself is a
  * driver-side iteration over the (tiny) top-of-table result.
  *
  * Scale shape: one narrow mapPartitions pass emits pairs (object boundary,
  * not HOF expression trees — the measured Catalyst duplication trap, see
  * [[Dedup]] shingleHashFrame), then ONE hash-aggregate shuffle with
  * map-side partial counts (heavy-hitter pairs collapse before the
  * exchange), then TakeOrderedAndProject for the top-k — nothing lands on
  * the driver but k rows.
  */
object Vocab {

  /** Corpus-wide adjacent token-pair counts, top-k by count (ties break on
    * the pair string ascending — deterministic, oracle-comparable).
    * Output: (pair, n) where pair = "left right" (single-space joined).
    * Documents with fewer than two tokens contribute nothing.
    */
  def topPairCounts(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(textCol).cast("string"))
      .as[String]
      .mapPartitions(_.flatMap { text =>
        val t = TextFns.tokensScala(text)
        if (t.length < 2) Iterator.empty
        else (0 until t.length - 1).iterator.map(i => t(i) + " " + t(i + 1))
      })
      .toDF("pair")
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
  }
}
