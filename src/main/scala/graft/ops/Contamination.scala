package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Benchmark-contamination check: flag corpus documents sharing at least one
  * word n-gram with a held-out benchmark set — the decontamination step every
  * training-data pipeline runs before a model sees the corpus (cf. the
  * n-gram-overlap methodology popularized by the GPT-3 and PaLM papers'
  * contamination appendices).
  *
  * Shape at scale: the benchmark side is SMALL by construction (eval sets are
  * thousands of documents, the corpus is billions), so its distinct shingle
  * set is collected into a broadcast hash join — the corpus side streams
  * through map-side, no corpus shuffle at all except the final per-doc count
  * aggregate on `doc_id` (which AQE coalesces). Shingle strings (not hashes)
  * are joined here for oracle bit-parity; the scale variant would hash
  * shingles to longs first ([[TextFns.shingleHashesFromTokens]]) to shrink
  * shuffle/broadcast width — same plan shape, narrower rows.
  *
  * Per-row shingling happens at an object boundary (one tokenize + one
  * sliding pass per document), not as nested higher-order expressions —
  * interpreted HOFs re-evaluate their argument per lambda element (the
  * measured cost trap documented at [[TextFns.shingleHashesFromTokens]]).
  */
object Contamination {

  /** Distinct word n-gram strings of one document (order preserved). */
  private[ops] def shingleStringsScala(text: String, n: Int): Array[String] = {
    val toks = TextFns.tokensScala(if (text == null) "" else text)
    if (toks.length < n) Array.empty[String]
    else {
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      var i = 0
      while (i <= toks.length - n) {
        val sb = new StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen += sb.result()
        i += 1
      }
      seen.toArray
    }
  }

  private def shingleFrame(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("_id"), col(textCol).cast("string").as("_t"))
      .as[(Long, String)]
      .flatMap { case (id, t) => shingleStringsScala(t, n).iterator.map(s => (id, s)) }
      .toDF("_id", "_s")
  }

  private def withZeroCounts(corpus: DataFrame, idCol: String,
      hits: DataFrame): DataFrame =
    corpus.select(col(idCol).cast("long").as("doc_id"))
      .join(hits, col("doc_id") === col("_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_hits"), lit(0L)).as("n_contaminated"),
        (coalesce(col("_hits"), lit(0L)) > 0).as("contaminated"))

  /** Per-document contamination counts of `corpus` against `benchmark`:
    * (doc_id, n_contaminated, contaminated) for EVERY corpus doc — zero
    * counts included, so the clean/dirty split is explicit. The benchmark
    * shingle set is broadcast: the right call when the benchmark is an eval
    * set (thousands of docs). For benchmark sides too big to broadcast,
    * use [[checkLarge]].
    */
  def check(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int = 5): DataFrame = {
    val benchShingles = shingleFrame(benchmark, idCol, textCol, n).select("_s").distinct()
    val hits = shingleFrame(corpus, idCol, textCol, n)
      .join(broadcast(benchShingles), "_s")
      .groupBy("_id").agg(count(lit(1)).as("_hits"))
    withZeroCounts(corpus, idCol, hits)
  }

  /** [[check]] for a LARGE reference side (cross-corpus contamination, e.g.
    * "does my training set overlap that other crawl"): identical output,
    * but the shingle match is a shuffle equi-join on the shingle key — both
    * sides hash-partition by shingle, nothing broadcasts, so the reference
    * corpus can be any size. The `_left_semi` join also stops shingle-level
    * fan-out: a shingle occurring k times in the reference must count ONCE
    * per corpus doc, not k times (the broadcast path gets this from
    * `distinct()`; here the semi-join does it without deduplicating the
    * reference side first).
    */
  def checkLarge(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int = 5): DataFrame = {
    val benchShingles = shingleFrame(benchmark, idCol, textCol, n).select("_s")
    val hits = shingleFrame(corpus, idCol, textCol, n)
      .join(benchShingles, Seq("_s"), "left_semi")
      .groupBy("_id").agg(count(lit(1)).as("_hits"))
    withZeroCounts(corpus, idCol, hits)
  }
}
