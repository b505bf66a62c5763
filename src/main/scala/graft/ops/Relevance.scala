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

  /** BM25 retrieval: top-k documents for a fixed bag-of-words query — the
    * search leg of a curation pipeline (find docs about X, pull eval-adjacent
    * content, build topic subsets).
    *
    * Determinism (so the double SCORES oracle-match, not just the ranking):
    *   - idf is the rational core of BM25's log argument,
    *     (N - df + 0.5) / (df + 0.5) — log dropped (monotone, libm-varying);
    *   - the per-term contribution is a fixed parenthesization of IEEE ops
    *     over exact integers (tf, len, df, N) and literal constants;
    *   - the per-document score folds the per-term columns LEFT-TO-RIGHT in
    *     `terms` order — never a SUM over rows, whose accumulation order is
    *     engine- and partitioning-dependent.
    * Only documents matching ≥1 query term are candidates (standard
    * retrieval contract; zero-score docs can't enter a top-k anyway).
    *
    * Scale shape: explode → per-(doc,term) count filtered to the query
    * vocabulary (the filter pushes before the aggregate, so the shuffle
    * carries only query-term hits); document frequencies (≤ |terms| rows)
    * broadcast back; one doc-keyed join against lengths; top-k is
    * TakeOrderedAndProject — no global sort.
    */
  def bm25TopDocs(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val lens = df.select(col(idCol).as("doc_id"),
      TextFns.tokenCount(col(textCol)).as("len"))
    val toks = df.select(col(idCol).as("doc_id"),
      explode(TextFns.tokens(col(textCol))).as("token"))
    val tf = toks.filter(col("token").isInCollection(terms))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    bm25Score(tf, lens, terms, k, k1, b)
  }

  /** BM25 over a PERSISTED search index ([[RefStore.writeSearchIndex]]):
    * the tokenize + per-(doc, term) aggregation — the whole-corpus pass —
    * happened when the index committed; a query reads only the
    * term-pruned postings (the store lays postings out range-partitioned
    * and sorted by token, so parquet row-group stats prune everything but
    * the query vocabulary) plus the lengths frame. Same scoring law to
    * the bit: per-(doc, token) tf within a batch equals the corpus-wide
    * tf (ids are unique across batches), document frequency and the
    * corpus scalars re-derive from the stored exact integers.
    */
  def bm25TopDocsStored(spark: org.apache.spark.sql.SparkSession,
      storeDir: String, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (postings, lengths) = RefStore.loadSearchIndex(spark, storeDir)
    bm25Score(postings.filter(col("token").isInCollection(terms)),
      lengths, terms, k, k1, b)
  }

  /** The BM25 scoring law over a prepared per-(doc, term) frequency frame
    * (doc_id, token, tf) and a lengths frame (doc_id, len) — shared by the
    * live and stored paths so they cannot drift.
    */
  private def bm25Score(tf: DataFrame, lens: DataFrame, terms: Seq[String],
      k: Int, k1: Double, b: Double): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms, "need distinct query terms")
    // two exact-integer corpus scalars; avg length derives from them with
    // one double division — bit-equal to any engine doing the same division
    val stats = lens.agg(count(lit(1)).as("n"), sum(col("len")).as("s")).head()
    val nDocs = stats.getLong(0)
    val avgLen = stats.getLong(1).toDouble / nDocs.toDouble
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("term_df"))
    val tfD = col("tf").cast("double")
    val idf = ((lit(nDocs) - col("term_df")).cast("double") + lit(0.5)) /
      (col("term_df").cast("double") + lit(0.5))
    val norm = (tfD * lit(k1 + 1.0)) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * (col("len").cast("double") / lit(avgLen))))
    val contrib = tf.join(broadcast(dfreq), "token")
      .join(lens, "doc_id")
      .select(col("doc_id"), col("token"), (idf * norm).as("contrib"))
    val perTerm = contrib.groupBy("doc_id").agg(
      sum(when(col("token") === terms.head, col("contrib"))).as(s"_c0"),
      terms.tail.zipWithIndex.map { case (t, i) =>
        sum(when(col("token") === t, col("contrib"))).as(s"_c${i + 1}")
      }: _*)
    val score = terms.indices
      .map(i => coalesce(col(s"_c$i"), lit(0.0)))
      .reduceLeft(_ + _) // fixed left-assoc fold in `terms` order
    perTerm.select(col("doc_id"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** BM25 for a BATCH of queries in one corpus pass — the production
    * retrieval shape ([[bm25TopDocs]] serves one query; a curation job
    * pulls topic subsets for hundreds at once, and re-scanning the corpus
    * per query is the cost this exists to avoid). One tokenize over the
    * UNION vocabulary, one tf aggregate, then a broadcast join against
    * the tiny (query, term) frame fans each hit out to its queries.
    *
    * Scoring law: the same idf/norm chain as [[bm25TopDocs]], but each
    * per-term contribution QUANTIZES to micro-units before a per-(query,
    * doc) integer sum — orderless and batching-independent, so queries
    * may have any number of terms (the single-query fold pins term order
    * instead; both laws are engine-exact, they are different laws).
    *
    * Scale shape: the corpus-side shuffle carries only union-vocabulary
    * hits; doc frequencies (≤ |vocab| rows) and the query map broadcast;
    * per-query top-k is one rank window over scored candidates
    * (WindowGroupLimit pushes the cut into the sort).
    *
    * Output: (query_name, doc_id, rk, score_micro).
    */
  def bm25TopDocsBatch(df: DataFrame, idCol: String, textCol: String,
      queries: Seq[(String, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty && queries.map(_._1).distinct.size == queries.size,
      "query names must be distinct")
    val spark = df.sparkSession
    import spark.implicits._
    val vocab = queries.flatMap(_._2).distinct
    val lens = df.select(col(idCol).as("doc_id"),
      TextFns.tokenCount(col(textCol)).as("len"))
    val tf = df.select(col(idCol).as("doc_id"),
        explode(TextFns.tokens(col(textCol))).as("token"))
      .filter(col("token").isInCollection(vocab))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val stats = lens.agg(count(lit(1)).as("n"), sum(col("len")).as("s")).head()
    val nDocs = stats.getLong(0)
    val avgLen = stats.getLong(1).toDouble / nDocs.toDouble
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("term_df"))
    val tfD = col("tf").cast("double")
    val idf = ((lit(nDocs) - col("term_df")).cast("double") + lit(0.5)) /
      (col("term_df").cast("double") + lit(0.5))
    val norm = (tfD * lit(k1 + 1.0)) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * (col("len").cast("double") / lit(avgLen))))
    val qt = queries.flatMap { case (qn, ts) => ts.distinct.map(t => (qn, t)) }
      .toDF("query_name", "token")
    val w = Window.partitionBy("query_name")
      .orderBy(col("score_micro").desc, col("doc_id"))
    tf.join(broadcast(dfreq), "token")
      .join(lens, "doc_id")
      .select(col("doc_id"), col("token"),
        round((idf * norm) * 1000000.0).cast("long").as("_cm"))
      .join(broadcast(qt), "token")
      .groupBy(col("query_name"), col("doc_id"))
      .agg(sum(col("_cm")).as("score_micro"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_name"), col("doc_id"), col("rk"), col("score_micro"))
  }
}
