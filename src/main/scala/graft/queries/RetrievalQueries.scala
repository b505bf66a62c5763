package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ExcelSerial
import graft.model.PathOps
import graft.ops.{Hierarchy, Parents, Upsert}
import graft.views.Analytic

/** Retrieval: BM25 (single/batch/stored), TF-IDF, reciprocal-rank fusion.
  *
  * Split from the monolithic `Registry` object (round 15): members are
  * unchanged; `Registry` mixes every family trait in, so the public
  * surface (`Registry.queries` / `Registry.oracle` / each q* member) is
  * identical. Cross-family helpers are `private[queries]`; vals are lazy
  * so trait-linearization order can never null-init a shared fragment.
  */
trait RetrievalQueries { self: RegistryAll =>

  /** Top-3 TF-IDF terms per document ([[graft.ops.Relevance.tfidfTopTerms]]).
    * The rational idf keeps the double scores bit-identical across engines
    * (see the operator scaladoc), so score values — not just ranks — are in
    * the hash compare.
    */
  def qTfidfTerms(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    graft.ops.Relevance.tfidfTopTerms(docs, "doc_id", "text", k = 3,
      nDocs = docs.count())
      .orderBy("doc_id", "rk")
  }

  lazy val qTfidfTermsSql: String =
    s"""WITH toks AS (SELECT doc_id, unnest($tokensSql) AS token FROM documents),
      | tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      | dfq AS (SELECT token, COUNT(*) AS doc_freq FROM tf GROUP BY 1),
      | sc AS (SELECT tf.doc_id, tf.token, CAST(tf.tf AS BIGINT) AS tf,
      |   CAST(dfq.doc_freq AS BIGINT) AS doc_freq,
      |   CAST(tf.tf AS DOUBLE) *
      |     (CAST((SELECT COUNT(*) FROM documents) - dfq.doc_freq AS DOUBLE)
      |      / CAST(dfq.doc_freq AS DOUBLE)) AS score
      |  FROM tf JOIN dfq USING (token)),
      | r AS (SELECT *, CAST(row_number() OVER
      |   (PARTITION BY doc_id ORDER BY score DESC, token) AS BIGINT) AS rk FROM sc)
      | SELECT doc_id, rk, token, tf, doc_freq, score FROM r
      | WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin.replace("\n", " ")

  /** BM25 retrieval ([[graft.ops.Relevance.bm25TopDocs]]): top-10 corpus
    * documents for a fixed 3-term query. The oracle recomputes the full
    * scoring law — rational idf, exact-integer corpus stats, the identical
    * parenthesization, and the same left-to-right per-term fold — so the
    * double scores themselves hash-match. Constant literals are
    * interpolated from the SAME Scala doubles the engine uses
    * (shortest-repr round-trip makes the bit patterns identical).
    */
  private[queries] lazy val bm25Terms = Seq("spark", "merge", "vector")

  def qBm25Search(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Relevance.bm25TopDocs(t(spark, dir, "documents"), "doc_id", "text",
      bm25Terms, k = 10)
      .orderBy(col("score").desc, col("doc_id"))

  lazy val qBm25SearchSql: String = {
    val (k1, b) = (1.2, 0.75)
    val inList = bm25Terms.map("'" + _ + "'").mkString(",")
    val cases = bm25Terms.zipWithIndex.map { case (t, i) =>
      s"COALESCE(SUM(CASE WHEN token = '$t' THEN contrib END), 0.0) AS _c$i"
    }.mkString(", ")
    val fold = bm25Terms.indices.map(i => s"_c$i").mkString(" + ")
    s"""WITH lens AS (SELECT doc_id, CAST(len($tokensSql) AS BIGINT) AS len FROM documents),
      | stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(len) AS BIGINT) AS sumlen FROM lens),
      | toks AS (SELECT doc_id, unnest($tokensSql) AS token FROM documents),
      | tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
      |   WHERE token IN ($inList) GROUP BY 1, 2),
      | dfq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS term_df FROM tf GROUP BY 1),
      | c AS (SELECT tf.doc_id, tf.token,
      |   ((CAST(s.n - dfq.term_df AS DOUBLE) + 0.5) / (CAST(dfq.term_df AS DOUBLE) + 0.5)) *
      |   ((CAST(tf.tf AS DOUBLE) * CAST(${k1 + 1.0} AS DOUBLE)) /
      |    (CAST(tf.tf AS DOUBLE) + CAST($k1 AS DOUBLE) * (CAST(${1.0 - b} AS DOUBLE)
      |      + CAST($b AS DOUBLE) * (CAST(l.len AS DOUBLE)
      |        / (CAST(s.sumlen AS DOUBLE) / CAST(s.n AS DOUBLE)))))) AS contrib
      |  FROM tf JOIN lens l USING (doc_id) CROSS JOIN stats s JOIN dfq USING (token)),
      | p AS (SELECT doc_id, $cases FROM c GROUP BY doc_id)
      | SELECT doc_id, $fold AS score FROM p
      | ORDER BY score DESC, doc_id LIMIT 10""".stripMargin.replace("\n", " ")
  }

  /** PERSISTED search index ([[graft.ops.RefStore.writeSearchIndex]] +
    * [[graft.ops.Relevance.bm25TopDocsStored]]): the corpus commits its
    * postings + lengths in two batches; the query scores against the
    * LOADED index without re-tokenizing anything. Oracle = the
    * q_bm25_search law over the whole corpus: per-document tf, document
    * frequency, and the exact-integer corpus scalars are
    * batching-invariant, so the stored path must hash-match the same
    * scores bit-for-bit — an index that loses a posting, double-commits
    * a batch, or drifts the layout breaks here.
    */
  def qBm25Store(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val store = storeOnce(dir, "searchstore") { s =>
      graft.ops.RefStore.writeSearchIndex(
        docs.filter(col("doc_id") % 6 < 3), "doc_id", "text", s)
      graft.ops.RefStore.mergeSearchIndex(
        docs.filter(col("doc_id") % 6 >= 3), "doc_id", "text", s, batchId = "b1")
    }
    graft.ops.Relevance.bm25TopDocsStored(spark, store, bm25Terms, k = 10)
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** Same law as q_bm25_search: batching is invisible to the exact-integer
    * index stats — precisely the property under test.
    */
  lazy val qBm25StoreSql: String = qBm25SearchSql

  /** Reciprocal-rank-fusion hybrid retrieval
    * ([[graft.ops.Similarity.rrfFuseTopK]]): cosine and euclidean
    * rankings of the corpus fused by exact-integer reciprocal ranks
    * (`1000000 div (60+rank)`, top-20 per system, top-10 fused). Both
    * per-system rankings and the fusion replay in SQL bit-for-bit (the
    * sims/distances are the same fixed IEEE chains as q_ann_cosine).
    */
  def qRrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    graft.ops.Similarity.rrfFuseTopK(
        e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
        perSystemK = 20, k0 = 60, k = 10)
      .orderBy("query_id", "rk")
  }

  lazy val qRrfFusionSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
      | c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
      | s AS (SELECT query_id, neighbor_id,
      |   list_dot_product(qv, cv) AS dp, list_dot_product(cv, cv) AS cc,
      |   list_dot_product(qv, qv) AS qq
      |  FROM c, q WHERE neighbor_id <> query_id),
      | s2 AS (SELECT query_id, neighbor_id, dp / (sqrt(qq) * sqrt(cc)) AS sim,
      |   (cc - 2.0 * dp) + qq AS l2sq FROM s),
      | r AS (SELECT query_id, neighbor_id,
      |   row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rkc,
      |   row_number() OVER (PARTITION BY query_id ORDER BY l2sq ASC, neighbor_id) AS rkl
      |  FROM s2),
      | f AS (SELECT query_id, neighbor_id,
      |   (CASE WHEN rkc <= 20 THEN 1000000 // (60 + rkc) ELSE 0 END
      |    + CASE WHEN rkl <= 20 THEN 1000000 // (60 + rkl) ELSE 0 END) AS rrf_micro,
      |   rkc, rkl FROM r WHERE rkc <= 20 OR rkl <= 20),
      | tt AS (SELECT query_id, neighbor_id, rrf_micro, rkc, rkl,
      |   row_number() OVER (PARTITION BY query_id ORDER BY rrf_micro DESC, neighbor_id) AS rk
      |  FROM f)
      | SELECT query_id, neighbor_id, CAST(rk AS BIGINT) AS rk,
      |  CAST(rrf_micro AS BIGINT) AS rrf_micro,
      |  CASE WHEN rkc <= 20 THEN CAST(rkc AS BIGINT) END AS rk_cos,
      |  CASE WHEN rkl <= 20 THEN CAST(rkl AS BIGINT) END AS rk_l2
      | FROM tt WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin.replace("\n", " ")

  /** Batched BM25 ([[graft.ops.Relevance.bm25TopDocsBatch]]): three
    * queries scored in ONE corpus pass, per-term contributions
    * micro-quantized before the orderless integer sum (the batch law),
    * per-query top-5.
    */
  private[queries] lazy val bm25BatchQueries: Seq[(String, Seq[String])] = Seq(
    "qa" -> Seq("spark", "merge"),
    "qb" -> Seq("vector", "window", "batch"),
    "qc" -> Seq("table"))

  def qBm25Batch(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Relevance.bm25TopDocsBatch(
        t(spark, dir, "documents"), "doc_id", "text", bm25BatchQueries, k = 5)
      .orderBy("query_name", "rk")

  lazy val qBm25BatchSql: String = {
    val (k1, b) = (1.2, 0.75)
    val allTerms = bm25BatchQueries.flatMap(_._2).distinct
    val inList = allTerms.map("'" + _ + "'").mkString(",")
    val qtValues = bm25BatchQueries
      .flatMap { case (qn, ts) => ts.distinct.map(t => s"('$qn','$t')") }
      .mkString(",")
    s"""WITH lens AS (SELECT doc_id, CAST(len($tokensSql) AS BIGINT) AS len FROM documents),
      | stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(len) AS BIGINT) AS sumlen FROM lens),
      | toks AS (SELECT doc_id, unnest($tokensSql) AS token FROM documents),
      | tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
      |   WHERE token IN ($inList) GROUP BY 1, 2),
      | dfq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS term_df FROM tf GROUP BY 1),
      | c AS (SELECT tf.doc_id, tf.token, CAST(round((
      |   ((CAST(s.n - dfq.term_df AS DOUBLE) + 0.5) / (CAST(dfq.term_df AS DOUBLE) + 0.5)) *
      |   ((CAST(tf.tf AS DOUBLE) * CAST(${k1 + 1.0} AS DOUBLE)) /
      |    (CAST(tf.tf AS DOUBLE) + CAST($k1 AS DOUBLE) * (CAST(${1.0 - b} AS DOUBLE)
      |      + CAST($b AS DOUBLE) * (CAST(l.len AS DOUBLE)
      |        / (CAST(s.sumlen AS DOUBLE) / CAST(s.n AS DOUBLE))))))
      |   ) * 1000000.0) AS BIGINT) AS cm
      |  FROM tf JOIN lens l USING (doc_id) CROSS JOIN stats s JOIN dfq USING (token)),
      | qt(query_name, token) AS (SELECT * FROM (VALUES $qtValues) v(q, t)),
      | p AS (SELECT qt.query_name, c.doc_id, CAST(SUM(c.cm) AS BIGINT) AS score_micro
      |  FROM c JOIN qt USING (token) GROUP BY 1, 2),
      | r AS (SELECT query_name, doc_id, score_micro,
      |   row_number() OVER (PARTITION BY query_name
      |     ORDER BY score_micro DESC, doc_id) AS rk FROM p)
      | SELECT query_name, doc_id, CAST(rk AS BIGINT) AS rk, score_micro
      | FROM r WHERE rk <= 5 ORDER BY query_name, rk""".stripMargin.replace("\n", " ")
  }
}
