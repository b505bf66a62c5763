package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ExcelSerial
import graft.model.PathOps
import graft.ops.{Hierarchy, Parents, Upsert}
import graft.views.Analytic

/** Evaluation statistics: ranking metrics, agreement, text-overlap scores, correlation and independence tests.
  *
  * Split from the monolithic `Registry` object (round 15): members are
  * unchanged; `Registry` mixes every family trait in, so the public
  * surface (`Registry.queries` / `Registry.oracle` / each q* member) is
  * identical. Cross-family helpers are `private[queries]`; vals are lazy
  * so trait-linearization order can never null-init a shared fragment.
  */
trait EvalQueries { self: RegistryAll =>

  /** Calibration reliability bins ([[graft.ops.Eval.calibrationBins]]):
    * every vector scored by anchored cosine to vec 0 mapped to [0,1],
    * truth = shares the anchor's label — is the scorer's confidence
    * honest, bin by bin? Exact laws end to end: the engine-wide cosine
    * kernel, (cos+1)/2 in fixed op order, clamped floor bins,
    * micro-quantized confidence sums, one double division per output
    * ratio.
    */
  def qCalibration(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    graft.functions.CosineSimilarity.register(spark)
    val anchor = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("_av"), col("label").as("_al"))
    val scored = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(anchor))
      .select(
        ((graft.functions.CosineSimilarity.cosine(col("embedding"), col("_av"))
          + lit(1.0)) / lit(2.0)).as("score"),
        (col("label") === col("_al")).as("is_pos"))
    graft.ops.Eval.calibrationBins(scored, "score", "is_pos", nBins = 10)
      .orderBy("bin")
  }

  lazy val qCalibrationSql: String =
    """WITH a AS (SELECT embedding::DOUBLE[] AS av, label AS al FROM embeddings WHERE vec_id = 0),
      | s AS (SELECT (list_dot_product(v, av)/(sqrt(list_dot_product(v, v))*sqrt(list_dot_product(av, av))) + 1.0) / 2.0 AS score,
      |    (e.label = a.al) AS y
      |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings WHERE vec_id <> 0) e, a),
      | b AS (SELECT least(9, greatest(0, CAST(floor(score * 10) AS BIGINT))) AS bin,
      |    CAST(floor(score * 1000000.0 + 0.5) AS BIGINT) AS m, y FROM s
      |  WHERE score IS NOT NULL AND isfinite(score) AND y IS NOT NULL)
      | SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(COUNT(CASE WHEN y THEN 1 END) AS BIGINT) AS n_pos,
      |  CAST(SUM(m) AS BIGINT) AS conf_micro_sum,
      |  CAST(COUNT(CASE WHEN y THEN 1 END) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE) AS accuracy,
      |  CAST(SUM(m) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE)/1000000.0 AS confidence
      | FROM b GROUP BY bin ORDER BY bin""".stripMargin.replace("\n", " ")

  /** Retrieval-quality evaluation ([[graft.ops.Eval.ndcgAtK]]): NDCG@10 /
    * recall@10 / first-relevant-rank of brute-force cosine retrieval where
    * a neighbor is relevant iff it shares the query's label. The ranking
    * eval is bit-exact because the discount table is a JVM-computed
    * integer literal embedded on BOTH engine sides (no engine `log2` in
    * the law) and DCG/IDCG are exact BIGINT sums; ndcg/recall are single
    * divisions of exact integers.
    */
  def qNdcgEval(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    graft.functions.CosineSimilarity.register(spark)
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("_qv"),
      col("label").as("_ql")).filter(col("qid") < 5)
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("_cv"),
      col("label").as("_cl"))
    val pairs = c.join(broadcast(q), col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        graft.functions.CosineSimilarity.cosine(col("_cv"), col("_qv")).as("_sim"),
        (col("_cl") === col("_ql")).cast("int").as("_rel"))
    graft.ops.Eval.ndcgAtK(pairs, "qid", "cid", "_sim", "_rel", k = 10)
      .withColumnRenamed("qid", "query_id")
      .orderBy("query_id")
  }

  lazy val qNdcgEvalSql: String = {
    val dlist = graft.ops.Eval.ndcgDiscountsMicro(10).mkString("[", ", ", "]")
    s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv, label AS ql
      |   FROM embeddings WHERE vec_id < 5),
      | c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv, label AS cl FROM embeddings),
      | s0 AS (SELECT qid, cid,
      |   list_dot_product(cv, qv)/(sqrt(list_dot_product(cv, cv))*sqrt(list_dot_product(qv, qv))) AS sim,
      |   CAST(CAST(cl = ql AS INTEGER) AS DOUBLE) AS rel
      |  FROM c, q WHERE cid <> qid),
      | s AS (SELECT * FROM s0 WHERE sim IS NOT NULL AND rel IS NOT NULL
      |   AND abs(rel) <= 9.0e12 AND NOT isnan(sim)),
      | r AS (SELECT *,
      |   row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rm,
      |   row_number() OVER (PARTITION BY qid ORDER BY rel DESC, cid) AS ri FROM s),
      | a AS (SELECT qid AS query_id,
      |   CAST(SUM(CASE WHEN rm <= 10 THEN CAST(round(rel * ($dlist[rm])) AS BIGINT) ELSE 0 END) AS BIGINT) AS dcg_micro,
      |   CAST(SUM(CASE WHEN ri <= 10 THEN CAST(round(rel * ($dlist[ri])) AS BIGINT) ELSE 0 END) AS BIGINT) AS idcg_micro,
      |   CAST(COUNT(CASE WHEN rel > 0 THEN 1 END) AS BIGINT) AS rel_total,
      |   CAST(COUNT(CASE WHEN rel > 0 AND rm <= 10 THEN 1 END) AS BIGINT) AS rel_at_k,
      |   CAST(MIN(CASE WHEN rel > 0 THEN rm END) AS BIGINT) AS first_rel_rank
      |  FROM r GROUP BY qid)
      | SELECT query_id, dcg_micro, idcg_micro, rel_total, rel_at_k, first_rel_rank,
      |  CASE WHEN idcg_micro > 0 THEN CAST(dcg_micro AS DOUBLE) / CAST(idcg_micro AS DOUBLE) END AS ndcg,
      |  CASE WHEN rel_total > 0 THEN CAST(rel_at_k AS DOUBLE) / CAST(rel_total AS DOUBLE) END AS recall_at_k
      | FROM a ORDER BY query_id""".stripMargin.replace("\n", " ")
  }

  /** Exact Mann-Whitney AUC per event type ([[graft.ops.Eval.aucByGroup]]):
    * how well `value` separates a deterministic synthetic label
    * (user_id % 3 = 0 — a stand-in for "passed human review"). Average
    * ranks on ties, NULL scores/labels excluded, degenerate groups NULL —
    * the oracle replays the identical rank algebra, DOUBLE throughout
    * (rank sums are exact integers + halves, so no decimal-rounding trap).
    */
  def qAucEval(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.aucByGroup(
      t(spark, dir, "events")
        .withColumn("label", col("user_id") % 3 === 0),
      "value", "label", "event_type")
      .select(col("event_type"), col("n_pos"), col("n_neg"),
        round(col("auc"), 10).as("auc"))
      .orderBy("event_type")

  lazy val qAucEvalSql: String =
    """WITH b AS (SELECT event_type AS _g, value AS _s,
      |   (user_id % 3 = 0) AS _y FROM events
      |  WHERE value IS NOT NULL AND user_id IS NOT NULL),
      | r AS (SELECT _g, _y,
      |   rank() OVER (PARTITION BY _g ORDER BY _s)
      |     + (COUNT(*) OVER (PARTITION BY _g, _s) - 1) / 2.0 AS _avg_rank
      |  FROM b),
      | a AS (SELECT _g AS event_type,
      |   COUNT(CASE WHEN _y THEN 1 END) AS n_pos,
      |   COUNT(CASE WHEN NOT _y THEN 1 END) AS n_neg,
      |   SUM(CASE WHEN _y THEN _avg_rank END) AS _rpos
      |  FROM r GROUP BY 1)
      | SELECT event_type, n_pos, n_neg,
      |  round(CASE WHEN n_pos > 0 AND n_neg > 0
      |   THEN (_rpos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg) END, 10) AS auc
      | FROM a ORDER BY event_type""".stripMargin.replace("\n", " ")

  /** Rank-Biased Overlap @20 (p=0.9) between the cosine and euclidean
    * rankings of each query ([[graft.ops.Similarity.systemRankings]] +
    * [[graft.ops.Eval.rboAtK]], Webber et al. TOIS'10) — "how much do
    * the two systems RRF fuses actually agree", top-weighted. Exact
    * prefix-overlap integers, ONE fixed `(1−p)·exp((d−1)·ln p)` double
    * chain per depth (the decay/KL libm discipline), every term
    * pico-quantized before the integer Σ — fully hash-oracled.
    */
  def qRboEval(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val r = graft.ops.Similarity.systemRankings(
      e, e.filter(col("vec_id") < 5), "vec_id", "embedding", perSystemK = 20)
    graft.ops.Eval.rboAtKFromRankings(
        r, "query_id", "neighbor_id", "rk_cos", "rk_l2", k = 20)
      .orderBy("query_id")
  }

  lazy val qRboEvalSql: String =
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
      | m AS (SELECT query_id, neighbor_id, rkc, rkl FROM r
      |  WHERE rkc <= 20 AND rkl <= 20),
      | dd AS (SELECT unnest(generate_series(1, 20)) AS d),
      | ov AS (SELECT qs.query_id, dd.d,
      |   CAST(COUNT(CASE WHEN m.rkc <= dd.d AND m.rkl <= dd.d THEN 1 END) AS BIGINT) AS ov
      |  FROM (SELECT DISTINCT query_id FROM r) qs CROSS JOIN dd
      |  LEFT JOIN m ON m.query_id = qs.query_id GROUP BY 1, 2),
      | tt AS (SELECT query_id,
      |   CAST(round((((1.0 - 0.9) * exp(CAST(d - 1 AS DOUBLE) * ln(0.9)))
      |     * (CAST(ov AS DOUBLE) / CAST(d AS DOUBLE))) * 1000000000000.0) AS BIGINT) AS term
      |  FROM ov),
      | nc AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_common FROM m GROUP BY 1)
      | SELECT s3.query_id, COALESCE(nc.n_common, 0) AS n_common,
      |  CAST(s3.rbo AS BIGINT) AS rbo_pico
      | FROM (SELECT query_id, SUM(term) AS rbo FROM tt GROUP BY 1) s3
      | LEFT JOIN nc ON nc.query_id = s3.query_id
      | ORDER BY s3.query_id""".stripMargin.replace("\n", " ")

  /** Per-source percent-rank calibration table
    * ([[graft.ops.Quantiles.percentRankDeciles]]): within-source deciles
    * of the raw score — the cross-source score-comparability fix.
    */
  def qScoreNorm(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Quantiles.percentRankDeciles(
        t(spark, dir, "documents"), "n_chars", "source")
      .orderBy("stratum", "decile")

  lazy val qScoreNormSql: String =
    """WITH v AS (SELECT source AS stratum, CAST(n_chars AS BIGINT) AS v
      |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
      | p AS (SELECT stratum, v,
      |   percent_rank() OVER (PARTITION BY stratum ORDER BY v) AS pr FROM v),
      | d AS (SELECT stratum, v,
      |   CAST(least(floor(pr * 10.0), 9.0) AS BIGINT) AS decile FROM p)
      | SELECT stratum, decile, CAST(COUNT(*) AS BIGINT) AS n,
      |  MIN(v) AS min_v, MAX(v) AS max_v
      | FROM d GROUP BY stratum, decile ORDER BY stratum, decile"""
      .stripMargin.replace("\n", " ")

  /** Cohen's kappa ([[graft.ops.Eval.cohenKappa]]) between the corpus's
    * declared `lang` and the rule-based [[graft.functions.TextFns.langId]]
    * prediction — the chance-corrected acceptance gate for the cheap
    * classifier, exact-integer margins and one fixed float chain.
    */
  def qKappa(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .select(col("lang"),
        graft.functions.TextFns.langId(col("text")).as("lang_pred"))
    graft.ops.Eval.cohenKappa(d, "lang", "lang_pred")
  }

  lazy val qKappaSql: String = {
    import graft.functions.TextFns._
    val (en, de, es, fr) =
      (hitsSql(enStopwords), hitsSql(deStopwords), hitsSql(esStopwords), hitsSql(frStopwords))
    val predCase =
      s"""CASE
        | WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
        | WHEN $en = 0 AND $de = 0 AND $es = 0 AND $fr = 0 THEN 'und'
        | WHEN $en >= $de AND $en >= $es AND $en >= $fr THEN 'en'
        | WHEN $de >= $es AND $de >= $fr THEN 'de'
        | WHEN $es >= $fr THEN 'es'
        | ELSE 'fr' END""".stripMargin.replace("\n", " ")
    s"""WITH pred AS (SELECT lang AS a, $predCase AS b FROM documents),
      | flt AS (SELECT a, b FROM pred WHERE a IS NOT NULL AND b IS NOT NULL),
      | cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c FROM flt GROUP BY a, b),
      | tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
      |   CAST(SUM(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS n_agree FROM cells),
      | rm AS (SELECT a, CAST(SUM(c) AS BIGINT) AS ra FROM cells GROUP BY a),
      | cm AS (SELECT b, CAST(SUM(c) AS BIGINT) AS cb FROM cells GROUP BY b),
      | pn AS (SELECT CAST(COALESCE(SUM(CAST(ra AS HUGEINT) * CAST(cb AS HUGEINT)), 0)
      |   AS DOUBLE) AS pe_num FROM rm JOIN cm ON rm.a = cm.b)
      | SELECT n, n_agree, pe_num,
      |  CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
      |  pe_num / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe,
      |  CASE WHEN pe_num / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) = 1.0
      |   THEN NULL
      |   ELSE (CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE)
      |     - pe_num / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
      |    / (1.0 - pe_num / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
      |  END AS kappa
      | FROM tot CROSS JOIN pn""".stripMargin.replace("\n", " ")
  }

  /** Spearman rank correlation between document length and token count
    * ([[graft.ops.Eval.spearman]]): the monotone-association companion
    * to q_metric_corr's Pearson panel, tie-corrected via exact doubled
    * average ranks from per-value frequency tables (no corpus-wide
    * sort). NULL-text docs count as 0 tokens (the tokens(NULL) = []
    * engine law).
    */
  def qSpearmanCorr(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.spearman(
      t(spark, dir, "documents")
        .select(col("n_chars"),
          graft.functions.TextFns.tokenCount(col("text")).as("n_tokens")),
      "n_chars", "n_tokens")

  lazy val qSpearmanCorrSql: String =
    s"""WITH d AS (SELECT CAST(n_chars AS BIGINT) AS x, $nTokensSqlExpr AS y
      |  FROM documents WHERE n_chars IS NOT NULL),
      | fx AS (SELECT x AS v, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY 1),
      | fy AS (SELECT y AS v, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY 1),
      | rx AS (SELECT v, 2 * (SUM(cnt) OVER (ORDER BY v) - cnt) + cnt + 1 AS r2
      |  FROM fx),
      | ry AS (SELECT v, 2 * (SUM(cnt) OVER (ORDER BY v) - cnt) + cnt + 1 AS r2
      |  FROM fy),
      | rk AS (SELECT rx.r2 AS r2x, ry.r2 AS r2y FROM d
      |  JOIN rx ON rx.v = d.x JOIN ry ON ry.v = d.y),
      | s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |   CAST(SUM(CAST(r2x AS HUGEINT)) AS HUGEINT) AS sx,
      |   CAST(SUM(CAST(r2y AS HUGEINT)) AS HUGEINT) AS sy,
      |   CAST(SUM(CAST(r2x AS HUGEINT) * r2x) AS HUGEINT) AS sxx,
      |   CAST(SUM(CAST(r2y AS HUGEINT) * r2y) AS HUGEINT) AS syy,
      |   CAST(SUM(CAST(r2x AS HUGEINT) * r2y) AS HUGEINT) AS sxy FROM rk),
      | nd AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fx) AS nx_distinct,
      |   (SELECT CAST(COUNT(*) AS BIGINT) FROM fy) AS ny_distinct)
      | SELECT n, nx_distinct, ny_distinct,
      |  CASE WHEN n > 0 AND
      |    (CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
      |     - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |       * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) <> 0.0 AND
      |    (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
      |     - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
      |       * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))) <> 0.0
      |   THEN CAST(round(
      |    (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
      |     - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |       * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
      |    / (sqrt(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
      |       - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |         * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
      |     * sqrt(CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
      |       - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
      |         * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))))
      |    * 1000000000000.0) AS BIGINT)
      |  END AS rho_pico
      | FROM s CROSS JOIN nd""".stripMargin.replace("\n", " ")

  /** Per-event-type confusion report at the type's mean-value threshold
    * ([[graft.ops.Eval.confusionReport]]): TP/FP/FN/TN, F1 and Matthews
    * correlation for the q_auc_eval label (user_id % 3 = 0) — the
    * thresholded companion to AUC's ranking view, with MCC as the
    * skew-robust single number. Exact DECIMAL score sums, exact cells,
    * two fixed double chains.
    */
  def qConfusionEval(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.confusionReport(
        t(spark, dir, "events")
          .withColumn("label", col("user_id") % 3 === 0),
        "value", "label", "event_type")
      .withColumnRenamed("group", "event_type")
      .orderBy("event_type")

  lazy val qConfusionEvalSql: String =
    """WITH b AS (SELECT event_type AS g, CAST(value AS DECIMAL(18,2)) AS s,
      |   (user_id % 3 = 0) AS y FROM events
      |  WHERE value IS NOT NULL AND user_id IS NOT NULL
      |   AND event_type IS NOT NULL),
      | m AS (SELECT g, CAST(SUM(s) AS DECIMAL(18,2)) AS ss,
      |   CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1),
      | p AS (SELECT b.g, b.y,
      |   (CAST(b.s AS DOUBLE) >= CAST(m.ss AS DOUBLE) / CAST(m.n AS DOUBLE))
      |    AS pred
      |  FROM b JOIN m ON m.g = b.g),
      | c AS (SELECT g,
      |   CAST(SUM(CASE WHEN pred AND y THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |   CAST(SUM(CASE WHEN pred AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |   CAST(SUM(CASE WHEN NOT pred AND y THEN 1 ELSE 0 END) AS BIGINT) AS fn,
      |   CAST(SUM(CASE WHEN NOT pred AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS tn
      |  FROM p GROUP BY 1)
      | SELECT g AS event_type, tp, fp, fn, tn,
      |  CASE WHEN 2 * tp + fp + fn > 0 THEN
      |   CAST(round(2.0 * tp / CAST(2 * tp + fp + fn AS DOUBLE)
      |     * 1000000000000.0) AS BIGINT) END AS f1_pico,
      |  CASE WHEN tp + fp > 0 AND tp + fn > 0 AND tn + fp > 0 AND tn + fn > 0
      |   THEN CAST(round(
      |    CAST(CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn AS DOUBLE)
      |    / (sqrt(CAST(tp + fp AS DOUBLE)) * sqrt(CAST(tp + fn AS DOUBLE))
      |     * sqrt(CAST(tn + fp AS DOUBLE)) * sqrt(CAST(tn + fn AS DOUBLE)))
      |    * 1000000000000.0) AS BIGINT) END AS mcc_pico
      | FROM c ORDER BY event_type""".stripMargin.replace("\n", " ")

  /** chrF2 of the LEAD-30-token baseline against each full document
    * ([[graft.ops.Eval.chrF]], Popović WMT'15) — the tokenizer-free
    * eval beside ROUGE-2's token recall: whitespace-stripped char
    * 1..6-grams, clipped counts, per-order P/R pico-quantized before the
    * cross-order integer Σ, one fixed F_β=2 double chain.
    */
  def qChrfEval(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("text").as("ref"),
        concat_ws(" ", slice(graft.functions.TextFns.tokens(col("text")),
          1, 30)).as("cand"))
    graft.ops.Eval.chrF(docs, "doc_id", "ref", "cand", maxN = 6, beta = 2.0)
      .orderBy("doc_id")
  }

  lazy val qChrfEvalSql: String = {
    val pAvg = "(CAST(COALESCE(sump_pico, 0) AS DOUBLE) / 6000000000000.0)"
    val rAvg = "(CAST(COALESCE(sumr_pico, 0) AS DOUBLE) / 6000000000000.0)"
    s"""WITH base AS (SELECT doc_id,
      |   regexp_replace(COALESCE(text, ''), '[ \\t\\n\\x0B\\f\\r]+', '', 'g') AS rs,
      |   regexp_replace(array_to_string(list_slice($tokensSql, 1, 30), ' '),
      |     '[ \\t\\n\\x0B\\f\\r]+', '', 'g') AS cs
      |  FROM documents),
      | ns AS (SELECT unnest(generate_series(1, 6)) AS n),
      | rg AS (SELECT doc_id, n, unnest(list_transform(
      |   generate_series(1, length(rs) - n + 1), i -> substr(rs, i, n))) AS g
      |  FROM base CROSS JOIN ns WHERE length(rs) >= n),
      | cg AS (SELECT doc_id, n, unnest(list_transform(
      |   generate_series(1, length(cs) - n + 1), i -> substr(cs, i, n))) AS g
      |  FROM base CROSS JOIN ns WHERE length(cs) >= n),
      | rc AS (SELECT doc_id, n, g, CAST(COUNT(*) AS BIGINT) AS cr
      |  FROM rg GROUP BY 1, 2, 3),
      | ccn AS (SELECT doc_id, n, g, CAST(COUNT(*) AS BIGINT) AS cc
      |  FROM cg GROUP BY 1, 2, 3),
      | po AS (SELECT rc.doc_id, rc.n, CAST(SUM(cr) AS BIGINT) AS nr,
      |   CAST(SUM(LEAST(cr, COALESCE(ccn.cc, 0))) AS BIGINT) AS m
      |  FROM rc LEFT JOIN ccn ON ccn.doc_id = rc.doc_id AND ccn.n = rc.n
      |    AND ccn.g = rc.g
      |  GROUP BY 1, 2),
      | ct AS (SELECT doc_id, n, CAST(SUM(cc) AS BIGINT) AS nc
      |  FROM ccn GROUP BY 1, 2),
      | fo AS (SELECT COALESCE(po.doc_id, ct.doc_id) AS doc_id,
      |   COALESCE(po.nr, 0) AS nr, COALESCE(po.m, 0) AS m,
      |   COALESCE(ct.nc, 0) AS nc
      |  FROM po FULL OUTER JOIN ct ON ct.doc_id = po.doc_id AND ct.n = po.n),
      | q AS (SELECT doc_id,
      |   CAST(SUM(CAST(round((CASE WHEN nc > 0
      |     THEN CAST(m AS DOUBLE) / CAST(nc AS DOUBLE) ELSE 0.0 END)
      |     * 1000000000000.0) AS BIGINT)) AS BIGINT) AS sump_pico,
      |   CAST(SUM(CAST(round((CASE WHEN nr > 0
      |     THEN CAST(m AS DOUBLE) / CAST(nr AS DOUBLE) ELSE 0.0 END)
      |     * 1000000000000.0) AS BIGINT)) AS BIGINT) AS sumr_pico
      |  FROM fo GROUP BY 1)
      | SELECT d.doc_id, COALESCE(sump_pico, 0) AS sump_pico,
      |  COALESCE(sumr_pico, 0) AS sumr_pico,
      |  CASE WHEN (4.0 * $pAvg) + $rAvg > 0.0
      |   THEN CAST(round(((5.0 * ($pAvg * $rAvg)) / ((4.0 * $pAvg) + $rAvg))
      |     * 1000000000000.0) AS BIGINT)
      |   ELSE 0 END AS chrf_pico
      | FROM (SELECT DISTINCT doc_id FROM documents) d
      | LEFT JOIN q USING (doc_id) ORDER BY doc_id""".stripMargin.replace("\n", " ")
  }

  /** Character error rate ([[graft.ops.Eval.cerAtPrefix]] — Levenshtein
    * edits per reference character, the ASR/OCR eval staple) of the
    * 30-token-head candidate against the full text, over ASCII-normalized
    * 256-char prefixes. Both dialect traps are part of the law: non-ASCII
    * strips first (Spark levenshtein counts codepoints, DuckDB counts
    * bytes — equal on pure ASCII) and the prefix cap bounds the O(len²)
    * DP per row. Exact integer edits; one fixed pico chain.
    */
  def qCerEval(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("text").as("ref"),
        concat_ws(" ", slice(graft.functions.TextFns.tokens(col("text")),
          1, 30)).as("cand"))
    graft.ops.Eval.cerAtPrefix(docs, "doc_id", "ref", "cand", prefixLen = 256)
      .orderBy("doc_id")
  }

  lazy val qCerEvalSql: String = {
    val strip = (c: String) =>
      s"substr(regexp_replace(COALESCE($c, ''), '[^\\x00-\\x7F]', '', 'g'), 1, 256)"
    s"""WITH base AS (SELECT doc_id, ${strip("text")} AS r,
      |   ${strip(s"array_to_string(list_slice($tokensSql, 1, 30), ' ')")} AS c
      |  FROM documents)
      | SELECT doc_id, CAST(length(r) AS BIGINT) AS ref_chars,
      |  CAST(levenshtein(r, c) AS BIGINT) AS edit_dist,
      |  CASE WHEN length(r) > 0 THEN
      |   CAST(round(CAST(levenshtein(r, c) AS DOUBLE)
      |     / CAST(length(r) AS DOUBLE) * 1000000000000.0) AS BIGINT)
      |  END AS cer_pico
      | FROM base ORDER BY doc_id""".stripMargin.replace("\n", " ")
  }

  /** Kendall's τ between the cosine and L2 rankings over their common
    * top-20 ([[graft.ops.Eval.kendallTauFromRankings]], Kendall '38):
    * the pairwise-concordance complement to q_rbo_eval's prefix overlap
    * — same [[graft.ops.Similarity.systemRankings]] frame, asking
    * whether the two systems ORDER the shared items alike. Exact
    * concordant/discordant integers, pair fan-out ≤ C(20,2) per query,
    * one fixed pico chain; fully hash-oracled (the rankings replay via
    * the q_rbo_eval fixed IEEE chain).
    */
  def qKendallTau(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val r = graft.ops.Similarity.systemRankings(
      e, e.filter(col("vec_id") < 5), "vec_id", "embedding", perSystemK = 20)
    graft.ops.Eval.kendallTauFromRankings(
        r, "query_id", "neighbor_id", "rk_cos", "rk_l2", k = 20)
      .orderBy("query_id")
  }

  lazy val qKendallTauSql: String =
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
      | m AS (SELECT query_id, neighbor_id, rkc, rkl FROM r
      |  WHERE rkc <= 20 AND rkl <= 20),
      | nc AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_common FROM m GROUP BY 1),
      | pr AS (SELECT a.query_id,
      |   CAST(SUM(CASE WHEN (a.rkc < b.rkc AND a.rkl < b.rkl)
      |     OR (a.rkc > b.rkc AND a.rkl > b.rkl) THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
      |   CAST(SUM(CASE WHEN (a.rkc < b.rkc AND a.rkl < b.rkl)
      |     OR (a.rkc > b.rkc AND a.rkl > b.rkl) THEN 0 ELSE 1 END) AS BIGINT) AS discordant
      |  FROM m a JOIN m b ON b.query_id = a.query_id
      |    AND a.neighbor_id < b.neighbor_id
      |  GROUP BY 1)
      | SELECT nc.query_id, nc.n_common,
      |  COALESCE(pr.concordant, 0) AS concordant,
      |  COALESCE(pr.discordant, 0) AS discordant,
      |  CASE WHEN nc.n_common >= 2 THEN
      |   CAST(round(CAST(COALESCE(pr.concordant, 0) - COALESCE(pr.discordant, 0) AS DOUBLE)
      |     / (CAST(nc.n_common * (nc.n_common - 1) AS DOUBLE) / 2.0)
      |     * 1000000000000.0) AS BIGINT)
      |  END AS tau_pico
      | FROM nc LEFT JOIN pr ON pr.query_id = nc.query_id
      | ORDER BY nc.query_id""".stripMargin.replace("\n", " ")

  /** Unbiased pass@5 per user-task over purchase outcomes
    * ([[graft.ops.Eval.passAtK]], Chen et al. '21): the code/agent
    * benchmark estimator `1 − C(n−c,5)/C(n,5)` with the binomial ratio
    * as one fixed left-associated 5-term double chain — exact n/c
    * integers, NULL below 5 attempts, exactly 1 when fewer than 5
    * failures exist. One hash aggregate; fully hash-oracled.
    */
  def qPassAtK(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.passAtK(
        t(spark, dir, "events")
          .filter(col("user_id").isNotNull && col("event_type").isNotNull)
          .select(col("user_id"), (col("event_type") === "purchase").as("ok")),
        "user_id", "ok", k = 5)
      .orderBy("task_id")

  lazy val qPassAtKSql: String = {
    val prod = (0 until 5).map(i =>
      s"((CAST(n_attempts - n_correct AS DOUBLE) - $i.0)" +
        s" / (CAST(n_attempts AS DOUBLE) - $i.0))").mkString(" * ")
    s"""WITH a AS (SELECT user_id AS task_id,
      |   CAST(COUNT(*) AS BIGINT) AS n_attempts,
      |   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
      |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      |  GROUP BY 1)
      | SELECT task_id, n_attempts, n_correct,
      |  CASE WHEN n_attempts >= 5 THEN
      |   CASE WHEN n_attempts - n_correct < 5 THEN 1000000000000
      |    ELSE CAST(round((1.0 - ($prod)) * 1000000000000.0) AS BIGINT) END
      |  END AS pass_at_k_pico
      | FROM a ORDER BY task_id""".stripMargin.replace("\n", " ")
  }

  /** Pearson χ² independence + Cramér's V between event type and hour
    * of day ([[graft.ops.Eval.chi2Independence]]): is the event mix
    * time-of-day dependent, and by how much? Per-cell terms
    * pico-quantized before the integer Σ, absent cells folded in
    * arithmetically (Σ_all r·c/N = N), the one sqrt is IEEE-exact.
    */
  def qChi2Independence(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.chi2Independence(
      t(spark, dir, "events")
        .select(col("event_type").as("etype"),
          hour(col("ts")).cast("long").as("hod")),
      "etype", "hod")

  lazy val qChi2IndependenceSql: String =
    """WITH base AS (SELECT event_type AS a, CAST(hour(ts) AS BIGINT) AS b
      |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
      | cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM base GROUP BY 1, 2),
      | en AS (SELECT a, b, n,
      |   CAST(SUM(n) OVER (PARTITION BY a) AS BIGINT) AS r,
      |   CAST(SUM(n) OVER (PARTITION BY b) AS BIGINT) AS c,
      |   CAST(SUM(n) OVER () AS BIGINT) AS t FROM cells),
      | dims AS (SELECT CAST(COUNT(DISTINCT a) AS BIGINT) AS na,
      |   CAST(COUNT(DISTINCT b) AS BIGINT) AS nb FROM cells),
      | s AS (SELECT MAX(t) AS t,
      |   CAST(SUM(CAST(round(
      |     CAST((CAST(t AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
      |       * (CAST(t AS HUGEINT) * n - CAST(r AS HUGEINT) * c) AS DOUBLE)
      |     / (CAST(t AS DOUBLE) * r * c) * 1e12) AS BIGINT)) AS HUGEINT)
      |    AS sp,
      |   CAST(SUM(CAST(round(
      |     (CAST(r AS DOUBLE) * c / t) * 1e12) AS BIGINT)) AS HUGEINT)
      |    AS sa
      |  FROM en)
      | SELECT s.t AS n_rows, dims.na AS n_a, dims.nb AS n_b,
      |  CAST(sp + CAST(s.t AS HUGEINT) * 1000000000000 - sa AS BIGINT)
      |   AS chi2_pico,
      |  CASE WHEN least(dims.na, dims.nb) >= 2 THEN
      |   CAST(round(sqrt(
      |     (CAST(sp + CAST(s.t AS HUGEINT) * 1000000000000 - sa AS DOUBLE)
      |       / 1e12)
      |     / (CAST(s.t AS DOUBLE) * (least(dims.na, dims.nb) - 1)))
      |    * 1e12) AS BIGINT) END AS cramers_v_pico
      | FROM s CROSS JOIN dims WHERE s.t IS NOT NULL"""
      .stripMargin.replace("\n", " ")

  /** Mood's median test of document length across sources
    * ([[graft.ops.Eval.moodMedianTest]]): the blunt outlier-proof
    * member of the q_kruskal_wallis location family — exact pooled
    * lower median off the distributed prefix sum, then
    * chi2Independence's per-cell law over (source × above-median).
    */
  def qMoodMedian(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.moodMedianTest(
      t(spark, dir, "documents")
        .select(col("n_chars").cast("long").as("len"), col("source")),
      "len", "source")

  lazy val qMoodMedianSql: String =
    """WITH d AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v
      |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
      | f AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY 1),
      | r AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum,
      |   CAST(SUM(c) OVER () AS BIGINT) AS n FROM f),
      | m AS (SELECT MIN(v) AS med FROM r WHERE cum >= (n + 1) // 2),
      | base AS (SELECT d.g AS a, d.v > m.med AS b FROM d, m),
      | cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM base GROUP BY 1, 2),
      | en AS (SELECT a, b, n,
      |   CAST(SUM(n) OVER (PARTITION BY a) AS BIGINT) AS r,
      |   CAST(SUM(n) OVER (PARTITION BY b) AS BIGINT) AS c,
      |   CAST(SUM(n) OVER () AS BIGINT) AS t FROM cells),
      | dims AS (SELECT CAST(COUNT(DISTINCT a) AS BIGINT) AS na,
      |   CAST(COUNT(DISTINCT b) AS BIGINT) AS nb FROM cells),
      | s AS (SELECT MAX(t) AS t,
      |   CAST(SUM(CAST(round(
      |     CAST((CAST(t AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
      |       * (CAST(t AS HUGEINT) * n - CAST(r AS HUGEINT) * c) AS DOUBLE)
      |     / (CAST(t AS DOUBLE) * r * c) * 1e12) AS BIGINT)) AS HUGEINT)
      |    AS sp,
      |   CAST(SUM(CAST(round(
      |     (CAST(r AS DOUBLE) * c / t) * 1e12) AS BIGINT)) AS HUGEINT)
      |    AS sa
      |  FROM en)
      | SELECT s.t AS n_rows, dims.na AS n_groups, dims.nb AS n_sides,
      |  m.med AS median_value,
      |  CAST(sp + CAST(s.t AS HUGEINT) * 1000000000000 - sa AS BIGINT)
      |   AS chi2_pico,
      |  CASE WHEN least(dims.na, dims.nb) >= 2 THEN
      |   CAST(round(sqrt(
      |     (CAST(sp + CAST(s.t AS HUGEINT) * 1000000000000 - sa AS DOUBLE)
      |       / 1e12)
      |     / (CAST(s.t AS DOUBLE) * (least(dims.na, dims.nb) - 1)))
      |    * 1e12) AS BIGINT) END AS cramers_v_pico
      | FROM s CROSS JOIN dims CROSS JOIN m WHERE s.t IS NOT NULL"""
      .stripMargin.replace("\n", " ")

  /** Mutual information between document source and length bucket
    * ([[graft.ops.Eval.mutualInformation]], 100-char bins — the PSI bin
    * law): how many nats the source tells you about document length —
    * the dependence STRENGTH beside q_chi2_independence's significance.
    * Per-cell log factors pico-quantized before the DECIMAL Σ; absent
    * cells contribute exactly 0 by the law.
    */
  def qMutualInfo(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.mutualInformation(
      t(spark, dir, "documents")
        .select(col("source"),
          expr("cast(n_chars as bigint) div 100").as("len_bin")),
      "source", "len_bin")

  lazy val qMutualInfoSql: String =
    """WITH base AS (SELECT source AS a, CAST(n_chars AS BIGINT) // 100 AS b
      |  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL),
      | cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM base GROUP BY 1, 2),
      | en AS (SELECT a, b, n,
      |   CAST(SUM(n) OVER (PARTITION BY a) AS BIGINT) AS r,
      |   CAST(SUM(n) OVER (PARTITION BY b) AS BIGINT) AS c,
      |   CAST(SUM(n) OVER () AS BIGINT) AS t FROM cells),
      | dims AS (SELECT CAST(COUNT(DISTINCT a) AS BIGINT) AS na,
      |   CAST(COUNT(DISTINCT b) AS BIGINT) AS nb FROM cells),
      | s AS (SELECT MAX(t) AS t,
      |   CAST(SUM(CAST(n AS HUGEINT) * CAST(round(ln(
      |     (CAST(t AS DOUBLE) * CAST(n AS DOUBLE))
      |     / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))) * 1e12) AS BIGINT))
      |    AS HUGEINT) AS sm
      |  FROM en)
      | SELECT s.t AS n_rows, dims.na AS n_a, dims.nb AS n_b,
      |  CAST(round(CAST(sm AS DOUBLE) / CAST(s.t AS DOUBLE)) AS BIGINT)
      |   AS mi_pico
      | FROM s CROSS JOIN dims WHERE s.t IS NOT NULL"""
      .stripMargin.replace("\n", " ")

  /** Mann–Whitney U + Cliff's delta between the two ingest shards'
    * document-length distributions ([[graft.ops.Eval.rankEffect]];
    * groups = doc_id parity — the A/B pipeline-comparison shape): the
    * distribution-free two-sample screen over heavy-tailed corpus
    * metrics. Exact pair counts from per-value frequency tables (never
    * the O(n·m) pairwise join); doubled-U stays integral; one double
    * division for the delta.
    */
  def qRankEffect(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.rankEffect(
      t(spark, dir, "documents")
        .select(col("n_chars").cast("long").as("len"),
          (col("doc_id") % 2 === 0).as("is_a")),
      "len", "is_a")

  lazy val qRankEffectSql: String =
    """WITH base AS (SELECT CAST(n_chars AS BIGINT) AS v,
      |   (doc_id % 2 = 0) AS fa FROM documents
      |  WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL),
      | f AS (SELECT v,
      |   CAST(SUM(CASE WHEN fa THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |   CAST(SUM(CASE WHEN fa THEN 0 ELSE 1 END) AS BIGINT) AS nb
      |  FROM base GROUP BY 1),
      | w AS (SELECT na, nb,
      |   COALESCE(CAST(SUM(nb) OVER (ORDER BY v
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS HUGEINT),
      |    0) AS bb,
      |   COALESCE(CAST(SUM(nb) OVER (ORDER BY v
      |     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS HUGEINT),
      |    0) AS ba
      |  FROM f),
      | s AS (SELECT CAST(SUM(na) AS BIGINT) AS n_a,
      |   CAST(SUM(nb) AS BIGINT) AS n_b,
      |   CAST(SUM(CAST(na AS HUGEINT) * bb) AS HUGEINT) AS gt,
      |   CAST(SUM(CAST(na AS HUGEINT) * ba) AS HUGEINT) AS lt,
      |   CAST(SUM(CAST(na AS HUGEINT) * nb) AS HUGEINT) AS ties FROM w)
      | SELECT n_a, n_b, CAST(gt AS BIGINT) AS gt_pairs,
      |  CAST(lt AS BIGINT) AS lt_pairs, CAST(ties AS BIGINT) AS tie_pairs,
      |  CAST(2 * gt + ties AS BIGINT) AS u2_statistic,
      |  CASE WHEN n_a > 0 AND n_b > 0 THEN
      |   CAST(round(CAST(gt - lt AS DOUBLE)
      |     / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
      |     * 1000000000000.0) AS BIGINT) END AS cliffs_delta_pico
      | FROM s""".stripMargin.replace("\n", " ")

  /** Mean-reciprocal-rank components of cosine retrieval against
    * same-label relevance ([[graft.ops.Eval.mrrAtK]], Voorhees TREC-8):
    * the first-relevant rank and its exact-integer reciprocal per query,
    * over the [[graft.ops.Similarity.bruteForceTopK]] top-20 with the
    * embeddings table's labels as qrels. The ranking replays in SQL via
    * the q_ann_cosine fixed IEEE chain, so ranks — and therefore every
    * reciprocal — hash-match.
    */
  def qMrrEval(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val ranked = graft.ops.Similarity.bruteForceTopK(
      e, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 20)
    val lab = e.select(col("vec_id"), col("label"))
    val rel = lab.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("label").as("_ql"))
      .join(lab.select(col("vec_id").as("neighbor_id"), col("label").as("_cl")),
        col("_ql") === col("_cl") && col("query_id") =!= col("neighbor_id"))
    graft.ops.Eval.mrrAtK(ranked, rel, "query_id", "neighbor_id", "rank",
        k = 20)
      .orderBy("query_id")
  }

  lazy val qMrrEvalSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS ql
      |  FROM embeddings WHERE vec_id < 5),
      | c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv, label AS cl
      |  FROM embeddings),
      | s AS (SELECT query_id, neighbor_id, ql, cl,
      |   list_dot_product(qv, cv)/(sqrt(list_dot_product(qv, qv))*sqrt(list_dot_product(cv, cv))) AS sim
      |  FROM c, q WHERE neighbor_id <> query_id),
      | r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk
      |  FROM s),
      | top AS (SELECT query_id, CAST(rk AS BIGINT) AS rk,
      |   CASE WHEN ql = cl THEN 1 ELSE 0 END AS rel FROM r WHERE rk <= 20),
      | agg AS (SELECT query_id, CAST(SUM(rel) AS BIGINT) AS n_rel_at_k,
      |   MIN(CASE WHEN rel = 1 THEN rk END) AS first_rel_rank FROM top GROUP BY 1)
      | SELECT query_id, n_rel_at_k, first_rel_rank,
      |  COALESCE(1000000 // first_rel_rank, 0) AS rr_micro
      | FROM agg ORDER BY query_id""".stripMargin.replace("\n", " ")

  /** ROUGE-2 recall of the LEAD-30-token baseline against each full
    * document ([[graft.ops.Eval.rougeN]], Lin 2004) — the standard
    * summarization-eval statistic over the standard lead baseline:
    * exact clipped-bigram integer counts under the shared token law,
    * one double division, short references (< 2 tokens) NULL by law.
    */
  def qRougeEval(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("text").as("ref"),
        concat_ws(" ", slice(graft.functions.TextFns.tokens(col("text")),
          1, 30)).as("cand"))
    graft.ops.Eval.rougeN(docs, "doc_id", "ref", "cand", n = 2)
      .orderBy("doc_id")
  }

  lazy val qRougeEvalSql: String =
    s"""WITH t AS (SELECT doc_id, $tokensSql AS tk FROM documents),
      | base AS (SELECT doc_id, tk, list_slice(tk, 1, 30) AS ck FROM t),
      | rg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 1),
      |   i -> tk[i] || ' ' || tk[i+1])) AS g FROM base WHERE len(tk) >= 2),
      | cg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ck) - 1),
      |   i -> ck[i] || ' ' || ck[i+1])) AS g FROM base WHERE len(ck) >= 2),
      | rc AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS cr FROM rg GROUP BY 1, 2),
      | cc AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS cn FROM cg GROUP BY 1, 2),
      | j AS (SELECT rc.doc_id, CAST(SUM(cr) AS BIGINT) AS nref,
      |   CAST(SUM(LEAST(cr, COALESCE(cc.cn, 0))) AS BIGINT) AS nov
      |  FROM rc LEFT JOIN cc ON cc.doc_id = rc.doc_id AND cc.g = rc.g
      |  GROUP BY 1)
      | SELECT d.doc_id, COALESCE(j.nref, 0) AS n_ref_grams,
      |  COALESCE(j.nov, 0) AS n_overlap,
      |  CASE WHEN COALESCE(j.nref, 0) > 0
      |   THEN CAST(COALESCE(j.nov, 0) AS DOUBLE) / CAST(j.nref AS DOUBLE)
      |  END AS rouge2_recall
      | FROM documents d LEFT JOIN j ON j.doc_id = d.doc_id
      | ORDER BY d.doc_id""".stripMargin.replace("\n", " ")

  /** BLEU-4 of the LEAD-30-token candidate against the token-16..60
    * window as reference ([[graft.ops.Eval.bleu]], Papineni ACL'02) —
    * clipped n-gram PRECISION beside ROUGE's recall, exercised on
    * PARTIALLY overlapping windows so the clip, the zero-order gate and
    * the brevity penalty all take both branches: per-order p_n and
    * ln p_n pico-quantized before the cross-order integer Σ, one fixed
    * BP·exp chain.
    */
  def qBleuEval(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.functions.TextFns.tokens(col("text"))
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"),
        concat_ws(" ", slice(toks, 16, 45)).as("ref"),
        concat_ws(" ", slice(toks, 1, 30)).as("cand"))
    graft.ops.Eval.bleu(docs, "doc_id", "ref", "cand", maxN = 4)
      .orderBy("doc_id")
  }

  lazy val qBleuEvalSql: String =
    s"""WITH t AS (SELECT doc_id, $tokensSql AS tk FROM documents),
      | base AS (SELECT doc_id, list_slice(tk, 16, 60) AS rk,
      |   list_slice(tk, 1, 30) AS ck FROM t),
      | ns AS (SELECT unnest(generate_series(1, 4)) AS n),
      | rg AS (SELECT doc_id, n, unnest(list_transform(
      |   generate_series(1, len(rk) - n + 1),
      |   i -> array_to_string(list_slice(rk, i, i + n - 1), ' '))) AS g
      |  FROM base CROSS JOIN ns WHERE len(rk) >= n),
      | cg AS (SELECT doc_id, n, unnest(list_transform(
      |   generate_series(1, len(ck) - n + 1),
      |   i -> array_to_string(list_slice(ck, i, i + n - 1), ' '))) AS g
      |  FROM base CROSS JOIN ns WHERE len(ck) >= n),
      | rc AS (SELECT doc_id, n, g, CAST(COUNT(*) AS BIGINT) AS cr
      |  FROM rg GROUP BY 1, 2, 3),
      | ccn AS (SELECT doc_id, n, g, CAST(COUNT(*) AS BIGINT) AS cc
      |  FROM cg GROUP BY 1, 2, 3),
      | po AS (SELECT ccn.doc_id, ccn.n, CAST(SUM(ccn.cc) AS BIGINT) AS nc,
      |   CAST(SUM(LEAST(ccn.cc, COALESCE(rc.cr, 0))) AS BIGINT) AS m
      |  FROM ccn LEFT JOIN rc ON rc.doc_id = ccn.doc_id AND rc.n = ccn.n
      |    AND rc.g = ccn.g
      |  GROUP BY 1, 2),
      | pq AS (SELECT doc_id, n, CAST(round((CAST(m AS DOUBLE)
      |     / CAST(nc AS DOUBLE)) * 1000000000000.0) AS BIGINT) AS p_pico
      |  FROM po),
      | lq AS (SELECT doc_id, p_pico, CASE WHEN p_pico > 0
      |   THEN CAST(round(ln(CAST(p_pico AS DOUBLE) / 1000000000000.0)
      |     * 1000000000000.0) AS BIGINT) ELSE 0 END AS l_pico FROM pq),
      | s AS (SELECT doc_id,
      |   CAST(SUM(CASE WHEN p_pico > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |     AS n_pos_orders,
      |   CAST(SUM(l_pico) AS BIGINT) AS sumlog_pico FROM lq GROUP BY 1),
      | lens AS (SELECT doc_id, CAST(len(rk) AS BIGINT) AS n_ref_tokens,
      |   CAST(len(ck) AS BIGINT) AS n_cand_tokens FROM base)
      | SELECT lens.doc_id, n_ref_tokens, n_cand_tokens,
      |  COALESCE(n_pos_orders, 0) AS n_pos_orders,
      |  COALESCE(sumlog_pico, 0) AS sumlog_pico,
      |  CASE WHEN COALESCE(n_pos_orders, 0) = 4 AND n_cand_tokens > 0
      |   THEN CAST(round((CASE WHEN n_cand_tokens >= n_ref_tokens THEN 1.0
      |     ELSE exp(1.0 - CAST(n_ref_tokens AS DOUBLE)
      |       / CAST(n_cand_tokens AS DOUBLE)) END)
      |     * exp(CAST(sumlog_pico AS DOUBLE) / 4000000000000.0)
      |     * 1000000000000.0) AS BIGINT)
      |   ELSE 0 END AS bleu_pico
      | FROM lens LEFT JOIN s ON s.doc_id = lens.doc_id
      | ORDER BY lens.doc_id""".stripMargin.replace("\n", " ")

  /** Theil's uncertainty coefficient between source and length bucket
    * ([[graft.ops.Eval.uncertaintyCoefficient]], Theil '70): the
    * NORMALIZED, directional form of q_mutual_info — U(a|b) = MI/H(a),
    * the fraction of a's entropy knowing b removes. Same cell scaffold;
    * marginal entropies pico-quantized per value before the DECIMAL Σ;
    * the coefficient is a division of two already-quantized longs.
    */
  def qUncertaintyCoef(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.uncertaintyCoefficient(
      t(spark, dir, "documents")
        .select(col("source"),
          expr("cast(n_chars as bigint) div 100").as("len_bin")),
      "source", "len_bin")

  lazy val qUncertaintyCoefSql: String =
    """WITH base AS (SELECT source AS a, CAST(n_chars AS BIGINT) // 100 AS b
      |  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL),
      | cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM base GROUP BY 1, 2),
      | rw AS (SELECT a, CAST(SUM(n) AS BIGINT) AS r FROM cells GROUP BY 1),
      | cl AS (SELECT b, CAST(SUM(n) AS BIGINT) AS c FROM cells GROUP BY 1),
      | tt AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cells),
      | ha AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_a,
      |   CAST(round(CAST(SUM(CAST(r AS HUGEINT) *
      |     CAST(round(ln(CAST(tt.t AS DOUBLE) / CAST(r AS DOUBLE)) * 1e12)
      |      AS BIGINT)) AS DOUBLE) / CAST(MAX(tt.t) AS DOUBLE)) AS BIGINT)
      |    AS h_a FROM rw CROSS JOIN tt),
      | hb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_b,
      |   CAST(round(CAST(SUM(CAST(c AS HUGEINT) *
      |     CAST(round(ln(CAST(tt.t AS DOUBLE) / CAST(c AS DOUBLE)) * 1e12)
      |      AS BIGINT)) AS DOUBLE) / CAST(MAX(tt.t) AS DOUBLE)) AS BIGINT)
      |    AS h_b FROM cl CROSS JOIN tt),
      | mi AS (SELECT MAX(tt.t) AS n_rows,
      |   CAST(round(CAST(SUM(CAST(n AS HUGEINT) *
      |     CAST(round(ln((CAST(tt.t AS DOUBLE) * CAST(n AS DOUBLE))
      |       / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))) * 1e12) AS BIGINT))
      |      AS DOUBLE) / CAST(MAX(tt.t) AS DOUBLE)) AS BIGINT) AS mi
      |  FROM cells JOIN rw USING (a) JOIN cl USING (b) CROSS JOIN tt)
      | SELECT n_rows, n_a, n_b, h_a AS h_a_pico, h_b AS h_b_pico,
      |  mi AS mi_pico,
      |  CASE WHEN h_a > 0 THEN CAST(round(CAST(mi AS DOUBLE)
      |    / CAST(h_a AS DOUBLE) * 1e6) AS BIGINT) END AS u_ab_micro,
      |  CASE WHEN h_b > 0 THEN CAST(round(CAST(mi AS DOUBLE)
      |    / CAST(h_b AS DOUBLE) * 1e6) AS BIGINT) END AS u_ba_micro
      | FROM mi CROSS JOIN ha CROSS JOIN hb
      | WHERE n_rows IS NOT NULL""".stripMargin.replace("\n", " ")

  /** Per-event-type conversion risk ratio with Wilson 95% bounds
    * ([[graft.ops.Eval.riskRatioByGroup]], Wilson '27): does this type
    * clear value ≥ 100 more often than the rest? — exact counts, one
    * fixed double chain per bound (a single IEEE sqrt).
    */
  def qRiskRatio(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.riskRatioByGroup(
      t(spark, dir, "events")
        .withColumn("hit", col("value") >= 100.0),
      "event_type", "hit")

  lazy val qRiskRatioSql: String =
    """WITH per AS (SELECT event_type AS grp, CAST(COUNT(*) AS BIGINT) AS n,
      |   CAST(SUM(CASE WHEN value >= 100.0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS successes
      |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
      |  GROUP BY 1),
      | tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn,
      |   CAST(SUM(successes) AS BIGINT) AS ts FROM per),
      | w AS (SELECT grp, n, successes, tn, ts,
      |   CAST(successes AS DOUBLE) / CAST(n AS DOUBLE) AS p,
      |   (1.96 * 1.96) / CAST(n AS DOUBLE) AS z2n
      |  FROM per CROSS JOIN tot)
      | SELECT grp, n, successes,
      |  CAST(round(p * 1e6) AS BIGINT) AS rate_micro,
      |  CASE WHEN tn > n AND ts > successes THEN
      |   CAST(round((p / (CAST(ts - successes AS DOUBLE)
      |     / CAST(tn - n AS DOUBLE))) * 1e6) AS BIGINT) END AS rr_micro,
      |  CAST(round(GREATEST(0.0, (p + z2n / 2.0) / (1.0 + z2n)
      |    - (1.96 / (1.0 + z2n)) * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
      |      + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
      |   * 1e6) AS BIGINT) AS wilson_lo_micro,
      |  CAST(round(LEAST(1.0, (p + z2n / 2.0) / (1.0 + z2n)
      |    + (1.96 / (1.0 + z2n)) * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
      |      + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
      |   * 1e6) AS BIGINT) AS wilson_hi_micro
      | FROM w ORDER BY grp""".stripMargin.replace("\n", " ")

  /** Kruskal–Wallis H across sources ([[graft.ops.Eval.kruskalWallis]],
    * '52): do the k sources draw doc length from one distribution? The
    * k-group rank test on the distributed prefix-sum midranks — the
    * q_rank_effect law generalized past two groups.
    */
  def qKruskalWallis(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.kruskalWallis(
      t(spark, dir, "documents")
        .select(col("n_chars").cast("long").as("len"), col("source")),
      "len", "source")

  lazy val qKruskalWallisSql: String =
    """WITH base AS (SELECT CAST(n_chars AS BIGINT) AS v, source AS g
      |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
      | vg AS (SELECT v, g, CAST(COUNT(*) AS BIGINT) AS nvg
      |  FROM base GROUP BY 1, 2),
      | fv AS (SELECT v, CAST(SUM(nvg) AS BIGINT) AS nv FROM vg GROUP BY 1),
      | mr AS (SELECT v, nv,
      |   2 * CAST(SUM(nv) OVER (ORDER BY v
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |     - nv + 1 AS mr2 FROM fv),
      | gr AS (SELECT g,
      |   CAST(SUM(CAST(nvg AS HUGEINT) * CAST(mr2 AS HUGEINT)) AS HUGEINT)
      |     AS r2,
      |   CAST(SUM(nvg) AS BIGINT) AS ng
      |  FROM vg JOIN mr USING (v) GROUP BY 1),
      | tie AS (SELECT CAST(SUM(CAST(nv AS HUGEINT) * CAST(nv AS HUGEINT)
      |     * CAST(nv AS HUGEINT) - CAST(nv AS HUGEINT)) AS HUGEINT) AS tn
      |  FROM fv),
      | tot AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
      |   CAST(COUNT(*) AS BIGINT) AS k FROM gr),
      | terms AS (SELECT n, k,
      |   CAST(CAST(round(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE) * 3.0
      |     / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
      |       * CAST(ng AS DOUBLE)) * 1.0e12) AS BIGINT) AS HUGEINT) AS t
      |  FROM gr CROSS JOIN tot),
      | s AS (SELECT n, k, CAST(SUM(t) AS HUGEINT) AS st
      |  FROM terms GROUP BY 1, 2),
      | h AS (SELECT n, k,
      |   CAST(st - 3 * (CAST(n AS HUGEINT) + 1) * 1000000000000 AS BIGINT)
      |     AS hp,
      |   1.0 - CAST(tn AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
      |     * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) AS c
      |  FROM s CROSS JOIN tie)
      | SELECT n AS n_rows, k AS k_groups, hp AS h_pico,
      |  CASE WHEN c > 0.0
      |   THEN CAST(round(CAST(hp AS DOUBLE) / c) AS BIGINT) END
      |   AS h_tiecorr_pico
      | FROM h""".stripMargin.replace("\n", " ")

  /** One-way ANOVA F across sources ([[graft.ops.Eval.anovaF]], Fisher
    * '25) with eta² effect size — the mean-variance companion of
    * q_kruskal_wallis over the same (length, source) design.
    */
  def qAnovaF(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.anovaF(
      t(spark, dir, "documents")
        .select(col("n_chars").cast("long").as("len"), col("source")),
      "len", "source")

  lazy val qAnovaFSql: String =
    """WITH base AS (SELECT CAST(n_chars AS BIGINT) AS v, source AS g
      |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
      | per AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
      |   CAST(SUM(CAST(v AS HUGEINT)) AS HUGEINT) AS s,
      |   CAST(SUM(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS HUGEINT) AS q
      |  FROM base GROUP BY 1),
      | ag AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
      |   CAST(COUNT(*) AS BIGINT) AS k,
      |   CAST(SUM(s) AS HUGEINT) AS ss, CAST(SUM(q) AS HUGEINT) AS qq,
      |   CAST(SUM(CAST(CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
      |     / CAST(ng AS DOUBLE) * 1.0e6) AS BIGINT) AS HUGEINT)) AS HUGEINT)
      |     AS a
      |  FROM per),
      | w AS (SELECT n, k,
      |   a - CAST(CAST(round(CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
      |     / CAST(n AS DOUBLE) * 1.0e6) AS BIGINT) AS HUGEINT) AS ssb,
      |   qq * 1000000 - a AS ssw FROM ag)
      | SELECT n AS n_rows, k AS k_groups,
      |  CASE WHEN k >= 2 AND n > k AND ssw > 0 THEN
      |   CAST(round(CAST(ssb AS DOUBLE) / CAST(k - 1 AS DOUBLE)
      |     / (CAST(ssw AS DOUBLE) / CAST(n - k AS DOUBLE)) * 1.0e12)
      |    AS BIGINT) END AS f_pico,
      |  CASE WHEN k >= 2 AND ssb + ssw > 0 THEN
      |   CAST(round(CAST(ssb AS DOUBLE) / CAST(ssb + ssw AS DOUBLE)
      |     * 1.0e12) AS BIGINT) END AS eta2_pico
      | FROM w""".stripMargin.replace("\n", " ")

  /** Welch's unequal-variance t with Welch–Satterthwaite df and Cohen's
    * d ([[graft.ops.Eval.welchTTest]]): are English docs longer than
    * the rest? — exact DECIMAL moment sums, each statistic one pinned
    * double chain.
    */
  def qWelchTtest(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.welchTTest(
      t(spark, dir, "documents")
        .filter(col("lang").isNotNull)
        .select(col("n_chars").cast("long").as("len"),
          (col("lang") === "en").as("is_en")),
      "len", "is_en")

  lazy val qWelchTtestSql: String =
    """WITH base AS (SELECT CAST(n_chars AS BIGINT) AS v, (lang = 'en') AS fa
      |  FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
      | ag AS (SELECT
      |   CAST(SUM(CASE WHEN fa THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |   CAST(SUM(CASE WHEN fa THEN CAST(v AS HUGEINT) ELSE 0 END)
      |     AS HUGEINT) AS s1,
      |   CAST(SUM(CASE WHEN fa THEN CAST(v AS HUGEINT) * CAST(v AS HUGEINT)
      |     ELSE 0 END) AS HUGEINT) AS q1,
      |   CAST(SUM(CASE WHEN fa THEN 0 ELSE 1 END) AS BIGINT) AS n2,
      |   CAST(SUM(CASE WHEN fa THEN 0 ELSE CAST(v AS HUGEINT) END)
      |     AS HUGEINT) AS s2,
      |   CAST(SUM(CASE WHEN fa THEN 0 ELSE CAST(v AS HUGEINT)
      |     * CAST(v AS HUGEINT) END) AS HUGEINT) AS q2
      |  FROM base),
      | w AS (SELECT n1, n2,
      |   CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
      |   CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
      |   (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
      |     / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) AS v1,
      |   (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
      |     / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0) AS v2
      |  FROM ag),
      | w2 AS (SELECT n1, n2, m1, m2, v1, v2,
      |   v1 / CAST(n1 AS DOUBLE) AS a1, v2 / CAST(n2 AS DOUBLE) AS a2
      |  FROM w)
      | SELECT n1 AS n_a, n2 AS n_b,
      |  CASE WHEN n1 >= 2 AND n2 >= 2 AND a1 + a2 > 0.0 THEN
      |   CAST(round((m1 - m2) / sqrt(a1 + a2) * 1.0e12) AS BIGINT) END
      |   AS t_pico,
      |  CASE WHEN n1 >= 2 AND n2 >= 2 AND a1 + a2 > 0.0 THEN
      |   CAST(round((a1 + a2) * (a1 + a2)
      |     / (a1 * a1 / (CAST(n1 AS DOUBLE) - 1.0)
      |       + a2 * a2 / (CAST(n2 AS DOUBLE) - 1.0)) * 1.0e6) AS BIGINT)
      |   END AS df_micro,
      |  CASE WHEN n1 >= 2 AND n2 >= 2
      |    AND ((CAST(n1 AS DOUBLE) - 1.0) * v1
      |      + (CAST(n2 AS DOUBLE) - 1.0) * v2)
      |     / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0) > 0.0 THEN
      |   CAST(round((m1 - m2) / sqrt(((CAST(n1 AS DOUBLE) - 1.0) * v1
      |     + (CAST(n2 AS DOUBLE) - 1.0) * v2)
      |     / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)) * 1.0e12)
      |    AS BIGINT) END AS cohen_d_pico
      | FROM w2""".stripMargin.replace("\n", " ")

  /** Kendall's τ-b between discount class and extended price
    * ([[graft.ops.Eval.kendallTauB]]): do pricier line items carry
    * deeper discounts? — the exact pair-concordance statistic computed
    * WITHOUT a single-task inversion sort: per-class cumulative counts
    * over the price order ride one multi-weight distributed prefix sum;
    * every concordant/discordant pair is counted once at its higher
    * class. q_spearman_corr's tie-robust sibling.
    */
  def qTaubCorr(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.kendallTauB(
      t(spark, dir, "lineitem"), "l_discount", "l_extendedprice")

  lazy val qTaubCorrSql: String =
    """WITH base AS (SELECT l_discount AS x, l_extendedprice AS y
      |  FROM lineitem
      |  WHERE l_discount IS NOT NULL AND l_extendedprice IS NOT NULL),
      | cells AS (SELECT x, y, CAST(COUNT(*) AS HUGEINT) AS f
      |  FROM base GROUP BY 1, 2),
      | xs AS (SELECT DISTINCT x FROM cells),
      | ys AS (SELECT DISTINCT y FROM cells),
      | grid AS (SELECT xs.x AS x, ys.y AS y, COALESCE(c.f, 0) AS f
      |  FROM xs CROSS JOIN ys
      |  LEFT JOIN cells c ON c.x = xs.x AND c.y = ys.y),
      | cum AS (SELECT x, y, f,
      |   SUM(f) OVER (PARTITION BY x ORDER BY y
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cle,
      |   SUM(f) OVER (PARTITION BY x) AS tot FROM grid),
      | cd AS (SELECT COALESCE(SUM(a.f * (b.cle - b.f)), 0) AS conc,
      |   COALESCE(SUM(a.f * (b.tot - b.cle)), 0) AS disc
      |  FROM cells a JOIN cum b ON b.y = a.y AND b.x < a.x),
      | yt AS (SELECT y, SUM(f) AS my FROM cells GROUP BY 1),
      | xt AS (SELECT x, SUM(f) AS mx FROM cells GROUP BY 1),
      | nn AS (SELECT COALESCE(CAST(SUM(f) AS HUGEINT), 0) AS n FROM cells),
      | t1 AS (SELECT COALESCE(SUM(mx * (mx - 1)), 0) // 2 AS v FROM xt),
      | t2 AS (SELECT COALESCE(SUM(my * (my - 1)), 0) // 2 AS v FROM yt),
      | kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM xs),
      | w AS (SELECT CAST(n AS BIGINT) AS n_rows, k AS k_classes,
      |   CAST(n * (n - 1) // 2 AS BIGINT) AS n0,
      |   CAST(t1.v AS BIGINT) AS tie_x_pairs,
      |   CAST(t2.v AS BIGINT) AS tie_y_pairs,
      |   CAST(conc AS BIGINT) AS concordant, CAST(disc AS BIGINT) AS discordant
      |  FROM nn, kk, t1, t2, cd)
      | SELECT n_rows, k_classes, tie_x_pairs, tie_y_pairs, concordant,
      |  discordant,
      |  CASE WHEN n0 - tie_x_pairs > 0 AND n0 - tie_y_pairs > 0 THEN
      |   CAST(round(CAST(concordant - discordant AS DOUBLE)
      |    / sqrt(CAST(n0 - tie_x_pairs AS DOUBLE)
      |      * CAST(n0 - tie_y_pairs AS DOUBLE)) * 1.0e12) AS BIGINT)
      |  END AS taub_pico
      | FROM w""".stripMargin.replace("\n", " ")

  /** Jonckheere–Terpstra ordered trend of extended price across
    * discount classes ([[graft.ops.Eval.jonckheereTerpstra]]):
    * q_taub_corr's hypothesis-test twin on the same cumulant scaffold —
    * strict concordant pairs + half tie credit against the exact
    * tie-corrected null variance.
    */
  def qJonckheere(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.jonckheereTerpstra(
      t(spark, dir, "lineitem"), "l_discount", "l_extendedprice")

  lazy val qJonckheereSql: String =
    """WITH base AS (SELECT l_discount AS x, l_extendedprice AS y
      |  FROM lineitem
      |  WHERE l_discount IS NOT NULL AND l_extendedprice IS NOT NULL),
      | cells AS (SELECT x, y, CAST(COUNT(*) AS HUGEINT) AS f
      |  FROM base GROUP BY 1, 2),
      | xs AS (SELECT DISTINCT x FROM cells),
      | ys AS (SELECT DISTINCT y FROM cells),
      | grid AS (SELECT xs.x AS x, ys.y AS y, COALESCE(c.f, 0) AS f
      |  FROM xs CROSS JOIN ys
      |  LEFT JOIN cells c ON c.x = xs.x AND c.y = ys.y),
      | cum AS (SELECT x, y, f,
      |   SUM(f) OVER (PARTITION BY x ORDER BY y
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cle
      |  FROM grid),
      | cd AS (SELECT COALESCE(SUM(a.f * (b.cle - b.f)), 0) AS conc
      |  FROM cells a JOIN cum b ON b.y = a.y AND b.x < a.x),
      | yt AS (SELECT y, SUM(f) AS my FROM cells GROUP BY 1),
      | xt AS (SELECT x, SUM(f) AS mx FROM cells GROUP BY 1),
      | nn AS (SELECT COALESCE(CAST(SUM(f) AS HUGEINT), 0) AS n FROM cells),
      | kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM xs),
      | vt AS (SELECT COALESCE(SUM(my * (my - 1)), 0) AS vt2,
      |   COALESCE(SUM(my * (my - 1) * (my - 2)), 0) AS vt3,
      |   COALESCE(SUM(my * (my - 1) * (2 * my + 5)), 0) AS vt25 FROM yt),
      | ct AS (SELECT COALESCE(SUM(f * (f - 1)), 0) AS ct2 FROM cells),
      | xt2 AS (SELECT COALESCE(SUM(mx * mx), 0) AS s2,
      |   COALESCE(SUM(mx * (mx - 1)), 0) AS g2,
      |   COALESCE(SUM(mx * (mx - 1) * (mx - 2)), 0) AS g3,
      |   COALESCE(SUM(mx * (mx - 1) * (2 * mx + 5)), 0) AS g25 FROM xt),
      | w AS (SELECT CAST(n AS BIGINT) AS n_rows, k AS k_classes,
      |   CAST(conc AS BIGINT) AS strict_pairs,
      |   CAST((vt2 - ct2) // 2 AS BIGINT) AS cross_tie_pairs,
      |   CAST(n * n - s2 AS BIGINT) AS e4,
      |   CAST(n * (n - 1) * (2 * n + 5) - g25 - vt25 AS DOUBLE) AS a,
      |   CAST(g3 AS DOUBLE) AS b1, CAST(vt3 AS DOUBLE) AS b2,
      |   CAST(g2 AS DOUBLE) AS gg2, CAST(vt2 AS DOUBLE) AS d2,
      |   CAST(n AS DOUBLE) AS nd
      |  FROM nn, kk, cd, vt, ct, xt2),
      | v AS (SELECT n_rows, k_classes, strict_pairs, cross_tie_pairs, e4,
      |   a / 72.0 + b1 * b2 / (36.0 * nd * (nd - 1.0) * (nd - 2.0))
      |    + gg2 * d2 / (8.0 * nd * (nd - 1.0)) AS vr
      |  FROM w)
      | SELECT n_rows, k_classes, strict_pairs, cross_tie_pairs, e4,
      |  CASE WHEN n_rows >= 3 THEN CAST(round(vr * 1.0e6) AS BIGINT)
      |  END AS var_micro,
      |  CASE WHEN n_rows >= 3 AND vr > 0.0 THEN
      |   CAST(round(CAST(4 * CAST(strict_pairs AS HUGEINT)
      |     + 2 * CAST(cross_tie_pairs AS HUGEINT) - e4 AS DOUBLE)
      |    / 4.0 / sqrt(vr) * 1.0e12) AS BIGINT)
      |  END AS z_pico
      | FROM v""".stripMargin.replace("\n", " ")

  /** Goodman–Kruskal γ + both Somers' d asymmetries over the discount ×
    * price design ([[graft.ops.Eval.ordinalAssociation]]): the
    * remaining classical ordinal-association statistics, one cumulant
    * scaffold with q_taub_corr / q_jonckheere.
    */
  def qGammaSomers(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.ordinalAssociation(
      t(spark, dir, "lineitem"), "l_discount", "l_extendedprice")

  lazy val qGammaSomersSql: String =
    """WITH base AS (SELECT l_discount AS x, l_extendedprice AS y
      |  FROM lineitem
      |  WHERE l_discount IS NOT NULL AND l_extendedprice IS NOT NULL),
      | cells AS (SELECT x, y, CAST(COUNT(*) AS HUGEINT) AS f
      |  FROM base GROUP BY 1, 2),
      | xs AS (SELECT DISTINCT x FROM cells),
      | ys AS (SELECT DISTINCT y FROM cells),
      | grid AS (SELECT xs.x AS x, ys.y AS y, COALESCE(c.f, 0) AS f
      |  FROM xs CROSS JOIN ys
      |  LEFT JOIN cells c ON c.x = xs.x AND c.y = ys.y),
      | cum AS (SELECT x, y, f,
      |   SUM(f) OVER (PARTITION BY x ORDER BY y
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cle,
      |   SUM(f) OVER (PARTITION BY x) AS tot FROM grid),
      | cd AS (SELECT COALESCE(SUM(a.f * (b.cle - b.f)), 0) AS conc,
      |   COALESCE(SUM(a.f * (b.tot - b.cle)), 0) AS disc
      |  FROM cells a JOIN cum b ON b.y = a.y AND b.x < a.x),
      | yt AS (SELECT y, SUM(f) AS my FROM cells GROUP BY 1),
      | xt AS (SELECT x, SUM(f) AS mx FROM cells GROUP BY 1),
      | nn AS (SELECT COALESCE(CAST(SUM(f) AS HUGEINT), 0) AS n FROM cells),
      | t1 AS (SELECT COALESCE(SUM(mx * (mx - 1)), 0) // 2 AS v FROM xt),
      | t2 AS (SELECT COALESCE(SUM(my * (my - 1)), 0) // 2 AS v FROM yt),
      | kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM xs),
      | w AS (SELECT CAST(n AS BIGINT) AS n_rows, k AS k_classes,
      |   CAST(n * (n - 1) // 2 AS BIGINT) AS n0,
      |   CAST(t1.v AS BIGINT) AS n1, CAST(t2.v AS BIGINT) AS n2,
      |   CAST(conc AS BIGINT) AS concordant, CAST(disc AS BIGINT) AS discordant
      |  FROM nn, kk, t1, t2, cd)
      | SELECT n_rows, k_classes, concordant, discordant,
      |  CASE WHEN concordant + discordant > 0 THEN
      |   CAST(round(CAST(concordant - discordant AS DOUBLE)
      |    / CAST(concordant + discordant AS DOUBLE) * 1.0e12) AS BIGINT)
      |  END AS gamma_pico,
      |  CASE WHEN n0 - n1 > 0 THEN
      |   CAST(round(CAST(concordant - discordant AS DOUBLE)
      |    / CAST(n0 - n1 AS DOUBLE) * 1.0e12) AS BIGINT)
      |  END AS somers_dyx_pico,
      |  CASE WHEN n0 - n2 > 0 THEN
      |   CAST(round(CAST(concordant - discordant AS DOUBLE)
      |    / CAST(n0 - n2 AS DOUBLE) * 1.0e12) AS BIGINT)
      |  END AS somers_dxy_pico
      | FROM w""".stripMargin.replace("\n", " ")

  /** Ansari–Bradley scale test of purchase vs non-purchase event values
    * ([[graft.ops.Eval.ansariBradley]]): do purchase amounts sit more
    * CONCENTRATED around the pooled centre than other event values? —
    * the rank-dispersion member of the location family (folded scores
    * off the value-table prefix sum, tie midscores quantized once as
    * exact integer division).
    */
  def qAnsariBradley(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.ansariBradley(
      t(spark, dir, "events")
        .select(floor(col("value") * lit(100.0)).as("cents"),
          (col("event_type") === "purchase").as("is_p")),
      "cents", "is_p")

  lazy val qAnsariBradleySql: String =
    """WITH base AS (SELECT CAST(floor(value * 100.0) AS BIGINT) AS v,
      |   (event_type = 'purchase') AS a
      |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
      | bt AS (SELECT v,
      |   CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS HUGEINT) AS fa,
      |   CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS HUGEINT) AS fb
      |  FROM base GROUP BY 1),
      | cumt AS (SELECT fa, fb, fa + fb AS m,
      |   SUM(fa + fb) OVER (ORDER BY v
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |   SUM(fa + fb) OVER () AS nn FROM bt),
      | sc AS (SELECT fa, fb, m, nn, cum - m + 1 AS l, cum AS u,
      |   (nn + 1) // 2 AS tf FROM cumt),
      | s2 AS (SELECT fa, fb, m,
      |   (CASE WHEN l <= least(u, tf) THEN
      |      (least(u, tf) * (least(u, tf) + 1)) // 2 - ((l - 1) * l) // 2
      |    ELSE 0 END
      |   + CASE WHEN greatest(l, tf + 1) <= u THEN
      |      (nn + 1) * (u - greatest(l, tf + 1) + 1)
      |      - ((u * (u + 1)) // 2
      |         - ((greatest(l, tf + 1) - 1) * greatest(l, tf + 1)) // 2)
      |    ELSE 0 END) AS s FROM sc),
      | sm AS (SELECT fa, fb, m,
      |   (2 * s * 1000000 + m) // (2 * m) AS sm FROM s2),
      | ag AS (SELECT COALESCE(SUM(fa), 0) AS na, COALESCE(SUM(fb), 0) AS nb,
      |   COALESCE(SUM(fa * sm), 0) AS w, COALESCE(SUM(m * sm), 0) AS t,
      |   COALESCE(SUM(m * sm * sm), 0) AS q FROM sm),
      | wd AS (SELECT na, nb, w, CAST(na + nb AS DOUBLE) AS nd,
      |   CAST(na AS DOUBLE) * CAST(t AS DOUBLE) / CAST(na + nb AS DOUBLE)
      |     AS ew,
      |   CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
      |     * (CAST(na + nb AS DOUBLE) * CAST(q AS DOUBLE)
      |        - CAST(t AS DOUBLE) * CAST(t AS DOUBLE))
      |     / (CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE)
      |        * CAST(na + nb - 1 AS DOUBLE)) AS vr
      |  FROM ag)
      | SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
      |  CAST(w AS DOUBLE) AS w_a_micro,
      |  CASE WHEN na + nb > 0 THEN round(ew) END
      |    AS e_w_micro,
      |  CASE WHEN na > 0 AND nb > 0 AND na + nb >= 2 AND vr > 0.0 THEN
      |   CAST(round((CAST(w AS DOUBLE) - ew) / sqrt(vr) * 1.0e12)
      |     AS BIGINT) END AS z_pico
      | FROM wd""".stripMargin.replace("\n", " ")

  /** Brunner–Munzel test of returned vs kept line-item quantities
    * ([[graft.ops.Eval.brunnerMunzel]]): does the returned flag shift
    * the quantity distribution, WITHOUT assuming equal variances or
    * shapes? — q_cliffs_delta's inferential sibling, with the
    * common-language effect p̂ itself in the output.
    */
  def qBrunnerMunzel(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.brunnerMunzel(
      t(spark, dir, "lineitem")
        .select(floor(col("l_quantity")).as("qty"),
          (col("l_returnflag") === "R").as("is_r")),
      "qty", "is_r")

  lazy val qBrunnerMunzelSql: String =
    """WITH base AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS v,
      |   (l_returnflag = 'R') AS a
      |  FROM lineitem
      |  WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL),
      | bt AS (SELECT v,
      |   CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS HUGEINT) AS fa,
      |   CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS HUGEINT) AS fb
      |  FROM base GROUP BY 1),
      | cumt AS (SELECT fa, fb, fa + fb AS m,
      |   SUM(fa) OVER w AS ca, SUM(fb) OVER w AS cb,
      |   SUM(fa) OVER () AS na, SUM(fb) OVER () AS nb
      |  FROM bt WINDOW w AS (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      | terms AS (SELECT fa, fb, na, nb,
      |   2 * (ca + cb) - m + 1 AS p2,
      |   (2 * (ca + cb) - m + 1) - (2 * ca - fa + 1) AS xa,
      |   (2 * (ca + cb) - m + 1) - (2 * cb - fb + 1) AS xb FROM cumt),
      | ag AS (SELECT COALESCE(MAX(na), 0) AS na, COALESCE(MAX(nb), 0) AS nb,
      |   COALESCE(SUM(fa * p2), 0) AS sra, COALESCE(SUM(fb * p2), 0) AS srb,
      |   COALESCE(SUM(fa * xa), 0) AS sxa, COALESCE(SUM(fb * xb), 0) AS sxb,
      |   COALESCE(SUM(fa * xa * xa), 0) AS qxa,
      |   COALESCE(SUM(fb * xb * xb), 0) AS qxb FROM terms),
      | kv AS (SELECT na, nb, sra, srb,
      |   na * qxa - 2 * (sra - na * (na + 1)) * sxa
      |     + (sra - na * (na + 1)) * (sra - na * (na + 1)) AS va,
      |   nb * qxb - 2 * (srb - nb * (nb + 1)) * sxb
      |     + (srb - nb * (nb + 1)) * (srb - nb * (nb + 1)) AS vb FROM ag),
      | dd AS (SELECT na, nb, sra, srb,
      |   CAST(srb AS DOUBLE) / CAST(nb AS DOUBLE)
      |     - CAST(sra AS DOUBLE) / CAST(na AS DOUBLE) AS diff,
      |   CAST(va AS DOUBLE) / CAST(na - 1 AS DOUBLE)
      |     + CAST(vb AS DOUBLE) / CAST(nb - 1 AS DOUBLE) AS vs,
      |   CAST(na + nb AS DOUBLE) AS nd FROM kv)
      | SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
      |  CAST(sra AS BIGINT) AS r2sum_a, CAST(srb AS BIGINT) AS r2sum_b,
      |  CASE WHEN na > 0 AND nb > 0 THEN
      |   CAST(round((diff / (2.0 * nd) + 0.5) * 1.0e12) AS BIGINT) END
      |   AS p_hat_pico,
      |  CASE WHEN na >= 2 AND nb >= 2 AND vs > 0.0 THEN
      |   CAST(round(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * diff
      |     / (nd * sqrt(vs)) * 1.0e12) AS BIGINT) END AS w_pico
      | FROM dd""".stripMargin.replace("\n", " ")

  /** Page's L trend of order value across priority classes within each
    * customer ([[graft.ops.Eval.pageTrendL]]): q_jonckheere's
    * within-block companion — every customer with orders in ALL five
    * priorities votes on the ORDER of their own per-priority spend, so
    * the customer-level spend effect can't drown the trend.
    */
  def qPageTrend(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.pageTrendL(
      t(spark, dir, "orders")
        .select(col("o_custkey").as("blk"),
          col("o_orderpriority").as("cls"),
          floor(col("o_totalprice")).as("spend")),
      "blk", "cls", "spend")

  lazy val qPageTrendSql: String =
    """WITH base AS (SELECT o_custkey AS b, o_orderpriority AS x,
      |   CAST(floor(o_totalprice) AS BIGINT) AS y
      |  FROM orders WHERE o_custkey IS NOT NULL
      |   AND o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
      | xs AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS s
      |  FROM (SELECT DISTINCT x FROM base)),
      | kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM xs),
      | cells AS (SELECT b, s, SUM(y) AS cell
      |  FROM base JOIN xs USING (x) GROUP BY 1, 2),
      | comp AS (SELECT b FROM cells GROUP BY b
      |  HAVING COUNT(*) = (SELECT k FROM kk)),
      | ranked AS (SELECT c.b, c.s,
      |   2 * RANK() OVER (PARTITION BY c.b ORDER BY c.cell)
      |    + COUNT(*) OVER (PARTITION BY c.b, c.cell) - 1 AS mr2
      |  FROM cells c JOIN comp USING (b)),
      | ag AS (SELECT COUNT(*) // (SELECT k FROM kk) AS n_blocks,
      |   COALESCE(SUM(CAST(s AS HUGEINT) * mr2), 0) AS l2 FROM ranked),
      | w AS (SELECT n_blocks, kk.k AS k, l2,
      |   (CAST(n_blocks AS HUGEINT) * kk.k * (kk.k + 1) * (kk.k + 1)) // 2
      |     AS e2
      |  FROM ag, kk)
      | SELECT CAST(n_blocks AS BIGINT) AS n_blocks,
      |  CAST(k AS BIGINT) AS k_classes, CAST(l2 AS BIGINT) AS l2,
      |  CAST(e2 AS BIGINT) AS e_l2,
      |  CASE WHEN n_blocks >= 1 AND k >= 3 THEN
      |   CAST(round(CAST(l2 - e2 AS DOUBLE)
      |    / sqrt(CAST(n_blocks AS DOUBLE) * k * k * (k + 1) * (k + 1)
      |       * (k - 1) / 36.0) * 1.0e12) AS BIGINT) END AS z_pico
      | FROM w""".stripMargin.replace("\n", " ")

  /** Friedman χ² + Kendall's W over the q_page_trend block design
    * ([[graft.ops.Eval.friedmanKendallW]]): does priority matter AT ALL
    * to a customer's per-priority spend (any-permutation alternative),
    * and how unanimously do customers rank the priorities the same way —
    * the unordered sibling of q_page_trend on the same scaffold.
    */
  def qFriedmanW(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.friedmanKendallW(
      t(spark, dir, "orders")
        .select(col("o_custkey").as("blk"),
          col("o_orderpriority").as("cls"),
          floor(col("o_totalprice")).as("spend")),
      "blk", "cls", "spend")

  lazy val qFriedmanWSql: String =
    """WITH base AS (SELECT o_custkey AS b, o_orderpriority AS x,
      |   CAST(floor(o_totalprice) AS BIGINT) AS y
      |  FROM orders WHERE o_custkey IS NOT NULL
      |   AND o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
      | xs AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS s
      |  FROM (SELECT DISTINCT x FROM base)),
      | kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM xs),
      | cells AS (SELECT b, s, SUM(y) AS cell
      |  FROM base JOIN xs USING (x) GROUP BY 1, 2),
      | comp AS (SELECT b FROM cells GROUP BY b
      |  HAVING COUNT(*) = (SELECT k FROM kk)),
      | ranked AS (SELECT c.b, c.s,
      |   2 * RANK() OVER (PARTITION BY c.b ORDER BY c.cell)
      |    + COUNT(*) OVER (PARTITION BY c.b, c.cell) - 1 AS mr2
      |  FROM cells c JOIN comp USING (b)),
      | pc AS (SELECT s, CAST(SUM(mr2) AS HUGEINT) AS r2,
      |   CAST(SUM(CAST(mr2 AS HUGEINT) * mr2) AS HUGEINT) AS q2,
      |   COUNT(*) AS nb FROM ranked GROUP BY 1),
      | ag AS (SELECT COALESCE(CAST(MAX(nb) AS BIGINT), 0) AS n,
      |   COALESCE(SUM(q2), 0) AS a4, COALESCE(SUM(r2 * r2), 0) AS srr
      |  FROM pc),
      | w AS (SELECT n, kk.k AS k, a4,
      |   srr - kk.k * CAST(n AS HUGEINT) * n * (kk.k + 1) * (kk.k + 1)
      |     AS s4,
      |   a4 - CAST(n AS HUGEINT) * kk.k * (kk.k + 1) * (kk.k + 1) AS den
      |  FROM ag, kk)
      | SELECT CAST(n AS BIGINT) AS n_blocks, CAST(k AS BIGINT) AS k_classes,
      |  CAST(s4 AS BIGINT) AS s4, CAST(a4 AS BIGINT) AS a4,
      |  CASE WHEN n >= 1 AND k >= 2 AND den > 0 THEN
      |   CAST(round(CAST(k - 1 AS DOUBLE) * CAST(s4 AS DOUBLE)
      |    / CAST(den AS DOUBLE) * 1.0e12) AS BIGINT) END AS chi2_pico,
      |  CASE WHEN n >= 1 AND k >= 2 AND den > 0 THEN
      |   CAST(round(CAST(k - 1 AS DOUBLE) * CAST(s4 AS DOUBLE)
      |    / CAST(den AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * CAST(k - 1 AS DOUBLE)) * 1.0e12)
      |    AS BIGINT) END AS w_pico
      | FROM w""".stripMargin.replace("\n", " ")

  /** Cuzick's trend of extended price across quantity brackets
    * ([[graft.ops.Eval.cuzickTrend]]): does price trend monotonically
    * across the five l_quantity bands? — the pooled-midrank trend
    * statistic, a distinct design from q_jonckheere's discount classes.
    */
  def qCuzickTrend(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.cuzickTrend(
      t(spark, dir, "lineitem")
        .select(expr("least(CAST(floor(l_quantity) AS BIGINT) div 10, 4L)")
          .as("qband"),
          floor(col("l_extendedprice")).as("price")),
      "qband", "price")

  lazy val qCuzickTrendSql: String =
    """WITH base AS (SELECT
      |   least(CAST(floor(l_quantity) AS BIGINT) // 10, 4) AS x,
      |   CAST(floor(l_extendedprice) AS BIGINT) AS v
      |  FROM lineitem
      |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      | xs AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS l
      |  FROM (SELECT DISTINCT x FROM base)),
      | kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM xs),
      | sc AS (SELECT l, v FROM base JOIN xs USING (x)),
      | vt AS (SELECT v, CAST(SUM(l) AS HUGEINT) AS lw,
      |   CAST(SUM(CAST(l AS HUGEINT) * l) AS HUGEINT) AS lw2,
      |   CAST(COUNT(*) AS HUGEINT) AS m FROM sc GROUP BY 1),
      | cumt AS (SELECT lw, lw2, m,
      |   2 * SUM(m) OVER (ORDER BY v
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - m + 1
      |     AS mr2,
      |   SUM(m) OVER () AS nn FROM vt),
      | ag AS (SELECT COALESCE(MAX(nn), 0) AS n, COALESCE(SUM(lw), 0) AS sl,
      |   COALESCE(SUM(lw2), 0) AS sll, COALESCE(SUM(lw * mr2), 0) AS t2,
      |   COALESCE(SUM(m * mr2 * mr2), 0) AS saa4 FROM cumt),
      | dd AS (SELECT n, kk.k AS k, t2, sl * (n + 1) AS e2,
      |   (CAST(sll AS DOUBLE) - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)
      |      / CAST(n AS DOUBLE))
      |   * (CAST(saa4 AS DOUBLE) - CAST(n AS DOUBLE)
      |      * (CAST(n AS DOUBLE) + 1.0) * (CAST(n AS DOUBLE) + 1.0))
      |   / CAST(n - 1 AS DOUBLE) AS vr
      |  FROM ag, kk)
      | SELECT CAST(n AS BIGINT) AS n_rows, k AS k_classes,
      |  CAST(t2 AS BIGINT) AS t2, CAST(e2 AS BIGINT) AS e_t2,
      |  CASE WHEN n >= 2 AND vr > 0.0 THEN
      |   CAST(round(CAST(t2 - e2 AS DOUBLE) / sqrt(vr) * 1.0e12)
      |     AS BIGINT) END AS z_pico
      | FROM dd""".stripMargin.replace("\n", " ")

  /** Wilcoxon signed-rank of per-customer spend, early vs late half of
    * the order history ([[graft.ops.Eval.signedRankTest]]): did
    * customers who ordered in BOTH halves shift their spend? — each
    * customer is their own control, so the customer-level spend effect
    * cancels in the difference before ranking.
    */
  def qSignedRank(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-05-01 00:00:00").cast("timestamp")
    val per = t(spark, dir, "orders")
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull &&
        col("o_totalprice").isNotNull)
      .groupBy(col("o_custkey"))
      .agg(sum(when(col("o_orderdate") < cut,
          floor(col("o_totalprice"))).otherwise(0L)).as("early_spend"),
        sum(when(col("o_orderdate") >= cut,
          floor(col("o_totalprice"))).otherwise(0L)).as("late_spend"),
        sum(when(col("o_orderdate") < cut, 1L).otherwise(0L)).as("_ne"),
        sum(when(col("o_orderdate") >= cut, 1L).otherwise(0L)).as("_nl"))
      .filter(col("_ne") > 0L && col("_nl") > 0L)
    graft.ops.Eval.signedRankTest(per, "early_spend", "late_spend")
  }

  lazy val qSignedRankSql: String =
    """WITH per AS (SELECT o_custkey,
      |   SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-05-01'
      |    THEN CAST(floor(o_totalprice) AS BIGINT) ELSE 0 END) AS a,
      |   SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-05-01'
      |    THEN CAST(floor(o_totalprice) AS BIGINT) ELSE 0 END) AS b,
      |   SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-05-01'
      |    THEN 1 ELSE 0 END) AS ne,
      |   SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-05-01'
      |    THEN 1 ELSE 0 END) AS nl
      |  FROM orders WHERE o_custkey IS NOT NULL
      |   AND o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
      |  GROUP BY 1 HAVING ne > 0 AND nl > 0),
      | dd AS (SELECT a - b AS d FROM per),
      | np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM dd),
      | vt AS (SELECT abs(d) AS v,
      |   CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS HUGEINT) AS fp,
      |   CAST(COUNT(*) AS HUGEINT) AS m
      |  FROM dd WHERE d <> 0 GROUP BY 1),
      | cumt AS (SELECT fp, m,
      |   2 * SUM(m) OVER (ORDER BY v
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - m + 1
      |     AS mr2,
      |   SUM(m) OVER () AS nn FROM vt),
      | ag AS (SELECT COALESCE(MAX(nn), 0) AS n,
      |   COALESCE(SUM(fp * mr2), 0) AS w2,
      |   COALESCE(SUM(m * m * m - m), 0) AS tie FROM cumt),
      | w AS (SELECT n, w2, (n * (n + 1)) // 2 AS e2,
      |   2 * n * (n + 1) * (2 * n + 1) - tie AS var12 FROM ag)
      | SELECT np.n_pairs, CAST(n AS BIGINT) AS n_nonzero,
      |  CAST(w2 AS BIGINT) AS w2_plus, CAST(e2 AS BIGINT) AS e2,
      |  CAST(var12 AS DOUBLE) AS var12,
      |  CASE WHEN n >= 1 AND var12 > 0 THEN
      |   CAST(round(CAST(w2 - e2 AS DOUBLE)
      |    / sqrt(CAST(var12 AS DOUBLE) / 12.0) * 1.0e12) AS BIGINT)
      |  END AS z_pico
      | FROM w, np""".stripMargin.replace("\n", " ")

  /** Cochran's Q over user × event-type engagement
    * ([[graft.ops.Eval.cochranQ]]): do the five event types differ in
    * the rate of ENGAGED users (≥5 events of that type), with every
    * user as their own control? — the binary complete-block member of
    * the q_friedman_w family.
    */
  def qCochranQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.cochranQ(
      t(spark, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("_n")).filter(col("_n") >= 5L)
        .select(col("user_id").as("blk"), col("event_type").as("cls")),
      "blk", "cls")

  lazy val qCochranQSql: String =
    """WITH hits AS (SELECT user_id, event_type FROM events
      |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 5),
      | pc AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS cj
      |  FROM hits GROUP BY 1),
      | ac AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
      |   COALESCE(CAST(SUM(cj) AS HUGEINT), 0) AS t,
      |   COALESCE(SUM(cj * cj), 0) AS cc FROM pc),
      | pb AS (SELECT user_id, CAST(COUNT(*) AS HUGEINT) AS rb
      |  FROM hits GROUP BY 1),
      | ab AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
      |   COALESCE(SUM(rb * rb), 0) AS rr FROM pb),
      | w AS (SELECT n_blocks, k, CAST(t AS BIGINT) AS t_hits,
      |   (k - 1) * (k * cc - t * t) AS num, k * t - rr AS den
      |  FROM ab, ac)
      | SELECT n_blocks, k AS k_classes, t_hits,
      |  CASE WHEN den > 0 THEN
      |   CAST(round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1.0e12)
      |     AS BIGINT) END AS q_pico
      | FROM w""".stripMargin.replace("\n", " ")

  /** Lepage's combined location-scale χ² of returned vs kept line-item
    * extended price ([[graft.ops.Eval.lepageTest]]): did the returned
    * population move OR spread? — z_W² + z_AB² off the ONE shared
    * value-table prefix-sum pass, the either-alternative screen
    * (q_brunner_munzel asks location-ish, q_ansari_bradley scale; this
    * fires on both).
    */
  def qLepage(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.lepageTest(
      t(spark, dir, "lineitem")
        .select(floor(col("l_extendedprice")).as("price"),
          (col("l_returnflag") === "R").as("is_r")),
      "price", "is_r")

  lazy val qLepageSql: String =
    """WITH base AS (SELECT CAST(floor(l_extendedprice) AS BIGINT) AS v,
      |   (l_returnflag = 'R') AS a
      |  FROM lineitem
      |  WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL),
      | bt AS (SELECT v,
      |   CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS HUGEINT) AS fa,
      |   CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS HUGEINT) AS fb
      |  FROM base GROUP BY 1),
      | cumt AS (SELECT fa, fb, fa + fb AS m,
      |   SUM(fa + fb) OVER (ORDER BY v
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |   SUM(fa + fb) OVER () AS nn FROM bt),
      | sc AS (SELECT fa, fb, m, nn, cum - m + 1 AS l, cum AS u,
      |   (nn + 1) // 2 AS tf, 2 * cum - m + 1 AS mr2 FROM cumt),
      | s2 AS (SELECT fa, fb, m, mr2,
      |   (CASE WHEN l <= least(u, tf) THEN
      |      (least(u, tf) * (least(u, tf) + 1)) // 2 - ((l - 1) * l) // 2
      |    ELSE 0 END
      |   + CASE WHEN greatest(l, tf + 1) <= u THEN
      |      (nn + 1) * (u - greatest(l, tf + 1) + 1)
      |      - ((u * (u + 1)) // 2
      |         - ((greatest(l, tf + 1) - 1) * greatest(l, tf + 1)) // 2)
      |    ELSE 0 END) AS s FROM sc),
      | sm AS (SELECT fa, fb, m, mr2,
      |   (2 * s * 1000000 + m) // (2 * m) AS sm FROM s2),
      | ag AS (SELECT COALESCE(SUM(fa), 0) AS na, COALESCE(SUM(fb), 0) AS nb,
      |   COALESCE(SUM(fa * mr2), 0) AS w2,
      |   COALESCE(SUM(m * m * m - m), 0) AS tie,
      |   COALESCE(SUM(fa * sm), 0) AS w, COALESCE(SUM(m * sm), 0) AS t,
      |   COALESCE(SUM(m * sm * sm), 0) AS q FROM sm),
      | zd AS (SELECT na, nb, w2,
      |   (CAST(w2 AS DOUBLE) - CAST(na AS DOUBLE)
      |      * (CAST(na + nb AS DOUBLE) + 1.0))
      |    / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
      |      * ((CAST(na + nb AS DOUBLE) + 1.0) * CAST(na + nb AS DOUBLE)
      |         * (CAST(na + nb AS DOUBLE) - 1.0) - CAST(tie AS DOUBLE))
      |      / (3.0 * CAST(na + nb AS DOUBLE)
      |         * (CAST(na + nb AS DOUBLE) - 1.0))) AS zw,
      |   (CAST(w AS DOUBLE) - CAST(na AS DOUBLE) * CAST(t AS DOUBLE)
      |      / CAST(na + nb AS DOUBLE))
      |    / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
      |      * (CAST(na + nb AS DOUBLE) * CAST(q AS DOUBLE)
      |         - CAST(t AS DOUBLE) * CAST(t AS DOUBLE))
      |      / (CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE)
      |         * CAST(na + nb - 1 AS DOUBLE))) AS zab,
      |   CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
      |    * ((CAST(na + nb AS DOUBLE) + 1.0) * CAST(na + nb AS DOUBLE)
      |       * (CAST(na + nb AS DOUBLE) - 1.0) - CAST(tie AS DOUBLE))
      |    / (3.0 * CAST(na + nb AS DOUBLE)
      |       * (CAST(na + nb AS DOUBLE) - 1.0)) AS vw,
      |   CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
      |    * (CAST(na + nb AS DOUBLE) * CAST(q AS DOUBLE)
      |       - CAST(t AS DOUBLE) * CAST(t AS DOUBLE))
      |    / (CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE)
      |       * CAST(na + nb - 1 AS DOUBLE)) AS vab
      |  FROM ag)
      | SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
      |  CAST(w2 AS BIGINT) AS w2_a,
      |  CASE WHEN na > 0 AND nb > 0 AND na + nb >= 2 AND vw > 0.0 THEN
      |   CAST(round(zw * 1.0e12) AS BIGINT) END AS zw_pico,
      |  CASE WHEN na > 0 AND nb > 0 AND na + nb >= 2 AND vab > 0.0 THEN
      |   CAST(round(zab * 1.0e12) AS BIGINT) END AS zab_pico,
      |  CASE WHEN na > 0 AND nb > 0 AND na + nb >= 2 AND vw > 0.0
      |    AND vab > 0.0 THEN
      |   CAST(round((zw * zw + zab * zab) * 1.0e12) AS BIGINT)
      |  END AS l_pico
      | FROM zd""".stripMargin.replace("\n", " ")

  /** Fligner–Killeen scale test of document length across sources
    * ([[graft.ops.Eval.flignerKilleen]]): do the twenty sources differ
    * in length DISPERSION once each source's own median level is
    * removed? — the robust scale companion of q_kruskal_wallis
    * (location) and q_brown_forsythe (variance-of-deviations) on the
    * same design, median-centered normal scores off two prefix-sum
    * passes.
    */
  def qFligner(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.flignerKilleen(
      t(spark, dir, "documents")
        .select(col("n_chars").cast("long").as("len"), col("source")),
      "len", "source")

  lazy val qFlignerSql: String =
    """WITH base AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v
      |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
      | med AS (SELECT g, CAST(2 * quantile_cont(v, 0.5) AS BIGINT) AS med2
      |  FROM base GROUP BY 1),
      | d2 AS (SELECT b.g, abs(2 * b.v - m.med2) AS d
      |  FROM base b JOIN med m USING (g)),
      | vt AS (SELECT d, CAST(COUNT(*) AS HUGEINT) AS m FROM d2 GROUP BY 1),
      | cum AS (SELECT d, m, 2 * SUM(m) OVER (ORDER BY d
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - m + 1 AS mr2,
      |   SUM(m) OVER () AS nn FROM vt),
      | pp AS (SELECT d, m, nn,
      |   0.5 + CAST(mr2 AS DOUBLE) / (4.0 * CAST(nn + 1 AS DOUBLE)) AS p
      |  FROM cum),
      | pr AS (SELECT d, m, nn, p, p - 0.5 AS q, (p - 0.5) * (p - 0.5) AS r,
      |   sqrt(-2.0 * ln(1.0 - p)) AS qt FROM pp),
      | am AS (SELECT d, m, nn, CAST(round((CASE WHEN p <= 0.97575 THEN
      |    (((((-39.69683028665376 * r + 220.9460984245205) * r
      |       - 275.9285104469687) * r + 138.357751867269) * r
      |       - 30.66479806614716) * r + 2.506628277459239) * q
      |    / (((((-54.47609879822406 * r + 161.5858368580409) * r
      |       - 155.6989798598866) * r + 66.80131188771972) * r
      |       - 13.28068155288572) * r + 1.0)
      |   ELSE
      |    -((((((-0.007784894002430293 * qt - 0.3223964580411365) * qt
      |       - 2.400758277161838) * qt - 2.549732539343734) * qt
      |       + 4.374664141464968) * qt + 2.938163982698783))
      |    / ((((0.007784695709041462 * qt + 0.3224671290700398) * qt
      |       + 2.445134137142996) * qt + 3.754408661907416) * qt + 1.0)
      |   END) * 1.0e6) AS BIGINT) AS am FROM pr),
      | j AS (SELECT g, am FROM d2 JOIN am USING (d)),
      | pg AS (SELECT g, CAST(COUNT(*) AS HUGEINT) AS nj,
      |   CAST(SUM(am) AS HUGEINT) AS sj FROM j GROUP BY 1),
      | tot AS (SELECT CAST(SUM(nj) AS HUGEINT) AS n,
      |   CAST(SUM(sj) AS HUGEINT) AS sa, CAST(COUNT(*) AS BIGINT) AS k
      |  FROM pg),
      | qa AS (SELECT CAST(SUM(m * am * am) AS HUGEINT) AS saa FROM am),
      | dv AS (SELECT nj,
      |   CAST(round(CAST(sj AS DOUBLE) / CAST(nj AS DOUBLE)
      |     - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS dev
      |  FROM pg, tot),
      | qq AS (SELECT COALESCE(CAST(SUM(nj * dev * dev) AS HUGEINT), 0)
      |   AS q4 FROM dv),
      | w AS (SELECT n, k, q4,
      |   (CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
      |      / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS vhat
      |  FROM tot, qa, qq)
      | SELECT CAST(n AS BIGINT) AS n_rows, k AS k_groups,
      |  CAST(q4 AS DOUBLE) AS q_mass,
      |  CASE WHEN n >= 2 AND vhat > 0.0 THEN
      |   CAST(round(CAST(q4 AS DOUBLE) / vhat * 1.0e12) AS BIGINT)
      |  END AS fk_pico
      | FROM w""".stripMargin.replace("\n", " ")

  /** Hodges–Lehmann shift of returned vs kept line-item quantity
    * ([[graft.ops.Eval.hodgesLehmannShift]]): HOW FAR did the returned
    * quantity distribution move — the robust point estimate behind
    * q_brunner_munzel's test on the same design, the median of all
    * n_A·n_B pairwise differences WITHOUT a pair stage (bisection over
    * prefix-sum count passes), with the Moses distribution-free 95%
    * interval off two more order statistics of the same memoized
    * count function.
    */
  def qHodgesLehmann(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.hodgesLehmannShift(
      t(spark, dir, "lineitem")
        .select(floor(col("l_quantity")).as("qty"),
          (col("l_returnflag") === "R").as("is_r")),
      "qty", "is_r")

  lazy val qHodgesLehmannSql: String =
    """WITH base AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS v,
      |   (l_returnflag = 'R') AS a
      |  FROM lineitem
      |  WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL),
      | av AS (SELECT v, CAST(COUNT(*) AS HUGEINT) AS f
      |  FROM base WHERE a GROUP BY 1),
      | bv AS (SELECT v, CAST(COUNT(*) AS HUGEINT) AS f
      |  FROM base WHERE NOT a GROUP BY 1),
      | nn AS (SELECT (SELECT COALESCE(SUM(f), 0) FROM av) AS na,
      |   (SELECT COALESCE(SUM(f), 0) FROM bv) AS nb),
      | dg AS (SELECT av.v - bv.v AS d, SUM(av.f * bv.f) AS w
      |  FROM av, bv GROUP BY 1),
      | c AS (SELECT d, SUM(w) OVER (ORDER BY d
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw FROM dg),
      | lo AS (SELECT MIN(d) AS dlo FROM c, nn
      |  WHERE cw >= (na * nb + 1) // 2),
      | hi AS (SELECT MIN(d) AS dhi FROM c, nn
      |  WHERE cw >= (na * nb + 2) // 2),
      | ck AS (SELECT GREATEST(CAST(0 AS BIGINT),
      |   CAST(floor(CAST(na * nb AS DOUBLE) / 2.0 - 1.959963984540054
      |     * sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
      |       * CAST(na + nb + 1 AS DOUBLE) / 12.0)) AS BIGINT)) AS cr
      |  FROM nn),
      | cl AS (SELECT MIN(d) AS dcl FROM c, nn, ck WHERE cw >= cr + 1),
      | ch AS (SELECT MIN(d) AS dch FROM c, nn, ck
      |  WHERE cw >= na * nb - cr)
      | SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
      |  CAST(na * nb AS DOUBLE) AS n_pairs,
      |  CASE WHEN na * nb > 0 THEN CAST(dlo + dhi AS BIGINT) END AS hl2,
      |  CASE WHEN na * nb > 0 THEN CAST(dlo + dhi AS DOUBLE) / 2.0 END
      |    AS hl,
      |  CASE WHEN na * nb > 0 THEN cr + 1 END AS ci_k,
      |  CASE WHEN na * nb > 0 THEN CAST(dcl AS BIGINT) END AS ci_lo,
      |  CASE WHEN na * nb > 0 THEN CAST(dch AS BIGINT) END AS ci_hi
      | FROM nn, lo, hi, ck, cl, ch""".stripMargin.replace("\n", " ")

  /** One-sample Hodges–Lehmann pseudomedian of the per-customer
    * early-vs-late spend shift, in thousands
    * ([[graft.ops.Eval.hlPseudomedian]]): the location estimate
    * q_signed_rank's test implicitly inverts, over the SAME
    * per-customer differences — the median of all n(n+1)/2 Walsh
    * averages WITHOUT a pair stage (bisection over the doubled Walsh
    * axis, ordered-pair + diagonal counts off one prefix-sum pass per
    * probe).
    */
  def qHlPseudomedian(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-05-01 00:00:00").cast("timestamp")
    val per = t(spark, dir, "orders")
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull &&
        col("o_totalprice").isNotNull)
      .groupBy(col("o_custkey"))
      .agg(sum(when(col("o_orderdate") < cut,
          floor(col("o_totalprice"))).otherwise(0L)).as("_early"),
        sum(when(col("o_orderdate") >= cut,
          floor(col("o_totalprice"))).otherwise(0L)).as("_late"),
        sum(when(col("o_orderdate") < cut, 1L).otherwise(0L)).as("_ne"),
        sum(when(col("o_orderdate") >= cut, 1L).otherwise(0L)).as("_nl"))
      .filter(col("_ne") > 0L && col("_nl") > 0L)
      .select(floor((col("_early") - col("_late")).cast("double")
        / lit(1000.0)).as("shift_k"))
    graft.ops.Eval.hlPseudomedian(per, "shift_k")
  }

  lazy val qHlPseudomedianSql: String =
    """WITH per AS (SELECT o_custkey,
      |   SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-05-01'
      |     THEN CAST(floor(o_totalprice) AS BIGINT) ELSE 0 END) AS e,
      |   SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-05-01'
      |     THEN CAST(floor(o_totalprice) AS BIGINT) ELSE 0 END) AS l,
      |   SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-05-01'
      |     THEN 1 ELSE 0 END) AS ne,
      |   SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-05-01'
      |     THEN 1 ELSE 0 END) AS nl
      |  FROM orders
      |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
      |   AND o_totalprice IS NOT NULL
      |  GROUP BY 1 HAVING ne > 0 AND nl > 0),
      | base AS (SELECT CAST(floor(CAST(e - l AS DOUBLE) / 1000.0)
      |   AS BIGINT) AS v FROM per),
      | vt AS (SELECT v, CAST(COUNT(*) AS HUGEINT) AS f
      |  FROM base GROUP BY 1),
      | nn AS (SELECT COALESCE(SUM(f), 0) AS n,
      |   COALESCE(SUM(f), 0) * (COALESCE(SUM(f), 0) + 1) // 2 AS t
      |  FROM vt),
      | pairs AS (SELECT a.v + b.v AS s,
      |   CASE WHEN a.v = b.v THEN a.f * (a.f + 1) // 2
      |    ELSE a.f * b.f END AS w
      |  FROM vt a JOIN vt b ON a.v <= b.v),
      | dg AS (SELECT s, SUM(w) AS w FROM pairs GROUP BY 1),
      | c AS (SELECT s, SUM(w) OVER (ORDER BY s
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw FROM dg),
      | lo AS (SELECT MIN(s) AS slo FROM c, nn WHERE cw >= (t + 1) // 2),
      | hi AS (SELECT MIN(s) AS shi FROM c, nn WHERE cw >= (t + 2) // 2),
      | ck AS (SELECT GREATEST(CAST(0 AS BIGINT),
      |   CAST(floor(CAST(t AS DOUBLE) / 2.0 - 1.959963984540054
      |    * sqrt(CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)
      |      * CAST(2 * n + 1 AS DOUBLE) / 24.0)) AS BIGINT)) AS cr
      |  FROM nn),
      | cl AS (SELECT MIN(s) AS scl FROM c, nn, ck WHERE cw >= cr + 1),
      | chh AS (SELECT MIN(s) AS sch FROM c, nn, ck WHERE cw >= t - cr)
      | SELECT CAST(n AS BIGINT) AS n_rows, CAST(t AS DOUBLE) AS n_walsh,
      |  CASE WHEN t > 0 THEN CAST(slo + shi AS BIGINT) END AS hl4,
      |  CASE WHEN t > 0 THEN CAST(slo + shi AS DOUBLE) / 4.0 END AS hl,
      |  CASE WHEN t > 0 THEN cr + 1 END AS ci_k,
      |  CASE WHEN t > 0 THEN CAST(scl AS BIGINT) END AS ci_lo2,
      |  CASE WHEN t > 0 THEN CAST(sch AS BIGINT) END AS ci_hi2,
      |  CASE WHEN t > 0 THEN CAST(scl AS DOUBLE) / 2.0 END AS ci_lo,
      |  CASE WHEN t > 0 THEN CAST(sch AS DOUBLE) / 2.0 END AS ci_hi
      | FROM nn, lo, hi, ck, cl, chh""".stripMargin.replace("\n", " ")

  /** Jarque–Bera normality of line-item price (in thousands)
    * ([[graft.ops.Eval.jarqueBera]]): are prices normal enough for the
    * parametric tests' calibration? — exact N-scaled central moments
    * in which the N-powers cancel, one codegen'd aggregate.
    */
  def qJarqueBera(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.jarqueBera(
      t(spark, dir, "lineitem")
        .select(floor(col("l_extendedprice") / lit(1000.0)).as("price_k")),
      "price_k")

  lazy val qJarqueBeraSql: String =
    """WITH base AS (SELECT CAST(floor(l_extendedprice / 1000.0)
      |   AS BIGINT) AS v
      |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
      | ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |   CAST(COALESCE(SUM(v), 0) AS HUGEINT) AS s1,
      |   CAST(COALESCE(SUM(CAST(v AS HUGEINT) * v), 0) AS HUGEINT) AS s2,
      |   CAST(COALESCE(SUM(CAST(v AS HUGEINT) * v * v), 0) AS HUGEINT)
      |     AS s3,
      |   CAST(COALESCE(SUM(CAST(v AS HUGEINT) * v * v * v), 0)
      |     AS HUGEINT) AS s4
      |  FROM base),
      | cm AS (SELECT n,
      |   CAST(n AS HUGEINT) * s2 - s1 * s1 AS c2,
      |   CAST(n AS HUGEINT) * n * s3
      |     - 3 * CAST(n AS HUGEINT) * s1 * s2 + 2 * s1 * s1 * s1 AS c3,
      |   CAST(n AS HUGEINT) * n * n * s4
      |     - 4 * CAST(n AS HUGEINT) * n * s1 * s3
      |     + 6 * CAST(n AS HUGEINT) * s1 * s1 * s2
      |     - 3 * s1 * s1 * s1 * s1 AS c4
      |  FROM ag),
      | ch AS (SELECT n, c2,
      |   GREATEST(CAST(c2 AS DOUBLE), 1.0e-300) AS c2c,
      |   CAST(c3 AS DOUBLE) AS c3d, CAST(c4 AS DOUBLE) AS c4d
      |  FROM cm),
      | fin AS (SELECT n, c2,
      |   c3d / (c2c * sqrt(c2c)) AS b1, c4d / (c2c * c2c) AS b2
      |  FROM ch)
      | SELECT n AS n_rows,
      |  CASE WHEN n >= 2 AND CAST(c2 AS DOUBLE) > 0.0 THEN b1 END
      |    AS skew_b1,
      |  CASE WHEN n >= 2 AND CAST(c2 AS DOUBLE) > 0.0 THEN b2 END
      |    AS kurt_b2,
      |  CASE WHEN n >= 2 AND CAST(c2 AS DOUBLE) > 0.0 THEN
      |   CAST(n AS DOUBLE) * (b1 * b1 / 6.0
      |     + (b2 - 3.0) * (b2 - 3.0) / 24.0) END AS jb
      | FROM fin""".stripMargin.replace("\n", " ")

  /** Grubbs' max-deviation outlier of raw line-item price
    * ([[graft.ops.Eval.grubbsTest]]): WHICH price strains the sample
    * most and by how many standard deviations — the screening
    * companion of q_jarque_bera on the same table.
    */
  def qGrubbs(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.grubbsTest(
      t(spark, dir, "lineitem")
        .select(floor(col("l_extendedprice")).as("price")),
      "price")

  lazy val qGrubbsSql: String =
    """WITH base AS (SELECT CAST(floor(l_extendedprice) AS BIGINT) AS v
      |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
      | ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |   CAST(COALESCE(SUM(v), 0) AS HUGEINT) AS s1,
      |   CAST(COALESCE(SUM(CAST(v AS HUGEINT) * v), 0) AS HUGEINT) AS s2
      |  FROM base),
      | dv AS (SELECT v, ABS(CAST(ag.n AS HUGEINT) * b.v - ag.s1) AS d
      |  FROM base b, ag),
      | mx AS (SELECT COALESCE(MAX(d), 0) AS mxd FROM dv),
      | arg AS (SELECT MIN(v) AS outlier_value FROM dv, mx WHERE d = mxd),
      | c2t AS (SELECT n, CAST(n AS HUGEINT) * s2 - s1 * s1 AS c2 FROM ag)
      | SELECT n AS n_rows, outlier_value,
      |  CASE WHEN n >= 2 AND CAST(c2 AS DOUBLE) > 0.0 THEN
      |   CAST(round(CAST(mxd AS DOUBLE) / CAST(n AS DOUBLE)
      |    / sqrt(GREATEST(CAST(c2 AS DOUBLE) / CAST(n AS DOUBLE)
      |      / CAST(n - 1 AS DOUBLE), 1.0e-300)) * 1.0e12) AS BIGINT)
      |  END AS g_pico
      | FROM c2t, mx, arg""".stripMargin.replace("\n", " ")

  /** Conover squared-ranks scale test of document length across
    * sources ([[graft.ops.Eval.conoverSquaredRanks]]): the squared-
    * ranks member on the SAME design as q_bartlett / q_fligner /
    * q_brown_forsythe — mean-centered micro-quantized deviations,
    * pooled squared midranks off one prefix-sum pass.
    */
  def qConoverSr(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.conoverSquaredRanks(
      t(spark, dir, "documents")
        .select(col("n_chars").cast("long").as("len"), col("source")),
      "len", "source")

  lazy val qConoverSrSql: String =
    """WITH base AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v
      |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
      | mg AS (SELECT g, CAST(COUNT(*) AS HUGEINT) AS ng,
      |   CAST(SUM(v) AS HUGEINT) AS sg FROM base GROUP BY 1),
      | d2 AS (SELECT b.g, CAST(round(abs(CAST(b.v AS DOUBLE)
      |    - CAST(m.sg AS DOUBLE) / CAST(m.ng AS DOUBLE)) * 1.0e6)
      |   AS BIGINT) AS d
      |  FROM base b JOIN mg m USING (g)),
      | vt AS (SELECT d, CAST(COUNT(*) AS HUGEINT) AS m FROM d2 GROUP BY 1),
      | cum AS (SELECT d, m, 2 * SUM(m) OVER (ORDER BY d
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - m + 1 AS mr2,
      |   SUM(m) OVER () AS nn FROM vt),
      | sq AS (SELECT d, m, nn, mr2 * mr2 AS sq FROM cum),
      | j AS (SELECT g, sq FROM d2 JOIN sq USING (d)),
      | pg AS (SELECT g, CAST(COUNT(*) AS HUGEINT) AS nj,
      |   CAST(SUM(sq) AS HUGEINT) AS sj FROM j GROUP BY 1),
      | tot AS (SELECT CAST(SUM(nj) AS HUGEINT) AS n,
      |   CAST(SUM(sj) AS HUGEINT) AS sa, CAST(COUNT(*) AS BIGINT) AS k
      |  FROM pg),
      | qa AS (SELECT CAST(SUM(m * sq * sq) AS HUGEINT) AS saa FROM sq),
      | dv AS (SELECT nj,
      |   CAST(round(CAST(sj AS DOUBLE) / CAST(nj AS DOUBLE)
      |     - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS dev
      |  FROM pg, tot),
      | qq AS (SELECT COALESCE(CAST(SUM(nj * dev * dev) AS HUGEINT), 0)
      |   AS q4 FROM dv),
      | w AS (SELECT n, k, q4,
      |   (CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
      |      / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS vhat
      |  FROM tot, qa, qq)
      | SELECT CAST(n AS BIGINT) AS n_rows, k AS k_groups,
      |  CAST(q4 AS DOUBLE) AS q_mass,
      |  CASE WHEN n >= 2 AND vhat > 0.0 THEN
      |   CAST(round(CAST(q4 AS DOUBLE) / vhat * 1.0e12) AS BIGINT)
      |  END AS conover_pico
      | FROM w""".stripMargin.replace("\n", " ")

  /** Bartlett's variance test of document length across sources
    * ([[graft.ops.Eval.bartlettTest]]): the parametric member closing
    * the scale trio on the SAME design as q_fligner (rank-based) and
    * q_brown_forsythe (deviation ANOVA) — per-source variances off
    * exact integer cumulants, once-quantized log terms, one
    * distributed hash aggregate end to end.
    */
  def qBartlett(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.bartlettTest(
      t(spark, dir, "documents")
        .select(col("n_chars").cast("long").as("len"), col("source")),
      "len", "source")

  lazy val qBartlettSql: String =
    """WITH base AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v
      |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
      | pg AS (SELECT g, CAST(COUNT(*) AS HUGEINT) AS n,
      |   CAST(SUM(v) AS HUGEINT) AS s,
      |   CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q
      |  FROM base GROUP BY 1 HAVING COUNT(*) >= 2),
      | s2t AS (SELECT n,
      |   CAST(n * q - s * s AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)
      |     AS s2 FROM pg),
      | qz AS (SELECT n, s2,
      |   CAST(round(ln(GREATEST(s2, 1.0e-300)) * 1.0e12) AS BIGINT) AS l,
      |   CAST(round(s2 * 1.0e6) AS BIGINT) AS m,
      |   CAST(round(1.0e12 / CAST(n - 1 AS DOUBLE)) AS BIGINT) AS r
      |  FROM s2t),
      | ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
      |   CAST(SUM(n) AS BIGINT) AS nr,
      |   CAST(SUM((n - 1) * l) AS HUGEINT) AS a,
      |   CAST(SUM((n - 1) * m) AS HUGEINT) AS vv,
      |   CAST(SUM(r) AS HUGEINT) AS rr,
      |   MIN(s2) AS mins2 FROM qz),
      | fin AS (SELECT k, nr, a, vv, rr, mins2,
      |   CAST(nr - k AS DOUBLE) AS nmk FROM ag),
      | ch AS (SELECT k, nr, mins2, nmk,
      |   CAST(vv AS DOUBLE) / 1.0e6 / nmk AS sp2,
      |   nmk * ln(GREATEST(CAST(vv AS DOUBLE) / 1.0e6 / nmk, 1.0e-300))
      |     - CAST(a AS DOUBLE) / 1.0e12 AS tnum,
      |   1.0 + (CAST(rr AS DOUBLE) / 1.0e12 - 1.0 / GREATEST(nmk, 1.0))
      |     / (3.0 * GREATEST(CAST(k - 1 AS DOUBLE), 1.0)) AS cf
      |  FROM fin)
      | SELECT nr AS n_rows, k AS k_groups, sp2,
      |  CASE WHEN k >= 2 AND nr > k AND mins2 > 0.0 THEN
      |   CAST(round(tnum / cf * 1.0e12) AS BIGINT) END AS bartlett_pico
      | FROM ch""".stripMargin.replace("\n", " ")

  /** Rotating one-priority-out incomplete design over the complete
    * 5-priority customer blocks: blocks ranked by custkey (the
    * distributed [[graft.ops.PrefixSum]] — never a one-task sort over
    * the block axis), truncated to a multiple of 5, block rank i
    * dropping priority ((i−1) mod 5)+1 — a BIB design (t=5, k=4,
    * r=4b/5, λ=3b/5) constructed deterministically from organic data;
    * the shared input of q_durbin and q_skillings_mack.
    */
  private def rotatingIncomplete(spark: SparkSession,
      dir: String): DataFrame = {
    val base = t(spark, dir, "orders")
      .filter(col("o_custkey").isNotNull && col("o_orderpriority").isNotNull
        && col("o_totalprice").isNotNull)
      .select(col("o_custkey").as("blk"), col("o_orderpriority").as("cls"),
        floor(col("o_totalprice")).as("spend"),
        expr("CAST(substring(o_orderpriority, 1, 1) AS INT)").as("sidx"))
    val complete = base.groupBy(col("blk"))
      .agg(countDistinct(col("cls")).as("_nd"))
      .filter(col("_nd") === 5L).select(col("blk"))
    val keep = graft.ops.PrefixSum.inclusiveAll(complete, "blk",
      Seq(lit(1L) -> "_rk"), withTotals = true)
      .filter(col("_rk") <= lit(5L) * expr("_rk_total div 5"))
      .select(col("blk"),
        (pmod(col("_rk") - lit(1L), lit(5L)) + lit(1L)).as("_dropi"))
    base.join(keep, "blk")
      .filter(col("sidx").cast("long") =!= col("_dropi"))
      .select(col("blk"), col("cls"), col("spend"))
  }

  /** The rotating-one-out construction + the op law, shared verbatim by
    * qDurbinSql and qSkillingsMackSql up to the ranked-cells stage.
    */
  private val incompleteCellsSql: String =
    """WITH baseall AS (SELECT o_custkey AS blk, o_orderpriority AS cls,
      |   CAST(floor(o_totalprice) AS BIGINT) AS spend,
      |   CAST(substring(o_orderpriority, 1, 1) AS INT) AS sidx
      |  FROM orders WHERE o_custkey IS NOT NULL
      |   AND o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
      | comp AS (SELECT blk FROM baseall GROUP BY 1
      |   HAVING COUNT(DISTINCT cls) = 5),
      | rk AS (SELECT blk, ROW_NUMBER() OVER (ORDER BY blk) AS r,
      |   COUNT(*) OVER () AS nb FROM comp),
      | keep AS (SELECT blk, ((r - 1) % 5) + 1 AS dropi FROM rk
      |   WHERE r <= 5 * (nb // 5)),
      | rows2 AS (SELECT b.blk AS b, b.cls AS x, b.spend AS y
      |   FROM baseall b JOIN keep USING (blk) WHERE b.sidx <> keep.dropi),
      | cells AS (SELECT b, x, SUM(y) AS cell FROM rows2 GROUP BY 1, 2),
      | rkd AS (SELECT b, x,
      |   2 * RANK() OVER (PARTITION BY b ORDER BY cell)
      |    + COUNT(*) OVER (PARTITION BY b, cell) - 1 AS mr2,
      |   COUNT(*) OVER (PARTITION BY b) AS kb FROM cells)"""
      .stripMargin.replace("\n", " ")

  /** Durbin's χ²/F over the rotating one-priority-out BIB design
    * ([[graft.ops.Eval.durbinTest]]): does priority matter to a
    * customer's per-priority spend when every customer ranks only the
    * FOUR priorities their block kept? — the incomplete-design member
    * of the q_friedman_w family, whose complete-block scaffold would
    * drop every one of these blocks.
    */
  def qDurbin(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.durbinTest(rotatingIncomplete(spark, dir),
      "blk", "cls", "spend")

  lazy val qDurbinSql: String =
    (incompleteCellsSql +
      """,
      | ca AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nc, MAX(kb) AS k,
      |   COALESCE(SUM(CAST(mr2 AS HUGEINT) * mr2), 0) AS a4 FROM rkd),
      | pt AS (SELECT x, CAST(COUNT(*) AS HUGEINT) AS r,
      |   CAST(SUM(mr2) AS HUGEINT) AS r2 FROM rkd GROUP BY 1),
      | ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS t,
      |   CAST(MAX(pt.r) AS BIGINT) AS rmax,
      |   COALESCE(SUM((r2 - r * (k + 1)) * (r2 - r * (k + 1))), 0) AS s4
      |  FROM pt, ca),
      | w AS (SELECT (nc // k) AS b, t, k, rmax, s4, a4,
      |   a4 - (nc // k) * k * (k + 1) * (k + 1) AS den,
      |   CAST(t - 1 AS DOUBLE) * CAST(s4 AS DOUBLE)
      |    / CAST(a4 - (nc // k) * k * (k + 1) * (k + 1) AS DOUBLE) AS t1,
      |   CAST(nc // k AS DOUBLE) * CAST(k - 1 AS DOUBLE) AS bk1
      |  FROM ag, ca)
      | SELECT CAST(b AS BIGINT) AS n_blocks, t AS n_treatments,
      |  CAST(k AS BIGINT) AS k_per_block, rmax AS r_reps,
      |  CAST(s4 AS BIGINT) AS s4, CAST(a4 AS BIGINT) AS a4,
      |  CASE WHEN t >= 2 AND den > 0 THEN
      |   CAST(round(t1 * 1.0e12) AS BIGINT) END AS t1_pico,
      |  CASE WHEN t >= 2 AND den > 0 AND bk1 - t1 > 0.0 THEN
      |   CAST(round(t1 / CAST(t - 1 AS DOUBLE)
      |    * (bk1 - CAST(t AS DOUBLE) + 1.0) / (bk1 - t1) * 1.0e12)
      |    AS BIGINT) END AS t2_pico
      | FROM w""").stripMargin.replace("\n", " ")

  /** Skillings–Mack over the same rotating one-out design
    * ([[graft.ops.Eval.skillingsMack]]): the general-missing-data
    * statistic on a pairwise-balanced pattern, where its covariance
    * solve collapses to the closed ΣA²/(λt) chain — the oracled leg of
    * the op whose general path is spec-pinned (Gaussian elimination
    * over the bounded treatment axis).
    */
  def qSkillingsMack(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.skillingsMack(rotatingIncomplete(spark, dir),
      "blk", "cls", "spend")

  lazy val qSkillingsMackSql: String =
    (incompleteCellsSql +
      """,
      | sized AS (SELECT b, x, mr2, kb FROM rkd WHERE kb >= 2),
      | sc AS (SELECT x, kb, mr2 - (kb + 1) AS d,
      |   CAST(round(sqrt(12.0 / CAST(kb + 1 AS DOUBLE)) * 1.0e6)
      |     AS BIGINT) AS cm FROM sized),
      | pt AS (SELECT x,
      |   COALESCE(SUM(CAST(cm AS HUGEINT) * d), 0) AS a2m,
      |   SUM(kb - 1) AS v FROM sc GROUP BY 1),
      | pr AS (SELECT l.x AS xa, r.x AS xb, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM sized l JOIN sized r USING (b) WHERE l.x < r.x GROUP BY 1, 2),
      | agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS t,
      |   COALESCE(SUM(a2m * a2m), 0) AS ssq,
      |   (MIN(v) = MAX(v)) AS dq FROM pt),
      | pra AS (SELECT CAST(COUNT(*) AS BIGINT) AS np, MIN(c) AS lam,
      |   (MIN(c) = MAX(c)) AS pq FROM pr),
      | nb AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS n_blocks
      |  FROM sized),
      | w AS (SELECT n_blocks, t,
      |   (t >= 2 AND np = t * (t - 1) // 2 AND pq AND lam > 0 AND dq)
      |     AS balanced,
      |   CAST(ssq AS DOUBLE) AS ssq_a2, ssq, lam FROM agg, pra, nb)
      | SELECT n_blocks, t AS n_treatments, balanced, ssq_a2,
      |  CASE WHEN balanced THEN
      |   CAST(round(CAST(ssq AS DOUBLE)
      |    / (CAST(lam AS DOUBLE) * CAST(t AS DOUBLE) * 4.0e12) * 1.0e12)
      |    AS BIGINT) END AS sm_pico
      | FROM w""").stripMargin.replace("\n", " ")

  /** Dunn's post-hoc pairwise z over the q_kruskal_wallis design
    * ([[graft.ops.Eval.dunnTest]]): which SOURCE PAIRS differ in
    * document length, once the omnibus H fires — 190 tie-corrected
    * pairwise comparisons off one pooled-midrank pass.
    */
  def qDunnPosthoc(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.dunnTest(
      t(spark, dir, "documents")
        .select(col("n_chars").cast("long").as("len"), col("source")),
      "len", "source")

  lazy val qDunnPosthocSql: String =
    """WITH base AS (SELECT CAST(n_chars AS BIGINT) AS v, source AS g
      |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
      | vt AS (SELECT v, g, CAST(COUNT(*) AS HUGEINT) AS c
      |  FROM base GROUP BY 1, 2),
      | mt AS (SELECT v, CAST(SUM(c) AS HUGEINT) AS m FROM vt GROUP BY 1),
      | cumt AS (SELECT v,
      |   2 * SUM(m) OVER (ORDER BY v
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - m + 1
      |     AS mr2 FROM mt),
      | nn AS (SELECT COALESCE(CAST(SUM(m) AS HUGEINT), 0) AS n,
      |   COALESCE(CAST(SUM(m * m * m - m) AS HUGEINT), 0) AS tie FROM mt),
      | pc AS (SELECT g, CAST(SUM(c) AS BIGINT) AS ng,
      |   CAST(SUM(c * mr2) AS HUGEINT) AS r2
      |  FROM vt JOIN cumt USING (v) GROUP BY 1),
      | pairs AS (SELECT a.g AS ga, b.g AS gb, a.ng AS na, b.ng AS nb,
      |   a.r2 AS r2a, b.r2 AS r2b
      |  FROM pc a JOIN pc b ON a.g < b.g),
      | zz AS (SELECT ga, gb, na, nb, r2a, r2b,
      |   CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 12.0
      |    - CAST(tie AS DOUBLE) / (12.0 * (CAST(n AS DOUBLE) - 1.0)) AS sig,
      |   CAST(n AS BIGINT) AS n
      |  FROM pairs, nn)
      | SELECT ga AS group_a, gb AS group_b, na AS n_a, nb AS n_b,
      |  CAST(r2a AS BIGINT) AS r2sum_a, CAST(r2b AS BIGINT) AS r2sum_b,
      |  CASE WHEN n >= 2 AND sig > 0.0 THEN
      |   CAST(round((CAST(r2a AS DOUBLE) / (2.0 * na)
      |     - CAST(r2b AS DOUBLE) / (2.0 * nb))
      |    / sqrt(sig * (1.0 / na + 1.0 / nb)) * 1.0e12) AS BIGINT)
      |  END AS z_pico
      | FROM zz ORDER BY 1, 2""".stripMargin.replace("\n", " ")

  /** Quade's weighted-block rank test on the q_page_trend design
    * ([[graft.ops.Eval.quadeTest]]): customers whose per-priority spends
    * SPREAD wider vote harder — the weighted sibling of q_friedman_w,
    * with the block-range ranking riding the distributed prefix sum.
    */
  def qQuade(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.quadeTest(
      t(spark, dir, "orders")
        .select(col("o_custkey").as("blk"),
          col("o_orderpriority").as("cls"),
          floor(col("o_totalprice")).as("spend")),
      "blk", "cls", "spend")

  lazy val qQuadeSql: String =
    """WITH base AS (SELECT o_custkey AS b, o_orderpriority AS x,
      |   CAST(floor(o_totalprice) AS BIGINT) AS y
      |  FROM orders WHERE o_custkey IS NOT NULL
      |   AND o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
      | xs AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS s
      |  FROM (SELECT DISTINCT x FROM base)),
      | kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM xs),
      | cells AS (SELECT b, s, SUM(y) AS cell
      |  FROM base JOIN xs USING (x) GROUP BY 1, 2),
      | comp AS (SELECT b FROM cells GROUP BY b
      |  HAVING COUNT(*) = (SELECT k FROM kk)),
      | ranked AS (SELECT c.b, c.s, c.cell,
      |   2 * RANK() OVER (PARTITION BY c.b ORDER BY c.cell)
      |    + COUNT(*) OVER (PARTITION BY c.b, c.cell) - 1 AS mr2
      |  FROM cells c JOIN comp USING (b)),
      | rng AS (SELECT b, MAX(cell) - MIN(cell) AS rg
      |  FROM ranked GROUP BY 1),
      | rrk AS (SELECT b, 2 * RANK() OVER (ORDER BY rg)
      |   + COUNT(*) OVER (PARTITION BY rg) - 1 AS q2 FROM rng),
      | wgt AS (SELECT r.s,
      |   CAST(q2 AS HUGEINT) * (mr2 - (kk.k + 1)) AS s4
      |  FROM ranked r JOIN rrk USING (b), kk),
      | pc AS (SELECT s, CAST(SUM(s4) AS HUGEINT) AS sb,
      |   CAST(SUM(s4 * s4) AS HUGEINT) AS qb, COUNT(*) AS nb
      |  FROM wgt GROUP BY 1),
      | ag AS (SELECT COALESCE(CAST(MAX(nb) AS BIGINT), 0) AS n,
      |   COALESCE(SUM(qb), 0) AS a16, COALESCE(SUM(sb * sb), 0) AS b16n
      |  FROM pc),
      | w AS (SELECT n, kk.k AS k, a16, b16n,
      |   CAST(n AS HUGEINT) * a16 - b16n AS den FROM ag, kk)
      | SELECT CAST(n AS BIGINT) AS n_blocks, CAST(k AS BIGINT) AS k_classes,
      |  CAST(a16 AS DOUBLE) AS a16, CAST(b16n AS DOUBLE) AS b16n,
      |  CASE WHEN n >= 2 AND den > 0 THEN
      |   CAST(round(CAST(n - 1 AS DOUBLE) * CAST(b16n AS DOUBLE)
      |    / CAST(den AS DOUBLE) * 1.0e12) AS BIGINT) END AS t3_pico
      | FROM w""".stripMargin.replace("\n", " ")

  /** Mood's squared-rank scale test of English vs non-English document
    * length ([[graft.ops.Eval.moodScaleTest]]): is the en length
    * distribution WIDER than the rest's? — the variance-sensitive
    * member of the scale pair (q_ansari_bradley weights the centre;
    * this weights the tails), on the q_welch_ttest design.
    */
  def qMoodScale(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.moodScaleTest(
      t(spark, dir, "documents")
        .filter(col("lang").isNotNull)
        .select(col("n_chars").cast("long").as("len"),
          (col("lang") === "en").as("is_en")),
      "len", "is_en")

  lazy val qMoodScaleSql: String =
    """WITH base AS (SELECT CAST(n_chars AS BIGINT) AS v, (lang = 'en') AS a
      |  FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
      | bt AS (SELECT v,
      |   CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS HUGEINT) AS fa,
      |   CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS HUGEINT) AS fb
      |  FROM base GROUP BY 1),
      | cumt AS (SELECT fa, fb, fa + fb AS m,
      |   2 * SUM(fa + fb) OVER (ORDER BY v
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    - (fa + fb) + 1 AS mr2,
      |   SUM(fa + fb) OVER () AS nn FROM bt),
      | sc AS (SELECT fa, fb, m,
      |   (mr2 - (nn + 1)) * (mr2 - (nn + 1)) AS a4 FROM cumt),
      | ag AS (SELECT COALESCE(SUM(fa), 0) AS na, COALESCE(SUM(fb), 0) AS nb,
      |   COALESCE(SUM(fa * a4), 0) AS t4, COALESCE(SUM(m * a4), 0) AS sa,
      |   COALESCE(SUM(m * a4 * a4), 0) AS saa FROM sc),
      | dd AS (SELECT na, nb, t4,
      |   CAST(na AS DOUBLE) * CAST(sa AS DOUBLE)
      |     / CAST(na + nb AS DOUBLE) AS et,
      |   CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
      |    * (CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
      |       / CAST(na + nb AS DOUBLE))
      |    / (CAST(na + nb AS DOUBLE) * CAST(na + nb - 1 AS DOUBLE)) AS vr
      |  FROM ag)
      | SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
      |  CAST(t4 AS DOUBLE) AS t4,
      |  CASE WHEN na + nb > 0 THEN round(et * 1.0e6) END
      |    AS e_t4_micro,
      |  CASE WHEN na > 0 AND nb > 0 AND na + nb >= 2 AND vr > 0.0 THEN
      |   CAST(round((CAST(t4 AS DOUBLE) - et) / sqrt(vr) * 1.0e12)
      |     AS BIGINT) END AS z_pico
      | FROM dd""".stripMargin.replace("\n", " ")

  /** Cliff's delta of English vs non-English document length
    * ([[graft.ops.Eval.cliffsDelta]]): the ordinal effect size on the
    * q_welch_ttest design — what FRACTION of cross pairs have the
    * English doc longer, minus the reverse; order-only, so the skewed
    * length tail cannot own it.
    */
  def qCliffsDelta(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.cliffsDelta(
      t(spark, dir, "documents")
        .filter(col("lang").isNotNull)
        .select(col("n_chars").cast("long").as("len"),
          (col("lang") === "en").as("is_en")),
      "len", "is_en")

  lazy val qCliffsDeltaSql: String =
    """WITH base AS (SELECT CAST(n_chars AS BIGINT) AS v, (lang = 'en') AS g
      |  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
      | bt AS (SELECT v,
      |   COALESCE(SUM(CASE WHEN g THEN 1 ELSE 0 END), 0) AS fa,
      |   COALESCE(SUM(CASE WHEN g THEN 0 ELSE 1 END), 0) AS fb
      |  FROM base GROUP BY 1),
      | cumb AS (SELECT v, CAST(fa AS HUGEINT) AS fa, CAST(fb AS HUGEINT) AS fb,
      |   CAST(SUM(fb) OVER (ORDER BY v
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS cbe,
      |   CAST(SUM(fb) OVER () AS HUGEINT) AS tb FROM bt),
      | cd AS (SELECT COALESCE(SUM(fa), 0) AS na, COALESCE(MIN(tb), 0) AS nb,
      |   COALESCE(SUM(fa * (cbe - fb)), 0) AS gt,
      |   COALESCE(SUM(fa * (tb - cbe)), 0) AS lt,
      |   COALESCE(SUM(fa * fb), 0) AS tie FROM cumb)
      | SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
      |  CAST(gt AS BIGINT) AS gt_pairs, CAST(lt AS BIGINT) AS lt_pairs,
      |  CAST(tie AS BIGINT) AS tie_pairs,
      |  CASE WHEN na > 0 AND nb > 0 THEN
      |   CAST(round(CAST(CAST(gt AS BIGINT) - CAST(lt AS BIGINT) AS DOUBLE)
      |    / CAST(na * nb AS DOUBLE) * 1.0e12) AS BIGINT)
      |  END AS delta_pico
      | FROM cd""".stripMargin.replace("\n", " ")

  /** Cochran–Armitage trend ([[graft.ops.Eval.cochranArmitageTrend]]):
    * does the English rate TREND across ordered length buckets? —
    * exact-integer contrasts, one double chain for z².
    */
  def qTrendTest(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.cochranArmitageTrend(
      t(spark, dir, "documents")
        .filter(col("lang").isNotNull)
        .select(expr("least(n_chars div 250, 4)").as("lvl"),
          (col("lang") === "en").as("hit")),
      "lvl", "hit")

  lazy val qTrendTestSql: String =
    """WITH base AS (SELECT least(CAST(n_chars AS BIGINT) // 250, 4) AS s,
      |   (lang = 'en') AS hit
      |  FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
      | per AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS ns,
      |   CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS ys
      |  FROM base GROUP BY 1),
      | ag AS (SELECT CAST(SUM(ns) AS BIGINT) AS n,
      |   CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ys) AS BIGINT) AS y,
      |   CAST(SUM(CAST(s AS HUGEINT) * ys) AS HUGEINT) AS t1,
      |   CAST(SUM(CAST(s AS HUGEINT) * ns) AS HUGEINT) AS t2,
      |   CAST(SUM(CAST(s AS HUGEINT) * CAST(s AS HUGEINT) * ns) AS HUGEINT)
      |     AS t3
      |  FROM per),
      | w AS (SELECT n, k,
      |   CAST(n AS HUGEINT) * t1 - CAST(y AS HUGEINT) * t2 AS u,
      |   CAST(y AS HUGEINT) * CAST(n - y AS HUGEINT)
      |     * (CAST(n AS HUGEINT) * t3 - t2 * t2) AS den
      |  FROM ag)
      | SELECT n AS n_rows, k AS k_levels,
      |  CASE WHEN den > 0 THEN
      |   CAST(round(CAST(n AS DOUBLE) * CAST(u AS DOUBLE)
      |     * CAST(u AS DOUBLE) / CAST(den AS DOUBLE) * 1.0e12) AS BIGINT)
      |   END AS z2_pico,
      |  CASE WHEN u > 0 THEN 1 WHEN u < 0 THEN -1 ELSE 0 END AS trend_sign
      | FROM w""".stripMargin.replace("\n", " ")

  /** Mean average precision at 20 ([[graft.ops.Eval.mapAtK]], the TREC
    * AP law) over the q_mrr_eval retrieval design (brute-force cosine
    * ranking, label-match relevance): AP's exact-integer numerator via
    * the lcm(1..20) common denominator, one double chain per query.
    */
  def qMapEval(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val ranked = graft.ops.Similarity.bruteForceTopK(
      e, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 20)
    val lab = e.select(col("vec_id"), col("label"))
    val rel = lab.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("label").as("_ql"))
      .join(lab.select(col("vec_id").as("neighbor_id"), col("label").as("_cl")),
        col("_ql") === col("_cl") && col("query_id") =!= col("neighbor_id"))
    graft.ops.Eval.mapAtK(ranked, rel, "query_id", "neighbor_id", "rank",
      k = 20)
  }

  lazy val qMapEvalSql: String = {
    val L = graft.ops.Eval.lcmTo(20)
    s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS ql
      |  FROM embeddings WHERE vec_id < 5),
      | c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv, label AS cl
      |  FROM embeddings),
      | s AS (SELECT query_id, neighbor_id, ql, cl,
      |   list_dot_product(qv, cv)/(sqrt(list_dot_product(qv, qv))*sqrt(list_dot_product(cv, cv))) AS sim
      |  FROM c, q WHERE neighbor_id <> query_id),
      | r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk
      |  FROM s),
      | top AS (SELECT query_id, CAST(rk AS BIGINT) AS rk,
      |   CASE WHEN ql = cl THEN 1 ELSE 0 END AS rel FROM r WHERE rk <= 20),
      | cum AS (SELECT query_id, rk, rel,
      |   CAST(SUM(rel) OVER (PARTITION BY query_id ORDER BY rk
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cr
      |  FROM top),
      | relt AS (SELECT a.vec_id AS query_id, CAST(COUNT(*) AS BIGINT) AS n_rel_total
      |  FROM embeddings a JOIN embeddings b
      |   ON a.label = b.label AND a.vec_id <> b.vec_id
      |  WHERE a.vec_id < 5 GROUP BY 1),
      | perq AS (SELECT query_id, CAST(SUM(rel) AS BIGINT) AS n_rel_at_k,
      |   CAST(SUM(CAST(rel AS HUGEINT) * cr * ($L // rk)) AS HUGEINT) AS numer
      |  FROM cum GROUP BY 1)
      | SELECT p.query_id, p.n_rel_at_k,
      |  COALESCE(t.n_rel_total, 0) AS n_rel_total,
      |  CASE WHEN COALESCE(t.n_rel_total, 0) > 0 THEN
      |   CAST(round(CAST(numer AS DOUBLE) / $L.0
      |     / CAST(LEAST(t.n_rel_total, 20) AS DOUBLE) * 1.0e6) AS BIGINT)
      |   END AS ap_micro
      | FROM perq p LEFT JOIN relt t USING (query_id)
      | ORDER BY query_id""".stripMargin.replace("\n", " ")
  }

  /** Brier score + Murphy decomposition
    * ([[graft.ops.Eval.brierDecomposition]]) over the q_calibration
    * scoring design (anchored cosine → [0,1], truth = label match):
    * reliability / resolution / uncertainty say WHY the screen scores
    * what it does. Exact integer Brier numerator; per-bin pico terms
    * before exact sums.
    */
  def qBrierDecomp(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    graft.functions.CosineSimilarity.register(spark)
    val anchor = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("_av"), col("label").as("_al"))
    val scored = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(anchor))
      .select(
        ((graft.functions.CosineSimilarity.cosine(col("embedding"), col("_av"))
          + lit(1.0)) / lit(2.0)).as("score"),
        (col("label") === col("_al")).as("is_pos"))
    graft.ops.Eval.brierDecomposition(scored, "score", "is_pos", nBins = 10)
  }

  lazy val qBrierDecompSql: String =
    """WITH a AS (SELECT embedding::DOUBLE[] AS av, label AS al FROM embeddings WHERE vec_id = 0),
      | s AS (SELECT (list_dot_product(v, av)/(sqrt(list_dot_product(v, v))*sqrt(list_dot_product(av, av))) + 1.0) / 2.0 AS score,
      |    (e.label = a.al) AS y
      |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings WHERE vec_id <> 0) e, a),
      | base AS (SELECT least(9, greatest(0, CAST(floor(score * 10) AS BIGINT))) AS b,
      |    CAST(floor(score * 1000000.0 + 0.5) AS BIGINT) AS m,
      |    CASE WHEN y THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS o
      |  FROM s WHERE score IS NOT NULL AND isfinite(score) AND y IS NOT NULL),
      | bins AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n,
      |   CAST(SUM(o) AS BIGINT) AS p, CAST(SUM(m) AS BIGINT) AS sm,
      |   CAST(SUM(CAST((m - o * 1000000) AS HUGEINT)
      |     * (m - o * 1000000)) AS HUGEINT) AS bsq
      |  FROM base GROUP BY 1),
      | gtot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
      |   CAST(SUM(p) AS BIGINT) AS pt FROM bins),
      | terms AS (SELECT nt, pt, bsq,
      |   CAST(CAST(round(CAST(n AS DOUBLE)
      |     * (CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
      |        - CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
      |     * (CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
      |        - CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
      |     * 1.0e12) AS BIGINT) AS HUGEINT) AS rel,
      |   CAST(CAST(round(CAST(n AS DOUBLE)
      |     * (CAST(p AS DOUBLE) / CAST(n AS DOUBLE)
      |        - CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE))
      |     * (CAST(p AS DOUBLE) / CAST(n AS DOUBLE)
      |        - CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE))
      |     * 1.0e12) AS BIGINT) AS HUGEINT) AS res
      |  FROM bins CROSS JOIN gtot WHERE nt > 0),
      | ag AS (SELECT nt, pt, CAST(COUNT(*) AS BIGINT) AS n_bins,
      |   CAST(SUM(bsq) AS HUGEINT) AS sq, CAST(SUM(rel) AS HUGEINT) AS srel,
      |   CAST(SUM(res) AS HUGEINT) AS sres
      |  FROM terms GROUP BY 1, 2)
      | SELECT nt AS n_rows, n_bins,
      |  CAST(round(CAST(sq AS DOUBLE) / CAST(nt AS DOUBLE)) AS BIGINT)
      |   AS brier_pico,
      |  CAST(round(CAST(srel AS DOUBLE) / CAST(nt AS DOUBLE)) AS BIGINT)
      |   AS reliability_pico,
      |  CAST(round(CAST(sres AS DOUBLE) / CAST(nt AS DOUBLE)) AS BIGINT)
      |   AS resolution_pico,
      |  CAST(round((CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE))
      |    * (1.0 - CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE)) * 1.0e12)
      |   AS BIGINT) AS uncertainty_pico
      | FROM ag""".stripMargin.replace("\n", " ")

  /** Fleiss' kappa ([[graft.ops.Eval.fleissKappa]], '71) over a
    * three-heuristic labeling committee (lang = en, length > 250,
    * even length) — how much does the panel agree beyond chance?
    * Exact S2/c_j² sums, one pinned double chain.
    */
  def qFleissKappa(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .filter(col("lang").isNotNull && col("n_chars").isNotNull)
      .select(col("doc_id"), col("lang"),
        col("n_chars").cast("long").as("nc"))
    val r = d.select(col("doc_id").as("item"),
        (col("lang") === "en").cast("long").as("cat"))
      .unionByName(d.select(col("doc_id").as("item"),
        (col("nc") > 250L).cast("long").as("cat")))
      .unionByName(d.select(col("doc_id").as("item"),
        (col("nc") % 2 === 0).cast("long").as("cat")))
    graft.ops.Eval.fleissKappa(r, "item", "cat", nRaters = 3)
  }

  lazy val qFleissKappaSql: String =
    """WITH d AS (SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS nc
      |  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
      | r AS (SELECT doc_id AS item,
      |   CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS cat FROM d
      |  UNION ALL SELECT doc_id,
      |   CAST(CASE WHEN nc > 250 THEN 1 ELSE 0 END AS BIGINT) FROM d
      |  UNION ALL SELECT doc_id,
      |   CAST(CASE WHEN nc % 2 = 0 THEN 1 ELSE 0 END AS BIGINT) FROM d),
      | nij AS (SELECT item, cat, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM r GROUP BY 1, 2),
      | pi AS (SELECT item, CAST(SUM(n) AS BIGINT) AS ri,
      |   CAST(SUM(CAST(n AS HUGEINT) * n) AS HUGEINT) AS s2i
      |  FROM nij GROUP BY 1),
      | ok AS (SELECT item, s2i FROM pi WHERE ri = 3),
      | it AS (SELECT CAST(COUNT(*) AS BIGINT) AS ni,
      |   CAST(SUM(s2i) AS HUGEINT) AS s2 FROM ok),
      | cj AS (SELECT nij.cat, CAST(SUM(nij.n) AS BIGINT) AS cjv
      |  FROM nij JOIN ok USING (item) GROUP BY 1),
      | ct AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
      |   CAST(SUM(CAST(cjv AS HUGEINT) * cjv) AS HUGEINT) AS cj2 FROM cj)
      | SELECT ni AS n_items, CAST(3 AS BIGINT) AS n_raters,
      |  k AS k_categories,
      |  CASE WHEN CAST(cj2 AS DOUBLE)
      |    / (CAST(ni AS DOUBLE) * 3.0 * (CAST(ni AS DOUBLE) * 3.0)) < 1.0
      |   THEN CAST(round(
      |    ((CAST(s2 AS DOUBLE) - CAST(ni AS DOUBLE) * 3.0)
      |      / (CAST(ni AS DOUBLE) * 3.0 * (3.0 - 1.0))
      |     - CAST(cj2 AS DOUBLE)
      |      / (CAST(ni AS DOUBLE) * 3.0 * (CAST(ni AS DOUBLE) * 3.0)))
      |    / (1.0 - CAST(cj2 AS DOUBLE)
      |      / (CAST(ni AS DOUBLE) * 3.0 * (CAST(ni AS DOUBLE) * 3.0)))
      |    * 1.0e12) AS BIGINT) END AS kappa_pico
      | FROM it CROSS JOIN ct WHERE ni > 0""".stripMargin.replace("\n", " ")

  /** McNemar's paired test ([[graft.ops.Eval.mcnemar]], '47): do the
    * length gate and the English gate disagree ASYMMETRICALLY on the
    * same documents? Discordant cells only; one double chain.
    */
  def qMcnemar(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.mcnemar(
      t(spark, dir, "documents")
        .filter(col("lang").isNotNull && col("n_chars").isNotNull)
        .select((col("n_chars") > 250).as("ga"),
          (col("lang") === "en").as("gb")),
      "ga", "gb")

  lazy val qMcnemarSql: String =
    """WITH base AS (SELECT (n_chars > 250) AS a, (lang = 'en') AS b
      |  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
      | ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
      |   CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
      |   CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10
      |  FROM base)
      | SELECT n_items, n01, n10,
      |  CASE WHEN n01 + n10 > 0 THEN
      |   CAST(round(CAST(n01 - n10 AS DOUBLE) * CAST(n01 - n10 AS DOUBLE)
      |     / CAST(n01 + n10 AS DOUBLE) * 1.0e12) AS BIGINT) END AS chi2_pico
      | FROM ag""".stripMargin.replace("\n", " ")

  /** Brown–Forsythe spread test across sources
    * ([[graft.ops.Eval.brownForsythe]], '74): q_anova_f's
    * equal-variance assumption, checked — ANOVA on exact integer
    * doubled deviations |2x − 2·median| (F is scale-invariant).
    */
  def qBrownForsythe(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.brownForsythe(
      t(spark, dir, "documents")
        .select(col("n_chars").cast("long").as("len"), col("source")),
      "len", "source")

  lazy val qBrownForsytheSql: String =
    """WITH base0 AS (SELECT CAST(n_chars AS BIGINT) AS v0, source AS g
      |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
      | med AS (SELECT g, quantile_cont(v0, 0.5) AS md FROM base0 GROUP BY 1),
      | base AS (SELECT b.g,
      |   CAST(abs(CAST(v0 AS DOUBLE) * 2.0 - md * 2.0) AS BIGINT) AS v
      |  FROM base0 b JOIN med USING (g)),
      | per AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
      |   CAST(SUM(CAST(v AS HUGEINT)) AS HUGEINT) AS s,
      |   CAST(SUM(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS HUGEINT) AS q
      |  FROM base GROUP BY 1),
      | ag AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
      |   CAST(COUNT(*) AS BIGINT) AS k,
      |   CAST(SUM(s) AS HUGEINT) AS ss, CAST(SUM(q) AS HUGEINT) AS qq,
      |   CAST(SUM(CAST(CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
      |     / CAST(ng AS DOUBLE) * 1.0e6) AS BIGINT) AS HUGEINT)) AS HUGEINT)
      |     AS a
      |  FROM per),
      | w AS (SELECT n, k,
      |   a - CAST(CAST(round(CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
      |     / CAST(n AS DOUBLE) * 1.0e6) AS BIGINT) AS HUGEINT) AS ssb,
      |   qq * 1000000 - a AS ssw FROM ag)
      | SELECT n AS n_rows, k AS k_groups,
      |  CASE WHEN k >= 2 AND n > k AND ssw > 0 THEN
      |   CAST(round(CAST(ssb AS DOUBLE) / CAST(k - 1 AS DOUBLE)
      |     / (CAST(ssw AS DOUBLE) / CAST(n - k AS DOUBLE)) * 1.0e12)
      |    AS BIGINT) END AS f_pico,
      |  CASE WHEN k >= 2 AND ssb + ssw > 0 THEN
      |   CAST(round(CAST(ssb AS DOUBLE) / CAST(ssb + ssw AS DOUBLE)
      |     * 1.0e12) AS BIGINT) END AS eta2_pico
      | FROM w""".stripMargin.replace("\n", " ")
}
