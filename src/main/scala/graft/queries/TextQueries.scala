package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ExcelSerial
import graft.model.PathOps
import graft.ops.{Hierarchy, Parents, Upsert}
import graft.views.Analytic

/** Text analysis: quality/readability/language laws, token stats, BPE, PII, keyness, collocations.
  *
  * Split from the monolithic `Registry` object (round 15): members are
  * unchanged; `Registry` mixes every family trait in, so the public
  * surface (`Registry.queries` / `Registry.oracle` / each q* member) is
  * identical. Cross-family helpers are `private[queries]`; vals are lazy
  * so trait-linearization order can never null-init a shared fragment.
  */
trait TextQueries { self: RegistryAll =>

  /** Per-document text statistics + deterministic quality score.
    *
    * ONE tokenization per row via mapPartitions (TextFns.statsScala): the
    * expression forms re-run the interpreted token pipeline once per output
    * column (the measured HOF trap — Dedup.shingleHashFrame cost note).
    * Bit-equality with the expression laws is pinned by TextFnsSpec.
    */
  def qTextStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents").select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val s = graft.functions.TextFns.statsScala(text)
        (id, s.nTokens, s.nSubwords, s.nPunct, s.nStopwords, s.quality)
      })
      .toDF("doc_id", "n_tokens", "n_subwords", "n_punct", "n_stopwords", "quality")
      .orderBy("doc_id")
  }

  lazy val qTextStatsSql: String =
    s"""SELECT doc_id,
       | $nTokensSqlExpr AS n_tokens,
       | CAST(list_sum(list_transform($tokensSql, tk -> CAST(ceil(CAST(length(tk) AS DOUBLE) / 4.0) AS BIGINT))) AS BIGINT) AS n_subwords,
       | $nPunctSqlExpr AS n_punct,
       | $nStopwordsSqlExpr AS n_stopwords,
       | $qualitySqlExpr AS quality
       | FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** Intra-document repetition ratio (repeated word-3-gram fraction) —
    * boilerplate/spam quality signal, one mapPartitions tokenization pass.
    */
  def qRepetition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents").select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val (total, distinct, ratio) = graft.functions.TextFns.repetitionScala(text)
        (id, total, distinct, ratio)
      })
      .toDF("doc_id", "n_shingles", "n_distinct", "repetition")
      .orderBy("doc_id")
  }

  lazy val qRepetitionSql: String =
    s"""WITH tk AS (SELECT doc_id, $tokensSql AS toks FROM documents),
       | sh AS (SELECT doc_id,
       |   CASE WHEN len(toks) < 3 THEN []
       |        ELSE list_transform(range(1, len(toks) - 1),
       |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS grams
       |   FROM tk)
       | SELECT doc_id,
       |  CAST(len(grams) AS BIGINT) AS n_shingles,
       |  CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
       |  CASE WHEN len(grams) = 0 THEN 0.0
       |       ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / CAST(len(grams) AS DOUBLE)
       |  END AS repetition
       | FROM sh ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** C4-style line-level cleaning ([[graft.functions.TextFns.c4Scala]],
    * Raffel et al. 2020 §2.2): per-document retained-line counts, the
    * lorem-ipsum / curly-brace page flags, the ≥5-sentence keep decision,
    * and the CLEANED text itself — all string/integer laws, so every
    * column including the rebuilt text hash-matches the SQL replay.
    */
  def qC4Clean(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents").select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val c = graft.functions.TextFns.c4Scala(text)
        (id, c.nLines, c.nKept, c.nSentences, c.hasLorem, c.hasBrace,
          c.c4Keep, c.cleanText)
      })
      .toDF("doc_id", "n_lines", "n_kept", "n_sentences", "has_lorem",
        "has_brace", "c4_keep", "clean_text")
      .orderBy("doc_id")
  }

  lazy val qC4CleanSql: String = {
    // one line's retention predicate, the lambda var `l` threaded through
    // the SHARED tokens law (tokensSqlOf) so the ≥3-words rule can never
    // diverge from the engine's tokenizer
    val lineKeep = s"regexp_matches(l, '[.!?\"]$$') AND " +
      s"len(${tokensSqlOf("l")}) >= 3 AND NOT contains(lower(l), 'javascript')"
    s"""WITH d AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
       | ls AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM d),
       | k AS (SELECT doc_id, list_filter(lines, l -> $lineKeep) AS kept FROM ls),
       | c AS (SELECT doc_id,
       |   COALESCE(array_to_string(kept, chr(10)), '') AS clean_text,
       |   len(kept) AS n_kept FROM k),
       | s AS (SELECT doc_id,
       |   CAST(length(regexp_replace(clean_text, '[^.!?]', '', 'g')) AS BIGINT) AS n_sentences
       |  FROM c)
       | SELECT d.doc_id,
       |  CAST(len(lines) AS BIGINT) AS n_lines,
       |  CAST(n_kept AS BIGINT) AS n_kept,
       |  s.n_sentences,
       |  contains(lower(d.text), 'lorem ipsum') AS has_lorem,
       |  contains(d.text, '{') AS has_brace,
       |  (NOT contains(lower(d.text), 'lorem ipsum') AND NOT contains(d.text, '{')
       |   AND s.n_sentences >= 5) AS c4_keep,
       |  clean_text
       | FROM d JOIN ls USING (doc_id) JOIN c USING (doc_id) JOIN s USING (doc_id)
       | ORDER BY doc_id""".stripMargin.replace("\n", " ")
  }

  /** Character-diversity spam signal
    * ([[graft.functions.TextFns.simpsonScala]]): code-point Simpson index
    * from two exact integer sums — the no-libm diversity law, so even the
    * double hash-matches (one multiply + one divide, same order, both
    * engines).
    */
  def qCharDiversity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents").select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val (n, sumC2, simpson) = graft.functions.TextFns.simpsonScala(text)
        (id, n, sumC2, simpson)
      })
      .toDF("doc_id", "n_cp", "sum_c2", "char_simpson")
      .orderBy("doc_id")
  }

  lazy val qCharDiversitySql: String =
    """WITH d AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
      | ch AS (SELECT doc_id, unnest(list_transform(range(1, length(text) + 1),
      |   i -> substr(text, i, 1))) AS c FROM d),
      | cc AS (SELECT doc_id, c, COUNT(*) AS cnt FROM ch GROUP BY doc_id, c),
      | agg AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_cp,
      |   CAST(SUM(cnt * cnt) AS BIGINT) AS sum_c2 FROM cc GROUP BY doc_id)
      | SELECT d.doc_id,
      |  COALESCE(a.n_cp, 0) AS n_cp,
      |  COALESCE(a.sum_c2, 0) AS sum_c2,
      |  CASE WHEN a.n_cp IS NULL OR a.n_cp = 0 THEN 0.0
      |       ELSE 1.0 - CAST(a.sum_c2 AS DOUBLE) /
      |            (CAST(a.n_cp AS DOUBLE) * CAST(a.n_cp AS DOUBLE)) END AS char_simpson
      | FROM d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** Corpus top-25 RAKE keyphrases ([[graft.ops.Keyphrase.rakePhrases]]):
    * stopword-boundary candidate runs, exact integer degree/frequency word
    * stats, micro-quantized per-word ratios summed to an exact BIGINT
    * phrase score — so the ranking hash-matches with no float-order risk.
    */
  def qRakePhrases(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Keyphrase.rakePhrases(t(spark, dir, "documents"), "text")

  lazy val qRakePhrasesSql: String = {
    val stopList = graft.functions.TextFns.enStopwords
      .map(w => s"'$w'").mkString(", ")
    s"""WITH d AS (SELECT doc_id, ${tokensSqlOf("lower(text)")} AS tks FROM documents),
      | pos AS (SELECT doc_id, tks, unnest(range(1, len(tks) + 1)) AS i FROM d),
      | w AS (SELECT doc_id, i, tks[i] AS w FROM pos),
      | nb AS (SELECT doc_id, i, w,
      |   i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS isl
      |  FROM w WHERE w NOT IN ($stopList) AND regexp_matches(w, '^[a-z]+$$')),
      | ph AS (SELECT list(w ORDER BY i) AS words FROM nb GROUP BY doc_id, isl
      |   HAVING COUNT(*) <= 4),
      | pw AS (SELECT unnest(words) AS w, len(words) AS nw FROM ph),
      | ws AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
      |   CAST(SUM(nw) AS BIGINT) AS deg FROM pw GROUP BY 1),
      | pd AS (SELECT array_to_string(words, ' ') AS phrase,
      |   CAST(COUNT(*) AS BIGINT) AS n_occ FROM ph GROUP BY 1),
      | pe AS (SELECT phrase, n_occ, unnest(string_split(phrase, ' ')) AS w FROM pd),
      | sc AS (SELECT phrase, n_occ,
      |   CAST(COUNT(*) AS BIGINT) AS n_words,
      |   CAST(SUM(CAST(round(CAST(deg AS DOUBLE) * 1000000.0
      |     / CAST(freq AS DOUBLE)) AS BIGINT)) AS BIGINT) AS score_micro
      |  FROM pe JOIN ws USING (w) GROUP BY 1, 2)
      | SELECT phrase, n_words, n_occ, score_micro FROM sc
      | ORDER BY score_micro DESC, phrase LIMIT 25""".stripMargin.replace("\n", " ")
  }

  /** HTML → text stripping ([[graft.functions.TextFns.htmlStrip]]): tag
    * count, markup witness, extracted text and its length. Prose rows
    * pass through (modulo the whitespace-collapse law); the planted-HTML
    * behavior is pinned in TextFnsSpec. Every regex is in the Java∩RE2
    * dialect subset, so the extracted TEXT itself hash-matches the
    * DuckDB replay — not just the counts.
    */
  def qHtmlStrip(spark: SparkSession, dir: String): DataFrame = {
    val text = coalesce(col("text"), lit(""))
    t(spark, dir, "documents").select(
        col("doc_id"),
        graft.functions.TextFns.htmlTagCount(text).as("n_tags"),
        (graft.functions.TextFns.htmlTagCount(text) > 0).as("had_html"),
        graft.functions.TextFns.htmlStrip(text).as("clean_text"))
      .withColumn("n_chars_clean", length(col("clean_text")).cast("bigint"))
      .orderBy("doc_id")
  }

  lazy val qHtmlStripSql: String =
    """WITH d AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
      | s AS (SELECT doc_id, text,
      |   regexp_replace(regexp_replace(regexp_replace(text,
      |     '(?is)<!--.*?-->', ' ', 'g'),
      |     '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
      |     '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g') AS t3 FROM d),
      | u AS (SELECT doc_id, text,
      |   regexp_replace(t3, '<[^>]+>', ' ', 'g') AS t4 FROM s),
      | e AS (SELECT doc_id, text,
      |   replace(replace(replace(replace(replace(replace(replace(t4,
      |     '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
      |     '&#39;', ''''), '&apos;', ''''), '&amp;', '&') AS t5 FROM u),
      | c AS (SELECT doc_id, text,
      |   regexp_replace(regexp_replace(t5, '[ \t\r\n\f]+', ' ', 'g'),
      |     '^ +| +$', '', 'g') AS clean_text FROM e)
      | SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '<[^>]+>')) AS BIGINT) AS n_tags,
      |  len(regexp_extract_all(text, '<[^>]+>')) > 0 AS had_html,
      |  clean_text,
      |  CAST(length(clean_text) AS BIGINT) AS n_chars_clean
      | FROM c ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** Zipf rank–frequency fit ([[graft.ops.Vocab.zipfFit]]): least squares
    * of ln(count) on ln(rank) over the top-256 tokens in micro-ln units
    * (the LM quantization discipline) — regression sums exact in
    * DECIMAL(38,0)/HUGEINT, slope/intercept one fixed IEEE chain each,
    * and the exact Σx/Σy integers ride in the output so the oracle gates
    * the integer core too.
    */
  def qZipfFit(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Vocab.zipfFit(t(spark, dir, "documents"), "text")

  lazy val qZipfFitSql: String = {
    val lowTok = tokensSqlOf("lower(text)")
    s"""WITH tk AS (SELECT unnest($lowTok) AS t FROM documents),
      | c AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tk GROUP BY t),
      | r AS (SELECT c, row_number() OVER (ORDER BY c DESC, t ASC) AS rank
      |   FROM c ORDER BY c DESC, t ASC LIMIT 256),
      | p AS (SELECT
      |   CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
      |   CAST(round(ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT) AS y FROM r),
      | a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_ranks,
      |   CAST(SUM(x) AS BIGINT) AS sum_x, CAST(SUM(y) AS BIGINT) AS sum_y,
      |   SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
      |   SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx FROM p),
      | s AS (SELECT n_ranks, sum_x, sum_y,
      |   CASE WHEN CAST(n_ranks AS HUGEINT) * sxx
      |          - CAST(sum_x AS HUGEINT) * CAST(sum_x AS HUGEINT) = 0 THEN NULL
      |        ELSE CAST(CAST(n_ranks AS HUGEINT) * sxy
      |          - CAST(sum_x AS HUGEINT) * CAST(sum_y AS HUGEINT) AS DOUBLE)
      |          / CAST(CAST(n_ranks AS HUGEINT) * sxx
      |          - CAST(sum_x AS HUGEINT) * CAST(sum_x AS HUGEINT) AS DOUBLE)
      |   END AS slope FROM a)
      | SELECT n_ranks, sum_x, sum_y, slope,
      |  CASE WHEN slope IS NULL THEN NULL
      |       ELSE (CAST(sum_y AS DOUBLE) / 1000000.0
      |         - slope * (CAST(sum_x AS DOUBLE) / 1000000.0))
      |         / CAST(n_ranks AS DOUBLE) END AS intercept
      | FROM s""".stripMargin.replace("\n", " ")
  }

  /** CCNet-style LM quality score ([[graft.ops.LangModel.bigramNllScore]]):
    * every document's negative log-likelihood under an add-one smoothed
    * bigram model trained on the `lang = 'en'` slice, in micro-log units
    * (the DSIR ln-quantization discipline) — thresholding avg_nll is the
    * perplexity filter without exp() between the engines.
    */
  def qLmScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    graft.ops.LangModel.bigramNllScore(
      docs, "doc_id", "text", docs.filter(col("lang") === "en"), "text")
      .orderBy("doc_id")
  }

  lazy val qLmScoreSql: String = {
    val lowTok = tokensSqlOf("lower(text)")
    s"""WITH tr AS (SELECT $lowTok AS tks FROM documents WHERE lang = 'en'),
      | bi AS (SELECT tks[i] AS w1, tks[i + 1] AS w2
      |  FROM (SELECT tks, unnest(range(1, len(tks))) AS i FROM tr)),
      | c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bi GROUP BY 1, 2),
      | c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
      | v AS (SELECT CAST(COUNT(DISTINCT t) + 1 AS BIGINT) AS v
      |  FROM (SELECT unnest(tks) AS t FROM tr)),
      | dt AS (SELECT doc_id, $lowTok AS tks FROM documents),
      | db AS (SELECT doc_id, tks[i] AS w1, tks[i + 1] AS w2
      |  FROM (SELECT doc_id, tks, unnest(range(1, len(tks))) AS i FROM dt)),
      | sc AS (SELECT doc_id,
      |   CAST(round((ln(CAST(COALESCE(c1.c1, 0) + v.v AS DOUBLE))
      |     - ln(CAST(COALESCE(c2.c2, 0) + 1 AS DOUBLE))) * 1000000.0) AS BIGINT) AS nll
      |  FROM db LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1) CROSS JOIN v),
      | agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |   CAST(SUM(nll) AS BIGINT) AS nll_micro FROM sc GROUP BY 1)
      | SELECT d.doc_id,
      |  COALESCE(a.n_bigrams, 0) AS n_bigrams,
      |  COALESCE(a.nll_micro, 0) AS nll_micro,
      |  CASE WHEN COALESCE(a.n_bigrams, 0) > 0
      |       THEN CAST(a.nll_micro AS DOUBLE) / 1000000.0 / CAST(a.n_bigrams AS DOUBLE)
      |       ELSE 0.0 END AS avg_nll
      | FROM documents d LEFT JOIN agg a USING (doc_id)
      | ORDER BY doc_id""".stripMargin.replace("\n", " ")
  }

  /** [[qLmScore]] against a PERSISTED model: the en slice trains the store
    * in two batches plus a crashed-commit retry of the second (the
    * count-family `batch=<id>/` overwrite makes the replay idempotent —
    * an append would double the counts and shift every score); scoring
    * runs [[graft.ops.LangModel.bigramNllScoreStored]]. Same law, same
    * oracle as the live form: the store is an implementation detail.
    */
  def qLmStore(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    graft.ops.LangModel.bigramNllScoreStored(docs, "doc_id", "text",
        lmStoreOnce(spark, dir))
      .orderBy("doc_id")
  }

  /** The shared persisted-LM commit (en slice in two batches plus a
    * crashed-commit retry) — q_lm_store scores against its counts,
    * q_oov_rate against its vocabulary; `storeOnce` makes whichever runs
    * first pay the commit.
    */
  private[queries] def lmStoreOnce(spark: SparkSession, dir: String): String = {
    val en = t(spark, dir, "documents").filter(col("lang") === "en")
    storeOnce(dir, "lmstore") { s =>
      graft.ops.RefStore.writeLmModel(
        en.filter(col("doc_id") % 2 === 0), "text", s)
      graft.ops.RefStore.mergeLmModel(
        en.filter(col("doc_id") % 2 =!= 0), "text", s, batchId = "b1")
      graft.ops.RefStore.mergeLmModel( // crashed-commit retry, same id
        en.filter(col("doc_id") % 2 =!= 0), "text", s, batchId = "b1")
    }
  }

  /** Out-of-vocabulary rate against the PERSISTED LM vocabulary
    * ([[graft.ops.Vocab.oovRate]] over [[graft.ops.RefStore.loadLmVocab]]):
    * per-document `n_tok` / `n_oov` / `oov_frac` vs the vocabulary the
    * lmstore family committed (distinct lowercased tokens of the en
    * slice — the exact law the LM trains with). The oracle rebuilds the
    * vocabulary in SQL from the same slice, so persistence, batching and
    * the crashed-commit retry are all invisible to the counts.
    */
  def qOovRate(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    graft.ops.Vocab.oovRateStored(docs, "doc_id", "text",
        lmStoreOnce(spark, dir))
      .orderBy("doc_id")
  }

  lazy val qOovRateSql: String = {
    val lowTok = tokensSqlOf("lower(text)")
    s"""WITH v AS (SELECT DISTINCT unnest($lowTok) AS tk
      |  FROM documents WHERE lang = 'en'),
      | dt AS (SELECT doc_id, unnest($lowTok) AS tk FROM documents),
      | agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
      |   CAST(COUNT(CASE WHEN v.tk IS NULL THEN 1 END) AS BIGINT) AS n_oov
      |  FROM dt LEFT JOIN v USING (tk) GROUP BY doc_id)
      | SELECT d.doc_id,
      |  COALESCE(a.n_tok, 0) AS n_tok,
      |  COALESCE(a.n_oov, 0) AS n_oov,
      |  CASE WHEN COALESCE(a.n_tok, 0) > 0
      |       THEN CAST(a.n_oov AS DOUBLE) / CAST(a.n_tok AS DOUBLE)
      |       ELSE 0.0 END AS oov_frac
      | FROM documents d LEFT JOIN agg a USING (doc_id)
      | ORDER BY doc_id""".stripMargin.replace("\n", " ")
  }

  /** Same law as q_lm_score: the store is an implementation detail. */
  lazy val qLmStoreSql: String = qLmScoreSql

  /** Pearson correlation between document metrics — the corpus-analytics
    * sanity panel ("does length track tokens? do syllables?"): all five
    * moment sums are EXACT (BIGINT row products summed in DECIMAL(38,0) /
    * HUGEINT, so batching cannot reorder anything), and r is rendered by
    * a fixed chain of IEEE ops (two sqrts, one divide) both engines
    * evaluate identically. Metrics: n_chars (table column), n_words
    * (shared token law), n_syllables ([[graft.functions.TextFns
    * .fleschScala]] vowel-group law). Zero-variance pairs read 0.0 by law.
    */
  def qMetricCorr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dec = "decimal(38,0)"
    // NULL-n_chars rows are excluded from the panel BY LAW (the corpus
    // model allows them — the q_length_buckets precedent) — the same
    // filter on both engines, so n and every moment agree
    val m = t(spark, dir, "documents")
      .filter(col("n_chars").isNotNull)
      .select(col("n_chars").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (chars, text) =>
        val f = graft.functions.TextFns.fleschScala(text)
        (chars, f.nWords, f.nSyllables)
      })
      .toDF("x", "y", "z")
    // each operand casts to DECIMAL(38,0) BEFORE the multiply (the
    // tvAgainstCounts discipline; the oracle's HUGEINT products) — an
    // int64 row product would silently wrap for n_chars past ~3e9
    def s(c: org.apache.spark.sql.Column) = sum(c)
    def p(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      sum(a.cast(dec) * b.cast(dec))
    val a = m.agg(
      count(lit(1)).as("n"),
      s(col("x").cast(dec)).as("sx"), s(col("y").cast(dec)).as("sy"),
      s(col("z").cast(dec)).as("sz"),
      p(col("x"), col("x")).as("sxx"), p(col("y"), col("y")).as("syy"),
      p(col("z"), col("z")).as("szz"),
      p(col("x"), col("y")).as("sxy"), p(col("x"), col("z")).as("sxz"),
      p(col("y"), col("z")).as("syz"))
    def r(sab: org.apache.spark.sql.Column, sa: org.apache.spark.sql.Column,
        sb: org.apache.spark.sql.Column, saa: org.apache.spark.sql.Column,
        sbb: org.apache.spark.sql.Column) = {
      val n = col("n").cast(dec)
      val num = (n * sab - sa * sb).cast("double")
      val va = (n * saa - sa * sa).cast("double")
      val vb = (n * sbb - sb * sb).cast("double")
      when(va === 0.0 || vb === 0.0, lit(0.0))
        .otherwise(num / (sqrt(va) * sqrt(vb)))
    }
    a.select(col("n").cast("long").as("n"),
        r(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy")).as("chars_words"),
        r(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz")).as("chars_syllables"),
        r(col("syz"), col("sy"), col("sz"), col("syy"), col("szz")).as("words_syllables"))
      .selectExpr("stack(3, 'chars_words', chars_words, " +
        "'chars_syllables', chars_syllables, " +
        "'words_syllables', words_syllables) AS (metric_pair, r)", "n")
      .select(col("metric_pair"), col("n"), col("r"))
      .orderBy("metric_pair")
  }

  lazy val qMetricCorrSql: String = {
    def rx(sab: String, sa: String, sb: String, saa: String, sbb: String) =
      s"""CASE WHEN CAST(n * $saa - $sa * $sa AS DOUBLE) = 0.0
        |  OR CAST(n * $sbb - $sb * $sb AS DOUBLE) = 0.0 THEN 0.0
        | ELSE CAST(n * $sab - $sa * $sb AS DOUBLE)
        |  / (sqrt(CAST(n * $saa - $sa * $sa AS DOUBLE))
        |     * sqrt(CAST(n * $sbb - $sb * $sb AS DOUBLE))) END""".stripMargin
    s"""WITH d AS (SELECT CAST(n_chars AS BIGINT) AS x,
      |   CAST(len($tokensSql) AS BIGINT) AS y,
      |   (SELECT CAST(COALESCE(SUM(greatest(1,
      |      len(regexp_extract_all(tk.t, '[aeiouyAEIOUY]+')))), 0) AS BIGINT)
      |    FROM unnest($tokensSql) AS tk(t)) AS z
      |  FROM documents WHERE n_chars IS NOT NULL),
      | a AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
      |   SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
      |   SUM(CAST(z AS HUGEINT)) AS sz,
      |   SUM(CAST(x AS HUGEINT) * x) AS sxx, SUM(CAST(y AS HUGEINT) * y) AS syy,
      |   SUM(CAST(z AS HUGEINT) * z) AS szz,
      |   SUM(CAST(x AS HUGEINT) * y) AS sxy, SUM(CAST(x AS HUGEINT) * z) AS sxz,
      |   SUM(CAST(y AS HUGEINT) * z) AS syz
      |  FROM d)
      | SELECT metric_pair, CAST(n AS BIGINT) AS n, r FROM (
      |  SELECT n, 'chars_words' AS metric_pair, ${rx("sxy", "sx", "sy", "sxx", "syy")} AS r FROM a
      |  UNION ALL
      |  SELECT n, 'chars_syllables', ${rx("sxz", "sx", "sz", "sxx", "szz")} FROM a
      |  UNION ALL
      |  SELECT n, 'words_syllables', ${rx("syz", "sy", "sz", "syy", "szz")} FROM a)
      | ORDER BY metric_pair""".stripMargin.replace("\n", " ")
  }

  /** N-gram novelty — the memorization/boilerplate signal: per document,
    * the fraction of its DISTINCT word-3-gram shingles that occur in no
    * other document (corpus-wide frequency 1). Low novelty = the document
    * is assembled from corpus-common passages (template/boilerplate); high
    * = genuinely unique text. The chop is ONE object-boundary pass (the
    * shingleHashFrame idiom); the corpus frequency comes from a count-only
    * window over the single shingle-keyed exchange rather than a
    * freq-table self-join, so the pass never re-executes (the RAKE
    * one-pass lesson). Trade-off, stated: a shingle shared by K docs
    * buffers a K-row window group — boilerplate mega-shingles spill
    * rather than skew-kill a hash agg; corpora where that dominates
    * should pre-screen with the dedup family first.
    */
  def qShingleNovelty(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = t(spark, dir, "documents")
    val sh = docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, t) =>
        val tk = graft.functions.TextFns.tokensScala(t)
        if (tk.length < 3) Iterator.empty
        else (0 to tk.length - 3).iterator
          .map(i => tk(i) + " " + tk(i + 1) + " " + tk(i + 2))
          .toSet.iterator.map((s: String) => (id, s))
      })
      .toDF("_id", "_sh")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("_sh")
    val per = sh
      .withColumn("_ndocs", count(lit(1)).over(w))
      .groupBy("_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("_ndocs") === 1, 1)).as("n_unique"))
    docs.select(col("doc_id").cast("long").as("doc_id"))
      .join(per, col("doc_id") === col("_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        when(coalesce(col("n_shingles"), lit(0L)) > 0,
          col("n_unique").cast("double") / col("n_shingles").cast("double"))
          .otherwise(lit(0.0)).as("novelty_frac"))
      .orderBy("doc_id")
  }

  lazy val qShingleNoveltySql: String =
    s"""WITH toks AS (SELECT doc_id, $tokensSql AS tk FROM documents),
      | sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |   generate_series(1, len(tk) - 2),
      |   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS s
      |  FROM toks WHERE len(tk) >= 3),
      | f AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY s) AS ndocs FROM sh),
      | per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
      |   CAST(COUNT(CASE WHEN ndocs = 1 THEN 1 END) AS BIGINT) AS n_unique
      |  FROM f GROUP BY 1)
      | SELECT d.doc_id,
      |  COALESCE(p.n_shingles, 0) AS n_shingles,
      |  COALESCE(p.n_unique, 0) AS n_unique,
      |  CASE WHEN COALESCE(p.n_shingles, 0) > 0
      |       THEN CAST(p.n_unique AS DOUBLE) / CAST(p.n_shingles AS DOUBLE)
      |       ELSE 0.0 END AS novelty_frac
      | FROM documents d LEFT JOIN per p USING (doc_id)
      | ORDER BY d.doc_id""".stripMargin.replace("\n", " ")

  /** Per-window language consistency — the code-switching / mixed-language
    * detector monolingual training pipelines gate on: classify each
    * 50-token window with the [[graft.functions.TextFns.langIdCascade]]
    * law and report the fraction of windows disagreeing with the
    * document's own whole-text classification. All counts are exact
    * integers; `mix_frac` is one division. One object-boundary pass per
    * document (windows never leave the closure); the oracle replays the
    * cascade over DuckDB list slices with the same stopword sets.
    */
  def qLangMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val W = 50
    t(spark, dir, "documents").select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        import graft.functions.TextFns._
        val toks = tokensScala(text)
        val low = toks.map(_.toLowerCase(java.util.Locale.ROOT))
        val docLang = langIdCascade(low, toks.exists(hasCjkScala))
        val nw = if (toks.isEmpty) 0 else (toks.length + W - 1) / W
        var mixed = 0
        var i = 0
        while (i < nw) {
          val sl = low.slice(i * W, math.min(toks.length, (i + 1) * W))
          if (langIdCascade(sl, sl.exists(hasCjkScala)) != docLang) mixed += 1
          i += 1
        }
        (id, docLang, nw.toLong, mixed.toLong,
          if (nw > 0) mixed.toDouble / nw.toDouble else 0.0)
      })
      .toDF("doc_id", "lang_pred", "n_windows", "n_mixed", "mix_frac")
      .orderBy("doc_id")
  }

  lazy val qLangMixSql: String = {
    def inList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")
    import graft.functions.TextFns._
    // the cascade over a bound token-list variable `L` (pre-lowered)
    def cascade(l: String): String = {
      def hits(ws: Seq[String]) = s"len(list_filter($l, t -> t IN (${inList(ws)})))"
      val (en, de, es, fr) =
        (hits(enStopwords), hits(deStopwords), hits(esStopwords), hits(frStopwords))
      s"""CASE WHEN regexp_matches(array_to_string($l, ' '), '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
        | WHEN $en = 0 AND $de = 0 AND $es = 0 AND $fr = 0 THEN 'und'
        | WHEN $en >= $de AND $en >= $es AND $en >= $fr THEN 'en'
        | WHEN $de >= $es AND $de >= $fr THEN 'de'
        | WHEN $es >= $fr THEN 'es'
        | ELSE 'fr' END""".stripMargin
    }
    s"""WITH d AS (SELECT doc_id, list_transform($tokensSql, t -> lower(t)) AS lt
      |  FROM documents),
      | dl AS (SELECT doc_id, lt, len(lt) AS n, ${cascade("lt")} AS lang_pred FROM d),
      | w AS (SELECT doc_id, lang_pred, n,
      |   unnest(generate_series(0, CAST(ceil(CAST(n AS DOUBLE) / 50.0) AS BIGINT) - 1)) AS i, lt
      |  FROM dl WHERE n > 0),
      | wl AS (SELECT doc_id, lang_pred,
      |   ${cascade("lt[i * 50 + 1 : least(n, (i + 1) * 50)]")} AS wlang FROM w),
      | per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
      |   CAST(COUNT(CASE WHEN wlang <> lang_pred THEN 1 END) AS BIGINT) AS n_mixed
      |  FROM wl GROUP BY 1)
      | SELECT dl.doc_id, dl.lang_pred,
      |  COALESCE(p.n_windows, 0) AS n_windows,
      |  COALESCE(p.n_mixed, 0) AS n_mixed,
      |  CASE WHEN COALESCE(p.n_windows, 0) > 0
      |       THEN CAST(p.n_mixed AS DOUBLE) / CAST(p.n_windows AS DOUBLE)
      |       ELSE 0.0 END AS mix_frac
      | FROM dl LEFT JOIN per p USING (doc_id)
      | ORDER BY dl.doc_id""".stripMargin.replace("\n", " ")
  }

  /** Lexical diversity — type-token ratio and hapax-legomenon fraction,
    * the word-level complement of [[qCharDiversity]]'s code-point Simpson
    * index (low TTR = repetitive/template text; high hapax = open
    * vocabulary). Exact integer counts from one object-boundary pass; two
    * single divisions render the ratios.
    */
  def qLexicalDiversity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents").select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val toks = graft.functions.TextFns.tokensScala(text)
        val n = toks.length.toLong
        val freq = new java.util.HashMap[String, Long]()
        toks.foreach(t => freq.merge(t, 1L, _ + _))
        var hapax = 0L
        freq.forEach((_, c) => if (c == 1L) hapax += 1)
        val types = freq.size.toLong
        (id, n, types, hapax,
          if (n > 0) types.toDouble / n.toDouble else 0.0,
          if (n > 0) hapax.toDouble / n.toDouble else 0.0)
      })
      .toDF("doc_id", "n_tokens", "n_types", "n_hapax", "ttr", "hapax_frac")
      .orderBy("doc_id")
  }

  lazy val qLexicalDiversitySql: String =
    s"""WITH d AS (SELECT doc_id, $tokensSql AS tk FROM documents),
      | tc AS (SELECT doc_id, t, COUNT(*) AS c
      |  FROM (SELECT doc_id, unnest(tk) AS t FROM d) GROUP BY 1, 2),
      | agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |   CAST(COUNT(*) AS BIGINT) AS n_types,
      |   CAST(COUNT(CASE WHEN c = 1 THEN 1 END) AS BIGINT) AS n_hapax
      |  FROM tc GROUP BY 1)
      | SELECT d.doc_id,
      |  COALESCE(a.n_tokens, 0) AS n_tokens,
      |  COALESCE(a.n_types, 0) AS n_types,
      |  COALESCE(a.n_hapax, 0) AS n_hapax,
      |  CASE WHEN COALESCE(a.n_tokens, 0) > 0
      |       THEN CAST(a.n_types AS DOUBLE) / CAST(a.n_tokens AS DOUBLE)
      |       ELSE 0.0 END AS ttr,
      |  CASE WHEN COALESCE(a.n_tokens, 0) > 0
      |       THEN CAST(a.n_hapax AS DOUBLE) / CAST(a.n_tokens AS DOUBLE)
      |       ELSE 0.0 END AS hapax_frac
      | FROM d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id""".stripMargin.replace("\n", " ")

  /** Unicode script mix — per-document code-point class counts (Latin
    * letters, CJK ideographs, Cyrillic, digits, whitespace, other) and the
    * Latin fraction of letter-bearing content: the script-consistency
    * signal language filters gate on before tokenization even applies.
    * Exact integer counts over CODE POINTS (surrogate pairs counted once);
    * one division renders the fraction.
    */
  def qScriptMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents").select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val s = if (text == null) "" else text
        var latin = 0L; var cjk = 0L; var cyr = 0L; var digit = 0L
        var ws = 0L; var other = 0L
        var i = 0
        while (i < s.length) {
          val cp = s.codePointAt(i)
          if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) latin += 1
          else if (cp >= 0x4e00 && cp <= 0x9fff) cjk += 1
          else if (cp >= 0x0400 && cp <= 0x04ff) cyr += 1
          else if (cp >= '0' && cp <= '9') digit += 1
          else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r') ws += 1
          else other += 1
          i += Character.charCount(cp)
        }
        val letters = latin + cjk + cyr
        (id, latin, cjk, cyr, digit, ws, other,
          if (letters > 0) latin.toDouble / letters.toDouble else 0.0)
      })
      .toDF("doc_id", "n_latin", "n_cjk", "n_cyrillic", "n_digit",
        "n_space", "n_other", "latin_frac")
      .orderBy("doc_id")
  }

  lazy val qScriptMixSql: String = {
    def cls(re: String) =
      s"CAST(length(regexp_replace(t, '[^$re]', '', 'g')) AS BIGINT)"
    s"""WITH d AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents),
      | c AS (SELECT doc_id,
      |   ${cls("A-Za-z")} AS n_latin,
      |   ${cls("\\x{4e00}-\\x{9fff}")} AS n_cjk,
      |   ${cls("\\x{0400}-\\x{04ff}")} AS n_cyrillic,
      |   ${cls("0-9")} AS n_digit,
      |   ${cls(" \\t\\n\\r")} AS n_space,
      |   CAST(length(t) AS BIGINT) AS n_all
      |  FROM d)
      | SELECT doc_id, n_latin, n_cjk, n_cyrillic, n_digit, n_space,
      |  n_all - n_latin - n_cjk - n_cyrillic - n_digit - n_space AS n_other,
      |  CASE WHEN n_latin + n_cjk + n_cyrillic > 0
      |       THEN CAST(n_latin AS DOUBLE)
      |         / CAST(n_latin + n_cjk + n_cyrillic AS DOUBLE)
      |       ELSE 0.0 END AS latin_frac
      | FROM c ORDER BY doc_id""".stripMargin.replace("\n", " ")
  }

  /** Line-shape panel — the Gopher line rules (Rae et al. 2021, Table A1)
    * not expressible from whole-document stats: fractions of lines that
    * start with a bullet glyph, end with an ellipsis, are very short
    * (≤ 2 tokens), or are blank — plus the composite pass flag
    * (bullet ≤ 0.9 ∧ ellipsis ≤ 0.3, the published thresholds). Lines
    * split on `\n` (the [[qC4Clean]] law); every fraction is an exact
    * integer pair rendered by one double division; the flag compares
    * doubles both engines computed identically.
    */
  def qLineShapes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents").select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val s = if (text == null) "" else text
        val lines = s.split("\n", -1)
        val n = lines.length.toLong
        var bullet = 0L; var ellipsis = 0L; var short = 0L; var blank = 0L
        lines.foreach { l =>
          val t = l.replaceAll("^\\s+|\\s+$", "")
          if (t.isEmpty) blank += 1
          else {
            if (t.startsWith("-") || t.startsWith("*") || t.startsWith("•")) bullet += 1
            if (t.endsWith("...") || t.endsWith("…")) ellipsis += 1
            if (graft.functions.TextFns.tokensScala(t).length <= 2) short += 1
          }
        }
        val bf = bullet.toDouble / n.toDouble
        val ef = ellipsis.toDouble / n.toDouble
        (id, n, bullet, ellipsis, short, blank, bf, ef,
          bf <= 0.9 && ef <= 0.3)
      })
      .toDF("doc_id", "n_lines", "n_bullet", "n_ellipsis", "n_short",
        "n_blank", "bullet_frac", "ellipsis_frac", "line_pass")
      .orderBy("doc_id")
  }

  lazy val qLineShapesSql: String = {
    // one line's trimmed form, shared by every class test
    val trim = "regexp_replace(l, '^\\s+|\\s+$', '', 'g')"
    s"""WITH d AS (SELECT doc_id, string_split(COALESCE(text, ''), chr(10)) AS lines
      |   FROM documents),
      | lc AS (SELECT doc_id, $trim AS t
      |  FROM (SELECT doc_id, unnest(lines) AS l FROM d)),
      | agg AS (SELECT doc_id,
      |   CAST(COUNT(*) AS BIGINT) AS n_lines,
      |   CAST(COUNT(CASE WHEN t <> '' AND (t LIKE '-%' OR t LIKE '*%'
      |     OR t LIKE '${"•"}%') THEN 1 END) AS BIGINT) AS n_bullet,
      |   CAST(COUNT(CASE WHEN t <> '' AND (t LIKE '%...'
      |     OR t LIKE '%${"…"}') THEN 1 END) AS BIGINT) AS n_ellipsis,
      |   CAST(COUNT(CASE WHEN t <> '' AND len(${tokensSqlOf("t")}) <= 2
      |     THEN 1 END) AS BIGINT) AS n_short,
      |   CAST(COUNT(CASE WHEN t = '' THEN 1 END) AS BIGINT) AS n_blank
      |  FROM lc GROUP BY 1)
      | SELECT doc_id, n_lines, n_bullet, n_ellipsis, n_short, n_blank,
      |  CAST(n_bullet AS DOUBLE) / CAST(n_lines AS DOUBLE) AS bullet_frac,
      |  CAST(n_ellipsis AS DOUBLE) / CAST(n_lines AS DOUBLE) AS ellipsis_frac,
      |  (CAST(n_bullet AS DOUBLE) / CAST(n_lines AS DOUBLE) <= 0.9
      |   AND CAST(n_ellipsis AS DOUBLE) / CAST(n_lines AS DOUBLE) <= 0.3) AS line_pass
      | FROM agg ORDER BY doc_id""".stripMargin.replace("\n", " ")
  }

  /** PMI collocations ([[graft.ops.Collocations.pmiTop]], Church & Hanks
    * 1990): top-25 adjacent pairs by micro-quantized pointwise mutual
    * information — the ln-of-exact-integers chain in lockstep on both
    * engines, ranking compared as exact BIGINTs.
    */
  def qPmiCollocations(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Collocations.pmiTop(t(spark, dir, "documents"), "text")

  lazy val qPmiCollocationsSql: String =
    s"""WITH t AS (SELECT ${tokensSqlOf("lower(text)")} AS tks FROM documents),
      | bi AS (SELECT tks[i] AS w1, tks[i + 1] AS w2
      |  FROM (SELECT tks, unnest(range(1, len(tks))) AS i FROM t)),
      | c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bi GROUP BY 1, 2),
      | uni AS (SELECT u AS w, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM (SELECT unnest(tks) AS u FROM t) GROUP BY 1),
      | np AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM bi),
      | nu AS (SELECT CAST(SUM(c) AS BIGINT) AS nu FROM uni)
      | SELECT c12.w1, c12.w2, c12.c12,
      |  CAST(round((((((ln(CAST(c12.c12 AS DOUBLE)) + ln(CAST(nu.nu AS DOUBLE)))
      |    + ln(CAST(nu.nu AS DOUBLE))) - ln(CAST(np.np AS DOUBLE)))
      |    - ln(CAST(u1.c AS DOUBLE))) - ln(CAST(u2.c AS DOUBLE)))
      |    * 1000000.0) AS BIGINT) AS pmi_micro
      | FROM c12 JOIN uni u1 ON u1.w = c12.w1 JOIN uni u2 ON u2.w = c12.w2
      | CROSS JOIN np CROSS JOIN nu
      | WHERE c12.c12 >= 5
      | ORDER BY pmi_micro DESC, w1, w2 LIMIT 25""".stripMargin.replace("\n", " ")

  /** Flesch readability ([[graft.functions.TextFns.fleschScala]]): three
    * exact integer counts (words, sentence-punctuation runs, vowel-group
    * syllables) and the two classic formulas evaluated left-to-right on
    * both engines — so even the doubles hash-match.
    */
  def qReadability(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents").select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val f = graft.functions.TextFns.fleschScala(text)
        (id, f.nWords, f.nSentences, f.nSyllables, f.flesch, f.fkGrade)
      })
      .toDF("doc_id", "n_words", "n_sentences", "n_syllables", "flesch", "fk_grade")
      .orderBy("doc_id")
  }

  lazy val qReadabilitySql: String =
    s"""WITH d AS (SELECT doc_id, COALESCE(text, '') AS text, $tokensSql AS tks
      |   FROM documents),
      | syl AS (SELECT doc_id, CAST(COALESCE(SUM(greatest(1,
      |     len(regexp_extract_all(tk, '[aeiouyAEIOUY]+')))), 0) AS BIGINT) AS n_syll
      |  FROM (SELECT doc_id, unnest(tks) AS tk FROM d) GROUP BY 1),
      | base AS (SELECT d.doc_id,
      |   CAST(len(d.tks) AS BIGINT) AS n_words,
      |   CAST(len(regexp_extract_all(d.text, '[.!?]+')) AS BIGINT) AS n_sentences,
      |   COALESCE(s.n_syll, 0) AS n_syllables
      |  FROM d LEFT JOIN syl s USING (doc_id))
      | SELECT doc_id, n_words, n_sentences,
      |  CASE WHEN n_words = 0 THEN 0 ELSE n_syllables END AS n_syllables,
      |  CASE WHEN n_words = 0 THEN 0.0
      |       ELSE 206.835
      |         - 1.015 * (CAST(n_words AS DOUBLE) / CAST(greatest(1, n_sentences) AS DOUBLE))
      |         - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) END AS flesch,
      |  CASE WHEN n_words = 0 THEN 0.0
      |       ELSE 0.39 * (CAST(n_words AS DOUBLE) / CAST(greatest(1, n_sentences) AS DOUBLE))
      |         + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
      |         - 15.59 END AS fk_grade
      | FROM base ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** Gopher-rule quality signals ([[graft.functions.TextFns.gopherScala]]):
    * duplicate-line fractions, top-n-gram character coverage, word-shape
    * metrics, and the composite pass flag — the web-scale pretraining
    * filter family. Every ratio is an exact integer pair rendered by ONE
    * double division on both engines (no libm), so all eight metrics and
    * the boolean hash-match.
    */
  def qGopherQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents").select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val g = graft.functions.TextFns.gopherScala(text)
        (id, g.nTokens, g.nLines, g.dupLineFrac, g.dupLineCharFrac,
          g.top2CharFrac, g.top3CharFrac, g.meanWordLen, g.alphaWordFrac,
          g.gopherPass)
      })
      .toDF("doc_id", "n_tokens", "n_lines", "dup_line_frac",
        "dup_line_char_frac", "top2_char_frac", "top3_char_frac",
        "mean_word_len", "alpha_word_frac", "gopher_pass")
      .orderBy("doc_id")
  }

  lazy val qGopherQualitySql: String =
    s"""WITH d AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
       | tk AS (SELECT doc_id, $tokensSql AS toks FROM d),
       | tstat AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |   CAST(COALESCE(list_sum(list_transform(toks, t -> length(t))), 0) AS BIGINT) AS sum_tok_chars,
       |   CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha
       |  FROM tk),
       | ls AS (SELECT doc_id, length(text) AS text_chars FROM d),
       | lu AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM d),
       | lg AS (SELECT doc_id, COUNT(*) AS cnt, length(line) AS llen FROM lu GROUP BY doc_id, line),
       | lstat AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_lines,
       |   CAST(COUNT(*) AS BIGINT) AS n_distinct_lines,
       |   CAST(SUM((cnt-1)*llen) AS BIGINT) AS dup_line_chars,
       |   CAST(SUM(cnt*llen) AS BIGINT) AS line_chars
       |  FROM lg GROUP BY doc_id),
       | g2 AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[])
       |   ELSE list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) END) AS gram FROM tk),
       | g2c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g2 GROUP BY doc_id, gram),
       | g2t AS (SELECT doc_id, cnt, glen FROM (SELECT doc_id, cnt, length(gram) AS glen,
       |   row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram) AS rn FROM g2c) WHERE rn = 1),
       | g3 AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
       |   ELSE list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS gram FROM tk),
       | g3c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g3 GROUP BY doc_id, gram),
       | g3t AS (SELECT doc_id, cnt, glen FROM (SELECT doc_id, cnt, length(gram) AS glen,
       |   row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram) AS rn FROM g3c) WHERE rn = 1)
       | SELECT d.doc_id, t.n_tokens, l.n_lines,
       |  1.0 - CAST(l.n_distinct_lines AS DOUBLE)/CAST(l.n_lines AS DOUBLE) AS dup_line_frac,
       |  CASE WHEN l.line_chars = 0 THEN 0.0
       |       ELSE CAST(l.dup_line_chars AS DOUBLE)/CAST(l.line_chars AS DOUBLE) END AS dup_line_char_frac,
       |  CASE WHEN g2t.cnt IS NULL OR ls.text_chars = 0 THEN 0.0
       |       ELSE least(1.0, CAST(g2t.cnt*g2t.glen AS DOUBLE)/CAST(ls.text_chars AS DOUBLE)) END AS top2_char_frac,
       |  CASE WHEN g3t.cnt IS NULL OR ls.text_chars = 0 THEN 0.0
       |       ELSE least(1.0, CAST(g3t.cnt*g3t.glen AS DOUBLE)/CAST(ls.text_chars AS DOUBLE)) END AS top3_char_frac,
       |  CASE WHEN t.n_tokens = 0 THEN 0.0
       |       ELSE CAST(t.sum_tok_chars AS DOUBLE)/CAST(t.n_tokens AS DOUBLE) END AS mean_word_len,
       |  CASE WHEN t.n_tokens = 0 THEN 0.0
       |       ELSE CAST(t.n_alpha AS DOUBLE)/CAST(t.n_tokens AS DOUBLE) END AS alpha_word_frac,
       |  (t.n_tokens >= 50 AND t.n_tokens <= 100000
       |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
       |   AND dup_line_frac <= 0.30 AND top2_char_frac <= 0.20
       |   AND alpha_word_frac >= 0.80) AS gopher_pass
       | FROM d JOIN tstat t USING (doc_id) JOIN lstat l USING (doc_id)
       |  JOIN ls USING (doc_id)
       |  LEFT JOIN g2t USING (doc_id) LEFT JOIN g3t USING (doc_id)
       | ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** Rule-based language ID (CJK charset, stopword argmax). */
  def qLangId(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(
      col("doc_id"), graft.functions.TextFns.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  lazy val qLangIdSql: String = {
    import graft.functions.TextFns._
    val (en, de, es, fr) =
      (hitsSql(enStopwords), hitsSql(deStopwords), hitsSql(esStopwords), hitsSql(frStopwords))
    s"""SELECT doc_id, CASE
       | WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
       | WHEN $en = 0 AND $de = 0 AND $es = 0 AND $fr = 0 THEN 'und'
       | WHEN $en >= $de AND $en >= $es AND $en >= $fr THEN 'en'
       | WHEN $de >= $es AND $de >= $fr THEN 'de'
       | WHEN $es >= $fr THEN 'es'
       | ELSE 'fr' END AS lang_pred
       | FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " ")
  }

  /** Quality gate: the filter stage of a training-data pipeline. Same
    * one-pass mapPartitions form as [[qTextStats]] — the filter context made
    * the expression form worst-case (Catalyst duplicated the inlined token
    * pipeline ~4× per row; 2.25 s vs 0.60 s at sf0.1 in BENCH_r01).
    */
  def qQualityFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id").cast("long"), col("lang"), col("n_chars").cast("long"), col("text"))
      .as[(Long, String, Long, String)]
      .mapPartitions(_.flatMap { case (id, lang, nChars, text) =>
        val s = graft.functions.TextFns.statsScala(text)
        if (s.nTokens >= 20 && s.nTokens <= 1000 && s.quality >= 0.5)
          Iterator.single((id, lang, nChars))
        else Iterator.empty
      })
      .toDF("doc_id", "lang", "n_chars")
      .orderBy("doc_id")
  }

  lazy val qQualityFilterSql: String =
    s"""SELECT doc_id, lang, n_chars FROM documents
       | WHERE $nTokensSqlExpr BETWEEN 20 AND 1000 AND $qualitySqlExpr >= 0.5
       | ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** Corpus vocabulary head: top-25 tokens by document frequency (exact
    * integer counts — no float scoring, so fully hash-oracleable; token
    * ties break lexicographically). Per-doc distinct tokens explode at an
    * object boundary, then one hash-aggregate shuffle + TakeOrderedAndProject
    * — the vocabulary-stats pass a tokenizer-training pipeline runs.
    */
  def qVocabTop(spark: SparkSession, dir: String): DataFrame =
    vocabDocFreq(spark, dir)
      .orderBy(col("doc_freq").desc, col("token"))
      .limit(25)

  /** Full (token, doc_freq) table behind [[qVocabTop]] — also the plateau
    * probe's surface.
    */
  private[queries] def vocabDocFreq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id").cast("long").as("_id"), col("text").cast("string").as("_t"))
      .as[(Long, String)]
      .flatMap { case (_, t) =>
        graft.functions.TextFns.tokensScala(if (t == null) "" else t).distinct.iterator
      }
      .toDF("token")
      .groupBy("token").agg(count(lit(1)).as("doc_freq"))
  }

  lazy val qVocabTopSql: String =
    s"""WITH toks AS (SELECT doc_id, $tokensSql AS tk FROM documents),
      | ex AS (SELECT DISTINCT doc_id, unnest(tk) AS token FROM toks)
      | SELECT token, count(*) AS doc_freq FROM ex GROUP BY token
      | ORDER BY doc_freq DESC, token LIMIT 25""".stripMargin.replace("\n", " ")

  /** Corpus token-length histogram (training-mix statistics): docs and
    * total tokens per 10-token bucket. Bucket arithmetic is `n - n % 10`
    * on both sides — no division-rounding dialect trap.
    */
  def qTokenHistogram(spark: SparkSession, dir: String): DataFrame = {
    val n = graft.functions.TextFns.tokenCount(col("text"))
    t(spark, dir, "documents")
      .select((n - n % 10).as("bucket"), n.as("_n"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("_n")).as("total_tokens"))
      .orderBy("bucket")
  }

  lazy val qTokenHistogramSql: String =
    s"""WITH t AS (SELECT CAST(len($tokensSql) AS BIGINT) AS n FROM documents)
      | SELECT n - n % 10 AS bucket, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS total_tokens
      | FROM t GROUP BY 1 ORDER BY bucket""".stripMargin.replace("\n", " ")

  /** PII scrub: email/phone regex masking + per-doc match counts. The
    * synthetic corpus carries no natural PII, so both sides deterministically
    * weave a contact string (derived from doc_id arithmetic) into the text —
    * docs with doc_id % 5 == 0 stay untouched to exercise the zero-mask
    * path. The scrub itself is [[graft.ops.Scrub]]'s codegen'd expression
    * tree; the oracle applies the identical pattern strings (Java ∩ RE2
    * dialect subset) with DuckDB's regexp engine.
    */
  def qPiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id").cast("long")
    val contact = when(id % 5 === 0, col("text")).otherwise(concat(
      lit("reach user"), id.cast("string"), lit("@example.com or call "),
      (id % 900 + 100).cast("string"), lit("-"),
      (id * 7 % 900 + 100).cast("string"), lit("-"),
      (id * 13 % 9000 + 1000).cast("string"), lit(" "), col("text")))
    t(spark, dir, "documents")
      .select(id.as("doc_id"), contact.as("_c"))
      .select(col("doc_id"),
        graft.ops.Scrub.emailCount(col("_c")).cast("bigint").as("n_emails"),
        graft.ops.Scrub.phoneCount(col("_c")).cast("bigint").as("n_phones"),
        graft.ops.Scrub.maskPii(col("_c")).as("scrubbed"))
      .orderBy("doc_id")
  }

  lazy val qPiiScrubSql: String =
    """WITH c AS (
      | SELECT doc_id,
      |  CASE WHEN doc_id % 5 = 0 THEN text ELSE
      |   'reach user' || CAST(doc_id AS VARCHAR) || '@example.com or call ' ||
      |   CAST(doc_id % 900 + 100 AS VARCHAR) || '-' ||
      |   CAST(doc_id * 7 % 900 + 100 AS VARCHAR) || '-' ||
      |   CAST(doc_id * 13 % 9000 + 1000 AS VARCHAR) || ' ' || text END AS _c
      | FROM documents)
      | SELECT doc_id,
      |  CAST(len(regexp_extract_all(_c, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(_c, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS n_phones,
      |  regexp_replace(regexp_replace(_c, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |   '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g') AS scrubbed
      | FROM c ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** BPE-style adjacent-pair counting ([[graft.ops.Vocab.topPairCounts]]):
    * the corpus-wide most-frequent adjacent token pairs — the counting
    * round of tokenizer (BPE/WordPiece) vocabulary construction. Exact
    * multiset law over the shared tokens law, so counts AND the
    * deterministic tiebreak are in the hash compare.
    */
  def qBpePairs(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Vocab.topPairCounts(t(spark, dir, "documents"), "text", k = 25)

  lazy val qBpePairsSql: String =
    s"""WITH tk AS (SELECT $tokensSql AS toks FROM documents),
      | p AS (SELECT unnest(list_transform(range(1, len(toks)),
      |   i -> toks[i] || ' ' || toks[i + 1])) AS pair
      |  FROM tk WHERE len(toks) >= 2)
      | SELECT pair, COUNT(*) AS n FROM p GROUP BY 1
      | ORDER BY n DESC, pair LIMIT 25""".stripMargin.replace("\n", " ")

  /** BPE tokenizer train + encode, end-to-end oracled
    * ([[graft.ops.Vocab.trainBpeMerges]] / [[graft.ops.Vocab.encodeBpe]]):
    * merges are trained on the corpus's bounded word-frequency table
    * (driver-side deterministic loop, the IVF/PQ training discipline),
    * broadcast, and applied distributed. The TRAINED artifact can't be
    * replayed in SQL — but the encode's round-trip can: `stream_hash` is
    * the md5 of the DECODED symbol stream, which must equal the original
    * token-stream md5 for every document NO MATTER what merges were
    * learned. A wrong merge application, marker corruption, or lossy
    * encode breaks the hash; n_bpe_tokens compression is pinned by unit
    * tests (merge-count monotonicity) since it is merge-dependent.
    */
  def qBpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val merges = graft.ops.Vocab.trainBpeMerges(docs, "text", numMerges = 200)
    graft.ops.Vocab.encodeBpe(docs, "doc_id", "text", merges)
      .select(col("doc_id"), col("n_tokens"), col("stream_hash"))
      .orderBy("doc_id")
  }

  lazy val qBpeEncodeSql: String =
    s"""SELECT doc_id, $nTokensSqlExpr AS n_tokens,
      | md5(array_to_string($tokensSql, ' ')) AS stream_hash
      | FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** Per-source encoding-artifact report
    * ([[graft.functions.TextFns.replacementCharCount]] /
    * [[graft.functions.TextFns.controlCharCount]]): U+FFFD decode-failure
    * markers and C0/DEL control contamination — the mojibake/binary
    * screen an ingest pipeline runs per source before text reaches
    * training. Exact character-count laws (length difference), one hash
    * aggregate; fully oracled (clean testdata legitimately reports
    * zeros — the planted law lives in TextFnsSpec).
    */
  def qEncodingQuality(spark: SparkSession, dir: String): DataFrame = {
    val repl = graft.functions.TextFns.replacementCharCount(col("text"))
    val ctrl = graft.functions.TextFns.controlCharCount(col("text"))
    t(spark, dir, "documents")
      .filter(col("source").isNotNull)
      .groupBy(col("source").as("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(repl).as("n_repl"),
        sum(ctrl).as("n_ctrl"),
        sum(when(repl + ctrl > 0L, 1L).otherwise(0L)).as("n_affected"))
      .orderBy("stratum")
  }

  lazy val qEncodingQualitySql: String = {
    val repl = "COALESCE(length(text) - length(regexp_replace(text, chr(65533), '', 'g')), 0)"
    val ctrl = "COALESCE(length(text) - length(regexp_replace(text, " +
      "'[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g')), 0)"
    s"""SELECT source AS stratum, CAST(COUNT(*) AS BIGINT) AS n_docs,
      | CAST(SUM($repl) AS BIGINT) AS n_repl,
      | CAST(SUM($ctrl) AS BIGINT) AS n_ctrl,
      | CAST(SUM(CASE WHEN $repl + $ctrl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_affected
      | FROM documents WHERE source IS NOT NULL
      | GROUP BY 1 ORDER BY stratum""".stripMargin.replace("\n", " ")
  }

  /** Dunning G² keyness ([[graft.ops.Vocab.keynessG2]]) of the `lang='en'`
    * slice against the rest — top-40 over/under-represented tokens,
    * micro-quantized statistic, exact-integer enrichment direction.
    */
  def qKeyness(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Vocab.keynessG2(
        t(spark, dir, "documents"), "text", col("lang") === "en", k = 40)
      .orderBy(col("g2_micro").desc, col("token"))

  lazy val qKeynessSql: String = {
    val lowTok = tokensSqlOf("lower(text)")
    val ea = "((CAST(a + b AS DOUBLE) * CAST(na AS DOUBLE)) / CAST(na + nb AS DOUBLE))"
    val eb = "((CAST(a + b AS DOUBLE) * CAST(nb AS DOUBLE)) / CAST(na + nb AS DOUBLE))"
    s"""WITH tk AS (SELECT lang = 'en' AS fg, unnest($lowTok) AS token FROM documents),
      | c AS (SELECT token,
      |   CAST(COUNT(CASE WHEN fg THEN 1 END) AS BIGINT) AS a,
      |   CAST(COUNT(CASE WHEN NOT fg THEN 1 END) AS BIGINT) AS b
      |  FROM tk WHERE fg IS NOT NULL GROUP BY token),
      | t AS (SELECT CAST(COALESCE(SUM(a), 0) AS BIGINT) AS na,
      |   CAST(COALESCE(SUM(b), 0) AS BIGINT) AS nb FROM c),
      | g AS (SELECT token, a, b,
      |   CAST(round((2.0 * (
      |     (CASE WHEN a > 0 THEN CAST(a AS DOUBLE) * ln(CAST(a AS DOUBLE) / $ea) ELSE 0.0 END)
      |     + (CASE WHEN b > 0 THEN CAST(b AS DOUBLE) * ln(CAST(b AS DOUBLE) / $eb) ELSE 0.0 END)
      |   )) * 1000000.0) AS BIGINT) AS g2_micro,
      |   CAST(a AS HUGEINT) * CAST(nb AS HUGEINT)
      |     > CAST(b AS HUGEINT) * CAST(na AS HUGEINT) AS enriched
      |  FROM c CROSS JOIN t)
      | SELECT token, a, b, g2_micro, enriched FROM g
      | ORDER BY g2_micro DESC, token LIMIT 40""".stripMargin.replace("\n", " ")
  }

  /** Hourly burstiness (Fano factor — variance/mean of per-hour event
    * counts over OBSERVED hours; index of dispersion, the classic
    * Poisson-departure screen: ≈1 Poisson, ≫1 bursty/flash-crowd,
    * ≪1 metronomic/bot) per event type — the traffic-shape report an
    * ingest scheduler reads. Exact integer hour bins (floor-division
    * law) and count moments in DECIMAL(38,0); ONE fixed double chain.
    */
  def qBurstiness(spark: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val dec = "decimal(38,0)"
    val hb = t(spark, dir, "events")
      .filter(col("event_type").isNotNull && col("ts").isNotNull)
      .select(col("event_type"),
        expr(s"(unix_micros(ts) - pmod(unix_micros(ts), ${hourUs}L))" +
          s" div ${hourUs}L").as("_h"))
    val nD = col("n_hours").cast("double")
    val mean = col("n_events").cast("double") / nD
    val vr = col("_ss").cast("double") / nD - mean * mean
    hb.groupBy(col("event_type"), col("_h")).agg(count(lit(1)).as("_c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("_c")).as("n_events"),
        sum(col("_c").cast(dec) * col("_c").cast(dec)).as("_ss"))
      .withColumn("fano_micro",
        round(vr / mean * 1000000.0).cast("long"))
      .select(col("event_type"), col("n_hours"), col("n_events"),
        col("fano_micro"))
      .orderBy("event_type")
  }

  lazy val qBurstinessSql: String = {
    val us = 3600000000L
    s"""WITH hb AS (SELECT event_type,
      |   (epoch_us(ts) - (((epoch_us(ts) % $us) + $us) % $us)) // $us AS h
      |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
      | c AS (SELECT event_type, h, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM hb GROUP BY 1, 2),
      | a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
      |   CAST(SUM(c) AS BIGINT) AS n_events,
      |   CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ss FROM c GROUP BY 1)
      | SELECT event_type, n_hours, n_events,
      |  CAST(round((CAST(ss AS DOUBLE) / CAST(n_hours AS DOUBLE)
      |    - (CAST(n_events AS DOUBLE) / CAST(n_hours AS DOUBLE))
      |      * (CAST(n_events AS DOUBLE) / CAST(n_hours AS DOUBLE)))
      |   / (CAST(n_events AS DOUBLE) / CAST(n_hours AS DOUBLE))
      |   * 1000000.0) AS BIGINT) AS fano_micro
      | FROM a ORDER BY event_type""".stripMargin.replace("\n", " ")
  }

  /** Market-basket association rules over order baskets
    * ([[graft.ops.Collocations.associationRules]], Agrawal et al. '93):
    * top-25 part pairs by lift at min-support 3 baskets, basket cap 64
    * (the AA apex-cap posture). Exact counts, one double chain per
    * metric, total (lift desc, a, b) order.
    */
  def qAssocRules(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Collocations.associationRules(
      t(spark, dir, "lineitem")
        .select(col("l_orderkey").as("basket"),
          col("l_partkey").cast("long").as("item")),
      "basket", "item", k = 25, minCo = 3L, maxBasket = 64)

  lazy val qAssocRulesSql: String =
    """WITH bi AS (SELECT DISTINCT l_orderkey AS bk,
      |   CAST(l_partkey AS BIGINT) AS it FROM lineitem
      |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      | kept AS (SELECT bi.bk, bi.it FROM bi JOIN (
      |   SELECT bk FROM bi GROUP BY 1 HAVING COUNT(*) <= 64) s
      |  ON s.bk = bi.bk),
      | nb AS (SELECT CAST(COUNT(DISTINCT bk) AS BIGINT) AS n FROM kept),
      | ic AS (SELECT it, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM kept GROUP BY 1),
      | co AS (SELECT a.it AS item_a, b.it AS item_b,
      |   CAST(COUNT(*) AS BIGINT) AS co_baskets
      |  FROM kept a JOIN kept b ON b.bk = a.bk AND a.it < b.it
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
      | SELECT item_a, item_b, co_baskets, ca.cnt AS n_a, cb.cnt AS n_b,
      |  CAST(round(CAST(co_baskets AS DOUBLE) / CAST(nb.n AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS support_micro,
      |  CAST(round(CAST(co_baskets AS DOUBLE) / CAST(ca.cnt AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS conf_ab_micro,
      |  CAST(round(CAST(nb.n AS DOUBLE) * CAST(co_baskets AS DOUBLE)
      |    / (CAST(ca.cnt AS DOUBLE) * CAST(cb.cnt AS DOUBLE))
      |    * 1000000000000.0) AS BIGINT) AS lift_pico
      | FROM co JOIN ic ca ON ca.it = co.item_a
      | JOIN ic cb ON cb.it = co.item_b CROSS JOIN nb
      | ORDER BY lift_pico DESC, item_a, item_b LIMIT 25"""
      .stripMargin.replace("\n", " ")

  /** Tokenizer fertility per language ([[graft.ops.Vocab.tokenFertility]]):
    * chars and ceil(codepoints/4) subword pieces per whitespace token —
    * the multilingual token-budget table, exact counts + two divisions.
    */
  def qTokFertility(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Vocab.tokenFertility(t(spark, dir, "documents"), "lang", "text")
      .orderBy("stratum")

  lazy val qTokFertilitySql: String = {
    val nSubw = s"COALESCE(CAST(list_sum(list_transform($tokensSql, " +
      "tk -> CAST(ceil(CAST(length(tk) AS DOUBLE) / 4.0) AS BIGINT))) AS BIGINT), 0)"
    s"""SELECT lang AS stratum, CAST(COUNT(*) AS BIGINT) AS n_docs,
      | CAST(SUM(COALESCE(length(text), 0)) AS BIGINT) AS n_chars,
      | CAST(SUM($nTokensSqlExpr) AS BIGINT) AS n_tokens,
      | CAST(SUM($nSubw) AS BIGINT) AS n_subwords,
      | CASE WHEN SUM($nTokensSqlExpr) > 0 THEN
      |  CAST(SUM(COALESCE(length(text), 0)) AS DOUBLE)
      |   / CAST(SUM($nTokensSqlExpr) AS DOUBLE) END AS chars_per_token,
      | CASE WHEN SUM($nTokensSqlExpr) > 0 THEN
      |  CAST(SUM($nSubw) AS DOUBLE)
      |   / CAST(SUM($nTokensSqlExpr) AS DOUBLE) END AS subwords_per_token
      | FROM documents WHERE lang IS NOT NULL
      | GROUP BY lang ORDER BY stratum""".stripMargin.replace("\n", " ")
  }

  /** T5-style span-corruption plan ([[graft.ops.Packing.maskSpans]]):
    * stratified, hash-jittered, non-overlapping spanLen=3 spans covering
    * ~15% of tokens — pure integer/md5 law, fully oracle-replayed.
    */
  def qMaskSpans(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Packing.maskSpans(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id", "span_idx")

  lazy val qMaskSpansSql: String = {
    s"""WITH base AS (SELECT doc_id, CAST(len($tokensSql) AS BIGINT) AS n_tokens
      |  FROM documents),
      | sp AS (SELECT doc_id, n_tokens, (n_tokens * 15) // 300 AS n_spans FROM base),
      | f AS (SELECT doc_id, n_tokens, n_spans, n_tokens // n_spans AS stratum
      |  FROM sp WHERE n_spans >= 1),
      | e AS (SELECT doc_id, n_tokens, n_spans, stratum,
      |   unnest(range(0, n_spans)) AS span_idx FROM f),
      | h AS (SELECT doc_id, n_tokens, n_spans, stratum, span_idx,
      |   md5(CAST(doc_id AS VARCHAR) || '_' || CAST(span_idx AS VARCHAR)) AS m
      |  FROM e)
      | SELECT doc_id, n_tokens, n_spans, CAST(span_idx AS BIGINT) AS span_idx,
      |  CAST(span_idx * stratum + (4096 * ${nibSql(1)} + 256 * ${nibSql(2)}
      |    + 16 * ${nibSql(3)} + ${nibSql(4)}) % (stratum - 2) AS BIGINT) AS start_tok,
      |  CAST(span_idx * stratum + (4096 * ${nibSql(1)} + 256 * ${nibSql(2)}
      |    + 16 * ${nibSql(3)} + ${nibSql(4)}) % (stratum - 2) + 3 AS BIGINT) AS end_tok
      | FROM h ORDER BY doc_id, span_idx""".stripMargin.replace("\n", " ")
  }

  /** Token-frequency concentration ([[graft.ops.Vocab.tokenGini]]): Gini
    * + top-10 share per source — the templating smell test, exact ranks
    * and DECIMAL/HUGEINT rank×count sums.
    */
  def qTokenGini(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Vocab.tokenGini(t(spark, dir, "documents"), "source", "text")
      .orderBy("stratum")

  lazy val qTokenGiniSql: String = {
    val lowTok = tokensSqlOf("lower(text)")
    s"""WITH cnt AS (SELECT stratum, t, CAST(COUNT(*) AS BIGINT) AS c FROM
      |   (SELECT source AS stratum, unnest($lowTok) AS t FROM documents
      |    WHERE source IS NOT NULL) GROUP BY 1, 2),
      | rk AS (SELECT stratum, c,
      |   CAST(row_number() OVER (PARTITION BY stratum ORDER BY c ASC, t ASC) AS BIGINT) AS i,
      |   CAST(row_number() OVER (PARTITION BY stratum ORDER BY c DESC, t ASC) AS BIGINT) AS rd
      |  FROM cnt),
      | agg AS (SELECT stratum, CAST(COUNT(*) AS BIGINT) AS v,
      |   CAST(SUM(c) AS BIGINT) AS n_toks,
      |   SUM(CAST(i AS HUGEINT) * CAST(c AS HUGEINT)) AS ic,
      |   CAST(SUM(CASE WHEN rd <= 10 THEN c ELSE 0 END) AS BIGINT) AS top10
      |  FROM rk GROUP BY 1)
      | SELECT stratum, v, n_toks,
      |  2.0 * CAST(ic AS DOUBLE)
      |    / CAST(CAST(v AS HUGEINT) * CAST(n_toks AS HUGEINT) AS DOUBLE)
      |    - CAST(v + 1 AS DOUBLE) / CAST(v AS DOUBLE) AS gini,
      |  CAST(top10 AS DOUBLE) / CAST(n_toks AS DOUBLE) AS top10_share
      | FROM agg ORDER BY stratum""".stripMargin.replace("\n", " ")
  }

  /** PII exposure dashboard ([[graft.ops.Scrub.piiDensity]]) over the
    * planted-PII corpus (the q_pii_scrub planting convention — every
    * doc_id % 5 != 0 carries an injected email + phone): per-source doc
    * and hit counts plus the two compliance rates.
    */
  def qPiiDensity(spark: SparkSession, dir: String): DataFrame = {
    val planted = t(spark, dir, "documents").select(col("source"),
      when(col("doc_id") % 5 === 0, col("text"))
        .otherwise(concat(
          lit("reach user"), col("doc_id").cast("string"), lit("@example.com or call "),
          (col("doc_id") % 900 + 100).cast("string"), lit("-"),
          (col("doc_id") * 7 % 900 + 100).cast("string"), lit("-"),
          (col("doc_id") * 13 % 9000 + 1000).cast("string"), lit(" "), col("text")))
        .as("text"))
    graft.ops.Scrub.piiDensity(planted, "source", "text")
      .orderBy("stratum")
  }

  lazy val qPiiDensitySql: String =
    """WITH c AS (SELECT source,
      |  CASE WHEN doc_id % 5 = 0 THEN text ELSE
      |   'reach user' || CAST(doc_id AS VARCHAR) || '@example.com or call ' ||
      |   CAST(doc_id % 900 + 100 AS VARCHAR) || '-' ||
      |   CAST(doc_id * 7 % 900 + 100 AS VARCHAR) || '-' ||
      |   CAST(doc_id * 13 % 9000 + 1000 AS VARCHAR) || ' ' || text END AS _c
      | FROM documents WHERE source IS NOT NULL),
      | h AS (SELECT source AS stratum,
      |   CAST(len(regexp_extract_all(_c, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS e,
      |   CAST(len(regexp_extract_all(_c, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS p
      |  FROM c)
      | SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(CASE WHEN e + p > 0 THEN 1 END) AS BIGINT) AS n_pii_docs,
      |  CAST(SUM(e) AS BIGINT) AS n_emails, CAST(SUM(p) AS BIGINT) AS n_phones,
      |  CAST(COUNT(CASE WHEN e + p > 0 THEN 1 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS pii_frac,
      |  CAST((SUM(e) + SUM(p)) * 1000 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS hits_per_1k
      | FROM h GROUP BY stratum ORDER BY stratum""".stripMargin.replace("\n", " ")

  /** Distinctive terms per source ([[graft.ops.Vocab.keynessByStratum]]):
    * each source's top-3 enriched G² tokens vs the rest — the source
    * fingerprint panel, same exact chain as q_keyness with a per-stratum
    * rank window.
    */
  def qSourceKeyness(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Vocab.keynessByStratum(
        t(spark, dir, "documents"), "source", "text", kPerStratum = 3)
      .orderBy("stratum", "rk")

  lazy val qSourceKeynessSql: String = {
    val lowTok = tokensSqlOf("lower(text)")
    val ea = "((CAST(a + b AS DOUBLE) * CAST(na AS DOUBLE)) / CAST(na + nb AS DOUBLE))"
    val eb = "((CAST(a + b AS DOUBLE) * CAST(nb AS DOUBLE)) / CAST(na + nb AS DOUBLE))"
    s"""WITH tk AS (SELECT source AS stratum, unnest($lowTok) AS token
      |  FROM documents WHERE source IS NOT NULL),
      | cst AS (SELECT stratum, token, CAST(COUNT(*) AS BIGINT) AS a
      |  FROM tk GROUP BY 1, 2),
      | ct AS (SELECT token, CAST(SUM(a) AS BIGINT) AS tot FROM cst GROUP BY 1),
      | ns AS (SELECT stratum, CAST(SUM(a) AS BIGINT) AS na FROM cst GROUP BY 1),
      | gl AS (SELECT CAST(SUM(tot) AS BIGINT) AS n FROM ct),
      | j AS (SELECT cst.stratum, cst.token, cst.a, ct.tot - cst.a AS b,
      |   ns.na, gl.n - ns.na AS nb
      |  FROM cst JOIN ct USING (token) JOIN ns USING (stratum) CROSS JOIN gl),
      | g AS (SELECT stratum, token, a, b,
      |   CAST(round((2.0 * (
      |     (CAST(a AS DOUBLE) * ln(CAST(a AS DOUBLE) / $ea))
      |     + (CASE WHEN b > 0 THEN CAST(b AS DOUBLE) * ln(CAST(b AS DOUBLE) / $eb)
      |        ELSE 0.0 END)
      |   )) * 1000000.0) AS BIGINT) AS g2_micro,
      |   CAST(a AS HUGEINT) * CAST(nb AS HUGEINT)
      |     > CAST(b AS HUGEINT) * CAST(na AS HUGEINT) AS enr
      |  FROM j),
      | r AS (SELECT stratum, token, a, b, g2_micro,
      |   row_number() OVER (PARTITION BY stratum
      |     ORDER BY g2_micro DESC, token) AS rk
      |  FROM g WHERE enr)
      | SELECT stratum, CAST(rk AS BIGINT) AS rk, token, a, b, g2_micro
      | FROM r WHERE rk <= 3 ORDER BY stratum, rk""".stripMargin.replace("\n", " ")
  }

  /** Heaps'-law vocabulary-growth fit over doubling doc-id prefixes
    * ([[graft.ops.Vocab.heapsLawFit]], Heaps '78): β from the exact
    * least-squares line through (ln tokens, ln vocab) points at prefix
    * cutoffs 2^j — the vocabulary-scaling exponent beside q_zipf_fit's
    * frequency exponent. Micro-quantized logs before the exact
    * normal-equation sums; one double chain per coefficient. Doubling
    * prefixes keep the design well-conditioned (equal-sized strata
    * would put all x within micro-noise — cancellation garbage).
    */
  def qHeapsLaw(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Vocab.heapsLawFit(t(spark, dir, "documents"),
      "doc_id", "text")

  lazy val qHeapsLawSql: String =
    s"""WITH mx AS (SELECT MAX(CAST(doc_id AS BIGINT)) AS m FROM documents
      |  WHERE doc_id IS NOT NULL),
      | cut AS (SELECT CAST(1 AS BIGINT) << j AS p
      |  FROM generate_series(0, 62) t(j) CROSS JOIN mx
      |  WHERE (CAST(1 AS BIGINT) << j) <= m + 1),
      | dt AS (SELECT CAST(doc_id AS BIGINT) AS id,
      |   CAST(len($tokensSql) AS BIGINT) AS tk
      |  FROM documents WHERE doc_id IS NOT NULL),
      | np AS (SELECT p, CAST(SUM(tk) AS BIGINT) AS n
      |  FROM dt CROSS JOIN cut WHERE id < p GROUP BY 1),
      | tf AS (SELECT t, MIN(id) AS f FROM (
      |   SELECT CAST(doc_id AS BIGINT) AS id, unnest($tokensSql) AS t
      |   FROM documents WHERE doc_id IS NOT NULL) GROUP BY 1),
      | vp AS (SELECT p, CAST(count(*) AS BIGINT) AS v
      |  FROM tf CROSS JOIN cut WHERE f < p GROUP BY 1),
      | pts AS (SELECT
      |   CAST(round(ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS x,
      |   CAST(round(ln(CAST(v AS DOUBLE)) * 1e6) AS BIGINT) AS y
      |  FROM np JOIN vp USING (p) WHERE n > 0),
      | ag AS (SELECT CAST(count(*) AS BIGINT) AS k,
      |   CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
      |   CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
      |   CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |   CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      |  FROM pts)
      | SELECT k AS n_points,
      |  CASE WHEN CAST(sxx AS DOUBLE) * CAST(k AS DOUBLE)
      |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0 THEN
      |   CAST(round((CAST(sxy AS DOUBLE) * CAST(k AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |     / (CAST(sxx AS DOUBLE) * CAST(k AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1e6) AS BIGINT)
      |  END AS beta_micro,
      |  CASE WHEN CAST(sxx AS DOUBLE) * CAST(k AS DOUBLE)
      |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0 THEN
      |   CAST(round((CAST(sy AS DOUBLE)
      |      - ((CAST(sxy AS DOUBLE) * CAST(k AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |       / (CAST(sxx AS DOUBLE) * CAST(k AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
      |       * CAST(sx AS DOUBLE)) / CAST(k AS DOUBLE)) AS BIGINT)
      |  END AS lnk_micro
      | FROM ag WHERE k >= 2""".stripMargin.replace("\n", " ")

  /** Per-source lexical diversity profile
    * ([[graft.ops.Vocab.diversityProfile]], Hill '73's q=0/1/2 family):
    * vocabulary richness, Shannon entropy (pico), inverse Simpson
    * (milli) side by side — template-generated text shows high richness
    * with collapsed inverse-Simpson. Per-token entropy terms
    * pico-quantized before the exact Σ; Simpson one division of exact
    * integer sums.
    */
  def qDiversityProfile(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Vocab.diversityProfile(t(spark, dir, "documents"),
      "source", "text")

  lazy val qDiversityProfileSql: String =
    s"""WITH toks AS (SELECT source AS stratum, unnest($tokensSql) AS t
      |  FROM documents WHERE source IS NOT NULL),
      | cnt AS (SELECT stratum, t, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM toks GROUP BY 1, 2),
      | ns AS (SELECT stratum, CAST(SUM(c) AS BIGINT) AS n
      |  FROM cnt GROUP BY 1)
      | SELECT cnt.stratum, MAX(ns.n) AS n_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS vocab_q0,
      |  CAST(round(CAST(SUM(CAST(c AS HUGEINT) *
      |    CAST(round(ln(CAST(ns.n AS DOUBLE) / CAST(c AS DOUBLE)) * 1e12)
      |     AS BIGINT)) AS DOUBLE) / CAST(MAX(ns.n) AS DOUBLE)) AS BIGINT)
      |   AS shannon_pico,
      |  CAST(round(CAST(MAX(ns.n) AS DOUBLE) * CAST(MAX(ns.n) AS DOUBLE)
      |    / CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE) * 1000.0) AS BIGINT)
      |   AS inv_simpson_milli
      | FROM cnt JOIN ns USING (stratum) GROUP BY cnt.stratum
      | ORDER BY stratum""".stripMargin.replace("\n", " ")

  /** Good–Turing frequency-of-frequencies ([[graft.ops.Vocab.goodTuring]],
    * Good '53): the occupancy spectrum N_r with each rank's hapax mass
    * share and smoothed count r* = (r+1)·N_{r+1}/N_r — the unseen-mass
    * table (p₀ = the r = 1 row's mass_ppm) every LM-data curator reads
    * first on a new corpus.
    */
  def qGoodTuring(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Vocab.goodTuring(t(spark, dir, "documents"), "text",
      maxR = 15)

  lazy val qGoodTuringSql: String =
    s"""WITH t AS (SELECT $lowerTokensSql AS tks FROM documents),
      | cnt AS (SELECT u AS w, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM (SELECT unnest(tks) AS u FROM t) GROUP BY 1),
      | fof AS (SELECT c AS r, CAST(COUNT(*) AS BIGINT) AS n_types
      |  FROM cnt GROUP BY 1),
      | tot AS (SELECT CAST(SUM(r * n_types) AS BIGINT) AS n FROM fof),
      | nxt AS (SELECT r - 1 AS r, n_types AS nr1 FROM fof)
      | SELECT f.r, f.n_types,
      |  CAST(round(CAST(f.r AS DOUBLE) * CAST(f.n_types AS DOUBLE)
      |    / CAST(tot.n AS DOUBLE) * 1.0e6) AS BIGINT) AS mass_ppm,
      |  CASE WHEN x.nr1 IS NOT NULL THEN
      |   CAST(round(CAST(f.r + 1 AS DOUBLE) * CAST(x.nr1 AS DOUBLE)
      |     / CAST(f.n_types AS DOUBLE) * 1.0e6) AS BIGINT) END
      |   AS r_star_micro
      | FROM fof f LEFT JOIN nxt x USING (r) CROSS JOIN tot
      | ORDER BY r LIMIT 15""".stripMargin.replace("\n", " ")

  /** TextRank keywords ([[graft.ops.Keyphrase.textRank]], Mihalcea &
    * Tarau '04): weighted integer-micro PageRank over the window-2
    * co-occurrence graph of the top-100 words — the graph keyword
    * signal beside q_rake_phrases' degree/frequency one, unrolled to
    * the same 5-round power iteration the q_pagerank oracle replays.
    */
  def qTextrank(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Keyphrase.textRank(t(spark, dir, "documents"), "text",
      vocabK = 100, window = 2, iterations = 5, k = 25)

  lazy val qTextrankSql: String = {
    val rounds = (1 to 5).map { i =>
      val prev = if (i == 1) "n0" else s"r${i - 1}"
      s""" r$i AS (SELECT n.word, 150000 + COALESCE(s.i, 0) AS rk
        |  FROM (SELECT src AS word FROM st) n
        |  LEFT JOIN (SELECT e.dst AS word,
        |    CAST(SUM((r.rk * 85 * e.wt) // (100 * e.str)) AS BIGINT) AS i
        |   FROM e JOIN $prev r ON r.word = e.src GROUP BY 1) s
        |  USING (word)),""".stripMargin
    }.mkString("\n")
    s"""WITH t AS (SELECT $lowerTokensSql AS tks FROM documents),
      | pr AS (
      |  SELECT tks[i] AS w1, tks[i + 1] AS w2
      |   FROM (SELECT tks, unnest(range(1, len(tks))) AS i FROM t)
      |  UNION ALL
      |  SELECT tks[i] AS w1, tks[i + 2] AS w2
      |   FROM (SELECT tks, unnest(range(1, len(tks) - 1)) AS i FROM t)),
      | uni AS (SELECT u AS w, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM (SELECT unnest(tks) AS u FROM t) GROUP BY 1),
      | voc AS (SELECT w FROM uni ORDER BY c DESC, w LIMIT 100),
      | und AS (SELECT least(w1, w2) AS a, greatest(w1, w2) AS b,
      |   CAST(COUNT(*) AS BIGINT) AS wt
      |  FROM pr JOIN voc v1 ON v1.w = pr.w1 JOIN voc v2 ON v2.w = pr.w2
      |  WHERE w1 <> w2 GROUP BY 1, 2),
      | ed AS (SELECT a AS src, b AS dst, wt FROM und
      |  UNION ALL SELECT b AS src, a AS dst, wt FROM und),
      | st AS (SELECT src, CAST(SUM(wt) AS BIGINT) AS str FROM ed GROUP BY 1),
      | e AS (SELECT ed.src, ed.dst, ed.wt, st.str FROM ed JOIN st USING (src)),
      | n0 AS (SELECT src AS word, CAST(1000000 AS BIGINT) AS rk FROM st),
      |$rounds
      | fin AS (SELECT word, rk FROM r5)
      | SELECT word, CAST(rk AS BIGINT) AS rank_micro FROM fin
      | ORDER BY rank_micro DESC, word LIMIT 25""".stripMargin.replace("\n", " ")
  }

  /** Burrows' Delta between sources ([[graft.ops.Vocab.burrowsDelta]],
    * Burrows LLC '02): mean |z-score gap| over the corpus top-25 words'
    * usage rates — the STYLE distance (function-word register) beside
    * q_source_overlap's vocabulary and q_js_matrix's distribution
    * views. Micro-quantized rates over the full K×S grid, exact moment
    * sums, one pinned double chain per z, nano-quantized gaps before
    * the exact pair sum.
    */
  def qBurrowsDelta(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Vocab.burrowsDelta(t(spark, dir, "documents"),
      "source", "text", topK = 25)

  lazy val qBurrowsDeltaSql: String =
    s"""WITH tok AS (SELECT source AS s, unnest($lowerTokensSql) AS w
      |  FROM documents WHERE source IS NOT NULL),
      | cws AS (SELECT s, w, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM tok GROUP BY 1, 2),
      | ns AS (SELECT s, CAST(SUM(c) AS BIGINT) AS nst FROM cws GROUP BY 1),
      | top AS (SELECT w FROM (SELECT w, CAST(COUNT(*) AS BIGINT) AS cw
      |   FROM tok GROUP BY 1) ORDER BY cw DESC, w LIMIT 25),
      | grid AS (SELECT ns.s, top.w,
      |   CAST(round(CAST(COALESCE(cws.c, 0) AS DOUBLE)
      |     / CAST(ns.nst AS DOUBLE) * 1.0e6) AS BIGINT) AS r
      |  FROM top CROSS JOIN ns
      |  LEFT JOIN cws ON cws.s = ns.s AND cws.w = top.w),
      | st AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS k,
      |   CAST(SUM(CAST(r AS HUGEINT)) AS HUGEINT) AS t1,
      |   CAST(SUM(CAST(r AS HUGEINT) * r) AS HUGEINT) AS t2
      |  FROM grid GROUP BY 1),
      | stv AS (SELECT w, k, t1,
      |   CAST(k AS HUGEINT) * t2 - t1 * t1 AS den FROM st
      |  WHERE CAST(k AS HUGEINT) * t2 - t1 * t1 > 0),
      | z AS (SELECT g.s, g.w,
      |   (CAST(v.k AS DOUBLE) * CAST(g.r AS DOUBLE) - CAST(v.t1 AS DOUBLE))
      |    / sqrt(CAST(v.den AS DOUBLE)) AS z
      |  FROM grid g JOIN stv v USING (w)),
      | pr AS (SELECT a.s AS src_a, b.s AS src_b,
      |   CAST(round(abs(a.z - b.z) * 1.0e9) AS BIGINT) AS d
      |  FROM z a JOIN z b ON a.w = b.w AND a.s < b.s),
      | ag AS (SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_words,
      |   CAST(SUM(CAST(d AS HUGEINT)) AS HUGEINT) AS sd FROM pr GROUP BY 1, 2)
      | SELECT src_a, src_b, n_words,
      |  CAST(round(CAST(sd AS DOUBLE) / CAST(n_words AS DOUBLE) / 1000.0)
      |   AS BIGINT) AS delta_micro
      | FROM ag ORDER BY src_a, src_b""".stripMargin.replace("\n", " ")
}
