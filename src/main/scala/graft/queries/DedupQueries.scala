package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ExcelSerial
import graft.model.PathOps
import graft.ops.{Hierarchy, Parents, Upsert}
import graft.views.Analytic

/** Deduplication family: exact/bloom/store, MinHash-LSH, SimHash, exact n-gram pair laws, CDC chunking, clusters/survivors, contamination.
  *
  * Split from the monolithic `Registry` object (round 15): members are
  * unchanged; `Registry` mixes every family trait in, so the public
  * surface (`Registry.queries` / `Registry.oracle` / each q* member) is
  * identical. Cross-family helpers are `private[queries]`; vals are lazy
  * so trait-linearization order can never null-init a shared fragment.
  */
trait DedupQueries { self: RegistryAll =>

  // EXTENSIONS: training-data pipeline operators over documents/embeddings

  /** Exact dedup by normalized-content fingerprint. */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.exact(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy("content_hash")

  lazy val qDedupExactSql: String =
    """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash,
      | min(doc_id) AS survivor_id, COUNT(*) AS dup_count
      | FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin.replace("\n", " ")

  /** Document chunking: 400-char windows with 100 overlap — the span set
    * and extracted text are pure arithmetic, replicated exactly in SQL.
    */
  def qDocChunks(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Chunking.charChunks(t(spark, dir, "documents"), "doc_id", "text",
      size = 400, overlap = 100)
      .orderBy("doc_id", "chunk_idx")

  lazy val qDocChunksSql: String =
    """WITH d AS (SELECT doc_id, COALESCE(text, '') AS text,
      |   length(COALESCE(text, '')) AS n FROM documents),
      | s AS (SELECT doc_id, text, n,
      |   unnest(range(0, greatest(n - 100, 1), 300)) AS chunk_start FROM d)
      | SELECT doc_id, CAST(chunk_start // 300 AS BIGINT) AS chunk_idx,
      |  CAST(chunk_start AS BIGINT) AS chunk_start,
      |  CAST(least(400, n - chunk_start) AS BIGINT) AS chunk_len,
      |  substr(text, CAST(chunk_start + 1 AS INTEGER), 400) AS chunk_text
      | FROM s ORDER BY doc_id, chunk_idx""".stripMargin.replace("\n", " ")

  /** Content-defined chunking ([[graft.ops.Chunking.cdcChunks]]): md5-
    * nibble boundaries (cut after any token whose md5 starts with '0'),
    * shift-robust storage-dedup units. Boundaries AND chunk content are
    * both gated — the oracle recomputes the running boundary count and
    * re-aggregates chunk text in token order.
    */
  def qCdcChunks(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Chunking.cdcChunks(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id", "chunk_idx")

  lazy val qCdcChunksSql: String =
    s"""WITH tk AS (SELECT doc_id, $tokensSql AS toks FROM documents),
       | u AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)+1),
       |    i -> struct_pack(pos := i, tok := toks[i]))) AS s FROM tk),
       | f AS (SELECT doc_id, s.pos AS pos, s.tok AS tok,
       |    CASE WHEN substr(md5(s.tok), 1, 1) = '0' THEN 1 ELSE 0 END AS cut FROM u),
       | c AS (SELECT doc_id, pos, tok,
       |    COALESCE(SUM(cut) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx FROM f)
       | SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |  CAST(COUNT(*) AS BIGINT) AS n_toks,
       |  string_agg(tok, ' ' ORDER BY pos) AS chunk_text,
       |  md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
       | FROM c GROUP BY doc_id, chunk_idx
       | ORDER BY doc_id, chunk_idx""".stripMargin.replace("\n", " ")

  /** Cross-corpus sub-document duplication
    * ([[graft.ops.Dedup.cdcChunkOverlap]]): incoming docs sharing ≥5-token
    * CDC chunks with the doc_id%10=0 reference slice. The oracle replays
    * the whole chain — chunk boundaries, hashes, distinct reference set,
    * overlap join, share fraction.
    */
  def qCdcOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    graft.ops.Dedup.cdcChunkOverlap(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", minTokens = 5)
      .orderBy("doc_id")
  }

  lazy val qCdcOverlapSql: String =
    s"""WITH tk AS (SELECT doc_id, $tokensSql AS toks FROM documents),
       | u AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)+1),
       |    i -> struct_pack(pos := i, tok := toks[i]))) AS s FROM tk),
       | f AS (SELECT doc_id, s.pos AS pos, s.tok AS tok,
       |    CASE WHEN substr(md5(s.tok), 1, 1) = '0' THEN 1 ELSE 0 END AS cut FROM u),
       | c AS (SELECT doc_id, pos, tok,
       |    COALESCE(SUM(cut) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx FROM f),
       | ch AS (SELECT doc_id, chunk_idx, COUNT(*) AS n_toks,
       |    md5(string_agg(tok, ' ' ORDER BY pos)) AS h
       |   FROM c GROUP BY doc_id, chunk_idx),
       | big AS (SELECT * FROM ch WHERE n_toks >= 5),
       | ref AS (SELECT DISTINCT h FROM big WHERE doc_id % 10 = 0),
       | inc AS (SELECT * FROM big WHERE doc_id % 10 <> 0)
       | SELECT inc.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       |  CAST(COUNT(ref.h) AS BIGINT) AS n_shared,
       |  CAST(COUNT(ref.h) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE) AS share_frac
       | FROM inc LEFT JOIN ref ON inc.h = ref.h
       | GROUP BY inc.doc_id HAVING COUNT(ref.h) > 0
       | ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** PERSISTED CDC chunk-hash reference
    * ([[graft.ops.RefStore.writeCdcChunks]] + loadCdcChunks →
    * [[graft.ops.Dedup.cdcOverlapStored]]): the reference slice commits
    * its chunk hashes in two batches (one replayed — consumer re-distinct
    * absorbs it), and the stored overlap must hash-match the live
    * q_cdc_overlap law exactly — batching and persistence are invisible
    * to the distinct hash set.
    */
  def qCdcStore(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val ref = docs.filter(col("doc_id") % 10 === 0)
    val store = storeOnce(dir, "cdcstore") { s =>
      graft.ops.RefStore.writeCdcChunks(
        ref.filter(col("doc_id") % 20 === 0), "doc_id", "text", s, minTokens = 5)
      graft.ops.RefStore.mergeCdcChunks(
        ref.filter(col("doc_id") % 20 =!= 0), "doc_id", "text", s)
      graft.ops.RefStore.mergeCdcChunks( // crashed-commit replay
        ref.filter(col("doc_id") % 20 =!= 0), "doc_id", "text", s)
    }
    graft.ops.Dedup.cdcOverlapStored(
        docs.filter(col("doc_id") % 10 =!= 0), store, "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Same law as q_cdc_overlap: the store is an implementation detail. */
  lazy val qCdcStoreSql: String = qCdcOverlapSql

  /** Pairwise source-vocabulary overlap
    * ([[graft.ops.Vocab.sourceVocabOverlap]]): distinct lowercased tokens
    * per source, exact intersection counts per source pair, Jaccard as
    * one division of exact integers — the mixture-design redundancy
    * matrix, hash-oracled end to end.
    */
  def qSourceOverlap(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Vocab.sourceVocabOverlap(
        t(spark, dir, "documents"), "source", "text")
      .orderBy("source_a", "source_b")

  lazy val qSourceOverlapSql: String = {
    val lowTok = tokensSqlOf("lower(text)")
    s"""WITH st AS (SELECT DISTINCT source, tk FROM
      |   (SELECT source, unnest($lowTok) AS tk FROM documents)),
      | sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS v
      |   FROM st GROUP BY source),
      | inter AS (SELECT a.source AS source_a, b.source AS source_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_shared
      |   FROM st a JOIN st b ON a.tk = b.tk AND a.source < b.source
      |   GROUP BY 1, 2)
      | SELECT sa.source AS source_a, sb.source AS source_b,
      |  sa.v AS v_a, sb.v AS v_b,
      |  COALESCE(i.n_shared, 0) AS n_shared,
      |  CAST(COALESCE(i.n_shared, 0) AS DOUBLE) /
      |    CAST(sa.v + sb.v - COALESCE(i.n_shared, 0) AS DOUBLE) AS jaccard
      | FROM sizes sa JOIN sizes sb ON sa.source < sb.source
      | LEFT JOIN inter i ON i.source_a = sa.source AND i.source_b = sb.source
      | ORDER BY source_a, source_b""".stripMargin.replace("\n", " ")
  }

  /** SemDeDup pruning (Abbas et al., "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication", 2023): within each
    * ε-similarity cluster of embeddings keep ONE exemplar and prune the
    * rest — the representation-level dedup pass that whole-document
    * fingerprints and MinHash cannot see. Clusters are the connected
    * components of the blocked exact-cosine pair graph (the
    * q_semantic_clusters assignment — [[graft.ops.Clusters.dedupClusters]]
    * over [[graft.ops.Similarity.blockedNearDupPairs]]); the exemplar law
    * is min-id (== the component label, so the choice is deterministic and
    * oracle-checkable). Singletons keep themselves. Scale shape: the pair
    * graph is block-bounded, components are O(log diameter) rounds over
    * the PAIR set, and the final prune is one left join back to the
    * corpus — nothing corpus-quadratic.
    */
  def qSemdedupPrune(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val comp = graft.ops.Clusters.dedupClusters(
      graft.ops.Similarity.blockedNearDupPairs(
        e, "vec_id", "embedding", "label", threshold = 0.4))
    e.select(col("vec_id").cast("long"), col("label"))
      .join(comp, col("vec_id") === col("doc_id"), "left")
      .select(col("vec_id"), col("label"),
        coalesce(col("cluster_id"), col("vec_id")).as("cluster_id"),
        (col("cluster_id").isNull || col("cluster_id") === col("vec_id"))
          .as("keep"))
      .orderBy("vec_id")
  }

  lazy val qSemdedupPruneSql: String =
    """WITH RECURSIVE e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      | p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |   list_dot_product(a.v, b.v)/(sqrt(list_dot_product(a.v, a.v))*sqrt(list_dot_product(b.v, b.v))) AS sim
      |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id),
      | verified AS (SELECT id_a, id_b FROM p WHERE sim >= 0.4),
      | edges AS (SELECT id_a AS s, id_b AS d FROM verified
      |  UNION SELECT id_b, id_a FROM verified),
      | reach(s, d) AS (SELECT s, d FROM edges
      |  UNION SELECT r.s, e2.d FROM reach r JOIN edges e2 ON r.d = e2.s),
      | comp AS (SELECT s AS vid, least(s, min(d)) AS cluster_id FROM reach GROUP BY s)
      | SELECT e.vec_id, e.label,
      |  COALESCE(c.cluster_id, e.vec_id) AS cluster_id,
      |  (c.cluster_id IS NULL OR c.cluster_id = e.vec_id) AS keep
      | FROM e LEFT JOIN comp c ON c.vid = e.vec_id
      | ORDER BY e.vec_id""".stripMargin.replace("\n", " ")

  /** Exact word-3-gram Jaccard near-duplicate pairs (inverted-index join). */
  def qNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.ngramJaccardPairs(t(spark, dir, "documents"), "doc_id", "text",
      shingleSize = 3, threshold = 0.8)
      .orderBy("id_a", "id_b")

  /** Shared CTE chain producing the exact word-3-gram pair candidates
    * (`pairs(id_a, id_b, shared, na, nb)`) — composed by the Jaccard pair
    * oracle, the containment oracle, and the dedup-clusters closure
    * oracle. Replays the engine's df-capped law
    * ([[graft.ops.Dedup.ngramJaccardPairs]]): a shingle in more than 64
    * documents is dropped as a candidate GENERATOR (`keptsh`), while
    * `shared`/`na`/`nb` verify against the FULL shingle sets
    * (`list_intersect`) — values exact, the cap affects recall only.
    */
  private[queries] lazy val ngramPairCtes: String =
    s"""toks AS (
      | SELECT doc_id, $tokensSql AS tk FROM documents
      |), sh AS (
      | SELECT doc_id, list_distinct(list_transform(generate_series(1, len(tk)-2),
      |   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingles
      | FROM toks WHERE len(tk) >= 3
      |), ex AS (
      | SELECT doc_id, unnest(shingles) AS s FROM sh WHERE len(shingles) > 0
      |), keptsh AS (
      | SELECT s FROM ex GROUP BY s HAVING count(*) <= 64
      |), cand AS (
      | SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      | FROM ex a JOIN keptsh k ON a.s = k.s
      |   JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      |), pairs AS (
      | SELECT c.id_a, c.id_b,
      |   len(list_intersect(sa.shingles, sb.shingles)) AS shared,
      |   len(sa.shingles) AS na, len(sb.shingles) AS nb
      | FROM cand c JOIN sh sa ON sa.doc_id = c.id_a
      |   JOIN sh sb ON sb.doc_id = c.id_b)""".stripMargin

  /** The UNCAPPED pair chain — the q_minhash_neardup oracle only: the LSH
    * path does not implement the exact-law df cap (its skew guard is
    * [[graft.ops.Dedup.capBuckets]] on band buckets), so its oracle must
    * not either.
    */
  private[queries] lazy val ngramPairCtesUncapped: String =
    s"""toks AS (
      | SELECT doc_id, $tokensSql AS tk FROM documents
      |), sh AS (
      | SELECT doc_id, list_distinct(list_transform(generate_series(1, len(tk)-2),
      |   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingles
      | FROM toks WHERE len(tk) >= 3
      |), ex AS (
      | SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n FROM sh WHERE len(shingles) > 0
      |), pairs AS (
      | SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared,
      |   any_value(a.n) AS na, any_value(b.n) AS nb
      | FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)""".stripMargin

  lazy val qNgramJaccardSql: String =
    s"""WITH $ngramPairCtes
      | SELECT id_a, id_b, CAST(shared AS DOUBLE)/(na+nb-shared) AS jaccard
      | FROM pairs WHERE CAST(shared AS DOUBLE)/(na+nb-shared) >= 0.8
      | ORDER BY id_a, id_b""".stripMargin.replace("\n", " ")

  lazy val qMinhashNeardupSql: String =
    s"""WITH $ngramPairCtesUncapped
      | SELECT id_a, id_b, CAST(shared AS DOUBLE)/(na+nb-shared) AS jaccard
      | FROM pairs WHERE CAST(shared AS DOUBLE)/(na+nb-shared) >= 0.8
      | ORDER BY id_a, id_b""".stripMargin.replace("\n", " ")

  /** Asymmetric n-gram containment pairs
    * ([[graft.ops.Dedup.ngramContainmentPairs]], Broder '97 overlap
    * |A∩B|/min(|A|,|B|)): the quote-inclusion detector Jaccard misses —
    * a short document wholly embedded in a long one scores ≈1 here while
    * the union swamps its Jaccard. Same inverted-index scaffold as
    * q_ngram_jaccard; one double division per pair.
    */
  def qContainment(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.ngramContainmentPairs(t(spark, dir, "documents"),
      "doc_id", "text", shingleSize = 3, threshold = 0.9)
      .orderBy("id_a", "id_b")

  lazy val qContainmentSql: String =
    s"""WITH $ngramPairCtes
      | SELECT id_a, id_b, shared, na, nb,
      |  CAST(shared AS DOUBLE)/least(na, nb) AS containment
      | FROM pairs WHERE CAST(shared AS DOUBLE)/least(na, nb) >= 0.9
      | ORDER BY id_a, id_b""".stripMargin.replace("\n", " ")

  /** Sørensen–Dice n-gram pairs ([[graft.ops.Dedup.ngramDicePairs]],
    * Sørensen '48 / Dice '45: 2|A∩B|/(|A|+|B|)) — the third face of the
    * capped shingle family: intersection-doubled, between Jaccard's
    * union-relative and containment's min-relative views. Same
    * df-capped scaffold and shared oracle CTE chain; one double chain
    * per pair.
    */
  def qDiceNgram(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.ngramDicePairs(t(spark, dir, "documents"),
      "doc_id", "text", shingleSize = 3, threshold = 0.85)
      .orderBy("id_a", "id_b")

  lazy val qDiceNgramSql: String =
    s"""WITH $ngramPairCtes
      | SELECT id_a, id_b, shared, na, nb,
      |  CAST(shared AS DOUBLE)*2.0/(na+nb) AS dice
      | FROM pairs WHERE CAST(shared AS DOUBLE)*2.0/(na+nb) >= 0.85
      | ORDER BY id_a, id_b""".stripMargin.replace("\n", " ")

  /** Winnowing fingerprints ([[graft.ops.Dedup.winnowFingerprints]],
    * Schleimer–Wilkerson–Aiken SIGMOD '03 — MOSS): rightmost-minimum
    * 5-gram md5 hashes over windows of 4, the position-aware local
    * fingerprint set with the shared-substring guarantee. The full
    * selection law (window minima, rightmost ties, full windows only)
    * replays in SQL over the same md5-polynomial hash images.
    */
  def qWinnowFp(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.winnowFingerprints(t(spark, dir, "documents"),
      "doc_id", "text", k = 5, w = 4)
      .orderBy("doc_id", "pos")

  lazy val qWinnowFpSql: String = {
    val poly15 = (1 to 15).map(i =>
      s"CAST(${1L << (4 * (15 - i))} AS BIGINT) * ${nibSql(i)}")
      .mkString(" + ")
    s"""WITH t AS (SELECT doc_id, $lowerTokensSql AS tks FROM documents),
      | g AS (SELECT doc_id, i,
      |   md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
      |       || ' ' || tk[i+4]) AS m
      |  FROM (SELECT doc_id, tks AS tk, unnest(range(1, len(tks) - 3)) AS i
      |   FROM t WHERE len(tks) >= 8)),
      | p AS (SELECT doc_id, i, CAST($poly15 AS BIGINT) AS h FROM g),
      | wm AS (SELECT doc_id, i AS j, MIN(h) OVER win AS mh,
      |   COUNT(*) OVER win AS cnt FROM p
      |  WINDOW win AS (PARTITION BY doc_id ORDER BY i
      |   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
      | wins AS (SELECT doc_id, j, mh FROM wm WHERE cnt = 4),
      | sel AS (SELECT w.doc_id, w.j, MAX(p.i) AS pos
      |  FROM wins w JOIN p ON p.doc_id = w.doc_id
      |   AND p.i BETWEEN w.j AND w.j + 3 AND p.h = w.mh
      |  GROUP BY 1, 2),
      | fp AS (SELECT DISTINCT s.doc_id, s.pos, p.h AS fp_hash
      |  FROM sel s JOIN p ON p.doc_id = s.doc_id AND p.i = s.pos)
      | SELECT doc_id, CAST(pos AS BIGINT) AS pos, fp_hash
      | FROM fp ORDER BY doc_id, pos""".stripMargin.replace("\n", " ")
  }

  /** Corpus-internal duplicate 5-gram mass
    * ([[graft.ops.Dedup.ngramDupMass]], the Lee et al. ACL'22
    * boilerplate surface): the fraction of (doc, distinct-5-gram)
    * incidences shared with another document — the whole-corpus
    * memorization-fuel number beside the pairwise dedup laws, at two
    * hash aggregates of cost.
    */
  def qNgramDupMass(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.ngramDupMass(t(spark, dir, "documents"),
      "doc_id", "text", shingleSize = 5)

  lazy val qNgramDupMassSql: String =
    s"""WITH toks AS (SELECT doc_id, $tokensSql AS tk FROM documents),
      | sh AS (SELECT doc_id,
      |   list_distinct(list_transform(generate_series(1, len(tk) - 4),
      |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' '
      |      || tk[i+3] || ' ' || tk[i+4])) AS shingles
      |  FROM toks WHERE len(tk) >= 5),
      | ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
      | f AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM ex GROUP BY 1),
      | a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_ngrams,
      |   CAST(COALESCE(SUM(df), 0) AS BIGINT) AS total_doc_ngrams,
      |   CAST(COALESCE(SUM(CASE WHEN df >= 2 THEN df ELSE 0 END), 0)
      |    AS BIGINT) AS dup_doc_ngrams FROM f)
      | SELECT n_distinct_ngrams, total_doc_ngrams, dup_doc_ngrams,
      |  CAST(round(CAST(dup_doc_ngrams AS DOUBLE)
      |    / CAST(total_doc_ngrams AS DOUBLE) * 1000000000000.0) AS BIGINT)
      |   AS dup_mass_pico
      | FROM a WHERE n_distinct_ngrams > 0""".stripMargin.replace("\n", " ")

  /** Near-dup cluster assignment: connected components over the verified
    * exact-Jaccard pair graph — the survivor-selection step of a dedup
    * pipeline (keep one doc per cluster). The oracle computes the same
    * components with a recursive transitive closure; both sides label each
    * cluster with its minimum doc id, so the outputs are deterministic.
    */
  def qDedupClusters(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Clusters.dedupClusters(
      graft.ops.Dedup.ngramJaccardPairs(t(spark, dir, "documents"), "doc_id", "text",
        shingleSize = 3, threshold = 0.8))
      .orderBy("doc_id")

  /** Recursive-closure CTEs over the verified pair graph, ending in
    * `comp(doc_id, cluster_id)` — appended after [[ngramPairCtes]] under a
    * `WITH RECURSIVE` header by the cluster oracles.
    */
  private[queries] lazy val componentCtes: String =
    """verified AS (
      | SELECT id_a, id_b FROM pairs
      | WHERE CAST(shared AS DOUBLE)/(na+nb-shared) >= 0.8
      |), edges AS (
      | SELECT id_a AS s, id_b AS d FROM verified
      | UNION SELECT id_b, id_a FROM verified
      |), reach(s, d) AS (
      | SELECT s, d FROM edges
      | UNION
      | SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
      |), comp AS (
      | SELECT s AS doc_id, least(s, min(d)) AS cluster_id FROM reach GROUP BY s)""".stripMargin

  lazy val qDedupClustersSql: String =
    s"""WITH RECURSIVE $ngramPairCtes, $componentCtes
      | SELECT doc_id, cluster_id FROM comp ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** The dedup pipeline's last step, end to end: pairs → components →
    * survivor per cluster, where the survivor is the longest document
    * (n_chars desc, doc_id asc tiebreak) — "keep the best copy", not just
    * "keep the first". One extra window over the (tiny) cluster frame.
    */
  def qClusterSurvivors(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val clusters = graft.ops.Clusters.dedupClusters(
      graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.8))
    val sized = clusters.join(
      docs.select(col("doc_id").cast("long").as("doc_id"), col("n_chars")), "doc_id")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
      .orderBy(col("n_chars").desc, col("doc_id"))
    sized
      .withColumn("_rk", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")))
      .filter(col("_rk") === 1)
      .select(col("cluster_id"), col("doc_id").as("survivor_id"), col("n_members"))
      .orderBy("cluster_id")
  }

  lazy val qClusterSurvivorsSql: String =
    s"""WITH RECURSIVE $ngramPairCtes, $componentCtes,
      | ranked AS (
      | SELECT c.cluster_id, c.doc_id, d.n_chars,
      |  row_number() OVER (PARTITION BY c.cluster_id ORDER BY d.n_chars DESC, c.doc_id) AS rk,
      |  count(*) OVER (PARTITION BY c.cluster_id) AS n_members
      | FROM comp c JOIN documents d USING (doc_id))
      | SELECT cluster_id, doc_id AS survivor_id, n_members
      | FROM ranked WHERE rk = 1 ORDER BY cluster_id""".stripMargin.replace("\n", " ")

  /** The shuffle-join twin of [[qContamination]] (reference side too big to
    * broadcast at scale) — identical semantics, identical oracle, different
    * physical strategy.
    */
  def qContaminationLarge(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    graft.ops.Contamination.checkLarge(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0),
      "doc_id", "text", n = 5)
      .orderBy("doc_id")
  }

  /** Document fingerprints, both laws side by side: the lowercased
    * normalized md5 (exact-dedup key — case-variant copies collide) and the
    * case-preserving token-stream md5 (they don't). Narrow codegen'd
    * expressions over the scan; no shuffle.
    */
  def qDocFingerprint(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"),
        graft.functions.TextFns.fingerprintMd5(col("text")).as("content_hash"),
        graft.functions.TextFns.orderedFingerprintMd5(col("text")).as("stream_hash"))
      .orderBy("doc_id")

  lazy val qDocFingerprintSql: String =
    s"""SELECT doc_id,
      | md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_hash,
      | md5(array_to_string($tokensSql, ' ')) AS stream_hash
      | FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** Benchmark-contamination check: corpus docs sharing ≥1 word 5-gram with
    * the benchmark subset (doc_id % 10 == 0 stands in for a held-out eval
    * set). Benchmark shingles broadcast; corpus streams map-side.
    */
  def qContamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    graft.ops.Contamination.check(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0),
      "doc_id", "text", n = 5)
      .orderBy("doc_id")
  }

  lazy val qContaminationSql: String =
    s"""WITH toks AS (
      | SELECT doc_id, $tokensSql AS tk FROM documents
      |), sh AS (
      | SELECT doc_id, list_distinct(list_transform(generate_series(1, len(tk)-4),
      |   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4])) AS shingles
      | FROM toks WHERE len(tk) >= 5
      |), bench AS (
      | SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 10 = 0
      |), ex AS (
      | SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 10 != 0
      |), hits AS (
      | SELECT ex.doc_id, count(*) AS n FROM ex JOIN bench USING (s) GROUP BY ex.doc_id)
      | SELECT d.doc_id, COALESCE(hits.n, 0) AS n_contaminated,
      |  COALESCE(hits.n, 0) > 0 AS contaminated
      | FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id
      | WHERE d.doc_id % 10 != 0 ORDER BY d.doc_id""".stripMargin.replace("\n", " ")

  /** MinHash+LSH near-dup pairs — same verified output as the exact pass at
    * these similarity levels (the documents' planted pairs sit ≥0.8 where
    * LSH recall with 16×4 banding is ≈1), so it shares the exact oracle.
    */
  def qMinhashNeardup(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.minhashLshPairs(t(spark, dir, "documents"), "doc_id", "text",
      numHashes = 64, bands = 16, shingleSize = 3, threshold = 0.8)
      .orderBy("id_a", "id_b")

  /** SimHash near-dup pairs (Hamming ≤ 3), FULLY hash-oracled since the
    * signature law moved to md5 (r10 verdict task 1): the oracle replays
    * every 64-bit signature nibble-for-nibble (token hash = first 16 md5
    * hex chars, sign-aggregated per bit) and computes the EXACT all-pairs
    * Hamming law, so the gate certifies both the signature arithmetic
    * and that the engine's pigeonhole chunk-join (4×16-bit chunks — any
    * pair within Hamming ≤ 3 shares one) loses no qualifying pair at
    * this scale, the q_minhash_against discipline. Verify's planted
    * recall-1.0 floor stays as the larger-sf ratchet.
    */
  def qSimhashNeardup(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.simhashPairs(t(spark, dir, "documents"), "doc_id", "text",
      maxHamming = 3)
      .orderBy("id_a", "id_b")

  /** Shared SimHash signature CTE chain: one 64-bit signature per
    * document, carried as two 32-bit halves (`hi`/`lo` BIGINTs — Hamming
    * over the halves equals Hamming over the whole signature, and the
    * halves dodge signed-64 overflow juggling in SQL). Replays
    * [[graft.ops.Dedup.simhash64]]'s law exactly: token hash bit b = bit
    * 3−(b mod 4) of md5-hex nibble b div 4 (ascii math, the [[nibSql]]
    * discipline with a computed position); signature bit b set iff the
    * signed ±1 count over tokens is ≥ 0 (so a token-free document is
    * all-ones on both engines).
    */
  private[queries] lazy val simhashSigsSql: String = {
    val nibAt = "(ascii(substr(m, CAST(b // 4 + 1 AS INTEGER), 1)) " +
      "- CASE WHEN substr(m, CAST(b // 4 + 1 AS INTEGER), 1) " +
      "BETWEEN '0' AND '9' THEN 48 ELSE 87 END)"
    s"""tok AS (SELECT doc_id, unnest($tokensSql) AS tk FROM documents),
      | tb AS (SELECT doc_id, md5(tk) AS m,
      |   unnest(generate_series(0, 63)) AS b FROM tok),
      | cnts AS (SELECT doc_id, b,
      |   SUM(CASE WHEN ($nibAt >> CAST(3 - (b % 4) AS INTEGER)) & 1 = 1
      |     THEN 1 ELSE -1 END) AS cnt
      |  FROM tb GROUP BY 1, 2),
      | fullb AS (SELECT d.doc_id, gs.b, COALESCE(c.cnt, 0) AS cnt
      |  FROM documents d
      |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) gs
      |  LEFT JOIN cnts c ON c.doc_id = d.doc_id AND c.b = gs.b),
      | sigs AS (SELECT doc_id,
      |   CAST(SUM(CASE WHEN cnt >= 0 AND b >= 32
      |     THEN (CAST(1 AS BIGINT) << CAST(b - 32 AS INTEGER)) ELSE 0 END) AS BIGINT) AS hi,
      |   CAST(SUM(CASE WHEN cnt >= 0 AND b < 32
      |     THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS lo
      |  FROM fullb GROUP BY doc_id)""".stripMargin.replace("\n", " ")
  }

  lazy val qSimhashNeardupSql: String =
    s"""WITH $simhashSigsSql,
      | p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |   bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS hamming
      |  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id)
      | SELECT id_a, id_b, CAST(hamming AS INTEGER) AS hamming
      | FROM p WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin.replace("\n", " ")

  /** Chunk-level cross-document dedup ([[graft.ops.Dedup.chunkDedupDocs]]):
    * the oracle independently rebuilds the chunk table, duplicate counts,
    * and the ORDER-SENSITIVE reassembly (string_agg ORDER BY chunk_idx vs
    * the engine's sorted-collect), so the whole law is hash-checked
    * including the md5 witness of each cleaned document.
    */
  def qChunkDedup(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.chunkDedupDocs(t(spark, dir, "documents"), "doc_id", "text",
      size = 400)
      .orderBy("doc_id")

  lazy val qChunkDedupSql: String =
    """WITH d AS (SELECT doc_id, COALESCE(text, '') AS text,
      |   length(COALESCE(text, '')) AS n FROM documents),
      | s AS (SELECT doc_id, text, unnest(range(0, greatest(n, 1), 400)) AS cs FROM d),
      | ch AS (SELECT doc_id, CAST(cs // 400 AS BIGINT) AS chunk_idx,
      |   substr(text, CAST(cs + 1 AS INTEGER), 400) AS chunk_text FROM s),
      | h AS (SELECT *, md5(chunk_text) AS _h FROM ch),
      | f AS (SELECT _h, COUNT(DISTINCT doc_id) AS _ndocs FROM h GROUP BY 1),
      | j AS (SELECT h.doc_id, h.chunk_idx, h.chunk_text, f._ndocs
      |   FROM h JOIN f USING (_h))
      | SELECT doc_id, COUNT(*) AS n_chunks,
      |  CAST(COUNT(CASE WHEN _ndocs = 1 THEN 1 END) AS BIGINT) AS n_kept,
      |  CAST(length(COALESCE(string_agg(chunk_text, '' ORDER BY chunk_idx)
      |    FILTER (WHERE _ndocs = 1), '')) AS BIGINT) AS clean_len,
      |  md5(COALESCE(string_agg(chunk_text, '' ORDER BY chunk_idx)
      |    FILTER (WHERE _ndocs = 1), '')) AS clean_hash
      | FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** Substring-level (span) dedup
    * ([[graft.ops.Dedup.stripDuplicatedSpans]]): content-anchored spans
    * recurring across documents are excised and each document reassembled —
    * the Lee et al. ACL'22 exact-substring law, here with winnowing-style
    * local-minimum anchors so detection is alignment-free. The oracle
    * independently rebuilds anchors, span flags, interval merge, AND the
    * ordered reassembly, hash-witnessed per document.
    */
  def qSpanDedup(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.stripDuplicatedSpans(t(spark, dir, "documents"),
        "doc_id", "text")
      .orderBy("doc_id")

  lazy val qSpanDedupSql: String =
    """WITH d AS (SELECT doc_id, COALESCE(text, '') AS t,
      |   length(COALESCE(text, '')) AS len FROM documents),
      | g AS (SELECT doc_id, len, t, unnest(range(0, len - 8 + 1)) AS p
      |   FROM d WHERE len >= 8),
      | h AS (SELECT doc_id, len, t, p,
      |   md5(substr(t, CAST(p + 1 AS INTEGER), 8)) AS hh FROM g),
      | a AS (SELECT doc_id, len, t, p, hh,
      |   min(hh) OVER (PARTITION BY doc_id ORDER BY p
      |     ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING) AS ml,
      |   min(hh) OVER (PARTITION BY doc_id ORDER BY p
      |     ROWS BETWEEN 1 FOLLOWING AND 8 FOLLOWING) AS mr FROM h),
      | an AS (SELECT doc_id, p, least(40, len - p) AS slen,
      |   md5(substr(t, CAST(p + 1 AS INTEGER),
      |     CAST(least(40, len - p) AS INTEGER))) AS sh
      |  FROM a WHERE (ml IS NULL OR hh < ml) AND (mr IS NULL OR hh < mr)),
      | f AS (SELECT sh FROM an GROUP BY sh HAVING COUNT(DISTINCT doc_id) >= 2),
      | fl AS (SELECT doc_id, p AS st, p + slen AS en FROM an JOIN f USING (sh)),
      | b AS (SELECT doc_id, st, en, CASE WHEN st > COALESCE(max(en) OVER
      |   (PARTITION BY doc_id ORDER BY st
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
      |   THEN 1 ELSE 0 END AS brk FROM fl),
      | i AS (SELECT doc_id, st, en, SUM(brk) OVER (PARTITION BY doc_id
      |   ORDER BY st ROWS UNBOUNDED PRECEDING) AS isl FROM b),
      | m AS (SELECT doc_id, isl, MIN(st) AS i_start, MAX(en) AS i_end,
      |   COUNT(*) AS nsp FROM i GROUP BY 1, 2),
      | gp AS (SELECT doc_id, COALESCE(lag(i_end) OVER (PARTITION BY doc_id
      |     ORDER BY i_start), 0) AS gs, i_start AS ge FROM m
      |   UNION ALL
      |   SELECT doc_id, MAX(i_end) AS gs, any_value(len) AS ge
      |    FROM m JOIN d USING (doc_id) GROUP BY doc_id),
      | seg AS (SELECT gp.doc_id, gs, substr(d.t, CAST(gs + 1 AS INTEGER),
      |   CAST(ge - gs AS INTEGER)) AS sgt FROM gp JOIN d USING (doc_id)),
      | cl AS (SELECT doc_id, string_agg(sgt, '' ORDER BY gs) AS ct
      |   FROM seg GROUP BY doc_id),
      | stt AS (SELECT doc_id, COUNT(*) AS n_islands, SUM(nsp) AS n_dup_spans
      |   FROM m GROUP BY doc_id)
      | SELECT d.doc_id,
      |  CAST(COALESCE(stt.n_islands, 0) AS BIGINT) AS n_islands,
      |  CAST(COALESCE(stt.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
      |  CAST(length(COALESCE(cl.ct, d.t)) AS BIGINT) AS clean_len,
      |  md5(COALESCE(cl.ct, d.t)) AS clean_hash
      | FROM d LEFT JOIN stt USING (doc_id) LEFT JOIN cl USING (doc_id)
      | ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** Cross-corpus exact dedup ([[graft.ops.Dedup.exactAgainst]]): a new
    * batch (doc_id % 7 != 0) anti-joined on content fingerprint against the
    * already-ingested corpus (doc_id % 7 == 0). NOT EXISTS in the oracle —
    * the same keep-on-NULL semantics as Spark's left_anti.
    */
  def qDedupAgainst(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    graft.ops.Dedup.exactAgainst(
        docs.filter(col("doc_id") % 7 =!= 0),
        docs.filter(col("doc_id") % 7 === 0),
        "doc_id", "text")
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  lazy val qDedupAgainstSql: String =
    """WITH fp AS (SELECT doc_id, lang,
      |   md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
      |  FROM documents),
      | inc AS (SELECT * FROM fp WHERE doc_id % 7 <> 0),
      | ref AS (SELECT DISTINCT h FROM fp WHERE doc_id % 7 = 0)
      | SELECT doc_id, lang FROM inc i
      | WHERE NOT EXISTS (SELECT 1 FROM ref r WHERE r.h = i.h)
      | ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** Bloom-prefiltered cross-corpus dedup
    * ([[graft.ops.Dedup.exactAgainstBloom]]): same NOT EXISTS law as
    * [[qDedupAgainst]] — the Bloom stage is a pure candidate reducer with
    * no false negatives, so the oracle is the EXACT anti-join semantics,
    * proving end-to-end that the prefilter+verify composition loses and
    * invents nothing. Different corpus split (% 5) than q_dedup_against so
    * the two rows gate independent code paths.
    */
  def qDedupBloom(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    graft.ops.Dedup.exactAgainstBloom(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", expectedItems = 100000L)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  lazy val qDedupBloomSql: String =
    """WITH fp AS (SELECT doc_id, lang,
      |   md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
      |  FROM documents),
      | inc AS (SELECT * FROM fp WHERE doc_id % 5 <> 0),
      | ref AS (SELECT DISTINCT h FROM fp WHERE doc_id % 5 = 0 AND h IS NOT NULL)
      | SELECT doc_id, lang FROM inc i
      | WHERE NOT EXISTS (SELECT 1 FROM ref r WHERE r.h = i.h)
      | ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** PERSISTED incremental dedup artifact, full lifecycle oracled
    * ([[graft.ops.RefStore]] + [[graft.ops.Dedup.exactAgainstBloomStored]]):
    * the reference corpus commits in TWO batches (write, then merge — bloom
    * OR-union + fingerprint append), and the incoming batch dedups against
    * the LOADED artifact without ever scanning the reference documents.
    * The oracle is the plain NOT-EXISTS law against the union of both
    * reference batches, so a store that loses a fingerprint in the merge,
    * breaks the bloom's no-false-negative superset invariant, or muddles
    * the meta round-trip hash-mismatches here.
    */
  def qDedupStore(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val store = storeOnce(dir, "refstore") { s =>
      graft.ops.RefStore.writeExact(
        docs.filter(col("doc_id") % 4 === 0), "text", s, expectedItems = 100000L)
      graft.ops.RefStore.mergeExact(docs.filter(col("doc_id") % 4 === 1), "text", s)
    }
    graft.ops.Dedup.exactAgainstBloomStored(
        docs.filter(col("doc_id") % 4 >= 2), store, "doc_id", "text")
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  lazy val qDedupStoreSql: String =
    """WITH fp AS (SELECT doc_id, lang,
      |   md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
      |  FROM documents),
      | inc AS (SELECT * FROM fp WHERE doc_id % 4 >= 2),
      | ref AS (SELECT DISTINCT h FROM fp WHERE doc_id % 4 <= 1 AND h IS NOT NULL)
      | SELECT doc_id, lang FROM inc i
      | WHERE NOT EXISTS (SELECT 1 FROM ref r WHERE r.h = i.h)
      | ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** Cross-corpus NEAR-dup dedup ([[graft.ops.Dedup.minhashAgainst]]):
    * incoming docs (doc_id % 7 ≠ 0) that near-duplicate (3-gram Jaccard
    * ≥ 0.8) ANY reference doc (doc_id % 7 = 0) are dropped. Candidates via
    * banded MinHash bucket join, verified with exact Jaccard; the oracle
    * recomputes the EXACT against-law (inverted-index join on trigram
    * strings), so the gate also certifies that LSH candidate recall loses
    * no qualifying pair at this scale — the same exact-oracle discipline
    * as q_minhash_neardup.
    */
  def qMinhashAgainst(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    graft.ops.Dedup.minhashAgainst(
        docs.filter(col("doc_id") % 7 =!= 0),
        docs.filter(col("doc_id") % 7 === 0),
        "doc_id", "text")
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  lazy val qMinhashAgainstSql: String =
    s"""WITH toks AS (SELECT doc_id, $tokensSql AS tk FROM documents),
      | sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(tk)-2),
      |   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingles
      |  FROM toks WHERE len(tk) >= 3),
      | exi AS (SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n FROM sh
      |  WHERE doc_id % 7 <> 0 AND len(shingles) > 0),
      | exr AS (SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n FROM sh
      |  WHERE doc_id % 7 = 0 AND len(shingles) > 0),
      | pairs AS (SELECT i.doc_id AS ia, r.doc_id AS ir, COUNT(*) AS shared,
      |   any_value(i.n) AS ni, any_value(r.n) AS nr
      |  FROM exi i JOIN exr r USING (s) GROUP BY 1, 2),
      | flagged AS (SELECT DISTINCT ia FROM pairs
      |  WHERE CAST(shared AS DOUBLE)/(ni+nr-shared) >= 0.8)
      | SELECT doc_id, lang FROM documents d
      | WHERE doc_id % 7 <> 0
      |  AND NOT EXISTS (SELECT 1 FROM flagged f WHERE f.ia = d.doc_id)
      | ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** PERSISTED near-dup guard, full lifecycle oracled
    * ([[graft.ops.RefStore.writeMinhash]]/mergeMinhash +
    * [[graft.ops.Dedup.minhashAgainstStored]]): the reference corpus
    * commits its shingle/signature frames in two batches (doc_id % 9 ∈
    * {0, 1}); the incoming batch (% 9 ≥ 2) dedups against the LOADED
    * signatures without recomputing the reference side. The oracle
    * recomputes the EXACT against-law over the union of both committed
    * batches — the q_minhash_against discipline — so a store that loses a
    * signature row, appends under drifted law parameters, or breaks the
    * banding-from-stored-signatures path hash-mismatches here.
    */
  def qMinhashStore(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val store = storeOnce(dir, "mhstore") { s =>
      graft.ops.RefStore.writeMinhash(
        docs.filter(col("doc_id") % 9 === 0), "doc_id", "text", s)
      graft.ops.RefStore.mergeMinhash(
        docs.filter(col("doc_id") % 9 === 1), "doc_id", "text", s)
    }
    graft.ops.Dedup.minhashAgainstStored(
        docs.filter(col("doc_id") % 9 >= 2), store, "doc_id", "text")
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  lazy val qMinhashStoreSql: String =
    s"""WITH toks AS (SELECT doc_id, $tokensSql AS tk FROM documents),
      | sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(tk)-2),
      |   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingles
      |  FROM toks WHERE len(tk) >= 3),
      | exi AS (SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n FROM sh
      |  WHERE doc_id % 9 >= 2 AND len(shingles) > 0),
      | exr AS (SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n FROM sh
      |  WHERE doc_id % 9 <= 1 AND len(shingles) > 0),
      | pairs AS (SELECT i.doc_id AS ia, r.doc_id AS ir, COUNT(*) AS shared,
      |   any_value(i.n) AS ni, any_value(r.n) AS nr
      |  FROM exi i JOIN exr r USING (s) GROUP BY 1, 2),
      | flagged AS (SELECT DISTINCT ia FROM pairs
      |  WHERE CAST(shared AS DOUBLE)/(ni+nr-shared) >= 0.8)
      | SELECT doc_id, lang FROM documents d
      | WHERE doc_id % 9 >= 2
      |  AND NOT EXISTS (SELECT 1 FROM flagged f WHERE f.ia = d.doc_id)
      | ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** PERSISTED SimHash signatures ([[graft.ops.RefStore.writeSimhash]] +
    * [[graft.ops.Dedup.simhashAgainstStored]]): the reference corpus
    * commits its 8-byte/doc signatures in two batches; the incoming split
    * screens against the LOADED frame (pigeonhole chunk join + exact
    * Hamming verify) without re-hashing the reference. Hash-oracled
    * through the FULL store lifecycle since the md5 signature law: the
    * oracle recomputes every signature from scratch and applies the exact
    * against-law (any reference doc within Hamming ≤ 3), so a store that
    * loses/garbles a signature row, or a chunk-join recall loss, fails
    * the hash gate — plus [[graft.Verify]]'s planted-recall floor stays
    * as the stored-path ratchet.
    */
  def qSimhashStore(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val store = storeOnce(dir, "shstore") { s =>
      graft.ops.RefStore.writeSimhash(
        docs.filter(col("doc_id") % 9 === 0), "doc_id", "text", s)
      graft.ops.RefStore.mergeSimhash(
        docs.filter(col("doc_id") % 9 === 1), "doc_id", "text", s)
    }
    graft.ops.Dedup.simhashAgainstStored(
        docs.filter(col("doc_id") % 9 >= 2), store, "doc_id", "text")
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  lazy val qSimhashStoreSql: String =
    s"""WITH $simhashSigsSql,
      | flg AS (SELECT DISTINCT i.doc_id FROM sigs i JOIN sigs r
      |  ON i.doc_id % 9 >= 2 AND r.doc_id % 9 <= 1
      |   AND bit_count(xor(i.hi, r.hi)) + bit_count(xor(i.lo, r.lo)) <= 3)
      | SELECT doc_id, lang FROM documents d
      | WHERE doc_id % 9 >= 2
      |  AND NOT EXISTS (SELECT 1 FROM flg f WHERE f.doc_id = d.doc_id)
      | ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** Duplicate-inflation report ([[graft.ops.Dedup.dupInflation]]) per
    * source, over the corpus plus a re-crawl slice (every 5th document
    * re-appears uppercased — an exact duplicate under the normalized
    * fingerprint law): which sources' volume is duplicate re-counting,
    * and by how much. Exact integers end to end.
    */
  def qDupInflation(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val recrawl = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        upper(col("text")).as("text"), col("source"))
    graft.ops.Dedup.dupInflation(
        docs.unionByName(recrawl), "text", "source")
      .orderBy("stratum")
  }

  lazy val qDupInflationSql: String =
    s"""WITH corpus AS (
      |  SELECT doc_id, text, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, upper(text), source FROM documents
      |  WHERE doc_id % 5 = 0),
      | f AS (SELECT source AS stratum,
      |   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
      |   CAST(len(${tokensSqlOf("text")}) AS BIGINT) AS tk
      |  FROM corpus WHERE source IS NOT NULL),
      | pc0 AS (SELECT stratum, CAST(COUNT(*) AS BIGINT) AS docs,
      |   CAST(SUM(tk) AS BIGINT) AS tks, MIN(tk) AS keep_tk
      |  FROM f WHERE fp IS NOT NULL GROUP BY stratum, fp),
      | pc AS (SELECT stratum, docs, tks, keep_tk FROM pc0
      |  UNION ALL
      |  SELECT stratum, CAST(1 AS BIGINT), tk, tk FROM f WHERE fp IS NULL)
      | SELECT stratum, CAST(SUM(docs) AS BIGINT) AS n_docs,
      |  CAST(COUNT(*) AS BIGINT) AS n_uniq,
      |  CAST(SUM(docs - 1) AS BIGINT) AS n_dup_docs,
      |  CAST(SUM(tks) AS BIGINT) AS n_tokens,
      |  CAST(SUM(keep_tk) AS BIGINT) AS uniq_tokens,
      |  CAST(SUM(tks) - SUM(keep_tk) AS BIGINT) AS dup_tokens,
      |  CASE WHEN SUM(keep_tk) > 0 THEN
      |   CAST(SUM(tks) AS DOUBLE) / CAST(SUM(keep_tk) AS DOUBLE) END AS inflation
      | FROM pc GROUP BY stratum ORDER BY stratum""".stripMargin.replace("\n", " ")

  /** Compression-ratio redundancy signal
    * ([[graft.functions.TextFns.deflateScala]]): per-source deflate
    * ratios — the "machine-generated text compresses too well" screen.
    * The byte counts are zlib-implementation constants, NOT a
    * cross-engine law, so this is a rows-only query; the ordering
    * invariant (repetitive ≪ diverse) is floor-gated in `graft.Verify`
    * and unit-pinned.
    */
  def qCompressRatio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("source"), col("text"))
      .as[(String, String)]
      .mapPartitions(_.map { case (source, text) =>
        val (raw, defl, _) = graft.functions.TextFns.deflateScala(text)
        (source, raw, defl)
      })
      .toDF("stratum", "_raw", "_defl")
      .filter(col("stratum").isNotNull)
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_raw")).as("raw_bytes"),
        sum(col("_defl")).as("deflate_bytes"))
      .withColumn("mean_ratio",
        when(col("raw_bytes") > 0L,
          col("deflate_bytes").cast("double") / col("raw_bytes").cast("double")))
      .orderBy("stratum")
  }

  /** PERSISTED canonical map ([[graft.ops.RefStore.writeCanonicalMap]] +
    * loadCanonicalMap): dedup's dup→survivor pairs commit in two
    * OVERLAPPING batches (re-learned pairs must be absorbed); the loaded
    * map is the min-label closure, and remapping the re-crawled corpus
    * must hash-match the direct min-per-fingerprint law — including any
    * NATURAL exact duplicates the corpus already carries.
    */
  def qCanonicalRemap(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    val corpus = docs
      .unionByName(docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          upper(col("text")).as("text")))
      .unionByName(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"),
          concat(lit("  "), col("text")).as("text")))
    val withFp = corpus.select(col("doc_id"),
      graft.functions.TextFns.fingerprintMd5(col("text")).as("_fp"))
    val mins = withFp.groupBy(col("_fp")).agg(min(col("doc_id")).as("_canon"))
    val pairs = withFp.join(mins, "_fp")
      .filter(col("doc_id") =!= col("_canon"))
      .select(col("doc_id").as("dup_id"), col("_canon").as("canon_id"))
    val store = storeOnce(dir, "canonstore") { s =>
      graft.ops.RefStore.writeCanonicalMap(
        pairs.filter(col("dup_id") % 2 === 0), "dup_id", "canon_id", s)
      graft.ops.RefStore.mergeCanonicalMap(pairs, "dup_id", "canon_id", s)
    }
    val map = graft.ops.RefStore.loadCanonicalMap(spark, store)
    corpus.join(map, col("doc_id") === col("dup_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canon_id"), col("doc_id")).as("canonical_id"))
      .orderBy("doc_id")
  }

  lazy val qCanonicalRemapSql: String =
    """WITH corpus AS (SELECT doc_id, text FROM documents
      | UNION ALL SELECT doc_id + 100000, upper(text) FROM documents WHERE doc_id % 5 = 0
      | UNION ALL SELECT doc_id + 200000, '  ' || text FROM documents WHERE doc_id % 10 = 0),
      | f AS (SELECT doc_id,
      |   md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp FROM corpus)
      | SELECT doc_id,
      |  CAST(MIN(doc_id) OVER (PARTITION BY fp) AS BIGINT) AS canonical_id
      | FROM f ORDER BY doc_id""".stripMargin.replace("\n", " ")
}
