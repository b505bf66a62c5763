package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and exact n-gram Jaccard. All are shuffle-aware distributed
  * plans — candidate generation is always a bucket-join (never an O(n²)
  * cross join), so they scale to billions of documents:
  *
  *   - exact: one hash-aggregate shuffle on the content fingerprint.
  *   - MinHash LSH: narrow signature computation (per-row expression trees),
  *     explode to (band, bandHash) buckets, self-join within buckets (shuffle
  *     on bucket key), then exact-Jaccard verification of candidates only.
  *   - SimHash: narrow 64-bit signature, bucket-join on 16-bit chunks
  *     (pairs within Hamming distance k share a chunk for k ≤ 3 by
  *     pigeonhole), verify with bit_count(xor).
  *   - n-gram Jaccard: explode distinct shingles, join on shingle, count
  *     shared per pair — exact, for bounded corpora or as the verify stage.
  *
  * Skew note: a degenerate band bucket (e.g. empty-text signature) would
  * quadratically blow up the bucket join; `maxBucket` caps candidate
  * generation per bucket, the standard LSH guard at scale.
  */
object Dedup {

  /** Exact dedup on a content fingerprint. Returns one survivor row per
    * distinct content: (content_hash, survivor_id, dup_count).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextFns.fingerprintMd5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("dup_count"))

  /** Per-document MinHash signature: numHashes independent min-hashes over
    * word-shingle hashes. Seed-rehash construction: h_i(s) = xxhash64(h(s), i).
    * Pure per-row expression tree — no shuffle, no UDF.
    */
  def minhashSignature(text: Column, numHashes: Int = 64, shingleSize: Int = 3): Column = {
    val shingleHashes = transform(TextFns.shingles(text, shingleSize), s => xxhash64(s))
    array((0 until numHashes).map { i =>
      array_min(transform(shingleHashes, h => xxhash64(h, lit(i))))
    }: _*)
  }

  /** MinHash+LSH near-duplicate pairs: returns (id_a, id_b, jaccard) with
    * id_a < id_b and exact-verified jaccard ≥ threshold. Candidate recall is
    * governed by (numHashes, bands): P[candidate] = 1-(1-j^r)^b with
    * r = numHashes/bands.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      threshold: Double = 0.8, maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig = df.select(col(idCol).as("_id"), col(textCol).as("_text"))
      .withColumn("_sig", minhashSignature(col("_text"), numHashes, shingleSize))
    val banded = sig.select(col("_id"), explode(
      array((0 until bands).map { b =>
        struct(lit(b).as("band"), xxhash64(concat_ws(",", slice(col("_sig"), b * r + 1, r))).as("bh"))
      }: _*)).as("bk"))
      .select(col("_id"), col("bk.band"), col("bk.bh"))
    // cap pathological buckets (all-empty docs etc.)
    val capped = banded.withColumn("_bn",
      count(lit(1)).over(Window.partitionBy("band", "bh")))
      .filter(col("_bn") <= maxBucket).drop("_bn")
    val cand = capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .distinct()
    verifyJaccard(cand, df, idCol, textCol, shingleSize, threshold)
  }

  /** Exact-Jaccard verification of candidate (id_a, id_b) pairs. */
  private def verifyJaccard(cand: DataFrame, df: DataFrame, idCol: String,
      textCol: String, shingleSize: Int, threshold: Double): DataFrame = {
    val sh = df.select(col(idCol).as("_jid"),
      TextFns.shingles(col(textCol), shingleSize).as("_sh"))
    cand
      .join(sh.select(col("_jid").as("id_a"), col("_sh").as("_sha")), "id_a")
      .join(sh.select(col("_jid").as("id_b"), col("_sh").as("_shb")), "id_b")
      .withColumn("_inter", size(array_intersect(col("_sha"), col("_shb"))).cast("double"))
      .withColumn("jaccard", col("_inter") /
        (size(col("_sha")) + size(col("_shb")) - col("_inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact n-gram Jaccard pairs via shingle inverted index: candidates are
    * pairs sharing ≥1 shingle; jaccard computed from shared/na/nb counts.
    * Exact but candidate count grows with shingle collision rate — use LSH
    * above when the corpus is web-scale.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = df.select(col(idCol).as("_id"),
      TextFns.shingles(col(textCol), shingleSize).as("_sh"))
      .filter(size(col("_sh")) > 0)
      .withColumn("_n", size(col("_sh")).cast("bigint"))
    val ex = sh.select(col("_id"), col("_n"), explode(col("_sh")).as("_s"))
    ex.as("a").join(ex.as("b"), col("a._s") === col("b._s") && col("a._id") < col("b._id"))
      .groupBy(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .agg(count(lit(1)).as("_shared"), first(col("a._n")).as("_na"), first(col("b._n")).as("_nb"))
      .withColumn("jaccard",
        col("_shared").cast("double") / (col("_na") + col("_nb") - col("_shared")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash of a document: sign-aggregate of per-token hash bits.
    * One pass over tokens with an array accumulator — narrow, codegen'd.
    */
  def simhash64(text: Column): Column = {
    val counts = aggregate(
      TextFns.tokens(text),
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0L), lit(63L)),
          (a, b) => a + when(
            call_function("shiftright", h, b.cast("int")).bitwiseAND(1L) === 1L, 1L)
            .otherwise(-1L))
      })
    aggregate(
      zip_with(counts, sequence(lit(0L), lit(63L)),
        (cnt, b) => when(cnt >= 0, call_function("shiftleft", lit(1L), b.cast("int")))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-duplicate pairs: bucket-join on 4×16-bit chunks (any pair
    * with Hamming distance ≤ 3 shares at least one chunk), verified with
    * bit_count(a xor b) ≤ maxHamming.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val sig = df.select(col(idCol).as("_id"), simhash64(col(textCol)).as("_sh"))
    val chunked = sig.select(col("_id"), col("_sh"), explode(
      array((0 until 4).map { k =>
        struct(lit(k).as("chunk"),
          shiftright(col("_sh"), k * 16).bitwiseAND(0xFFFFL).as("ch")).as("c")
      }: _*)).as("ck"))
      .select(col("_id"), col("_sh"), col("ck.chunk"), col("ck.ch"))
    val capped = chunked.withColumn("_bn",
      count(lit(1)).over(Window.partitionBy("chunk", "ch")))
      .filter(col("_bn") <= maxBucket).drop("_bn")
    capped.as("a").join(capped.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ch") === col("b.ch") &&
          col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        bit_count(col("a._sh").bitwiseXOR(col("b._sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
