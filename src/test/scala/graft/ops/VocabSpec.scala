package graft.ops

import graft.SparkSpec

class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("adjacent-pair counts: exact multiset with deterministic tiebreak") {
    val docs = Seq(
      "the cat sat",            // "the cat", "cat sat"
      "the cat ran",            // "the cat", "cat ran"
      "  the   cat  ",          // whitespace-law: still "the cat"
      "single",                 // < 2 tokens → nothing
      "",                       // blank → nothing
      null.asInstanceOf[String] // NULL → nothing
    ).toDF("text")
    val got = Vocab.topPairCounts(docs, "text", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    // count desc, then pair asc
    assert(got === List(("the cat", 3L), ("cat ran", 1L), ("cat sat", 1L)))
  }

  test("k truncates after the deterministic order") {
    val docs = Seq("a b", "a b", "b c", "c d").toDF("text")
    val got = Vocab.topPairCounts(docs, "text", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(got === List(("a b", 2L), ("b c", 1L)))
  }

  test("pairs overlap (every adjacent position counted, not chunked)") {
    val docs = Seq("w x y z").toDF("text")
    val got = Vocab.topPairCounts(docs, "text", k = 10)
      .collect().map(_.getString(0)).toSet
    assert(got === Set("w x", "x y", "y z"))
  }

  test("property: total pair mass equals sum of max(0, n_tokens - 1)") {
    val rnd = new scala.util.Random(3L)
    val vocab = Array("aa", "bb", "cc", "dd")
    val texts = Seq.fill(60)(
      Seq.fill(rnd.nextInt(6))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    val docs = texts.toDF("text")
    val totalPairs = Vocab.topPairCounts(docs, "text", k = 1000)
      .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    val want = texts.map(t => math.max(0,
      graft.functions.TextFns.tokensScala(t).length - 1).toLong).sum
    assert(totalPairs === want)
  }

  test("BPE: merges learn the dominant pair; encode compresses monotonically; round-trip exact") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "lower lower lower newest newest widest low low low low"),
      (2L, "lower newest newest er er est low lowest"),
      (3L, "an unrelated </w> literal marker survives decoding intact"))
      .toDF("doc_id", "text")

    val merges = Vocab.trainBpeMerges(docs, "text", numMerges = 50)
    assert(merges.nonEmpty)
    // the first merge is the most frequent weighted symbol pair: 'l'+'o'
    // ("low"×5, "lower"×4, "lowest"×1 all contribute l,o at rank 1 weight 10)
    assert(merges.head === (("l", "o")), s"first merge was ${merges.head}")

    // more merges never increase the encoded length; enough merges reach
    // one-symbol-per-frequent-word
    def totalBpe(n: Int): Long = {
      val m = Vocab.trainBpeMerges(docs, "text", numMerges = n)
      Vocab.encodeBpe(docs, "doc_id", "text", m)
        .agg(sum("n_bpe_tokens")).head.getLong(0)
    }
    val t0 = totalBpe(0); val t10 = totalBpe(10); val t50 = totalBpe(50)
    assert(t0 >= t10 && t10 >= t50, s"$t0 >= $t10 >= $t50 violated")
    assert(t50 < t0, "merges compressed nothing")

    // round-trip witness: decoded stream md5 equals the original
    // token-stream md5 for EVERY doc — including the literal "</w>" text
    val enc = Vocab.encodeBpe(docs, "doc_id", "text", merges)
      .select("doc_id", "stream_hash").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = docs.select(col("doc_id"),
        graft.functions.TextFns.orderedFingerprintMd5(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(enc === want)
  }
}
