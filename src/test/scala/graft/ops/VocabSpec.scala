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
}
