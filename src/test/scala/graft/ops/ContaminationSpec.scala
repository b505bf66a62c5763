package graft.ops

import graft.SparkSpec

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("shingleStringsScala: sliding distinct n-grams, short text empty") {
    assert(Contamination.shingleStringsScala("a b c d", 3).toSeq ===
      Seq("a b c", "b c d"))
    assert(Contamination.shingleStringsScala("a b", 3).isEmpty)
    assert(Contamination.shingleStringsScala("a a a a", 2).toSeq === Seq("a a"))
    assert(Contamination.shingleStringsScala(null, 2).isEmpty)
  }

  test("docs sharing an n-gram with the benchmark are flagged with hit counts") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "entirely different words in this one here now"),
      (3L, "quick brown fox jumps high and brown fox jumps over")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "a quick brown fox jumps straight up")).toDF("doc_id", "text")
    val got = Contamination.check(corpus, bench, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // bench 4-grams: {a quick brown fox, quick brown fox jumps,
    //  brown fox jumps straight, fox jumps straight up} — each corpus doc
    // overlaps only on "quick brown fox jumps"
    assert(got(1L) === ((1L, true)))
    assert(got(2L) === ((0L, false)))
    assert(got(3L) === ((1L, true)))
  }

  test("checkLarge (shuffle semi-join) returns exactly check's output") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "entirely different words in this one here now"),
      (3L, "quick brown fox jumps high and brown fox jumps over")).toDF("doc_id", "text")
    // duplicate shingles across benchmark docs: the semi-join must not
    // multiply a corpus doc's hit count by reference-side occurrences
    val bench = Seq(
      (100L, "a quick brown fox jumps straight up"),
      (101L, "that quick brown fox jumps again today")).toDF("doc_id", "text")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(collect(Contamination.checkLarge(corpus, bench, "doc_id", "text", n = 4)) ===
      collect(Contamination.check(corpus, bench, "doc_id", "text", n = 4)))
  }

  test("every corpus doc appears exactly once, clean docs included") {
    val corpus = Seq((1L, "x y z"), (2L, "p q r")).toDF("doc_id", "text")
    val bench = Seq((9L, "x y z w")).toDF("doc_id", "text")
    val got = Contamination.check(corpus, bench, "doc_id", "text", n = 3)
    assert(got.count() === 2)
    assert(got.filter($"contaminated").collect().map(_.getLong(0)).toSeq === Seq(1L))
  }
}
