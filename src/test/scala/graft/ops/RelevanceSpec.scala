package graft.ops

import graft.SparkSpec

class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  // "rare" appears in one doc; "filler" in every doc; doc 3 is empty
  private lazy val docs = Seq(
    (1L, "filler rare filler"),
    (2L, "filler common common"),
    (3L, ""),
    (4L, "filler common")
  ).toDF("doc_id", "text")

  test("tfidf: rare term outranks common term despite lower tf") {
    val r = Relevance.tfidfTopTerms(docs, "doc_id", "text", k = 3, nDocs = 4L)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getString(2), x.getLong(3), x.getLong(4), x.getDouble(5)))
      .toMap
    // doc 1: "rare" (tf=1, df=1, idf=(4-1)/1=3 → 3.0) beats
    // "filler" (tf=2, df=3, idf=1/3 → 0.667)
    assert(r((1L, 1L))._1 === "rare")
    assert(r((1L, 1L))._4 === 3.0)
    assert(r((1L, 2L))._1 === "filler")
    // corpus-wide term "filler" in ALL docs scores (4-4)/4 = 0 exactly
    val filler4 = Relevance.tfidfTopTerms(
      Seq((1L, "filler a"), (2L, "filler b"), (3L, "filler c"), (4L, "filler d"))
        .toDF("doc_id", "text"), "doc_id", "text", k = 3, nDocs = 4L)
      .filter($"token" === "filler").select("score").as[Double].collect()
    assert(filler4.forall(_ === 0.0))
  }

  test("tfidf: k caps per-doc rows; empty docs yield none; ties break on token") {
    val out = Relevance.tfidfTopTerms(docs, "doc_id", "text", k = 1, nDocs = 4L)
    val byDoc = out.groupBy("doc_id").count().collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(byDoc.values.forall(_ === 1L))
    assert(!byDoc.contains(3L)) // empty doc absent
    // doc 2: "common" (tf=2, df=2, idf=1 → 2.0) is the head term
    val head2 = out.filter($"doc_id" === 2L).select("token").as[String].head()
    assert(head2 === "common")
    // equal-score tie: two singleton terms in one doc rank alphabetically
    val tied = Relevance.tfidfTopTerms(
      Seq((1L, "zeta alpha")).toDF("doc_id", "text"), "doc_id", "text",
      k = 2, nDocs = 1L)
      .orderBy("rk").select("token").as[String].collect()
    assert(tied.toSeq === Seq("alpha", "zeta"))
  }

  test("bm25: term-dense short docs rank first; non-matching docs absent; k caps") {
    val corpus = Seq(
      (1L, "spark spark spark"), // dense, short → highest
      (2L, "spark filler filler filler filler filler filler filler filler"),
      (3L, "nothing relevant here at all"),
      (4L, "spark spark filler")
    ).toDF("doc_id", "text")
    val r = Relevance.bm25TopDocs(corpus, "doc_id", "text", Seq("spark"), k = 10)
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    assert(r.map(_._1).toSeq === Seq(1L, 4L, 2L)) // rank order
    assert(!r.map(_._1).contains(3L)) // no query term → not a candidate
    assert(r.map(_._2).toSeq === r.map(_._2).sortBy(-_).toSeq)
    val capped = Relevance.bm25TopDocs(corpus, "doc_id", "text", Seq("spark"), k = 2)
    assert(capped.count() === 2)
  }

  test("bm25: multi-term scores are the left-assoc sum of per-term contributions") {
    // doc 1 matches both terms, doc 2 only one — two-term score strictly
    // dominates when tf/len are equal
    val corpus = Seq(
      (1L, "alpha beta"),
      (2L, "alpha gamma"),
      (3L, "delta delta")
    ).toDF("doc_id", "text")
    val r = Relevance.bm25TopDocs(corpus, "doc_id", "text",
      Seq("alpha", "beta"), k = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) > r(2L))
    assert(!r.contains(3L))
    // single-term retrieval on the shared term gives both docs the SAME
    // score (identical tf, len, df) — the doc_id tiebreak orders them
    val tie = Relevance.bm25TopDocs(corpus, "doc_id", "text", Seq("alpha"), k = 10)
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    assert(tie(0)._2 === tie(1)._2 && tie(0)._1 === 1L)
  }
}
