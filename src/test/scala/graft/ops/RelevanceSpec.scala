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

  test("bm25TopDocsBatch matches a Scala replay of the micro-quantized batch law") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "spark merge spark"),
      (2L, "spark table"),
      (3L, "window window table"),
      (4L, "nothing relevant here at all"))
      .toDF("doc_id", "text")
    val queries = Seq("qa" -> Seq("spark", "merge"), "qb" -> Seq("table", "window"))
    val got = Relevance.bm25TopDocsBatch(corpus, "doc_id", "text", queries, k = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // replay: identical idf/norm chain, HALF_UP micro rounding, integer sum
    val texts = Map(1L -> "spark merge spark", 2L -> "spark table",
      3L -> "window window table", 4L -> "nothing relevant here at all")
    val lens = texts.map { case (d, t) => d -> t.split("\\s+").length.toLong }
    val n = texts.size.toLong
    val avg = lens.values.sum.toDouble / n.toDouble
    def tf(d: Long, t: String) = texts(d).split("\\s+").count(_ == t).toLong
    val vocab = queries.flatMap(_._2).distinct
    def dfreq(t: String) = texts.keys.count(d => tf(d, t) > 0).toLong
    def cm(d: Long, t: String): Long = {
      val f = tf(d, t)
      if (f == 0) 0L
      else {
        val idf = ((n - dfreq(t)).toDouble + 0.5) / (dfreq(t).toDouble + 0.5)
        val norm = (f.toDouble * 2.2) /
          (f.toDouble + 1.2 * (0.25 + 0.75 * (lens(d).toDouble / avg)))
        BigDecimal((idf * norm) * 1000000.0)
          .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
      }
    }
    require(vocab.nonEmpty)
    val want = (for {
      (qn, ts) <- queries
      d <- texts.keys if ts.exists(t => tf(d, t) > 0)
    } yield (qn, d) -> ts.map(t => cm(d, t)).sum).toMap
    val wantRanked = want.groupBy(_._1._1).flatMap { case (qn, scores) =>
      scores.toSeq.sortBy { case ((_, d), s) => (-s, d) }.take(3).zipWithIndex
        .map { case (((_, d), s), i) => (qn, d) -> ((i + 1L, s)) }
    }
    assert(got === wantRanked)
  }

  test("bm25TopDocsBatch: a term shared by two queries scores in both") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    val got = Relevance.bm25TopDocsBatch(corpus, "doc_id", "text",
        Seq("q1" -> Seq("alpha"), "q2" -> Seq("alpha", "gamma")), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("q1", 1L), ("q2", 1L), ("q2", 2L)))
  }
}
