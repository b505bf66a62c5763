package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies: "target-ish" docs vs "other" docs
  private lazy val corpus = Seq(
    (1L, "alpha beta gamma alpha beta alpha"),
    (2L, "alpha gamma beta gamma alpha gamma"),
    (3L, "umber vermilion woad umber vermilion"),
    (4L, "woad umber vermilion woad woad umber"),
    (5L, ""),
    (6L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")
  private lazy val target = corpus.filter($"doc_id" <= 2)

  test("ratio table: always exactly `buckets` rows, missing buckets at the smoothing floor") {
    val ratios = Importance.hashedRatioTable(target, corpus, "text", buckets = 64)
    assert(ratios.count() === 64)
    // an untouched bucket's ratio is ((ln 1 - ln(T+B)) - ln 1) + ln(S+B):
    // positive here because the source total exceeds the target total
    val lrs = ratios.select("lr_micro").as[Long].collect()
    val t = 12L; val s = 23L; val b = 64L // token occurrences above + buckets
    val floor = math.round(
      (((math.log(1.0) - math.log((t + b).toDouble)) - math.log(1.0)) +
        math.log((s + b).toDouble)) * 1e6)
    assert(lrs.contains(floor), s"smoothing-floor ratio $floor missing")
  }

  test("weights: target-vocabulary docs outscore disjoint-vocabulary docs; empty text weighs 0") {
    val ratios = Importance.hashedRatioTable(target, corpus, "text")
    val w = Importance.importanceWeights(corpus, "doc_id", "text", ratios)
      .select("doc_id", "weight_micro").as[(Long, Long)].collect().toMap
    assert(w(1L) > 0 && w(2L) > 0, s"target-ish docs must score positive: $w")
    assert(w(3L) < 0 && w(4L) < 0, s"disjoint-vocab docs must score negative: $w")
    assert(w(5L) === 0L && w(6L) === 0L, "blank/NULL text weighs exactly 0")
    assert(math.min(w(1L), w(2L)) > math.max(w(3L), w(4L)))
  }

  test("dsirSelect: top-k prefers the target look-alikes, deterministic order") {
    val top = Importance.dsirSelect(corpus, target, "doc_id", "text", k = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(top.toSet === Set(1L, 2L))
    val again = Importance.dsirSelect(corpus, target, "doc_id", "text", k = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(again === top)
  }

  test("bigram features see word order where unigrams cannot") {
    // doc 2 is a PERMUTATION of doc 1: identical unigram bag, disjoint
    // bigrams. With ngrams=Seq(1) both score the same; with Seq(1,2) the
    // true word-order match must outscore the permutation.
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "zeta epsilon delta gamma beta alpha"),
      (3L, "umber vermilion woad ochre sienna teal")).toDF("doc_id", "text")
    val target = corpus.filter($"doc_id" === 1L)
    def weights(ngrams: Seq[Int]): Map[Long, Long] = {
      val r = Importance.hashedRatioTable(target, corpus, "text", ngrams = ngrams)
      Importance.importanceWeights(corpus, "doc_id", "text", r, ngrams = ngrams)
        .select("doc_id", "weight_micro").as[(Long, Long)].collect().toMap
    }
    val uni = weights(Seq(1))
    assert(uni(1L) === uni(2L), "unigram law is order-blind by construction")
    val bi = weights(Seq(1, 2))
    assert(bi(1L) > bi(2L), s"bigrams must break the permutation tie: $bi")
    assert(bi(2L) > bi(3L), "shared unigrams still beat a disjoint vocabulary")
  }

  test("narrow scorer ≡ declarative scorer, exactly (integer law, both strategies)") {
    for (ngrams <- Seq(Seq(1), Seq(1, 2))) {
      val ratios = Importance.hashedRatioTable(target, corpus, "text", ngrams = ngrams)
      val wide = Importance.importanceWeights(corpus, "doc_id", "text", ratios,
        ngrams = ngrams)
        .select("doc_id", "weight_micro").as[(Long, Long)].collect().toMap
      val narrow = Importance.importanceWeightsNarrow(corpus, "doc_id", "text", ratios,
        ngrams = ngrams)
        .select("doc_id", "weight_micro").as[(Long, Long)].collect().toMap
      assert(narrow === wide, s"strategies diverge for ngrams=$ngrams")
    }
  }

  test("bigram bucket stream: object-boundary UDF ≡ the declarative SQL law") {
    // orders > 1 route through the Scala law twins (featuresScala +
    // bucketScala) for throughput; this pins them against the SQL
    // expression law (featuresCol + bucketOf) they must never drift from
    val texts = corpus.union(Seq(
      (7L, "ünïcode tokens AND   irregular   spacing here"),
      (8L, "one"),
      (9L, "a b a b a b")).toDF("doc_id", "text"))
    val declared = texts
      .select(explode(Importance.featuresCol(col("text"), Seq(1, 2))).as("_tok"))
      .select(Importance.bucketOf(col("_tok"), 64).as("b"))
      .groupBy("b").count().as[(Int, Long)].collect().toMap
    val viaCounts = Importance.bucketCounts(texts, "text", 64, Seq(1, 2))
      .as[(Int, Long)].collect().toMap
    assert(viaCounts === declared, "bigram UDF path diverged from the SQL law")
  }

  test("gate fixture: every bucket's lr·1e6 sits far from a rounding boundary") {
    // the DuckDB oracle takes its own libm ln; a hash flip needs a bucket
    // whose unquantized lr·1e6 lies within ~1e-7 of a .5 boundary. Pin the
    // actual gate data (sf0.01, the q_dsir_select configuration) orders of
    // magnitude clear of that window, so the gate cannot flake on libm.
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def cmap(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
      Importance.bucketCounts(df, "text", 256, Seq(1))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val margin = Importance.minBoundaryMarginMicro(
      cmap(docs.filter($"lang" === "en")), cmap(docs), 256)
    assert(margin > 1e-4,
      f"gate-fixture boundary margin $margin%g too close to a .5 flip")
  }

  test("weight law is an exact integer sum: clone a doc's tokens, weight doubles") {
    val dup = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma alpha beta gamma")).toDF("doc_id", "text")
    val ratios = Importance.hashedRatioTable(dup.filter($"doc_id" === 1L), dup, "text")
    val w = Importance.importanceWeights(dup, "doc_id", "text", ratios)
      .select("doc_id", "weight_micro").as[(Long, Long)].collect().toMap
    assert(w(2L) === 2L * w(1L), "doubling occurrences must exactly double the integer weight")
  }
}
