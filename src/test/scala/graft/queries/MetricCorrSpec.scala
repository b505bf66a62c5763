package graft.queries

import graft.SparkSpec

/** Pearson-correlation law: the exact-moment engine form against a naive
  * double replay, plus range and sign sanity on real testdata.
  */
class MetricCorrSpec extends SparkSpec {

  test("metric correlations match a naive double replay on real testdata") {
    val dir = "/root/testdata/sf0.001"
    val got = Registry.qMetricCorr(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.keySet === Set("chars_words", "chars_syllables", "words_syllables"))
    // independent replay: straight doubles over the same metric law
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("n_chars", "text").collect().map { r =>
        val f = graft.functions.TextFns.fleschScala(r.getAs[String]("text"))
        (r.getAs[Long]("n_chars").toDouble, f.nWords.toDouble, f.nSyllables.toDouble)
      }
    def pearson(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size.toDouble
      val (ma, mb) = (a.sum / n, b.sum / n)
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      val va = a.map(x => (x - ma) * (x - ma)).sum
      val vb = b.map(y => (y - mb) * (y - mb)).sum
      if (va == 0.0 || vb == 0.0) 0.0 else cov / (math.sqrt(va) * math.sqrt(vb))
    }
    val (xs, ys, zs) = (rows.map(_._1).toSeq, rows.map(_._2).toSeq, rows.map(_._3).toSeq)
    val want = Map(
      "chars_words" -> pearson(xs, ys),
      "chars_syllables" -> pearson(xs, zs),
      "words_syllables" -> pearson(ys, zs))
    want.foreach { case (k, w) =>
      assert(math.abs(got(k) - w) < 1e-9, s"$k: engine ${got(k)} vs naive $w")
      assert(got(k) >= -1.0 && got(k) <= 1.0 + 1e-12, s"$k out of range")
    }
    // text length and token count must correlate strongly on any real corpus
    assert(got("chars_words") > 0.9, s"suspicious chars~words r ${got("chars_words")}")
  }

  test("lexical diversity law: types, hapax, and the zero-token row") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("lexdiv").toString
    Seq(
      (1L, "a b a c a"),   // 5 tokens, 3 types, hapax {b, c} = 2
      (2L, "x x x"),       // 3 tokens, 1 type, 0 hapax → ttr 1/3
      (3L, ""), (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Registry.qLexicalDiversity(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got(1L) === ((5L, 3L, 2L, 3.0 / 5.0, 2.0 / 5.0)))
    assert(got(2L) === ((3L, 1L, 0L, 1.0 / 3.0, 0.0)))
    assert(got(3L) === ((0L, 0L, 0L, 0.0, 0.0)))
    assert(got(4L) === ((0L, 0L, 0L, 0.0, 0.0)))
  }

  test("script mix law: code-point classes, emoji count once, NBSP is other") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("scriptmix").toString
    Seq(
      (1L, "Ab 中я9 😀"), // 2 latin, 1 cjk, 1 cyr, 1 digit, 1 space, NBSP+emoji other
      (2L, "只有中文"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Registry.qScriptMix(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(got(1L) === Seq(2L, 1L, 1L, 1L, 1L, 2L, 2.0 / 4.0))
    assert(got(2L) === Seq(0L, 4L, 0L, 0L, 0L, 0L, 0.0))
    assert(got(3L) === Seq(0L, 0L, 0L, 0L, 0L, 0L, 0.0))
  }

  test("line-shape law: bullets, ellipses, short and blank lines, thresholds") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("lineshape").toString
    Seq(
      (1L, "- one\n* two items here\n• three\nplain line of text\n\nshort…\nok then..."),
      (2L, "…\n…\n…\nnormal"),   // a lone '…' is a 1-token non-blank line
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Registry.qLineShapes(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    // doc 1: 7 lines; bullets: -, *, • = 3; ellipsis: "short…", "ok then..." = 2;
    // short (≤2 tokens, non-blank): "- one", "• three", "short…", "ok then..." = 4;
    // blank: 1. bullet_frac 3/7 ≤ .9, ellipsis_frac 2/7 ≤ .3 → pass
    assert(got(1L) === Seq(7L, 3L, 2L, 4L, 1L, 3.0 / 7.0, 2.0 / 7.0, true))
    // doc 2: 4 lines, 3 pure-ellipsis lines → ellipsis_frac 0.75 > 0.3 → fail
    assert(got(2L) === Seq(4L, 0L, 3L, 4L, 0L, 0.0, 3.0 / 4.0, false))
    // NULL text → one blank line, passes vacuously
    assert(got(3L) === Seq(1L, 0L, 0L, 0L, 1L, 0.0, 0.0, true))
  }

  test("zero-variance pairs read 0.0 by law") {
    import spark.implicits._
    val sp = spark
    import org.apache.spark.sql.functions._
    // all-identical docs → every variance is 0 → all three r are 0.0;
    // a NULL-n_chars row rides along to pin the exclusion law
    val d = Seq.fill(4)((Some(7L), "one two three")).toDF("n_chars", "text")
      .union(Seq((Option.empty[Long], "different text entirely"))
        .toDF("n_chars", "text"))
    val tmp = java.nio.file.Files.createTempDirectory("corr-zero").toString
    d.withColumn("doc_id", monotonically_increasing_id())
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Registry.qMetricCorr(sp, tmp).collect()
    assert(rows.forall(_.getLong(1) === 4L),
      "the NULL-n_chars row must be excluded from n by law")
    val got = rows.map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.values.forall(_ === 0.0), s"zero-variance corpus must read 0.0: $got")
  }
}
