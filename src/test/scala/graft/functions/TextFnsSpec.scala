package graft.functions

import graft.SparkSpec

class TextFnsSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def one[T](text: String, c: org.apache.spark.sql.Column): T =
    Seq(text).toDF("t").select(c).head.getAs[T](0)

  test("tokenCount: whitespace runs, trim, blank → 0") {
    assert(one[Long]("a b  c", TextFns.tokenCount(col("t"))) === 3L)
    assert(one[Long]("  a\t b \n", TextFns.tokenCount(col("t"))) === 2L)
    assert(one[Long]("", TextFns.tokenCount(col("t"))) === 0L)
    assert(one[Long]("   ", TextFns.tokenCount(col("t"))) === 0L)
  }

  test("punctCount and subwordCount") {
    assert(one[Long]("Hi, there! Ok?", TextFns.punctCount(col("t"))) === 3L)
    // ceil(len/4) per token: "abcdefgh"→2, "abc"→1, "abcde"→2
    assert(one[Long]("abcdefgh abc abcde", TextFns.subwordCount(col("t"))) === 5L)
  }

  test("langId: charset + stopword cascade") {
    assert(one[String]("the cat is in the hat", TextFns.langId(col("t"))) === "en")
    assert(one[String]("der hund und die katze ist nicht da", TextFns.langId(col("t"))) === "de")
    assert(one[String]("le chat est dans la maison et il dort", TextFns.langId(col("t"))) === "fr")
    assert(one[String]("el perro y el gato es un animal en casa", TextFns.langId(col("t"))) === "es")
    assert(one[String]("这是中文文本", TextFns.langId(col("t"))) === "zh")
    assert(one[String]("zzz qqq www", TextFns.langId(col("t"))) === "und")
    // tie prefers en (deterministic cascade)
    assert(one[String]("the der", TextFns.langId(col("t"))) === "en")
  }

  test("qualityScore: bounded [0,1], monotone in stopword ratio") {
    val hi = one[Double]("the cat is on the mat and it is a good day for the walk " * 5,
      TextFns.qualityScore(col("t")))
    val lo = one[Double]("zzz!!! ??? ... ;;; :::", TextFns.qualityScore(col("t")))
    assert(hi > lo)
    assert(hi <= 1.0 && lo >= 0.0)
    assert(one[Double]("", TextFns.qualityScore(col("t"))) === 0.0)
  }

  test("statsScala twin: bit-equal to the expression laws on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaExprs = docs.select(
      col("doc_id"),
      TextFns.tokenCount(col("text")).as("n_tokens"),
      TextFns.subwordCount(col("text")).as("n_subwords"),
      TextFns.punctCount(col("text")).as("n_punct"),
      TextFns.stopwordCount(col("text")).as("n_stopwords"),
      TextFns.qualityScore(col("text")).as("quality"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    val viaScala = docs.select("doc_id", "text").collect().map { r =>
      val s = TextFns.statsScala(r.getString(1))
      r.getLong(0) -> (s.nTokens, s.nSubwords, s.nPunct, s.nStopwords, s.quality)
    }.toMap
    assert(viaScala === viaExprs) // exact ==, including the double quality
  }

  test("statsScala twin: edge cases match the expression laws") {
    for (text <- Seq("", "   ", "a", "the the the", "Hi, there! Ok?",
        "x\ty \n z", "zzz!!! ??? ... ;;; :::")) {
      val r = Seq(text).toDF("t").select(
        TextFns.tokenCount(col("t")), TextFns.subwordCount(col("t")),
        TextFns.punctCount(col("t")), TextFns.stopwordCount(col("t")),
        TextFns.qualityScore(col("t"))).head
      val s = TextFns.statsScala(text)
      assert((s.nTokens, s.nSubwords, s.nPunct, s.nStopwords, s.quality) ===
        ((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))), s"text=<$text>")
    }
  }

  test("gopherScala: hand-checked duplicate-line and top-gram laws") {
    // 4 lines, "dup" twice: distinct 3 of 4; dup chars = 3 of 3+3+1+1=8
    val g = TextFns.gopherScala("dup\ndup\na\nb")
    assert(g.nLines === 4L)
    assert(g.dupLineFrac === 1.0 - 3.0 / 4.0)
    assert(g.dupLineCharFrac === 3.0 / 8.0)
    // tokens: dup dup a b → top 2-gram "dup dup" (others unique, tie law
    // picks the smallest; "a b" < "dup a"... count first: "dup dup"=1,
    // "dup a"=1, "a b"=1 — all 1, tie → lexicographically smallest "a b")
    assert(g.top2CharFrac === (1L * 3L).toDouble / 11.0) // "a b"=3 cp, text=11 cp
    assert(g.meanWordLen === (3 + 3 + 1 + 1).toDouble / 4.0)
    assert(g.alphaWordFrac === 1.0)
    assert(!g.gopherPass) // far under 50 tokens

    // empty/null: one empty line, zero tokens, all ratios 0
    for (t <- Seq("", null)) {
      val e = TextFns.gopherScala(t)
      assert(e.nTokens === 0L && e.nLines === 1L)
      assert(e.dupLineFrac === 0.0 && e.dupLineCharFrac === 0.0)
      assert(e.top2CharFrac === 0.0 && e.top3CharFrac === 0.0)
      assert(e.meanWordLen === 0.0 && e.alphaWordFrac === 0.0 && !e.gopherPass)
    }

    // a passing document: 60 distinct-ish words, clean shape
    val good = (1 to 60).map(i => s"word$i").mkString(" ")
    val gp = TextFns.gopherScala(good)
    assert(gp.nTokens === 60L && gp.gopherPass,
      s"clean 60-word doc must pass: $gp")

    // heavy 2-gram repetition fails the coverage rule even at good length
    val spam = Array.fill(30)("buy now").mkString(" ") + " " +
      (1 to 10).map(i => s"tail$i").mkString(" ")
    val gs = TextFns.gopherScala(spam)
    assert(gs.top2CharFrac > 0.20 && !gs.gopherPass)
  }

  test("c4Scala: line retention, page flags, sentence threshold — hand-checked") {
    // retained: ends in terminal punct AND >= 3 words AND no 'javascript'
    val doc = Seq(
      "This is a fine sentence.",          // kept
      "Short one.",                        // dropped: 2 words
      "No terminal punctuation here",      // dropped: no terminal mark
      "Please enable JavaScript to view.", // dropped: javascript rule
      "He said \"stop right there\"",      // kept: closing quote is terminal
      "Another good sentence ends here!",  // kept
      "").mkString("\n")                   // dropped: empty
    val c = TextFns.c4Scala(doc)
    assert(c.nLines === 7L && c.nKept === 3L)
    assert(c.cleanText === Seq(
      "This is a fine sentence.",
      "He said \"stop right there\"",
      "Another good sentence ends here!").mkString("\n"))
    // sentences count . ! ? in the CLEANED text: 1 + 0 + 1
    assert(c.nSentences === 2L)
    assert(!c.hasLorem && !c.hasBrace)
    assert(!c.c4Keep, "under 5 sentences must not keep")

    // five+ sentences → keep; lorem/brace flags veto over the RAW text
    val five = (1 to 5).map(i => s"Sentence number $i is right here.").mkString("\n")
    assert(TextFns.c4Scala(five).c4Keep)
    assert(!TextFns.c4Scala(five + "\nlorem ipsum dolor sit amet.").c4Keep)
    val braced = TextFns.c4Scala(five + "\nvar x = { a: 1 };")
    assert(braced.hasBrace && !braced.c4Keep)

    // NULL/empty law: one empty line, nothing kept, nothing flagged
    val empty = TextFns.c4Scala(null)
    assert(empty.nLines === 1L && empty.nKept === 0L &&
      empty.cleanText === "" && !empty.c4Keep)
  }

  test("simpsonScala: exact integer sums; code points not UTF-16 units") {
    assert(TextFns.simpsonScala("aaa") === ((3L, 9L, 0.0)))
    assert(TextFns.simpsonScala("ab") === ((2L, 2L, 0.5)))
    assert(TextFns.simpsonScala("") === ((0L, 0L, 0.0)))
    assert(TextFns.simpsonScala(null) === ((0L, 0L, 0.0)))
    // an astral-plane char is ONE code point (SQL length/substr law),
    // though two UTF-16 units in the JVM string
    val (n, s2, _) = TextFns.simpsonScala("a😀a")
    assert(n === 3L && s2 === 5L, "emoji counts once: {a:2, emoji:1} → 4+1")
    // diversity is monotone: one-char spam → 0, all-distinct → max
    val (_, _, spam) = TextFns.simpsonScala("xxxxxxxx")
    val (_, _, varied) = TextFns.simpsonScala("abcdefgh")
    assert(spam === 0.0 && varied === 1.0 - 8.0 / 64.0)
  }

  test("shingles: distinct n-grams, short text → empty") {
    val sh = Seq("a b c d").toDF("t")
      .select(TextFns.shingles(col("t"), 3)).head.getSeq[String](0)
    assert(sh === Seq("a b c", "b c d"))
    assert(Seq("a b").toDF("t")
      .select(TextFns.shingles(col("t"), 3)).head.getSeq[String](0).isEmpty)
    // repeated shingles dedup
    val rep = Seq("x y x y x y").toDF("t")
      .select(TextFns.shingles(col("t"), 2)).head.getSeq[String](0)
    assert(rep === Seq("x y", "y x"))
  }

  test("fleschScala: hand-checked counts and formulas") {
    // 6 words, 2 sentence runs, syllables: the=1 cat=1 sat=1 here=2
    // so=1 quickly=2 (qu-i..: i, then y run) → wait: "quickly" vowel runs:
    // u-i? q(u)ickly → 'ui' is ONE run; 'y' another → 2. here: e, e → 2.
    val f = TextFns.fleschScala("The cat sat here. So quickly?!")
    assert(f.nWords === 6L)
    assert(f.nSentences === 2L)
    assert(f.nSyllables === (1L + 1L + 1L + 2L + 1L + 2L))
    val wps = 6.0 / 2.0; val spw = 8.0 / 6.0
    assert(f.flesch === 206.835 - 1.015 * wps - 84.6 * spw)
    assert(f.fkGrade === 0.39 * wps + 11.8 * spw - 15.59)
    // no terminal punctuation → raw run count 0, formulas divide by 1
    val g = TextFns.fleschScala("just words no stops")
    assert(g.nSentences === 0L)
    assert(g.flesch === 206.835 - 1.015 * 4.0 - 84.6 * (4.0 / 4.0))
    // vowel-free word floors at 1 syllable; zero words → all-zero metrics
    assert(TextFns.fleschScala("brr").nSyllables === 1L)
    assert(TextFns.fleschScala("") === TextFns.FleschStats(0L, 0L, 0L, 0.0, 0.0))
    assert(TextFns.fleschScala(null) === TextFns.FleschStats(0L, 0L, 0L, 0.0, 0.0))
    assert(TextFns.fleschScala("...!!!") === TextFns.FleschStats(1L, 1L, 1L, 206.835 - 1.015 - 84.6, 0.39 + 11.8 - 15.59))
  }

  test("langIdCascade twin: matches the langId expression on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"),
        TextFns.langId(col("text")).as("expr_lang"))
      .collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      val text = r.getAs[String]("text")
      val toks = TextFns.tokensScala(text)
      val low = toks.map(_.toLowerCase(java.util.Locale.ROOT))
      val got = TextFns.langIdCascade(low, TextFns.hasCjkScala(text))
      assert(got === r.getAs[String]("expr_lang"), s"doc ${r.get(0)}")
    }
  }

  test("lang-mix law: uniform doc reads 0, a half-switched doc flags its windows") {
    val tmp = java.nio.file.Files.createTempDirectory("langmix").toString
    val en50 = Seq.fill(10)("the cat is in it").mkString(" ")   // 50 en-heavy tokens
    val de50 = Seq.fill(10)("der hund ist nicht das").mkString(" ") // 50 de-heavy tokens
    Seq(
      (1L, en50 + " " + en50),  // 2 uniform windows
      (2L, en50 + " " + de50 + " " + de50), // en window + 2 de windows → doc de? count hits:
      (3L, "中文 " + en50), // CJK anywhere → zh doc; window 2 pure en → mixed
      (4L, "")
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.Registry.qLangMix(spark, tmp)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got(1L) === (("en", 2L, 0L, 0.0)))
    // doc 2: en hits 30 (the,is,in,it ×10 → 'the' 10,'is' 10? tokens per
    // repeat: the,cat,is,in,it → hits the+is+in+it = 4×10 = 40; de hits
    // 2×(der,ist,nicht,das ×10 = 40) = 80 → doc de; the en window flags
    assert(got(2L)._1 === "de" && got(2L)._2 === 3L && got(2L)._3 === 1L)
    assert(got(3L)._1 === "zh" && got(3L)._3 >= 1L,
      s"the pure-en window must disagree with the zh doc: ${got(3L)}")
    assert(got(4L) === (("und", 0L, 0L, 0.0)))
  }

  test("fleschScala: scan counts match independent regex replays on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").as[String].collect()
    assert(docs.nonEmpty)
    val sentRe = java.util.regex.Pattern.compile("[.!?]+")
    val vowRe = java.util.regex.Pattern.compile("[aeiouyAEIOUY]+")
    def count(p: java.util.regex.Pattern, s: String): Long = {
      val m = p.matcher(s); var n = 0L; while (m.find()) n += 1; n
    }
    docs.foreach { t =>
      val f = TextFns.fleschScala(t)
      val s = if (t == null) "" else t
      assert(f.nSentences === count(sentRe, s), s"sentences for '$s'")
      val want = TextFns.tokensScala(s).map(w => math.max(1L, count(vowRe, w))).sum
      assert(f.nSyllables === want, s"syllables for '$s'")
    }
  }

  test("htmlStrip: planted crawl page — script/style removed WITH contents, entities decoded, prose preserved") {
    import org.apache.spark.sql.functions.col
    val page =
      """<!DOCTYPE html><html><head>
        |<title>My Page</title>
        |<style type="text/css">body { color: red; }</style>
        |<SCRIPT src="x.js">var hidden = "must vanish";</script>
        |</head><body>
        |<!-- a comment <p>with a fake tag</p> -->
        |<h1>Hello &amp; welcome</h1>
        |<p>5 &lt; 7 and 9 &gt; 2, &quot;quoted&quot;, it&#39;s&nbsp;here.</p>
        |<img src="a.png"/>
        |</body></html>""".stripMargin
    val cases = Seq(
      (1L, page),
      (2L, "plain prose stays  as is"), // only whitespace-collapse applies
      (3L, "a &amp;lt; b"),             // amp decoded LAST: no double-decode
      (4L, "<script>no close tag"),     // unclosed: content survives tag strip
      (5L, null.asInstanceOf[String]))
    val got = cases.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextFns.htmlStrip(org.apache.spark.sql.functions.coalesce(
          col("text"), org.apache.spark.sql.functions.lit(""))).as("c"),
        TextFns.htmlTagCount(org.apache.spark.sql.functions.coalesce(
          col("text"), org.apache.spark.sql.functions.lit(""))).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L)._1 ===
      "My Page Hello & welcome 5 < 7 and 9 > 2, \"quoted\", it's here.")
    assert(got(1L)._2 >= 10L, s"tag count ${got(1L)._2}")
    assert(got(2L) === (("plain prose stays as is", 0L)))
    assert(got(3L) === (("a &lt; b", 0L)), "freshly decoded & must not cascade")
    assert(got(4L)._1 === "no close tag")
    assert(got(5L) === (("", 0L)))
  }

  test("deflateScala: ratio orders repetitive < prose < noise; edge laws") {
    val rep = ("lorem ipsum " * 500).trim
    val prose = (0 until 500).map(i =>
      s"sentence $i carries subject${i % 37} verb${i % 53} object${i * 13 % 97}")
      .mkString(". ")
    val rnd = new scala.util.Random(7)
    val noise = Array.fill(6000)((rnd.nextInt(94) + 33).toChar).mkString
    val r1 = TextFns.deflateScala(rep)._3
    val r2 = TextFns.deflateScala(prose)._3
    val r3 = TextFns.deflateScala(noise)._3
    assert(r1 < 0.05, s"pure repetition must crush: $r1")
    assert(r1 < r2 && r2 < r3, s"ordering broke: $r1 / $r2 / $r3")
    assert(r3 > 0.7, s"high-entropy text must resist compression: $r3")
    assert(TextFns.deflateScala(null) === ((0L, 0L, 0.0)))
    assert(TextFns.deflateScala("") === ((0L, 0L, 0.0)))
    // raw byte law is UTF-8: a 3-byte CJK char counts 3
    assert(TextFns.deflateScala("中")._1 === 3L)
    // deterministic within the JVM (the signal contract)
    assert(TextFns.deflateScala(prose) === TextFns.deflateScala(prose))
  }

  test("encoding artifacts: replacement and control chars count exactly; tab/newline legitimate") {
    import spark.implicits._
    val rows = Seq(
      (1L, "clean prose with no artifacts"),
      (2L, "decode fail\uFFFDres he\uFFFDre\uFFFD"),          // 3 replacement chars
      (3L, "nul\u0000 pad\u0000ded\u0007 bell"),               // 3 control chars
      (4L, "tabs\tand\nnewlines\rare legitimate text"),        // the allowed three
      (5L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = rows.select($"id",
        TextFns.replacementCharCount($"text").as("r"),
        TextFns.controlCharCount($"text").as("c"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) === ((0L, 0L)))
    assert(got(2L) === ((3L, 0L)))
    assert(got(3L) === ((0L, 3L)))
    assert(got(4L) === ((0L, 0L)), "tab/newline/CR must not count as contamination")
    assert(got(5L) === ((0L, 0L)), "NULL text counts 0, not NULL")
  }

}
