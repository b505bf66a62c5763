package graft.functions

import org.scalacheck.Gen

import graft.SparkSpec

/** Property tests pitting engine expressions against independently-written
  * Scala implementations of the laws — regression armor for future
  * expression rewrites.
  */
class LawPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Independent POI-law implementation (SQLiteDirectImporter.java:984-1006
    * semantics, written from the law, not from ExcelSerial's expression tree).
    */
  private def referenceSerial(s: String): Option[String] = {
    val d = try s.trim.toDouble catch { case _: Exception => return None }
    if (d <= 0.0 || d.isNaN) return None
    val whole = math.floor(d).toLong
    val dayAdjust = if (whole < 61) 0L else -1L
    val millis = math.floor((d - whole) * 86400000.0 + 0.5).toLong
    val epochSec = (whole + dayAdjust - 25568L) * 86400L + millis / 1000L
    val ldt = java.time.LocalDateTime.ofEpochSecond(epochSec, 0, java.time.ZoneOffset.UTC)
    Some(ldt.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")))
  }

  test("property: excel serial expression matches the independent law on 400 samples") {
    val serials: Seq[String] =
      Gen.listOfN(200, Gen.chooseNum(0.0, 80000.0)).sample.get.map(_.toString) ++
        Gen.listOfN(100, Gen.chooseNum(1L, 70000L)).sample.get.map(_.toString) ++
        Seq("0", "-1", "59", "60", "61", "60.999999", "25569", "", " ", "x",
          "1e3", "0.5", "0.0001") ++
        Gen.listOfN(87, Gen.chooseNum(0.0, 100.0)).sample.get.map(_.toString)
    val got = serials.toDF("v")
      .select($"v", ExcelSerial.excelSerialToTimestamp($"v").cast("string").as("ts"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    serials.foreach { s =>
      val want = referenceSerial(s).map(_ + "") // seconds precision
      val gotTs = got(s).map(_.stripSuffix(".0")) // spark renders ts without frac here
      assert(gotTs === want, s"serial '$s'")
    }
  }

  test("property: tokensScala (object-boundary law) matches the tokens expression") {
    val texts = Gen.listOfN(120, Gen.oneOf(
      "", " ", "a", " a ", "a b", "a  b\tc", "\n x \n", "a b", // NBSP is not \s
      "word " * 10, "  tabs\t\tand  runs  ")).sample.get.distinct
    val exprTokens = texts.toDF("t")
      .select($"t", TextFns.tokens($"t").as("tk"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    texts.foreach { t =>
      assert(TextFns.tokensScala(t).toList === exprTokens(t), s"text '$t'")
    }
  }

  test("property: codePointLess ≡ unsigned UTF-8 byte order on random unicode incl. supplementary planes") {
    // the SQL-oracle collation law: binary UTF-8 comparison. Generate
    // strings biased toward the disagreement zone (surrogate-encoded
    // supplementary chars vs U+E000..FFFF) plus plain ASCII/BMP.
    def utf8Less(a: String, b: String): Boolean = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      var i = 0
      while (i < x.length && i < y.length) {
        val c = java.lang.Integer.compareUnsigned(x(i) & 0xff, y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    val interesting = Seq(0x41, 0x7a, 0xe9, 0x4e00, 0xe000, 0xfffd, 0x10000, 0x1f600, 0x10ffff)
    val genCp = Gen.oneOf(Gen.oneOf(interesting), Gen.choose(0x20, 0x10ffff)
      .map(cp => if (cp >= 0xd800 && cp <= 0xdfff) cp + 0x800 else cp)) // remap surrogates
    val genStr = Gen.listOfN(4, genCp)
      .map(_.foldLeft(new java.lang.StringBuilder)((sb, cp) => sb.appendCodePoint(cp)).toString)
    val pairs = Gen.listOfN(500, Gen.zip(genStr, genStr)).sample.get
    pairs.foreach { case (a, b) =>
      assert(TextFns.codePointLess(a, b) === utf8Less(a, b),
        s"collation divergence on ${a.codePoints().toArray.toSeq} vs ${b.codePoints().toArray.toSeq}")
      assert(!(TextFns.codePointLess(a, b) && TextFns.codePointLess(b, a)), "antisymmetry")
    }
    // the motivating counter-example: compareTo disagrees, codePointLess doesn't
    val emoji = new java.lang.StringBuilder().appendCodePoint(0x1f600).toString
    val bmp = "�"
    assert(emoji.compareTo(bmp) < 0 && !TextFns.codePointLess(emoji, bmp),
      "the UTF-16 code-unit trap this comparator exists to avoid")
  }

  test("property: gopherScala ratios match naive recomputation on random multi-line texts") {
    val rnd = new scala.util.Random(11)
    def randText(): String = {
      val nLines = 1 + rnd.nextInt(6)
      (1 to nLines).map { _ =>
        val nw = rnd.nextInt(8)
        (1 to nw).map(_ => "w" + rnd.nextInt(6)).mkString(" ")
      }.mkString("\n")
    }
    (1 to 200).foreach { _ =>
      val t = randText()
      val g = TextFns.gopherScala(t)
      // independent recomputation of the line laws
      val lines = t.split("\n", -1)
      assert(g.nLines === lines.length.toLong)
      assert(g.dupLineFrac === 1.0 - lines.distinct.length.toDouble / lines.length.toDouble)
      val byLine = lines.groupBy(identity)
      val dupChars = byLine.map { case (l, o) => (o.length - 1).toLong * l.length }.sum
      val totChars = byLine.map { case (l, o) => o.length.toLong * l.length }.sum
      assert(g.dupLineCharFrac ===
        (if (totChars == 0) 0.0 else dupChars.toDouble / totChars.toDouble))
      // word laws
      val toks = TextFns.tokensScala(t)
      assert(g.nTokens === toks.length.toLong)
      if (toks.nonEmpty)
        assert(g.meanWordLen === toks.map(_.length.toLong).sum.toDouble / toks.length.toDouble)
      // top-2-gram coverage bound: in [0, 1] and exact when a unique max exists
      assert(g.top2CharFrac >= 0.0 && g.top2CharFrac <= 1.0)
    }
  }

  test("property: c4Scala matches a naive line-by-line replay on random multi-line texts") {
    val rnd = new scala.util.Random(23)
    val enders = Seq(".", "!", "?", "\"", "", " ")
    def randLine(): String = {
      val nw = rnd.nextInt(6)
      val words = (1 to nw).map(_ =>
        if (rnd.nextInt(12) == 0) "JavaScript" else "w" + rnd.nextInt(9))
      words.mkString(" ") + enders(rnd.nextInt(enders.length))
    }
    def randText(): String = {
      val base = (1 to 1 + rnd.nextInt(7)).map(_ => randLine()).mkString("\n")
      rnd.nextInt(10) match {
        case 0 => base + "\nsome Lorem Ipsum filler here."
        case 1 => base + "\nif (x) { return 1; }"
        case _ => base
      }
    }
    (1 to 300).foreach { _ =>
      val t = randText()
      val c = TextFns.c4Scala(t)
      // naive replay, written from the documented rules
      val lines = t.split("\n", -1)
      val kept = lines.filter { l =>
        l.nonEmpty && ".!?\"".contains(l.last.toString) &&
          l.trim.split("\\s+").count(_.nonEmpty) >= 3 &&
          !l.toLowerCase.contains("javascript")
      }
      assert(c.nLines === lines.length.toLong, t)
      assert(c.nKept === kept.length.toLong, t)
      assert(c.cleanText === kept.mkString("\n"), t)
      val sent = c.cleanText.count(ch => ch == '.' || ch == '!' || ch == '?').toLong
      assert(c.nSentences === sent, t)
      assert(c.hasLorem === t.toLowerCase.contains("lorem ipsum"), t)
      assert(c.hasBrace === t.contains("{"), t)
      assert(c.c4Keep === (!c.hasLorem && !c.hasBrace && sent >= 5L), t)
    }
  }

  test("property: simpsonScala equals a naive code-point frequency replay") {
    val rnd = new scala.util.Random(29)
    def randText(): String = {
      val n = rnd.nextInt(40)
      (1 to n).map(_ => rnd.nextInt(5) match {
        case 0 => "a"
        case 1 => "b"
        case 2 => " "
        case 3 => "é"   // multi-byte BMP
        case _ => "😀" // astral plane: one code point, two units
      }).mkString
    }
    (1 to 300).foreach { _ =>
      val t = randText()
      val (n, s2, simpson) = TextFns.simpsonScala(t)
      val cps = t.codePoints().toArray
      val counts = cps.groupBy(identity).map(_._2.length.toLong)
      assert(n === cps.length.toLong, t)
      assert(s2 === counts.map(c => c * c).sum, t)
      val want = if (cps.isEmpty) 0.0
        else 1.0 - counts.map(c => c * c).sum.toDouble /
          (cps.length.toDouble * cps.length.toDouble)
      assert(simpson === want, t)
    }
  }
}
