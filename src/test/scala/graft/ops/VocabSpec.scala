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

  test("BPE: maxVocabRows cap is part of the law — words outside the top rows never influence merges") {
    // three high-frequency words (aa×50, ab×49, ba×48) + 60 DISTINCT
    // one-off words each containing the adjacent pair z,q: uncapped, the
    // (z,q) weight 60 dominates every top-word pair (max 50) and must be
    // the first merge; capped at the top 3 rows, the one-off words are
    // outside the trained vocabulary and (z,q) must never be merged —
    // the documented driver-loop bound is a LAW, not best-effort.
    val docs = Seq(
      (Seq.fill(50)("aa") ++ Seq.fill(49)("ab") ++ Seq.fill(48)("ba"))
        .mkString(" "),
      // varying digit suffixes keep (z,q) the UNIQUE weight-60 pair (a
      // constant 3rd letter would tie it with (q,·) and lose the
      // lexicographic tiebreak)
      (0 until 60).map(i => s"zq$i").mkString(" ")).toDF("text")
    val uncapped = Vocab.trainBpeMerges(docs, "text", numMerges = 1)
    assert(uncapped.head === (("z", "q")), s"uncapped first: ${uncapped.head}")
    val capped = Vocab.trainBpeMerges(docs, "text", numMerges = 30,
      maxVocabRows = 3)
    assert(!capped.contains(("z", "q")),
      s"capped merges leaked a beyond-cap pair: $capped")
    assert(capped.head === (("a", "a</w>")), s"capped first: ${capped.head}")
  }

  test("zipfFit: naive quantized replay, near -1 on a planted power law, degenerate single token NULL") {
    import org.apache.spark.sql.functions.col
    // planted frequencies ~ 1/rank: token t_r appears round(1200/r) times
    val words = (1 to 40).flatMap(r =>
      Seq.fill(math.round(1200.0 / r).toInt)(s"t$r"))
    val rnd = new scala.util.Random(5L)
    val shuffled = rnd.shuffle(words)
    val docs = shuffled.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    val got = Vocab.zipfFit(docs, "text", topRanks = 40).head()
    val (nR, sx, sy, slope, icept) = (got.getLong(0), got.getLong(1),
      got.getLong(2), got.getDouble(3), got.getDouble(4))
    assert(nR === 40L)
    // naive replay of the exact law
    val counts = words.groupBy(identity).map { case (w, xs) => (w, xs.size) }
      .toSeq.sortBy { case (w, c) => (-c, w) }.take(40)
    val pts = counts.zipWithIndex.map { case ((_, c), i) =>
      (math.round(math.log((i + 1).toDouble) * 1e6),
        math.round(math.log(c.toDouble) * 1e6)) }
    assert(sx === pts.map(_._1).sum)
    assert(sy === pts.map(_._2).sum)
    val n = pts.size.toDouble
    val (sxd, syd) = (pts.map(_._1.toDouble).sum, pts.map(_._2.toDouble).sum)
    val sxy = pts.map(p => p._1.toDouble * p._2.toDouble).sum
    val sxx = pts.map(p => p._1.toDouble * p._1.toDouble).sum
    val wantSlope = (n * sxy - sxd * syd) / (n * sxx - sxd * sxd)
    assert(math.abs(slope - wantSlope) < 1e-9, s"slope $slope vs $wantSlope")
    assert(slope > -1.15 && slope < -0.85, s"planted 1/r corpus should fit near -1: $slope")
    assert(!icept.isNaN)
    // one distinct token: zero x-variance, slope undefined
    val degen = Seq("same same same", "same").toDF("text")
    val d = Vocab.zipfFit(degen, "text").select(col("slope"), col("intercept")).head()
    assert(d.isNullAt(0) && d.isNullAt(1))
  }

  test("OOV rate: hand counts, lowercase law, empty/NULL docs, every doc a row") {
    val vocab = Seq("the", "cat", "sat").toDF("tk")
    val docs = Seq(
      (1L, "The CAT sat"),          // lowercase law: all in-vocab
      (2L, "the dog ran fast"),     // 3 of 4 OOV
      (3L, "dog dog dog"),          // occurrences count, not distinct: 3/3
      (4L, ""),                     // empty → 0/0, frac 0.0
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Vocab.oovRate(docs, "doc_id", "text", vocab)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toList
    assert(got === List(
      (1L, 3L, 0L, 0.0),
      (2L, 4L, 3L, 0.75),
      (3L, 3L, 3L, 1.0),
      (4L, 0L, 0L, 0.0),
      (5L, 0L, 0L, 0.0)))
  }

  test("source vocab overlap: hand Jaccard, lowercase distinct law, empty-vocab stratum excluded") {
    val docs = Seq(
      ("a", "the cat sat"), ("a", "THE Cat ran"),   // V_a = {the,cat,sat,ran}
      ("b", "the dog sat"),                          // V_b = {the,dog,sat}
      ("c", "unrelated words entirely"),             // V_c disjoint from a,b
      ("d", "   "))                                  // empty vocab → excluded
      .toDF("source", "text")
    val got = Vocab.sourceVocabOverlap(docs, "source", "text")
      .orderBy("source_a", "source_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toList
    assert(got === List(
      ("a", "b", 4L, 3L, 2L, 2.0 / 5.0),  // {the,sat} shared
      ("a", "c", 4L, 3L, 0L, 0.0),
      ("b", "c", 3L, 3L, 0L, 0.0)))
  }

  test("OOV rate: duplicated vocab rows don't double-count; stored ≡ live") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "beta beta zeta"),
      (3L, "entirely novel words here"))
      .toDF("doc_id", "text")
    val dupVocab = Seq("alpha", "beta", "alpha", "beta", "gamma").toDF("w")
    val live = Vocab.oovRate(docs, "doc_id", "text", dupVocab)
      .orderBy("doc_id").collect().map(_.toSeq).toList

    val cleanVocab = Seq("alpha", "beta", "gamma").toDF("w")
    assert(live === Vocab.oovRate(docs, "doc_id", "text", cleanVocab)
      .orderBy("doc_id").collect().map(_.toSeq).toList)

    // stored path: LM store trained on a slice whose vocabulary is
    // exactly {alpha, beta, gamma} lowercased
    val dir = java.nio.file.Files.createTempDirectory("oov-store").toString
    val train = Seq("Alpha beta GAMMA", "beta alpha").toDF("text")
    RefStore.writeLmModel(train, "text", dir)
    val stored = Vocab.oovRateStored(docs, "doc_id", "text", dir)
      .orderBy("doc_id").collect().map(_.toSeq).toList
    assert(stored === live)
  }

  test("keynessG2: hand-computed statistic, exact enrichment direction") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(("apple apple banana", "en"), ("banana cherry cherry", "de"))
      .toDF("text", "lang")
    val got = Vocab.keynessG2(docs, "text", col("lang") === "en", k = 10)
      .collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    // apple: a=2 b=0 na=nb=3 → e_a = 2·3/6 = 1 → G2 = 2·(2·ln 2) = 4 ln 2
    val appleMicro = math.round(2.0 * (2.0 * math.log(2.0 / 1.0)) * 1000000.0)
    assert(got("apple") === ((2L, 0L, appleMicro, true)))
    // banana: a=1 b=1, both expectations 1 → both ln terms 0; 1·3 > 1·3 false
    assert(got("banana") === ((1L, 1L, 0L, false)))
    // cherry mirrors apple with the sides swapped: same G2, depleted
    assert(got("cherry") === ((0L, 2L, appleMicro, false)))
  }

  test("tokenFertility: exact counts and ratios on a hand-checked corpus") {
    import spark.implicits._
    val docs = Seq(
      ("en", "hello world!"),      // 12 chars, 2 tokens, subw 2+2
      ("en", "ab"),                // 2 chars, 1 token, subw 1
      ("de", null.asInstanceOf[String]), // 0 everything, still a doc
      (null.asInstanceOf[String], "dropped"))
      .toDF("lang", "text")
    val got = Vocab.tokenFertility(docs, "lang", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet === Set("en", "de"))
    assert(got("en") === ((2L, 14L, 3L, 5L)))
    assert(got("de") === ((1L, 0L, 0L, 0L)))
    val en = Vocab.tokenFertility(docs, "lang", "text")
      .filter($"stratum" === "en").head
    assert(en.getDouble(5) === 14.0 / 3.0)
    assert(en.getDouble(6) === 5.0 / 3.0)
    val de = Vocab.tokenFertility(docs, "lang", "text")
      .filter($"stratum" === "de").head
    assert(de.isNullAt(5) && de.isNullAt(6),
      "token-free stratum must carry NULL ratios, not fake zeros")
  }

  test("tokenGini: uniform distribution at 0, concentration pushes toward 1") {
    import spark.implicits._
    // uniform: 4 tokens × 3 occurrences each → G = 2·(1+2+3+4)·3/(4·12) − 5/4 = 0
    val uniform = Seq(("u", "a b c d a b c d a b c d")).toDF("src", "text")
    val gu = Vocab.tokenGini(uniform, "src", "text").head
    assert(gu.getLong(1) === 4L && gu.getLong(2) === 12L)
    assert(math.abs(gu.getDouble(3)) < 1e-15)
    assert(gu.getDouble(4) === 1.0) // 4 tokens ≤ top-10: whole mass

    // concentrated: one token 98 times, two once → near 2/3 for v=3
    val conc = Seq(("c", (Seq.fill(98)("z") ++ Seq("q", "w")).mkString(" ")))
      .toDF("src", "text")
    val gc = Vocab.tokenGini(conc, "src", "text").head
    // exact law: Σ i·c = 1·1 + 2·1 + 3·98 = 297; G = 2·297/(3·100) − 4/3
    assert(gc.getDouble(3) === 2.0 * 297.0 / 300.0 - 4.0 / 3.0)
    assert(gc.getDouble(3) > 0.6)
  }

  test("tokenGini: top10_share isolates the head of a long-tail stratum") {
    import spark.implicits._
    // 15 singleton tokens + one 85-count head → top10 = 85 + 9 singles
    val text = (Seq.fill(85)("head") ++ (1 to 15).map(i => s"tail$i")).mkString(" ")
    val g = Vocab.tokenGini(Seq(("s", text)).toDF("src", "text"), "src", "text").head
    assert(g.getLong(1) === 16L && g.getLong(2) === 100L)
    assert(g.getDouble(4) === 94.0 / 100.0)
  }

  test("keynessByStratum: enriched-only per-stratum top terms, lone stratum yields nothing") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      ("A", "apple apple apple shared shared"),
      ("B", "banana banana banana shared shared"))
      .toDF("src", "text")
    val got = Vocab.keynessByStratum(docs, "src", "text", kPerStratum = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    // each stratum's rank-1 distinctive term is its own fruit; 'shared'
    // is balanced (a·nb = b·na) — never enriched, never listed
    assert(got(("A", 1L)) === "apple")
    assert(got(("B", 1L)) === "banana")
    assert(!got.values.toSet.contains("shared"))
    // the per-stratum g2 for the fruit equals the two-class keynessG2 law
    val direct = Vocab.keynessG2(docs, "text", col("src") === "A", k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val byStratum = Vocab.keynessByStratum(docs, "src", "text", 2)
      .collect().map(r => (r.getString(0), r.getString(2)) -> r.getLong(5)).toMap
    assert(byStratum(("A", "apple")) === direct("apple"))

    val lone = Seq(("only", "x y z")).toDF("src", "text")
    assert(Vocab.keynessByStratum(lone, "src", "text").count() === 0L,
      "a stratum with no rest side has no distinctive terms")
  }

  test("keynessG2: top-k ordering is g2 desc with token tiebreak") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(("aa bb aa", true), ("bb cc cc", false))
      .toDF("text", "fg")
    val toks = Vocab.keynessG2(docs, "text", col("fg"), k = 2)
      .collect().map(_.getString(0)).toSeq
    // aa and cc tie on G2 (mirror counts) — token asc breaks it; bb (G2=0) cut
    assert(toks === Seq("aa", "cc"))
  }

  test("coverageReport: Good-Turing and Chao1 hand-checked; saturated stratum covers fully; NULLs drop") {
    val docs = Seq(
      ("a", "x x y z"),                        // N=4 V=3 n1=2 n2=1
      ("b", "w w w"),                          // N=3 V=1 n1=0 n2=0
      ("a", null.asInstanceOf[String]),        // tokens(NULL) = [] — no rows
      (null.asInstanceOf[String], "ignored"))  // NULL stratum drops
      .toDF("src", "text")
    val got = Vocab.coverageReport(docs, "src", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    // a: coverage 1 - 2/4 = 0.5; chao1 = 3 + 2*1/(2*(1+1)) = 3.5
    assert(got("a") === ((4L, 3L, 2L, 1L, 500000000000L, 3500000L)))
    // b: no singletons -> unseen mass 0, chao1 = observed vocab exactly
    assert(got("b") === ((3L, 1L, 0L, 0L, 1000000000000L, 1000000L)))
    assert(got.size === 2)
  }

  test("heapsLawFit: planted growth laws hit beta exactly") {
    import spark.implicits._
    // every doc is ONE globally-unique token → V(n) = n exactly → every
    // point has x = y → beta = 1, lnK = 0 (quantized EXACTLY: same longs)
    val unique = (0L until 64L).map(i => (i, s"tok$i")).toDF("doc_id", "text")
    val r1 = Vocab.heapsLawFit(unique, "doc_id", "text").collect().head
    assert(r1.getLong(0) === 7L, "prefixes 1,2,4,...,64")
    assert(r1.getLong(1) === 1000000L && r1.getLong(2) === 0L)
    // every doc is the SAME token → V = 1, ln V = 0 → beta = 0, lnK = 0
    val flat = (0L until 64L).map(i => (i, "same")).toDF("doc_id", "text")
    val r2 = Vocab.heapsLawFit(flat, "doc_id", "text").collect().head
    assert(r2.getLong(1) === 0L && r2.getLong(2) === 0L)
    // degenerate design (single point): NULL coefficients never emit —
    // one doc gives one prefix, filtered by the n_points >= 2 law
    val single = Seq((0L, "a b c")).toDF("doc_id", "text")
    assert(Vocab.heapsLawFit(single, "doc_id", "text").count() === 0L)
  }
  test("diversityProfile: uniform vocab hand-exact, constant token degenerate") {
    import spark.implicits._
    val docs = Seq(("u", "a b c d"), ("c", "same same same same"))
      .toDF("src", "text")
    val got = Vocab.diversityProfile(docs, "src", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // uniform: H = ln 4 exactly (one quantized term per token), 1/Simpson = 4
    assert(got("u") === ((4L, 4L, math.round(math.log(4.0) * 1e12), 4000L)))
    // constant: single type -> H = 0, 1/Simpson = 1
    assert(got("c") === ((4L, 1L, 0L, 1000L)))
  }

  test("goodTuring: hand-checked occupancy spectrum, unsmoothable tail NULL, case folding") {
    import spark.implicits._
    // "A a a b b c": counts a:3 b:2 c:1 → N_1=N_2=N_3=1, N=6
    val df0 = Seq("A a a b b", "c").toDF("text")
    val rows = Vocab.goodTuring(df0, "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(rows.keySet === Set(1L, 2L, 3L))
    // p0 = N1/N = 1/6; r* = (r+1)·N_{r+1}/N_r
    assert(rows(1L) === ((1L, math.round(1.0 / 6.0 * 1e6), Some(2000000L))))
    assert(rows(2L) === ((1L, math.round(2.0 / 6.0 * 1e6), Some(3000000L))))
    assert(rows(3L) === ((1L, 500000L, None)), "no N_4: tail r* undefined")
    // maxR truncation keeps the SMALLEST ranks (the mass head)
    val many = Seq.tabulate(30)(i => ("w" + i + " ") * (i + 1)).toDF("text")
    val rs = Vocab.goodTuring(many, "text", maxR = 5).collect().map(_.getLong(0))
    assert(rs.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("burrowsDelta: identical styles 0, mirrored styles hand-replayed, zero-variance words drop") {
    import spark.implicits._
    // a and b share one distribution; c mirrors it → Δ(a,b) = 0 and
    // Δ(a,c) = Δ(b,c) > 0
    val docs = Seq(
      ("a", "x x y"), ("b", "x x y"), ("c", "x y y"))
      .toDF("source", "text")
    val got = Vocab.burrowsDelta(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(got(("a", "b"))._2 === 0L)
    assert(got(("a", "c")) === got(("b", "c")))
    // independent replay of the ("a","c") pair: rates micro-quantized,
    // population-σ z over the 3 sources, nano-quantized gaps
    val rx = Map("a" -> 666667L, "b" -> 666667L, "c" -> 333333L)
    val ry = Map("a" -> 333333L, "b" -> 333333L, "c" -> 666667L)
    def delta(r: Map[String, Long], s1: String, s2: String): Double = {
      val k = 3L
      val t1 = r.values.sum
      val t2 = r.values.map(v => BigInt(v) * v).sum
      val den = (BigInt(k) * t2 - BigInt(t1) * t1).toDouble
      def z(s: String) = (k.toDouble * r(s) - t1.toDouble) / math.sqrt(den)
      math.round(math.abs(z(s1) - z(s2)) * 1e9).toDouble
    }
    val want = math.round(
      (delta(rx, "a", "c") + delta(ry, "a", "c")) / 2.0 / 1000.0)
    assert(got(("a", "c")) === ((2L, want)))
    // a word at IDENTICAL rates everywhere has zero variance → it drops
    // from n_words instead of yielding a 0/0 z
    val flat = Seq(("a", "w"), ("b", "w"), ("c", "w")).toDF("source", "text")
    assert(Vocab.burrowsDelta(flat, "source", "text")
      .collect().forall(_.getLong(2) === 0L))
  }
}
