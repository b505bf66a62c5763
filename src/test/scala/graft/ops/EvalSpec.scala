package graft.ops

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("aucByGroup: separation, inversion, tie half-credit, degenerate NULL, NULL exclusion") {
    val rows = Seq(
      // a: perfect separation → 1.0
      ("a", 3.0, true), ("a", 4.0, true), ("a", 1.0, false), ("a", 2.0, false),
      // b: perfectly inverted → 0.0
      ("b", 1.0, true), ("b", 2.0, false),
      // c: full ties → 0.5 (average-rank law)
      ("c", 1.0, true), ("c", 2.0, true), ("c", 1.0, false), ("c", 2.0, false),
      // d: positives only → NULL auc
      ("d", 1.0, true), ("d", 2.0, true))
      .toDF("g", "score", "label")
      // a NULL score must not perturb group a
      .union(Seq(("a", null.asInstanceOf[java.lang.Double], true))
        .toDF("g", "score", "label"))

    val got = Eval.aucByGroup(rows, "score", "label", "g")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got("a") === ((2L, 2L, Some(1.0))))
    assert(got("b") === ((1L, 1L, Some(0.0))))
    assert(got("c") === ((2L, 2L, Some(0.5))))
    assert(got("d") === ((2L, 0L, None)))
  }

  test("ndcgAtK: hand-computed DCG/IDCG, graded ideal order, NULL laws") {
    // disc(1..3) = [1000000, 630930, 500000]
    assert(Eval.ndcgDiscountsMicro(3) === Seq(1000000L, 630930L, 500000L))
    val df = Seq(
      // g=1: model order by score desc = (a,b,c,d); gains 0,1,1,0; k=3
      (1, "a", Some(9.0), Some(0)), (1, "b", Some(8.0), Some(1)),
      (1, "c", Some(7.0), Some(1)), (1, "d", Some(6.0), Some(0)),
      // g=2: graded gains — ideal puts gain 2 first even though the model
      // scored it below the gain-1 doc
      (2, "a", Some(9.0), Some(1)), (2, "b", Some(8.0), Some(2)),
      // g=3: nothing relevant → NULL ndcg/recall/first_rel_rank
      (3, "a", Some(9.0), Some(0)),
      // g=4: NULL score and NULL gain rows are excluded from ranking
      (4, "a", Some(9.0), Some(1)), (4, "zz", None, Some(1)),
      (4, "yy", Some(99.0), None)
    ).toDF("g", "id", "score", "rel")
    val r = Eval.ndcgAtK(df, "g", "id", "score", "rel", k = 3)
      .collect().map(x => x.getInt(0) -> x).toMap
    // g=1: DCG = 1·630930 + 1·500000; IDCG = 1000000 + 630930
    assert(r(1).getAs[Long]("dcg_micro") === 1130930L)
    assert(r(1).getAs[Long]("idcg_micro") === 1630930L)
    assert(r(1).getAs[Double]("ndcg") === 1130930.0 / 1630930.0)
    assert(r(1).getAs[Long]("rel_at_k") === 2L &&
      r(1).getAs[Long]("rel_total") === 2L)
    assert(r(1).getAs[Double]("recall_at_k") === 1.0)
    assert(r(1).getAs[Long]("first_rel_rank") === 2L)
    // g=2: model DCG = 1·1e6 + 2·630930; ideal = 2·1e6 + 1·630930
    assert(r(2).getAs[Long]("dcg_micro") === 2261860L)
    assert(r(2).getAs[Long]("idcg_micro") === 2630930L)
    // g=3: no relevant → visible NULLs
    assert(r(3).isNullAt(r(3).fieldIndex("ndcg")))
    assert(r(3).isNullAt(r(3).fieldIndex("recall_at_k")))
    assert(r(3).isNullAt(r(3).fieldIndex("first_rel_rank")))
    // g=4: the NULL-score and NULL-gain rows never occupy a rank
    assert(r(4).getAs[Long]("dcg_micro") === 1000000L)
    assert(r(4).getAs[Long]("first_rel_rank") === 1L)
  }

  test("ndcgAtK: non-finite scores/gains are excluded like NULL, not a crash") {
    val df = Seq(
      (5, "a", Some(9.0), Some(1.0)),
      // NaN gain: passes isNotNull and `_rel > 0` (NaN compares greatest),
      // then round(NaN·disc) would throw under ANSI — must drop pre-rank
      (5, "nan", Some(8.0), Some(Double.NaN)),
      (5, "inf", Some(7.0), Some(Double.PositiveInfinity)),
      // finite but past the 9e12 bound: gain·disc_micro would leave BIGINT
      (5, "big", Some(6.5), Some(1.0e13)),
      // NaN score: sorts greatest in Spark — would steal rank 1
      (5, "nsc", Some(Double.NaN), Some(1.0)),
      (5, "b", Some(6.0), Some(1.0))
    ).toDF("g", "id", "score", "rel")
    val r = Eval.ndcgAtK(df, "g", "id", "score", "rel", k = 3)
      .collect().map(x => x.getInt(0) -> x).toMap
    // only a and b occupy ranks (1, 2): excluded rows shift nobody
    assert(r(5).getAs[Long]("dcg_micro") === 1630930L)
    assert(r(5).getAs[Long]("idcg_micro") === 1630930L)
    assert(r(5).getAs[Long]("rel_total") === 2L &&
      r(5).getAs[Long]("rel_at_k") === 2L)
    assert(r(5).getAs[Long]("first_rel_rank") === 1L)
    // non-floating score columns can't be NaN: the guard must not reject
    // (or try to isnan-cast) an integer-scored frame
    val ints = Seq((6, "a", 2, 1.0), (6, "b", 1, 0.0)).toDF("g", "id", "score", "rel")
    val ri = Eval.ndcgAtK(ints, "g", "id", "score", "rel", k = 2).collect()
    assert(ri.length === 1 && ri(0).getAs[Long]("dcg_micro") === 1000000L)
  }

  test("calibrationBins: hand-checked bins, boundary score 1.0, clamps, NULL exclusion") {
    import spark.implicits._
    val rows = Seq(
      (0.05, Some(false)), (0.05, Some(false)),            // bin 0: acc 0, conf 0.05
      (0.95, Some(true)), (0.95, Some(false)),             // bin 9: acc 0.5
      (1.0, Some(true)),                                   // score 1.0 → bin 9, not 10
      (-0.2, Some(true)),                                  // below range clamps to bin 0
      (0.5, Option.empty[Boolean]), (0.55, Some(true))     // NULL label excluded; bin 5
    ).toDF("score", "label")
    val got = Eval.calibrationBins(rows, "score", "label", nBins = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.keySet === Set(0L, 5L, 9L))
    assert(got(0L)._1 === 3L && got(0L)._2 === 1L) // two 0.05s + clamped -0.2
    assert(got(5L) === ((1L, 1L, 1.0, 0.55)))
    assert(got(9L)._1 === 3L && got(9L)._2 === 2L)
    // conf means are exact micro-sums: (0.95 + 0.95 + 1.0)/3 in micro units
    val conf9 = (950000L + 950000L + 1000000L).toDouble / 3.0 / 1000000.0
    assert(got(9L)._4 === conf9)
    // NaN scores are excluded like NULL (they'd bin to 0 in Spark but
    // ERROR the oracle's BIGINT cast — the law demands exclusion)
    val withNan = rows.union(Seq((Double.NaN, Some(true))).toDF("score", "label"))
    val gotNan = Eval.calibrationBins(withNan, "score", "label", nBins = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotNan === got.map { case (k, v) => k -> v._1 },
      "a NaN score must not add mass to any bin")
  }

  test("auc agrees with the pair-counting definition on a random frame") {
    val rnd = new scala.util.Random(23L)
    val rows = Seq.fill(300)((rnd.nextInt(20).toDouble, rnd.nextBoolean()))
    val df = rows.toDF("score", "label")
    val got = Eval.auc(df, "score", "label").select("auc").head.getDouble(0)
    // P(pos > neg) + P(tie)/2 by brute force over all pairs
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val want = wins / (pos.size.toDouble * neg.size)
    assert(math.abs(got - want) < 1e-12, s"$got vs $want")
  }

  test("cohenKappa reproduces the textbook 2×2 example exactly") {
    import spark.implicits._
    // 20 yes/yes, 15 no/no, 5 yes/no, 10 no/yes:
    // n=50 agree=35 po=0.7; marginals A(25,25) B(30,20) → pe_num=1250 pe=0.5
    val rows = Seq.fill(20)(("yes", "yes")) ++ Seq.fill(15)(("no", "no")) ++
      Seq.fill(5)(("yes", "no")) ++ Seq.fill(10)(("no", "yes"))
    val got = Eval.cohenKappa(rows.toDF("a", "b"), "a", "b").head
    assert(got.getLong(0) === 50L)
    assert(got.getLong(1) === 35L)
    assert(got.getDouble(2) === 1250.0) // decimal-exact sum, double on the wire
    assert(got.getDouble(3) === 0.7)
    assert(got.getDouble(4) === 0.5)
    // same IEEE chain as the operator: (po - pe) / (1 - pe)
    assert(got.getDouble(5) === (0.7 - 0.5) / (1.0 - 0.5))
  }

  test("cohenKappa: perfect agreement is 1, label-swapped raters go negative") {
    import spark.implicits._
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x"))
    assert(Eval.cohenKappa(perfect.toDF("a", "b"), "a", "b")
      .head.getDouble(5) === 1.0)
    val inverted = Seq.fill(10)(("x", "y")) ++ Seq.fill(10)(("y", "x"))
    assert(Eval.cohenKappa(inverted.toDF("a", "b"), "a", "b")
      .head.getDouble(5) < 0.0)
  }

  test("cohenKappa: degenerate constant-equal raters yield NULL, NULL labels drop") {
    import spark.implicits._
    val const = Seq(("k", "k"), ("k", "k")).toDF("a", "b")
    assert(Eval.cohenKappa(const, "a", "b").head.isNullAt(5))
    val withNulls = Seq((Some("x"), Some("x")), (None, Some("x")), (Some("y"), None))
      .toDF("a", "b")
    assert(Eval.cohenKappa(withNulls, "a", "b").head.getLong(0) === 1L)
  }

  test("rougeN: clipped-count law hand-checked; identical = 1; short reference NULL") {
    import spark.implicits._
    val rows = Seq(
      // ref bigrams {a b: 2, b c: 1, c a: 1} (4 total); cand clips a b at 1
      (1L, "a b c a b", "a b"),
      (2L, "a b c a b", "a b c a b"),          // identical → recall 1
      (3L, "x", "x"),                          // < 2 ref tokens → NULL
      (4L, "p q r", "z z z z"),                // no shared grams → 0
      (5L, "m n m n", "m n m n m n m n"))      // cand SURPLUS clips at ref counts
      .toDF("doc_id", "ref", "cand")
    val got = Eval.rougeN(rows, "doc_id", "ref", "cand", n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    assert(got(1L) === ((4L, 1L, Some(0.25))))
    assert(got(2L) === ((4L, 4L, Some(1.0))))
    assert(got(3L) === ((0L, 0L, None)), "short reference must be NULL, not 0")
    assert(got(4L) === ((2L, 0L, Some(0.0))))
    // ref {m n: 2, n m: 1}; cand {m n: 4, n m: 3} → clipped 2 + 1 of 3
    assert(got(5L) === ((3L, 3L, Some(1.0))))
  }

  test("rboAtK: identical lists hit the closed form; disjoint score 0; reversal sits between") {
    import spark.implicits._
    val k = 5; val p = 0.9
    def rank(items: Seq[Long], q: Long = 1L) =
      items.zipWithIndex.map { case (it, i) => (q, it, i + 1) }
        .toDF("q", "item", "rank")
    // the EXACT expected integer replays the engine's per-term law
    // (quantize-then-sum), not a float approximation of the closed form
    def expectPico(ovAtDepth: Int => Int): Long =
      (1 to k).map(d => math.round(
        (((1.0 - p) * math.exp((d - 1).toDouble * math.log(p)))
          * (ovAtDepth(d).toDouble / d.toDouble)) * 1e12)).sum
    val a = rank(Seq(10L, 20L, 30L, 40L, 50L))
    def score(x: org.apache.spark.sql.DataFrame,
        y: org.apache.spark.sql.DataFrame): Long =
      Eval.rboAtK(x, y, "q", "item", "rank", k).head.getLong(2)
    // identical: overlap at depth d is exactly d → Σ = the 1−p^k form
    val same = score(a, a)
    assert(same === expectPico(d => d), s"identical-list pico $same")
    assert(math.abs(same / 1e12 - (1.0 - math.pow(p, k))) < 1e-9)
    // disjoint: overlap 0 everywhere — score EXACTLY 0, not NULL
    val disjoint = score(a, rank(Seq(60L, 70L, 80L, 90L, 99L)))
    assert(disjoint === 0L)
    // full reversal: same membership, opposite order — overlap d at the
    // tail but thinner prefixes: strictly between disjoint and identical
    val rev = score(a, rank(Seq(50L, 40L, 30L, 20L, 10L)))
    assert(rev > 0L && rev < same, s"reversal $rev vs identical $same")
    // ranks beyond k are ignored by contract (no phantom overlap)
    val long = rank(Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L))
    assert(score(long, long) === same)
  }

  test("mrrAtK: first-relevant rank, no-relevant 0, k cut, duplicate qrels") {
    val ranked = Seq(
      // q1: relevant at ranks 3 and 7 -> first 3, rr 333333
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (1L, 13L, 7L),
      // q2: relevant ONLY past the k cut -> 0 by MRR's convention
      (2L, 20L, 1L), (2L, 21L, 6L),
      // q3: relevant at rank 1 -> rr exactly 1000000
      (3L, 30L, 1L), (3L, 31L, 2L)).toDF("query_id", "item_id", "rk")
    val rel = Seq((1L, 12L), (1L, 13L), (1L, 13L), // duplicate pair must not double-count
      (2L, 21L), (3L, 30L)).toDF("query_id", "item_id")
    val got = Eval.mrrAtK(ranked, rel, "query_id", "item_id", "rk", k = 5)
      .orderBy("query_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3)))
    assert(got(0) === ((1L, 1L, 3L, 333333L)), s"q1: ${got(0)}")
    assert(got(1) === ((2L, 0L, -1L, 0L)), s"q2: ${got(1)}")
    assert(got(2) === ((3L, 1L, 1L, 1000000L)), s"q3: ${got(2)}")
  }


  test("chrF: identity scores ~1, disjoint 0, recall-weighting, empty sides total") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, "abcdef ghij", "abcdef ghij"),   // identical -> F ~ 1
      (2L, "abcdefgh", "zyxwvuts"),         // disjoint chars -> F = 0
      (3L, "abcdefgh", "abcd"),             // prefix: R < 1, P high
      (4L, "", "xyz"),                      // empty ref -> R=0 -> F=0
      (5L, "abc", ""))                      // empty cand -> P=0, M=0 -> F=0
      .toDF("id", "ref", "cand")
    val got = Eval.chrF(rows, "id", "ref", "cand")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L)._3 === 1000000000000L, s"identity must score exactly 1: ${got(1L)}")
    assert(got(2L)._3 === 0L)
    assert(got(4L)._3 === 0L && got(5L)._3 === 0L)
    // beta=2 weights recall: the truncated candidate scores closer to its
    // recall than its precision
    val (sump3, sumr3, f3) = got(3L)
    assert(sumr3 < sump3, "truncation must cost recall, not precision")
    assert(f3 > 0L && f3 < 1000000000000L)
    val fAsD = f3.toDouble / 1e12
    val p = sump3.toDouble / 6e12; val r = sumr3.toDouble / 6e12
    assert(math.abs(fAsD - (5.0 * p * r) / (4.0 * p + r)) < 1e-9)
  }

  test("bleu: identity 1, brevity penalty exact, clip + zero-order gate, short/empty candidates 0") {
    val rows = Seq(
      (1L, "a b c d e", "a b c d e"),   // identical -> BLEU exactly 1
      (2L, "a b c d e f", "a b c d"),   // all p_n = 1, BP = exp(1 - 6/4)
      (3L, "a b c d", "a a b c"),       // clip kills one unigram, p4 = 0
      (4L, "a b c d e", "a b"),         // < 4 tokens: order 3,4 absent
      (5L, "a b c d", ""))              // empty candidate
      .toDF("id", "ref", "cand")
    val got = Eval.bleu(rows, "id", "ref", "cand")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
    assert(got(1L) === ((5L, 5L, 4L, 1000000000000L)))
    // BP path: sumlog = 0, bleu = exp(-0.5) quantized
    assert(got(2L) === ((6L, 4L, 4L,
      math.round(math.exp(-0.5) * 1e12))))
    // unigram clip: a appears twice in cand, once in ref -> p1 = 3/4;
    // 4-gram "a a b c" misses -> p4 = 0 -> unsmoothed gate zeroes it
    val (_, _, pos3, b3) = got(3L)
    assert(pos3 === 3L && b3 === 0L)
    // a 2-token candidate has no 3/4-grams at all -> gate fires
    val (_, _, pos4, b4) = got(4L)
    assert(pos4 === 2L && b4 === 0L)
    assert(got(5L) === ((4L, 0L, 0L, 0L)))
  }

  test("confusionReport: hand-computed cells at the mean threshold; perfect F1/MCC; degenerate NULL MCC") {
    val rows = Seq(
      // a: mean 2.5 -> pred {3,4}; tp=1 (3,T), fp=1 (4,F), fn=1 (1,T),
      // tn=1 (2,F) -> F1 = 2/(2+1+1) = 0.5, MCC = 0
      ("a", 1.0, true), ("a", 2.0, false), ("a", 3.0, true), ("a", 4.0, false),
      // b: perfectly separated -> F1 = MCC = 1
      ("b", 1.0, false), ("b", 2.0, false), ("b", 3.0, true), ("b", 4.0, true),
      // c: all positives -> tn = fp = 0 margins -> MCC NULL, F1 defined
      ("c", 1.0, true), ("c", 3.0, true))
      .toDF("g", "score", "label")
    val got = Eval.confusionReport(rows, "score", "label", "g")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5),
          if (r.isNullAt(6)) Long.MinValue else r.getLong(6)))).toMap
    assert(got("a") === ((1L, 1L, 1L, 1L, 500000000000L, 0L)))
    assert(got("b") === ((2L, 0L, 0L, 2L, 1000000000000L, 1000000000000L)))
    // c: mean 2 -> pred {3}; tp=1, fn=1 -> F1 = 2/(2+0+1)
    val (tp, fp, fn, tn, f1, mcc) = got("c")
    assert((tp, fp, fn, tn) === ((1L, 0L, 1L, 0L)))
    assert(f1 === math.round(2.0 / 3.0 * 1e12))
    assert(mcc === Long.MinValue, "degenerate matrix must report NULL MCC")
  }

  test("spearman: monotone 1, inverse -1, rank-invariance to nonlinearity, tie law, constant NULL") {
    def rho(rows: Seq[(Long, Long)]): Option[Long] = {
      val r = Eval.spearman(rows.toDF("x", "y"), "x", "y").collect().head
      if (r.isNullAt(3)) None else Some(r.getLong(3))
    }
    assert(rho(Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
      === Some(1000000000000L))
    assert(rho(Seq((1L, 40L), (2L, 30L), (3L, 20L), (4L, 10L)))
      === Some(-1000000000000L))
    // rank correlation sees through monotone nonlinearity (x vs x^2)
    assert(rho(Seq((1L, 1L), (2L, 4L), (3L, 9L))) === Some(1000000000000L))
    // tied x values share an average rank; identical tie structure -> 1
    assert(rho(Seq((1L, 5L), (1L, 5L), (2L, 9L))) === Some(1000000000000L))
    // hand case: y-permutation (30,10,20) of ranked x -> rho = -1/2
    val g = rho(Seq((1L, 30L), (2L, 10L), (3L, 20L))).get
    assert(math.abs(g + 500000000000L) <= 5L, s"expected ~-0.5, got $g")
    // constant side: zero variance -> NULL by law
    assert(rho(Seq((1L, 7L), (2L, 7L), (3L, 7L))) === None)
    // distinct-value counts ride along
    val row = Eval.spearman(Seq((1L, 5L), (1L, 5L), (2L, 9L)).toDF("x", "y"),
      "x", "y").collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) === ((3L, 2L, 2L)))
  }

  test("kendallTau: identical +1, reversed -1, hand-scored mix, <2 common NULL, rank>k excluded") {
    // q1: identical orders → all C(3,2)=3 pairs concordant, tau 1
    // q2: reversed → all discordant, tau -1
    // q3: ranks A (1,2,3) vs B (1,3,2): pairs (i,j),(i,k) concordant,
    //     (j,k) discordant → tau = (2-1)/3
    // q4: one common item → NULL tau
    // q5: an item with rank > k on one side must not enter
    val rows = Seq(
      (1L, 10L, 1, 1), (1L, 11L, 2, 2), (1L, 12L, 3, 3),
      (2L, 10L, 1, 3), (2L, 11L, 2, 2), (2L, 12L, 3, 1),
      (3L, 10L, 1, 1), (3L, 11L, 2, 3), (3L, 12L, 3, 2),
      (4L, 10L, 1, 1),
      (5L, 10L, 1, 1), (5L, 11L, 2, 2), (5L, 12L, 3, 99))
      .toDF("q", "item", "ra", "rb")
    val got = Eval.kendallTauFromRankings(rows, "q", "item", "ra", "rb", k = 20)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(got(1L) === ((3L, 3L, 0L, Some(1000000000000L))))
    assert(got(2L) === ((3L, 0L, 3L, Some(-1000000000000L))))
    assert(got(3L) === ((3L, 2L, 1L, Some(333333333333L))))
    assert(got(4L) === ((1L, 0L, 0L, None)))
    // q5: item 12's rb=99 > k drops it; the remaining 2 agree → tau 1
    assert(got(5L) === ((2L, 1L, 0L, Some(1000000000000L))))
  }

  test("passAtK: hand-computed C(n-c,k)/C(n,k) cases, all-fail 0, few-fail 1, n<k NULL, NULL-flag exclusion") {
    // t1: n=6, c=1, k=5 → 1 − C(5,5)/C(6,5) = 1 − 1/6 = 5/6
    // t2: n=5, c=0 → 1 − C(5,5)/C(5,5) = 0 (all fail)
    // t3: n=5, c=1 → n−c=4 < k → exactly 1
    // t4: n=4 < k → NULL (undefined)
    // t5: 5 valid attempts + one NULL flag — NULL rows carry no truth
    val rows =
      (Seq.fill(5)((1L, Some(false))) :+ ((1L, Some(true)))) ++
      Seq.fill(5)((2L, Some(false))) ++
      (Seq.fill(4)((3L, Some(false))) :+ ((3L, Some(true)))) ++
      Seq.fill(4)((4L, Some(false))) ++
      (Seq.fill(5)((5L, Some(false))) :+ ((5L, Option.empty[Boolean])))
    val df = rows.toDF("task", "ok")
    val got = Eval.passAtK(df, "task", "ok", k = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(got(1L) === ((6L, 1L, Some(833333333333L)))) // round(5/6 · 1e12)
    assert(got(2L) === ((5L, 0L, Some(0L))))
    assert(got(3L) === ((5L, 1L, Some(1000000000000L))))
    assert(got(4L) === ((4L, 0L, None)))
    assert(got(5L) === ((5L, 0L, Some(0L))), "NULL flag row must not count")
  }

  test("cerAtPrefix: hand-scored edits, identity 0, empty-ref NULL, non-ASCII strip, prefix cap") {
    val rows = Seq(
      (1L, "kitten", "sitting"),   // classic distance 3 over 6 ref chars
      (2L, "same text", "same text"), // identity → 0
      (3L, "", "anything"),        // empty ref → NULL cer
      (4L, "héllo", "hello"),      // é strips BOTH sides → hllo vs hello: 1 edit / 4
      (5L, "a" * 300, "a" * 300 + "zzz")) // cap at 256: suffix past the prefix invisible
      .toDF("id", "ref", "cand")
    val got = Eval.cerAtPrefix(rows, "id", "ref", "cand", prefixLen = 256)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(got(1L) === ((6L, 3L, Some(500000000000L))))
    assert(got(2L) === ((9L, 0L, Some(0L))))
    assert(got(3L) === ((0L, 8L, None)))
    assert(got(4L) === ((4L, 1L, Some(250000000000L))))
    assert(got(5L) === ((256L, 0L, Some(0L))))
  }

  test("chi2Independence: hand-computed 2x2 with an absent cell; exact V; single-valued dim NULLs V; empty = no rows") {
    import spark.implicits._
    // counts: (x,0)=10, (x,1)=0 ABSENT, (y,0)=10, (y,1)=10 → E = {6.67,
    // 3.33, 13.33, 6.67} → chi2 = 7.5 exactly, V = sqrt(7.5/30) = 0.5
    val rows = (Seq.fill(10)(("x", 0L)) ++ Seq.fill(10)(("y", 0L)) ++
      Seq.fill(10)(("y", 1L))).toDF("a", "b")
    val r = Eval.chi2Independence(rows, "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((30L, 2L, 2L)))
    assert(r.getLong(3) === 7500000000000L, "chi2 = 7.5 exactly")
    assert(r.getLong(4) === 500000000000L, "V = 0.5 exactly")
    // independent table: chi2 exactly 0
    val indep = (Seq.fill(4)(("x", 0L)) ++ Seq.fill(2)(("x", 1L)) ++
      Seq.fill(8)(("y", 0L)) ++ Seq.fill(4)(("y", 1L))).toDF("a", "b")
    val i = Eval.chi2Independence(indep, "a", "b").collect().head
    assert((i.getLong(3), i.getLong(4)) === ((0L, 0L)))
    // one-column dim: V undefined (NULL), chi2 still 0
    val mono = Seq(("x", 0L), ("y", 0L)).toDF("a", "b")
    val m = Eval.chi2Independence(mono, "a", "b").collect().head
    assert(m.getLong(3) === 0L)
    assert(m.isNullAt(4))
    assert(Eval.chi2Independence(
      Seq.empty[(String, Long)].toDF("a", "b"), "a", "b").count() === 0L)
  }

  test("mutualInformation: perfect balanced dependence is exactly ln 2; independence is exactly 0; empty = no rows") {
    import spark.implicits._
    val dep = (Seq.fill(5)(("x", 0L)) ++ Seq.fill(5)(("y", 1L)))
      .toDF("a", "b")
    val d = Eval.mutualInformation(dep, "a", "b").collect().head
    assert((d.getLong(0), d.getLong(1), d.getLong(2)) === ((10L, 2L, 2L)))
    assert(d.getLong(3) === math.round(math.log(2.0) * 1e12),
      "balanced perfect dependence carries exactly ln 2 nats")
    val indep = (Seq.fill(4)(("x", 0L)) ++ Seq.fill(2)(("x", 1L)) ++
      Seq.fill(8)(("y", 0L)) ++ Seq.fill(4)(("y", 1L))).toDF("a", "b")
    assert(Eval.mutualInformation(indep, "a", "b").collect()
      .head.getLong(3) === 0L)
    assert(Eval.mutualInformation(
      Seq.empty[(String, Long)].toDF("a", "b"), "a", "b").count() === 0L)
  }

  test("rankEffect: hand-computed pair counts with ties; empty group yields NULL delta; NULLs drop") {
    import spark.implicits._
    // A = {1, 2, 2}, B = {2, 3}: pairs (a, b) → gt 0, lt 4, ties 2
    // (2a×2b twice); u2 = 2·0 + 2 = 2; delta = (0−4)/6 = −0.666…
    val rows = Seq[(Option[Long], Option[Boolean])](
      (Some(1L), Some(true)), (Some(2L), Some(true)), (Some(2L), Some(true)),
      (Some(2L), Some(false)), (Some(3L), Some(false)),
      (Some(99L), None), (None, Some(true)))
      .toDF("v", "fa")
    val r = Eval.rankEffect(rows, "v", "fa").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((3L, 2L, 0L, 4L, 2L, 2L)))
    assert(r.getLong(6) === -666666666667L,
      "delta rounds away from zero on both engines")
    // one-sided input: counts exact, delta undefined (visible NULL)
    val oneSided = Eval.rankEffect(
      Seq((5L, true), (7L, true)).toDF("v", "fa"), "v", "fa").collect().head
    assert((oneSided.getLong(0), oneSided.getLong(1)) === ((2L, 0L)))
    assert(oneSided.isNullAt(6))
  }
  test("uncertaintyCoefficient: bijection = 1.0 both ways, independence = 0, constant side NULL") {
    import spark.implicits._
    // a <-> b bijection: MI = H(a) = H(b) (same quantized sums) -> U = 1e6
    val bij = Seq(("x", 1L), ("y", 2L), ("x", 1L), ("y", 2L), ("z", 3L))
      .toDF("a", "b")
    val r1 = Eval.uncertaintyCoefficient(bij, "a", "b").collect().head
    assert(r1.getLong(6) === 1000000L && r1.getLong(7) === 1000000L)
    assert(r1.getLong(3) === r1.getLong(5), "H(a) = MI under bijection")
    // balanced independence: every cell n/4 -> MI terms ln(1) = 0
    val ind = Seq(("x", 1L), ("x", 2L), ("y", 1L), ("y", 2L)).toDF("a", "b")
    val r2 = Eval.uncertaintyCoefficient(ind, "a", "b").collect().head
    assert(r2.getLong(5) === 0L && r2.getLong(6) === 0L && r2.getLong(7) === 0L)
    // constant a: H(a) = 0 -> u_ab NULL (visible, not a division blowup)
    val const = Seq(("x", 1L), ("x", 2L)).toDF("a", "b")
    val r3 = Eval.uncertaintyCoefficient(const, "a", "b").collect().head
    assert(r3.isNullAt(6) && r3.getLong(7) === 0L)
  }

  test("riskRatioByGroup: hand-exact ratio, Scala Wilson replay, lone group NULL rr") {
    import spark.implicits._
    val df = Seq(("x", true), ("x", true), ("x", false), ("x", false),
      ("y", true), ("y", false), ("y", false), ("y", false))
      .toDF("grp", "hit")
    val got = Eval.riskRatioByGroup(df, "grp", "hit")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(got("x")._4 === 2000000L, "0.5 vs rest 0.25 -> rr 2.0")
    assert(got("y")._4 === 500000L)
    // Wilson replay for x: n=4, s=2, p=0.5
    def wilson(n: Double, p: Double): (Long, Long) = {
      val z = 1.96
      val z2n = z * z / n
      val center = (p + z2n / 2.0) / (1.0 + z2n)
      val half = (z / (1.0 + z2n)) *
        math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
      (math.round(math.max(0.0, center - half) * 1e6),
        math.round(math.min(1.0, center + half) * 1e6))
    }
    assert((got("x")._5, got("x")._6) === wilson(4.0, 0.5))
    // a lone group has no rest: rr NULL
    val lone = Seq(("only", true), ("only", false)).toDF("grp", "hit")
    assert(Eval.riskRatioByGroup(lone, "grp", "hit").collect().head.isNullAt(4))
  }

  test("kruskalWallis: hand-checked H, tie correction, all-tied NULL") {
    // no ties: a={1,2}, b={3,4} → ranks 1..4, R_a=3, R_b=7,
    // H = 12/(4·5)·(9/2 + 49/2) − 3·5 = 2.4; C = 1
    val noTies = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L))
      .toDF("g", "v")
    val r1 = Eval.kruskalWallis(noTies, "v", "g").collect().head
    assert((r1.getLong(0), r1.getLong(1)) === ((4L, 2L)))
    assert(r1.getLong(2) === 2400000000000L)
    assert(r1.getLong(3) === 2400000000000L)
    // ties: a={1,1}, b={1,2} → midranks 2,2,2,4, H = 0.6;
    // C = 1 − 24/60 = 0.6 → H/C = 1
    val ties = Seq(("a", 1L), ("a", 1L), ("b", 1L), ("b", 2L)).toDF("g", "v")
    val r2 = Eval.kruskalWallis(ties, "v", "g").collect().head
    assert(r2.getLong(2) === 600000000000L)
    assert(r2.getLong(3) === 1000000000000L)
    // every value tied: H = 0 and C = 0 → corrected form undefined
    val allTied = Seq(("a", 5L), ("b", 5L)).toDF("g", "v")
    val r3 = Eval.kruskalWallis(allTied, "v", "g").collect().head
    assert(r3.getLong(2) === 0L)
    assert(r3.isNullAt(3))
  }

  test("anovaF: hand-checked F and eta², zero-SSW and single-group NULLs") {
    // a={1,2,3}, b={4,5,6}: SSB = 13.5, SSW = 4 → F = 13.5, η² = 27/35
    val two = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 4L), ("b", 5L), ("b", 6L)).toDF("g", "v")
    val r1 = Eval.anovaF(two, "v", "g").collect().head
    assert((r1.getLong(0), r1.getLong(1)) === ((6L, 2L)))
    assert(r1.getLong(2) === 13500000000000L)
    assert(r1.getLong(3) === math.round(13.5 / 17.5 * 1e12))
    // zero within-group variance: F undefined, η² = 1
    val sep = Seq(("a", 2L), ("a", 2L), ("b", 3L), ("b", 3L)).toDF("g", "v")
    val r2 = Eval.anovaF(sep, "v", "g").collect().head
    assert(r2.isNullAt(2))
    assert(r2.getLong(3) === 1000000000000L)
    // one group: k − 1 = 0 → both NULL (SST = SSW; η² = 0 would misread
    // as "grouping explains nothing" when there is no grouping)
    val one = Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
    val r3 = Eval.anovaF(one, "v", "g").collect().head
    assert(r3.isNullAt(2))
    assert(r3.isNullAt(3))
  }

  test("kendallTauB: brute-force parity on a tied random frame") {
    val rnd = new scala.util.Random(17L)
    val rows = (1 to 200).map(_ =>
      (rnd.nextInt(4).toLong, rnd.nextInt(20).toLong))
    val r = Eval.kendallTauB(rows.toDF("x", "y"), "x", "y").collect().head
    var conc = 0L; var disc = 0L; var tx = 0L; var ty = 0L
    for (i <- rows.indices; j <- i + 1 until rows.size) {
      val sx = java.lang.Long.signum(rows(j)._1 - rows(i)._1)
      val sy = java.lang.Long.signum(rows(j)._2 - rows(i)._2)
      if (sx == 0) tx += 1
      if (sy == 0) ty += 1
      if (sx != 0 && sy != 0) { if (sx == sy) conc += 1 else disc += 1 }
    }
    val n = rows.size.toLong
    val n0 = n * (n - 1) / 2
    assert((r.getLong(0), r.getLong(1)) === ((n, 4L)))
    assert((r.getLong(2), r.getLong(3)) === ((tx, ty)))
    assert((r.getLong(4), r.getLong(5)) === ((conc, disc)))
    assert(r.getLong(6) === math.round((conc - disc).toDouble
      / math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble) * 1e12))
  }

  test("moodMedianTest: exact lower median, separated chi2, degenerate one-side table") {
    // a = {1,2,3} all ≤ median 3 < b = {10,11,12}: perfect separation →
    // the 2×2 table is [3,0;0,3], χ² = 6, Cramér's V = 1
    val sep = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 10L), ("b", 11L), ("b", 12L)).toDF("g", "v")
    val r = Eval.moodMedianTest(sep, "v", "g").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((6L, 2L, 2L)))
    assert(r.getLong(3) === 3L)
    assert(r.getLong(4) === 6000000000000L)
    assert(r.getLong(5) === 1000000000000L)
    // even count: the LOWER median (rank (n+1) div 2 = 2) is 2
    val even = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)).toDF("g", "v")
    assert(Eval.moodMedianTest(even, "v", "g").collect().head.getLong(3) === 2L)
    // all values equal: one side only → χ² exactly 0, V NULL
    val const = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "v")
    val r2 = Eval.moodMedianTest(const, "v", "g").collect().head
    assert((r2.getLong(2), r2.getLong(4)) === ((1L, 0L)))
    assert(r2.isNullAt(5))
  }

  test("ordinalAssociation: brute-force gamma/Somers parity, degenerate NULLs") {
    val rnd = new scala.util.Random(29L)
    val rows = (1 to 150).map(_ =>
      (rnd.nextInt(4).toLong, rnd.nextInt(15).toLong))
    val r = Eval.ordinalAssociation(rows.toDF("x", "y"), "x", "y")
      .collect().head
    var conc = 0L; var disc = 0L; var tx = 0L; var ty = 0L
    for (i <- rows.indices; j <- i + 1 until rows.size) {
      val sx = java.lang.Long.signum(rows(j)._1 - rows(i)._1)
      val sy = java.lang.Long.signum(rows(j)._2 - rows(i)._2)
      if (sx == 0) tx += 1
      if (sy == 0) ty += 1
      if (sx != 0 && sy != 0) { if (sx == sy) conc += 1 else disc += 1 }
    }
    val n0 = rows.size.toLong * (rows.size - 1) / 2
    assert((r.getLong(2), r.getLong(3)) === ((conc, disc)))
    assert(r.getLong(4) === math.round(
      (conc - disc).toDouble / (conc + disc).toDouble * 1e12))
    assert(r.getLong(5) === math.round(
      (conc - disc).toDouble / (n0 - tx).toDouble * 1e12))
    assert(r.getLong(6) === math.round(
      (conc - disc).toDouble / (n0 - ty).toDouble * 1e12))
    // clean monotone: all three read exactly 1
    val up = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("x", "y")
    val r2 = Eval.ordinalAssociation(up, "x", "y").collect().head
    assert((r2.getLong(4), r2.getLong(5), r2.getLong(6)) ===
      ((1000000000000L, 1000000000000L, 1000000000000L)))
    // fully tied metric: no orderable pairs → gamma and d_x|y NULL,
    // d_y|x = 0 (pairs order in x but never in y)
    val constY = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "y")
    val r3 = Eval.ordinalAssociation(constY, "x", "y").collect().head
    assert(r3.isNullAt(4) && r3.isNullAt(6))
    assert(r3.getLong(5) === 0L)
  }

  test("jonckheereTerpstra: hand-checked clean and tied designs, degenerate NULLs") {
    // a={1,2}, b={3,4}: C = 4, no ties, N = 4 → J − E = 2,
    // Var = A/72 = (4·3·13 − 2·18)/72 = 120/72
    val clean = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L)).toDF("g", "v")
    val r = Eval.jonckheereTerpstra(clean, "g", "v").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((4L, 2L)))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((4L, 0L, 8L)))
    assert(r.getLong(5) === math.round(120.0 / 72.0 * 1e6))
    assert(r.getLong(6) === math.round(2.0 / math.sqrt(120.0 / 72.0) * 1e12))
    // a={1,1}, b={1,2}: C = 2, one cross-tied value pair ⇒ J* = 3,
    // E = 2; A = 156 − 36 − 66 = 54, B-term 0 (g3 = 0),
    // C-term = 4·6/(8·4·3) = 0.25 → Var = 54/72 + 0.25 = 1 → z = 1
    val tied = Seq((1L, 1L), (1L, 1L), (2L, 1L), (2L, 2L)).toDF("g", "v")
    val r2 = Eval.jonckheereTerpstra(tied, "g", "v").collect().head
    assert((r2.getLong(2), r2.getLong(3), r2.getLong(4)) === ((2L, 2L, 8L)))
    assert(r2.getLong(5) === 1000000L)
    assert(r2.getLong(6) === 1000000000000L)
    // all values equal across 3 singleton classes: Var = 0 → z NULL
    val const = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("g", "v")
    val r3 = Eval.jonckheereTerpstra(const, "g", "v").collect().head
    assert(r3.getLong(5) === 0L)
    assert(r3.isNullAt(6))
    // N < 3: variance undefined → both NULL
    val tiny = Seq((1L, 1L), (2L, 2L)).toDF("g", "v")
    val r4 = Eval.jonckheereTerpstra(tiny, "g", "v").collect().head
    assert(r4.isNullAt(5) && r4.isNullAt(6))
  }

  test("cliffsDelta: separation, mix, ties, one-sided NULL") {
    // a={3,4} all above b={1,2}: δ = 1
    val sep = Seq((3L, true), (4L, true), (1L, false), (2L, false))
      .toDF("v", "fa")
    val r = Eval.cliffsDelta(sep, "v", "fa").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((2L, 2L)))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((4L, 0L, 0L)))
    assert(r.getLong(5) === 1000000000000L)
    // a={1,3} straddles b={2}: gt = lt = 1 → δ = 0
    val mix = Seq((1L, true), (3L, true), (2L, false)).toDF("v", "fa")
    assert(Eval.cliffsDelta(mix, "v", "fa").collect().head.getLong(5) === 0L)
    // full tie: one cross pair, equal → δ = 0 with tie_pairs = 1
    val tie = Seq((2L, true), (2L, false)).toDF("v", "fa")
    val r2 = Eval.cliffsDelta(tie, "v", "fa").collect().head
    assert((r2.getLong(2), r2.getLong(3), r2.getLong(4)) === ((0L, 0L, 1L)))
    assert(r2.getLong(5) === 0L)
    // one empty group: no pairs, δ NULL
    val one = Seq((1L, true), (2L, true)).toDF("v", "fa")
    val r3 = Eval.cliffsDelta(one, "v", "fa").collect().head
    assert((r3.getLong(0), r3.getLong(1)) === ((2L, 0L)))
    assert(r3.isNullAt(5))
  }

  test("kendallTauB: monotone 1, inverse -1, degenerate NULLs, class cap") {
    // clean monotone / inverse over 3 classes
    val up = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("x", "y")
    assert(Eval.kendallTauB(up, "x", "y").collect().head
      .getLong(6) === 1000000000000L)
    val down = Seq((1L, 30L), (2L, 20L), (3L, 10L)).toDF("x", "y")
    assert(Eval.kendallTauB(down, "x", "y").collect().head
      .getLong(6) === -1000000000000L)
    // a single class: every pair is an x tie → n0 − n1 = 0 → NULL
    val oneClass = Seq((1L, 1L), (1L, 2L), (1L, 3L)).toDF("x", "y")
    val r1 = Eval.kendallTauB(oneClass, "x", "y").collect().head
    assert((r1.getLong(4), r1.getLong(5)) === ((0L, 0L)))
    assert(r1.isNullAt(6))
    // a constant metric: every pair is a y tie → NULL
    val constY = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "y")
    assert(Eval.kendallTauB(constY, "x", "y").collect().head.isNullAt(6))
    // the ordinal axis is bounded BY CONTRACT: 65 classes at the default
    // cap must fail the require, not flood the per-class column law
    val wide = (1 to 65).map(i => (i.toLong, i.toLong)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      Eval.kendallTauB(wide, "x", "y")
    }
    assert(e.getMessage.contains("bounded ordinal axis"))
  }

  test("welchTTest: clean two-group fixture, degenerate n < 2 NULLs") {
    // A={0,2} (m=1, s²=2), B={1,3} (m=2, s²=2): se² = 2,
    // t = d = −1/√2, df = 4/(1+1) = 2
    val df0 = Seq((0L, true), (2L, true), (1L, false), (3L, false))
      .toDF("v", "fa")
    val r = Eval.welchTTest(df0, "v", "fa").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((2L, 2L)))
    assert(r.getLong(2) === math.round(-1.0 / math.sqrt(2.0) * 1e12))
    assert(r.getLong(3) === 2000000L)
    assert(r.getLong(4) === math.round(-1.0 / math.sqrt(2.0) * 1e12))
    // one side a singleton: variance undefined → all NULL
    val tiny = Seq((1L, true), (2L, false), (3L, false)).toDF("v", "fa")
    val r2 = Eval.welchTTest(tiny, "v", "fa").collect().head
    assert(r2.isNullAt(2) && r2.isNullAt(3) && r2.isNullAt(4))
  }

  test("cochranArmitageTrend: hand-checked z², sign, degenerate NULL") {
    // levels 0,1,2 with (n,y) = (2,0),(2,1),(2,2): U = 12,
    // den = 3·3·(60−36) = 216, z² = 6·144/216 = 4
    val up = Seq((0L, false), (0L, false), (1L, true), (1L, false),
      (2L, true), (2L, true)).toDF("s", "hit")
    val r1 = Eval.cochranArmitageTrend(up, "s", "hit").collect().head
    assert((r1.getLong(0), r1.getLong(1)) === ((6L, 3L)))
    assert(r1.getLong(2) === 4000000000000L)
    assert(r1.getLong(3) === 1L)
    // reversed outcome → same z², opposite sign
    val down = up.select(org.apache.spark.sql.functions.col("s"),
      (!org.apache.spark.sql.functions.col("hit")).as("hit"))
    val r2 = Eval.cochranArmitageTrend(down, "s", "hit").collect().head
    assert(r2.getLong(2) === 4000000000000L)
    assert(r2.getLong(3) === -1L)
    // all-success: Y(N−Y) = 0 → z² NULL, sign 0
    val flat = Seq((0L, true), (1L, true)).toDF("s", "hit")
    val r3 = Eval.cochranArmitageTrend(flat, "s", "hit").collect().head
    assert(r3.isNullAt(2))
    assert(r3.getLong(3) === 0L)
  }

  test("mapAtK: exact lcm numerator, total-relevant denominator, no-rel NULL") {
    // q=1 top-4 rel pattern [1,0,1,0], R = 3 (one relevant never ranked):
    // AP@4 = (1 + 2/3)/3 = 5/9
    val ranked = Seq((1L, 11L, 1), (1L, 12L, 2), (1L, 13L, 3), (1L, 14L, 4),
      (2L, 11L, 1), (2L, 12L, 2)).toDF("q", "item", "rank")
    val rel = Seq((1L, 11L), (1L, 13L), (1L, 99L)).toDF("q", "item")
    val got = Eval.mapAtK(ranked, rel, "q", "item", "rank", k = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(got(1L) === ((2L, 3L, Some(math.round(5.0 / 9.0 * 1e6)))))
    // q=2 has no relevant items at all → NULL AP
    assert(got(2L) === ((0L, 0L, None)))
    // lcm sanity: the exact-integer denominator the law rests on
    assert(Eval.lcmTo(4) === 12L)
    assert(Eval.lcmTo(20) === 232792560L)
  }

  test("brierDecomposition: hand-exact Murphy identity on a clean fixture; empty input no rows") {
    // two bins: score 0.1 (never true) ×2, score 0.9 (always true) ×2
    // Brier = 0.01; REL = 0.01 (each bin off by 0.1); RES = 0.25
    // (bin accuracies 0/1 vs base rate 0.5); UNC = 0.25 — the identity
    // Brier = REL − RES + UNC holds exactly here
    val rows = Seq((0.1, false), (0.1, false), (0.9, true), (0.9, true))
      .toDF("s", "y")
    val r = Eval.brierDecomposition(rows, "s", "y").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((4L, 2L)))
    assert(r.getLong(2) === 10000000000L)
    assert(r.getLong(3) === 10000000000L)
    assert(r.getLong(4) === 250000000000L)
    assert(r.getLong(5) === 250000000000L)
    assert(r.getLong(2) === r.getLong(3) - r.getLong(4) + r.getLong(5))
    // NaN/NULL rows drop; empty input emits NO row (not a NULL row)
    val empty = Seq((Double.NaN, true)).toDF("s", "y")
    assert(Eval.brierDecomposition(empty, "s", "y").count() === 0L)
  }

  test("fleissKappa: perfect agreement 1, degenerate constant NULL, off-panel items drop") {
    // 3 raters unanimous per item, two categories across items:
    // P̄ = 1, P̄e = 0.5 → κ = 1
    val perfect = (1L to 2L).flatMap(i => Seq.fill(3)((i, 0L))) ++
      (3L to 4L).flatMap(i => Seq.fill(3)((i, 1L)))
    val r1 = Eval.fleissKappa(perfect.toDF("item", "cat"), "item", "cat", 3)
      .collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) === ((4L, 3L, 2L)))
    assert(r1.getLong(3) === 1000000000000L)
    // every rating the same single category: P̄e = 1 → κ undefined
    val const = (1L to 4L).flatMap(i => Seq.fill(3)((i, 0L)))
    assert(Eval.fleissKappa(const.toDF("item", "cat"), "item", "cat", 3)
      .collect().head.isNullAt(3))
    // an item with only 2 ratings is OFF the fixed panel and drops
    val partial = perfect ++ Seq((9L, 0L), (9L, 1L))
    val r2 = Eval.fleissKappa(partial.toDF("item", "cat"), "item", "cat", 3)
      .collect().head
    assert(r2.getLong(0) === 4L)
    assert(r2.getLong(3) === 1000000000000L)
  }

  test("mcnemar: discordant-cell chi2 exact, concordant-only NULL") {
    val rows = Seq((false, true), (false, true), (false, true),
      (true, false), (true, true), (false, false)).toDF("a", "b")
    val r = Eval.mcnemar(rows, "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((6L, 3L, 1L)))
    assert(r.getLong(3) === 1000000000000L) // (3−1)²/4 = 1
    val agree = Seq((true, true), (false, false)).toDF("a", "b")
    assert(Eval.mcnemar(agree, "a", "b").collect().head.isNullAt(3))
  }

  test("brownForsythe: hand-exact F on doubled median deviations; equal spreads NULL") {
    // a = {0,2,4} (med 2 → |2x−4| = 4,0,4), b = {10,20,30} (med 20 →
    // 20,0,20): ANOVA on the deviations gives F = 2.4615…
    val df0 = Seq(("a", 0L), ("a", 2L), ("a", 4L),
      ("b", 10L), ("b", 20L), ("b", 30L)).toDF("g", "v")
    val r = Eval.brownForsythe(df0, "v", "g").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((6L, 2L)))
    val ssb = 170666666.0; val ssw = 277333334.0
    assert(r.getLong(2) === math.round(ssb / 1.0 / (ssw / 4.0) * 1e12))
    // identical spreads: every deviation equal → SSW = SSB = 0 → NULLs
    val flat = Seq(("a", 0L), ("a", 2L), ("b", 10L), ("b", 12L))
      .toDF("g", "v")
    val r2 = Eval.brownForsythe(flat, "v", "g").collect().head
    assert(r2.isNullAt(2) && r2.isNullAt(3))
  }

  test("ansariBradley: folded scores, tie midscores, signs, degenerate NULLs") {
    // A = {1,4} brackets B = {2,3}: scores 1,2,2,1 → W_A = 2, E = 3,
    // Var = 1/3 → z = −√3 (A is the DISPERSED side → below-mean score)
    val sep = Seq((1L, true), (4L, true), (2L, false), (3L, false))
      .toDF("v", "fa")
    val r = Eval.ansariBradley(sep, "v", "fa").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((2L, 2L)))
    // w/e diagnostics surface as doubles (ANSI-safe past N ≈ 10⁷)
    assert(r.getDouble(2) === 2000000.0)
    assert(r.getDouble(3) === 3000000.0)
    assert(r.getLong(4) === -1732050807569L)
    // mirrored: A = {2,2} tight inside B = {1,3} — the tied run at v=2
    // spans ranks {2,3} with score sum 4 → midscore 2 exactly; z = +√3
    val tight = Seq((2L, true), (2L, true), (1L, false), (3L, false))
      .toDF("v", "fa")
    val r2 = Eval.ansariBradley(tight, "v", "fa").collect().head
    assert(r2.getDouble(2) === 4000000.0)
    assert(r2.getLong(4) === 1732050807569L)
    // all values tied: Var = 0 → z NULL, W still reported
    val flat2 = Seq((5L, true), (5L, false)).toDF("v", "fa")
    val r3 = Eval.ansariBradley(flat2, "v", "fa").collect().head
    assert(r3.getDouble(2) === 1000000.0 && r3.isNullAt(4))
    // a lone side: z NULL
    val lone = Seq((1L, true), (2L, true)).toDF("v", "fa")
    assert(Eval.ansariBradley(lone, "v", "fa").collect().head.isNullAt(4))
  }

  test("brunnerMunzel: Brunner–Munzel '00 worked example, exact rank sums, degenerate NULLs") {
    // the canonical BM example (n_A=14, n_B=11, heavy cross ties):
    // W = 3.1374674823029505, p̂ = 0.7889610389610390 — checked against
    // an independent per-observation midrank computation
    val a = Seq(1L, 2L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 2L, 4L, 1L, 1L)
    val b = Seq(3L, 3L, 4L, 3L, 1L, 2L, 3L, 1L, 1L, 5L, 4L)
    val df = (a.map(_ -> true) ++ b.map(_ -> false)).toDF("v", "fa")
    val r = Eval.brunnerMunzel(df, "v", "fa").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((14L, 11L)))
    assert((r.getLong(2), r.getLong(3)) === ((275L, 375L)))
    assert(r.getLong(4) === 788961038961L)
    assert(r.getLong(5) === 3137467482303L)
    // identical singletons: variance cumulants are 0 → W NULL, p̂ = ½
    val flat = Seq((7L, true), (7L, true), (7L, false), (7L, false))
      .toDF("v", "fa")
    val r2 = Eval.brunnerMunzel(flat, "v", "fa").collect().head
    assert(r2.getLong(4) === 500000000000L && r2.isNullAt(5))
    // n < 2 on a side: W NULL even with spread
    val small = Seq((1L, true), (2L, false), (3L, false)).toDF("v", "fa")
    assert(Eval.brunnerMunzel(small, "v", "fa").collect().head.isNullAt(5))
  }

  test("pageTrendL: perfect trend, within-block ties, incomplete blocks drop, k guards") {
    // 3 complete blocks, perfect 1<2<3 trend: L = 42 → L2 = 84, E2 = 72,
    // Var2 = 24 → z = √6
    val perfect = (1 to 3).flatMap(bk => Seq(
      (s"b$bk", "c1", 10L), (s"b$bk", "c2", 20L), (s"b$bk", "c3", 30L)))
      .toDF("blk", "cls", "v")
    val r = Eval.pageTrendL(perfect, "blk", "cls", "v").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((3L, 3L)))
    assert((r.getLong(2), r.getLong(3)) === ((84L, 72L)))
    assert(r.getLong(4) === 2449489742783L)
    // an incomplete block (missing c3) must drop, not skew
    val withIncomplete = perfect.union(
      Seq(("bX", "c1", 99L), ("bX", "c2", 1L)).toDF("blk", "cls", "v"))
    val r2 = Eval.pageTrendL(withIncomplete, "blk", "cls", "v")
      .collect().head
    assert((r2.getLong(0), r2.getLong(2)) === ((3L, 84L)))
    // within-block tie: cells (5,5,7) → midranks2 (3,3,6) →
    // block L2 = 1·3 + 2·3 + 3·6 = 27; replicated cells SUM first
    val tied = Seq(("b1", "c1", 5L), ("b1", "c2", 3L), ("b1", "c2", 2L),
      ("b1", "c3", 7L)).toDF("blk", "cls", "v")
    val r3 = Eval.pageTrendL(tied, "blk", "cls", "v").collect().head
    assert((r3.getLong(0), r3.getLong(2)) === ((1L, 27L)))
    // k = 2: L2 computes but z is NULL (tabulated for k ≥ 3)
    val two = Seq(("b1", "c1", 1L), ("b1", "c2", 2L)).toDF("blk", "cls", "v")
    assert(Eval.pageTrendL(two, "blk", "cls", "v").collect().head.isNullAt(4))
    // over-limit class axis fails the require before any ranking
    val wide = (0 until 5).map(j => ("b1", s"c$j", j.toLong))
      .toDF("blk", "cls", "v")
    val e = intercept[IllegalArgumentException] {
      Eval.pageTrendL(wide, "blk", "cls", "v", maxClasses = 4).collect()
    }
    assert(e.getMessage.contains("exceeds 4 distinct values"))
  }

  test("friedmanKendallW: perfect agreement, single tied block, all-tied NULL") {
    // 3 blocks in perfect agreement: classic χ²_F = 6, W = 1
    val perfect = (1 to 3).flatMap(bk => Seq(
      (s"b$bk", "c1", 10L), (s"b$bk", "c2", 20L), (s"b$bk", "c3", 30L)))
      .toDF("blk", "cls", "v")
    val r = Eval.friedmanKendallW(perfect, "blk", "cls", "v").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((3L, 3L)))
    assert((r.getLong(2), r.getLong(3)) === ((72L, 168L)))
    assert(r.getLong(4) === 6000000000000L)
    assert(r.getLong(5) === 1000000000000L)
    // one block with a tie (5,5,7): mr2 = (3,3,6) → S4 = 6, A4 = 54,
    // C4 = 48 → χ² = 2·6/6 = 2, W = 2/(1·2) = 1
    val tied = Seq(("b1", "c1", 5L), ("b1", "c2", 5L), ("b1", "c3", 7L))
      .toDF("blk", "cls", "v")
    val r2 = Eval.friedmanKendallW(tied, "blk", "cls", "v").collect().head
    assert((r2.getLong(2), r2.getLong(3)) === ((6L, 54L)))
    assert(r2.getLong(4) === 2000000000000L)
    // every block fully tied: A4 = C4 → no ranking information → NULLs
    val flat = Seq(("b1", "c1", 5L), ("b1", "c2", 5L), ("b1", "c3", 5L))
      .toDF("blk", "cls", "v")
    val r3 = Eval.friedmanKendallW(flat, "blk", "cls", "v").collect().head
    assert(r3.isNullAt(4) && r3.isNullAt(5))
  }

  test("cuzickTrend: perfect trend, ties through midranks, degenerate NULLs") {
    // classes c1<c2<c3, one obs each, values increasing: T2 = 28,
    // E2 = 24, Var = 8 → z = √2
    val up = Seq(("c1", 1L), ("c2", 2L), ("c3", 3L)).toDF("cls", "v")
    val r = Eval.cuzickTrend(up, "cls", "v").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((3L, 3L)))
    assert((r.getLong(2), r.getLong(3)) === ((28L, 24L)))
    assert(r.getLong(4) === 1414213562373L)
    // ties ride the midranks: c1 = {1,1}, c2 = {1,2} → T2 = 32,
    // E2 = 30, Var = 4 → z = 1
    val ties = Seq(("c1", 1L), ("c1", 1L), ("c2", 1L), ("c2", 2L))
      .toDF("cls", "v")
    val r2 = Eval.cuzickTrend(ties, "cls", "v").collect().head
    assert((r2.getLong(2), r2.getLong(3)) === ((32L, 30L)))
    assert(r2.getLong(4) === 1000000000000L)
    // all values tied: Var = 0 → NULL; single class likewise
    val flat = Seq(("c1", 7L), ("c2", 7L)).toDF("cls", "v")
    assert(Eval.cuzickTrend(flat, "cls", "v").collect().head.isNullAt(4))
    val one = Seq(("c1", 1L), ("c1", 2L)).toDF("cls", "v")
    assert(Eval.cuzickTrend(one, "cls", "v").collect().head.isNullAt(4))
  }

  test("signedRankTest: hand-exact W+, tie correction, zero-diff drop, degenerate NULL") {
    // d = (1,2,3): W2+ = 12, E2 = 6, var12 = 168 → z = 6/√14
    val up = Seq((2L, 1L), (4L, 2L), (6L, 3L)).toDF("a", "b")
    val r = Eval.signedRankTest(up, "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((3L, 3L)))
    assert((r.getLong(2), r.getLong(3)) === ((12L, 6L)))
    // var12 ≈ 4n'³ surfaces as a double (ANSI-safe past n' ≈ 1.3M)
    assert(r.getDouble(4) === 168.0)
    assert(r.getLong(5) === 1603567451475L)
    // d = (1, −1, 2): the |d| = 1 run ties across signs — W2+ = 9,
    // tie mass 6 → var12 = 162, z = 3/√13.5
    val mixed = Seq((5L, 4L), (4L, 5L), (7L, 5L)).toDF("a", "b")
    val r2 = Eval.signedRankTest(mixed, "a", "b").collect().head
    assert((r2.getLong(2), r2.getDouble(4)) === ((9L, 162.0)))
    assert(r2.getLong(5) === 816496580928L)
    // zero differences drop from the ranking but count as pairs
    val withZero = mixed.union(Seq((3L, 3L)).toDF("a", "b"))
    val r3 = Eval.signedRankTest(withZero, "a", "b").collect().head
    assert((r3.getLong(0), r3.getLong(1)) === ((4L, 3L)))
    assert(r3.getLong(2) === 9L)
    // all pairs equal: nothing to rank → NULL z
    val flat = Seq((3L, 3L), (9L, 9L)).toDF("a", "b")
    val r4 = Eval.signedRankTest(flat, "a", "b").collect().head
    assert(r4.getLong(1) === 0L && r4.isNullAt(5))
  }

  test("cochranQ: hand-exact Q, all-hit NULL, duplicate hits collapse") {
    // u1{A}, u2{A,B}, u3{A,B,C}: C = (3,2,1), R = (1,2,3), T = 6 → Q = 3
    val hits = Seq(("u1", "A"), ("u2", "A"), ("u2", "B"),
      ("u3", "A"), ("u3", "B"), ("u3", "C")).toDF("blk", "cls")
    val r = Eval.cochranQ(hits, "blk", "cls").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 3L, 6L)))
    assert(r.getLong(3) === 3000000000000L)
    // a duplicate hit row is the same hit
    val dup = hits.union(Seq(("u1", "A")).toDF("blk", "cls"))
    assert(Eval.cochranQ(dup, "blk", "cls").collect().head.getLong(3)
      === 3000000000000L)
    // every block hit every class: no discordance → NULL
    val full = Seq(("u1", "A"), ("u1", "B"), ("u2", "A"), ("u2", "B"))
      .toDF("blk", "cls")
    assert(Eval.cochranQ(full, "blk", "cls").collect().head.isNullAt(3))
  }

  test("dunnTest: pairwise z off pooled midranks, tie correction, all-tied NULL, require") {
    // a = {1,2}, b = {3,4}: mr2 = (2,4,6,8), R2 = (6,14), σ² = 5/3 →
    // z_ab = −2/√(5/3) = −1.5491933384829668
    val two = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L))
      .toDF("g", "v")
    val r = Eval.dunnTest(two, "v", "g").collect()
    assert(r.length === 1)
    assert((r.head.getString(0), r.head.getString(1)) === (("a", "b")))
    assert((r.head.getLong(2), r.head.getLong(3)) === ((2L, 2L)))
    assert((r.head.getLong(4), r.head.getLong(5)) === ((6L, 14L)))
    assert(r.head.getLong(6) === -1549193338483L)
    // three groups with cross ties: c = {1, 4} joins — midranks shift,
    // tie mass ΣT = 12 enters σ²; all three pairs present and ordered
    val three = two.union(Seq(("c", 1L), ("c", 4L)).toDF("g", "v"))
    val r3 = Eval.dunnTest(three, "v", "g").collect()
    assert(r3.map(x => (x.getString(0), x.getString(1))).toSeq ===
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    val byPair = r3.map(x => (x.getString(0), x.getString(1)) ->
      ((x.getLong(4), x.getLong(5), x.getLong(6)))).toMap
    // R2_a = 9, R2_b = 19, R2_c = 14; σ² = 3.5 − 12/60 = 3.3
    assert(byPair(("a", "b"))._1 === 9L && byPair(("a", "b"))._2 === 19L)
    val sig = 6.0 * 7.0 / 12.0 - 12.0 / (12.0 * 5.0)
    val zAb = (9.0 / 4.0 - 19.0 / 4.0) / math.sqrt(sig * (0.5 + 0.5))
    assert(byPair(("a", "b"))._3 ===
      java.math.BigDecimal.valueOf(zAb * 1.0e12)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue)
    // every value tied: σ² folds to exactly 0 → NULL z
    val flat = Seq(("a", 5L), ("b", 5L)).toDF("g", "v")
    assert(Eval.dunnTest(flat, "v", "g").collect().head.isNullAt(6))
    // over-limit group axis fails the require
    val wide = (0 until 5).map(j => (s"g$j", j.toLong)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Eval.dunnTest(wide, "v", "g", maxGroups = 4).collect()
    }
    assert(e.getMessage.contains("exceeds 4 distinct values"))
  }

  test("quadeTest: range-weighted blocks, hand-checked T3, tied-flat NULL") {
    // b1 = (1,2) range 1, b2 = (3,7) range 4: Q2 = (2,4),
    // S4 = (−2,+2,−4,+4) → A16 = 40, B16n = 72, T3 = 1·72/(2·40−72) = 9
    val df = Seq(("b1", "c1", 1L), ("b1", "c2", 2L),
      ("b2", "c1", 3L), ("b2", "c2", 7L)).toDF("blk", "cls", "v")
    val r = Eval.quadeTest(df, "blk", "cls", "v").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((2L, 2L)))
    assert((r.getDouble(2), r.getDouble(3)) === ((40.0, 72.0)))
    assert(r.getLong(4) === 9000000000000L)
    // fully-tied blocks contribute exactly 0 everywhere → NULL T3
    val flat = Seq(("b1", "c1", 5L), ("b1", "c2", 5L),
      ("b2", "c1", 8L), ("b2", "c2", 8L)).toDF("blk", "cls", "v")
    val r2 = Eval.quadeTest(flat, "blk", "cls", "v").collect().head
    assert((r2.getDouble(2), r2.getDouble(3)) === ((0.0, 0.0)))
    assert(r2.isNullAt(4))
    // an incomplete block drops via the shared scaffold
    val withInc = df.union(Seq(("bX", "c1", 99L)).toDF("blk", "cls", "v"))
    assert(Eval.quadeTest(withInc, "blk", "cls", "v").collect()
      .head.getLong(0) === 2L)
  }

  test("moodScaleTest: quadratic scores flag the dispersed side positive, degenerate NULLs") {
    // A = {1,4} brackets B = {2,3}: scores (9,1,1,9) → T4 = 18, E = 10,
    // Var = 64/3 → z = +√3 — the SIGN CONTRAST with ansariBradley,
    // whose folded scores read the same data at −√3
    val sep = Seq((1L, true), (4L, true), (2L, false), (3L, false))
      .toDF("v", "fa")
    val r = Eval.moodScaleTest(sep, "v", "fa").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((2L, 2L)))
    // t4/e diagnostics surface as doubles (ANSI-safe past N ≈ 4·10⁶)
    assert(r.getDouble(2) === 18.0)
    assert(r.getDouble(3) === 10000000.0)
    assert(r.getLong(4) === 1732050807569L)
    val ab = Eval.ansariBradley(sep, "v", "fa").collect().head
    assert(ab.getLong(4) === -r.getLong(4), "AB and Mood-scale must mirror")
    // all tied: Var = 0 → NULL z
    val flat = Seq((5L, true), (5L, false)).toDF("v", "fa")
    assert(Eval.moodScaleTest(flat, "v", "fa").collect().head.isNullAt(4))
    // lone side: NULL z
    val lone = Seq((1L, true), (2L, true)).toDF("v", "fa")
    assert(Eval.moodScaleTest(lone, "v", "fa").collect().head.isNullAt(4))
  }

  test("lepageTest: pure-scale data reads zw = 0 and L = zab², degenerate NULLs") {
    // A = {1,4} brackets B = {2,3}: W2_A = 2+8 = 10 = E[W2] → z_W = 0;
    // the AB leg reads −√3 (the ansariBradley spec's data) → L = 3
    val sep = Seq((1L, true), (4L, true), (2L, false), (3L, false))
      .toDF("v", "fa")
    val r = Eval.lepageTest(sep, "v", "fa").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 2L, 10L)))
    assert(r.getLong(3) === 0L)
    assert(r.getLong(4) === -1732050807569L)
    assert(r.getLong(5) === 3000000000000L)
    // both legs must agree with their standalone ops bit-for-bit
    val ab = Eval.ansariBradley(sep, "v", "fa").collect().head
    assert(r.getLong(4) === ab.getLong(4), "AB leg must match ansariBradley")
    // pure location shift: zw ≠ 0 carries the signal
    val shift = Seq((1L, true), (2L, true), (3L, false), (4L, false))
      .toDF("v", "fa")
    val r2 = Eval.lepageTest(shift, "v", "fa").collect().head
    assert(r2.getLong(3) < 0L, "A below B must read z_W < 0")
    // all values tied: both variances 0 → all NULL
    val flat = Seq((5L, true), (5L, false)).toDF("v", "fa")
    val r3 = Eval.lepageTest(flat, "v", "fa").collect().head
    assert(r3.isNullAt(3) && r3.isNullAt(4) && r3.isNullAt(5))
    // lone side: NULL
    val lone = Seq((1L, true), (2L, true)).toDF("v", "fa")
    assert(Eval.lepageTest(lone, "v", "fa").collect().head.isNullAt(5))
  }

  test("flignerKilleen: dispersion fires, pure location shift reads exactly 0, all-tied NULL, require") {
    // A = {10,10,11,11} tight vs B = {1,5,20,24} wide: the chain
    // replica (median-centered |2x−med2|, Acklam normal scores ×10⁶,
    // micro-quantized group deviations) pins Q = 1176038093952 and
    // FK = 5.685838975672…
    val d = Seq(("A", 10L), ("A", 10L), ("A", 11L), ("A", 11L),
      ("B", 1L), ("B", 5L), ("B", 20L), ("B", 24L)).toDF("g", "v")
    val r = Eval.flignerKilleen(d, "v", "g").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((8L, 2L)))
    assert(r.getDouble(2) === 1176038093952.0)
    assert(r.getLong(3) === 5685838975672L)
    // a pure location shift: median centering makes the deviation
    // multisets IDENTICAL → group score means equal → FK = 0 exactly
    // (ansariBradley's common-center assumption would misread this)
    val shifted = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("A", 4L),
      ("B", 101L), ("B", 102L), ("B", 103L), ("B", 104L)).toDF("g", "v")
    val r2 = Eval.flignerKilleen(shifted, "v", "g").collect().head
    assert(r2.getDouble(2) === 0.0 && r2.getLong(3) === 0L)
    // every group constant: all deviations 0 → v̂ = 0 → NULL
    val flat = Seq(("A", 5L), ("A", 5L), ("B", 9L), ("B", 9L))
      .toDF("g", "v")
    assert(Eval.flignerKilleen(flat, "v", "g").collect().head.isNullAt(3))
    // bounded group axis
    val many = (0 until 70).map(i => (f"g$i%02d", i.toLong)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Eval.flignerKilleen(many, "v", "g")
    }
    assert(e.getMessage.contains("64 distinct"))
  }

  test("hodgesLehmannShift: exact middle order statistics, shift recovery, Moses CI, empty-side NULL") {
    // A = {5,6,7} vs B = {1,2}: differences sorted (3,4,4,5,5,6) →
    // middle pair (4, 5) → HL2 = 9, HL = 4.5; T = 6 → Moses C = 0 →
    // CI = [d_(1), d_(6)] = [3, 6]
    val d = Seq((5L, true), (6L, true), (7L, true),
      (1L, false), (2L, false)).toDF("v", "a")
    val r = Eval.hodgesLehmannShift(d, "v", "a").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((3L, 2L)))
    assert(r.getDouble(2) === 6.0)
    assert(r.getLong(3) === 9L)
    assert(r.getDouble(4) === 4.5)
    assert((r.getLong(5), r.getLong(6), r.getLong(7)) === ((1L, 3L, 6L)))
    // odd pair count: the single middle difference
    val odd = Seq((10L, true), (1L, false), (2L, false), (3L, false))
      .toDF("v", "a")
    val r2 = Eval.hodgesLehmannShift(odd, "v", "a").collect().head
    assert(r2.getLong(3) === 16L && r2.getDouble(4) === 8.0)
    // a pure location shift is recovered exactly
    val shift = Seq((1L, true), (2L, true), (3L, true),
      (11L, false), (12L, false), (13L, false)).toDF("v", "a")
    val r3 = Eval.hodgesLehmannShift(shift, "v", "a").collect().head
    assert(r3.getDouble(4) === -10.0)
    // a nonzero Moses rank: A = 1..10 vs B = ten zeros → T = 100,
    // C = ⌊50 − 1.96·√(100·21/12)⌋ = 24 → CI = [d_(25), d_(76)] =
    // [3, 8] around HL = (d_50 + d_51)/2 = 5.5
    val wide = ((1 to 10).map(i => (i.toLong, true)) ++
      (1 to 10).map(_ => (0L, false))).toDF("v", "a")
    val r5 = Eval.hodgesLehmannShift(wide, "v", "a").collect().head
    assert(r5.getLong(3) === 11L && r5.getDouble(4) === 5.5)
    assert((r5.getLong(5), r5.getLong(6), r5.getLong(7)) === ((25L, 3L, 8L)))
    // empty side: no pairs → NULL estimate and NULL interval
    val lone = Seq((1L, true), (2L, true)).toDF("v", "a")
    val r4 = Eval.hodgesLehmannShift(lone, "v", "a").collect().head
    assert(r4.getDouble(2) === 0.0 && r4.isNullAt(3) && r4.isNullAt(4))
    assert(r4.isNullAt(5) && r4.isNullAt(6) && r4.isNullAt(7))
  }

  test("hlPseudomedian: exact Walsh order statistics, robustness to one outlier, Tukey CI, tie run, empty NULL") {
    // x = {1,2,3}: Walsh averages (1, 1.5, 2, 2, 2.5, 3) → middle pair
    // both 2 on the doubled axis (s_(3) = s_(4) = 4) → HL4 = 8, HL = 2;
    // T = 6 → Tukey C = 0 → CI = [W_(1), W_(6)] = [1, 3]
    val d = Seq(1L, 2L, 3L).toDF("v")
    val r = Eval.hlPseudomedian(d, "v").collect().head
    assert(r.getLong(0) === 3L && r.getDouble(1) === 6.0)
    assert(r.getLong(2) === 8L && r.getDouble(3) === 2.0)
    assert((r.getLong(4), r.getDouble(7), r.getDouble(8)) ===
      ((1L, 1.0, 3.0)))
    // one outlier owns 3 of 6 Walsh averages but not the estimate:
    // {1,2,10} → sorted Walsh (1, 1.5, 2, 5.5, 6, 10) → HL = 3.75
    // (the mean would read 4.33; the raw median 2)
    val out = Seq(1L, 2L, 10L).toDF("v")
    val r2 = Eval.hlPseudomedian(out, "v").collect().head
    assert(r2.getLong(2) === 15L && r2.getDouble(3) === 3.75)
    // a nonzero Tukey rank: x = 1..10 → T = 55, C = ⌊27.5 −
    // 1.96·√(10·11·21/24)⌋ = 8 → CI = [W_(9), W_(47)] = [3, 8]
    // around HL = 5.5 (Walsh cum counts: s=6 reaches 9, s=16 reaches 49)
    val ten = (1L to 10L).toDF("v")
    val r5 = Eval.hlPseudomedian(ten, "v").collect().head
    assert(r5.getDouble(3) === 5.5)
    assert((r5.getLong(4), r5.getLong(5), r5.getLong(6)) ===
      ((9L, 6L, 16L)))
    assert((r5.getDouble(7), r5.getDouble(8)) === ((3.0, 8.0)))
    // a tied run: {5,5} → 3 Walsh averages all 5
    val tie = Seq(5L, 5L).toDF("v")
    val r3 = Eval.hlPseudomedian(tie, "v").collect().head
    assert(r3.getDouble(1) === 3.0 && r3.getDouble(3) === 5.0)
    assert(r3.getDouble(7) === 5.0 && r3.getDouble(8) === 5.0)
    // empty input → NULL estimate and interval
    val none = Seq.empty[Long].toDF("v")
    val r4 = Eval.hlPseudomedian(none, "v").collect().head
    assert(r4.getLong(0) === 0L && r4.isNullAt(2) && r4.isNullAt(3))
    assert(r4.isNullAt(4) && r4.isNullAt(5) && r4.isNullAt(8))
  }

  test("jarqueBera: symmetric sample reads b1 = 0 exactly, skewed fires, constant NULL") {
    // {1..5}: C2 = 50, C3 = 0 (symmetry), C4 = 4250 → b1 = 0,
    // b2 = 1.7, JB = 5·(1.7−3)²/24 — the N-powers cancel by law
    val d = Seq(1L, 2L, 3L, 4L, 5L).toDF("v")
    val r = Eval.jarqueBera(d, "v").collect().head
    assert(r.getLong(0) === 5L)
    assert(r.getDouble(1) === 0.0)
    assert(r.getDouble(2) === 4250.0 / 2500.0)
    val b2 = 4250.0 / 2500.0
    assert(r.getDouble(3) === 5.0 * ((b2 - 3.0) * (b2 - 3.0) / 24.0))
    // {0,0,0,10}: C3 = 6000 → b1 = 6000/300^1.5 = 2/√3 > 0
    val sk = Seq(0L, 0L, 0L, 10L).toDF("v")
    val r2 = Eval.jarqueBera(sk, "v").collect().head
    assert(r2.getDouble(1) === 6000.0 /
      (300.0 * math.sqrt(300.0)) && r2.getDouble(1) > 1.15)
    // constant sample: C2 = 0 → NULL
    val flat = Seq(7L, 7L, 7L).toDF("v")
    assert(Eval.jarqueBera(flat, "v").collect().head.isNullAt(3))
  }

  test("grubbsTest: names the outlier, smallest-value tiebreak, hand-exact G, degenerate NULL") {
    // {1,2,3,4,100}: N-scaled deviations |5v−110| peak at 390 for
    // v = 100; G = 78/√(38050/20)
    val d = Seq(1L, 2L, 3L, 4L, 100L).toDF("v")
    val r = Eval.grubbsTest(d, "v").collect().head
    assert(r.getLong(0) === 5L && r.getLong(1) === 100L)
    val g = 390.0 / 5.0 / math.sqrt(38050.0 / 5.0 / 4.0)
    assert(r.getLong(2) === math.round(g * 1.0e12))
    // symmetric pair ties the deviation → the SMALLEST value wins
    val tie = Seq(0L, 10L).toDF("v")
    val r2 = Eval.grubbsTest(tie, "v").collect().head
    assert(r2.getLong(1) === 0L && r2.getLong(2) === 707106781187L)
    // constant sample → NULL G
    val flat = Seq(5L, 5L).toDF("v")
    assert(Eval.grubbsTest(flat, "v").collect().head.isNullAt(2))
  }

  test("conoverSquaredRanks: hand-exact T = 3, equal-shape groups read exactly 0, all-tied NULL, require") {
    // A = {1,5} (devs 2,2) vs B = {2,4} (devs 1,1): pooled midranks
    // (1.5, 1.5, 3.5, 3.5) → squared-rank sums 24.5 vs 4.5 →
    // T = 100/(100/3) = 3 exactly (the doubled-rank scaling cancels)
    val d = Seq(("A", 1L), ("A", 5L), ("B", 2L), ("B", 4L)).toDF("g", "v")
    val r = Eval.conoverSquaredRanks(d, "v", "g").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((4L, 2L)))
    assert(r.getDouble(2) === 1600.0)
    assert(r.getLong(3) === 3000000000000L)
    // identical deviation shapes (pure location shift): group
    // squared-rank means equal → T = 0 exactly
    val eq = Seq(("A", 1L), ("A", 2L), ("A", 3L),
      ("B", 11L), ("B", 12L), ("B", 13L)).toDF("g", "v")
    val r2 = Eval.conoverSquaredRanks(eq, "v", "g").collect().head
    assert(r2.getDouble(2) === 0.0 && r2.getLong(3) === 0L)
    // every deviation tied (all groups symmetric pairs): v̂ = 0 → NULL
    val flat = Seq(("A", 1L), ("A", 3L), ("B", 11L), ("B", 13L))
      .toDF("g", "v")
    assert(Eval.conoverSquaredRanks(flat, "v", "g").collect().head
      .isNullAt(3))
    // bounded group axis
    val many = (0 until 70).map(i => (f"g$i%02d", i.toLong)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Eval.conoverSquaredRanks(many, "v", "g")
    }
    assert(e.getMessage.contains("64 distinct"))
  }

  test("bartlettTest: unequal variances fire, equal variances read quantization-zero, singleton excluded, degenerate NULL") {
    // A = {10,10,11,11} (s² = 1/3) vs B = {1,5,20,24} (s² = 377/3):
    // the textbook chain gives T = [6·ln 63 − 3(ln ⅓ + ln(377/3))]
    // / (1 + (⅔ − ⅙)/3) ≈ 11.7032, and the documented once-quantized
    // chain (per-group pico log-variances, micro pooled variance)
    // pins it exactly
    val d = Seq(("A", 10L), ("A", 10L), ("A", 11L), ("A", 11L),
      ("B", 1L), ("B", 5L), ("B", 20L), ("B", 24L)).toDF("g", "v")
    val r = Eval.bartlettTest(d, "v", "g").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((8L, 2L)))
    assert(r.getLong(3) === 11703211309728L)
    // equal variances (same shape, shifted): T collapses to the
    // per-group quantization noise — zero at the 10⁻⁵ level
    val eq = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("A", 4L),
      ("B", 101L), ("B", 102L), ("B", 103L), ("B", 104L)).toDF("g", "v")
    val r2 = Eval.bartlettTest(eq, "v", "g").collect().head
    assert(math.abs(r2.getLong(3)) < 10000000L)
    // a singleton group carries no variance — excluded by definition
    val single = Seq(("A", 1L), ("A", 2L), ("A", 3L),
      ("B", 5L), ("B", 9L), ("C", 7L)).toDF("g", "v")
    assert(Eval.bartlettTest(single, "v", "g").collect().head
      .getLong(1) === 2L)
    // a constant group: s² = 0 → ln undefined → NULL statistic
    val flat = Seq(("A", 5L), ("A", 5L), ("B", 1L), ("B", 9L))
      .toDF("g", "v")
    assert(Eval.bartlettTest(flat, "v", "g").collect().head.isNullAt(3))
  }

  test("durbinTest: hand-exact BIB chi2 and F, complete-design Friedman equality, BIB contract enforced") {
    // t=3, b=3, k=2, r=2, λ=1: R2 = (4, 6, 8) vs r(k+1) = 6 → S4 = 8,
    // A4 = 60, C4 = 54 → T1 = 2·8/6 = 8/3; T2 = (4/3)·1/(1/3) = 4
    val bib = Seq(("b1", "T1", 1L), ("b1", "T2", 2L),
      ("b2", "T2", 1L), ("b2", "T3", 2L),
      ("b3", "T1", 1L), ("b3", "T3", 2L)).toDF("blk", "cls", "v")
    val r = Eval.durbinTest(bib, "blk", "cls", "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((3L, 3L, 2L, 2L)))
    assert((r.getLong(4), r.getLong(5)) === ((8L, 60L)))
    assert(r.getLong(6) === 2666666666667L)
    assert(r.getLong(7) === 4000000000000L)
    // complete design (k = t): T1 IS the tie-corrected Friedman χ² —
    // same pinned double chain, bit-equal picos
    val complete = Seq(("b1", "c1", 1L), ("b1", "c2", 2L), ("b1", "c3", 3L),
      ("b2", "c1", 1L), ("b2", "c2", 2L), ("b2", "c3", 3L))
      .toDF("blk", "cls", "v")
    val d = Eval.durbinTest(complete, "blk", "cls", "v").collect().head
    val f = Eval.friedmanKendallW(complete, "blk", "cls", "v")
      .collect().head
    assert(d.getLong(6) === f.getLong(4),
      "complete-design Durbin must equal Friedman bit-for-bit")
    // unequal block sizes: the BIB contract fails the job in-plan
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    val ragged = bib.union(Seq(("b1", "T3", 3L)).toDF("blk", "cls", "v"))
    val e1 = intercept[Exception] {
      Eval.durbinTest(ragged, "blk", "cls", "v").collect()
    }
    assert(messages(e1).exists(_.contains("unequal sizes")), messages(e1))
    // unequal replication (equal k, ragged r): likewise enforced
    val unrep = Seq(("b1", "T1", 1L), ("b1", "T2", 2L),
      ("b2", "T1", 1L), ("b2", "T2", 2L),
      ("b3", "T1", 1L), ("b3", "T3", 2L)).toDF("blk", "cls", "v")
    val e2 = intercept[Exception] {
      Eval.durbinTest(unrep, "blk", "cls", "v").collect()
    }
    assert(messages(e2).exists(_.contains("unequal replication")),
      messages(e2))
    // every block fully tied: A4 = C4 → NULL statistics
    val flat = Seq(("b1", "T1", 5L), ("b1", "T2", 5L),
      ("b2", "T1", 5L), ("b2", "T2", 5L)).toDF("blk", "cls", "v")
    val rf = Eval.durbinTest(flat, "blk", "cls", "v").collect().head
    assert(rf.isNullAt(6) && rf.isNullAt(7))
  }

  test("skillingsMack: balanced closed chain, general-path solve, disconnected NULL, singleton drop, require") {
    // complete 2-block no-tie design: balanced (λ=2), the closed chain
    // with k=3's quantized weight c = round(√3·10⁶) = 1732051 —
    // SM = 4.000000888… (Friedman χ² = 4 + the documented ~1e-6
    // quantization), ssq = 2·6928204²
    val complete = Seq(("b1", "T1", 1L), ("b1", "T2", 2L), ("b1", "T3", 3L),
      ("b2", "T1", 1L), ("b2", "T2", 2L), ("b2", "T3", 3L))
      .toDF("blk", "cls", "v")
    val r = Eval.skillingsMack(complete, "blk", "cls", "v").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((2L, 3L)))
    assert(r.getBoolean(2))
    assert(r.getDouble(3) === 96000021331232.0)
    assert(r.getLong(4) === 4000000888801L)
    // general missing pattern {T1,T2}, {T1,T2}, {T2,T3}: co-occurrence
    // is unbalanced (2/1/0) → the Gaussian-elimination path; with k=2's
    // EXACT weight c = 2·10⁶, A = (0,−1,1), Σ+J solve gives SM = 1
    val general = Seq(("b1", "T1", 1L), ("b1", "T2", 2L),
      ("b2", "T1", 2L), ("b2", "T2", 1L),
      ("b3", "T2", 1L), ("b3", "T3", 2L)).toDF("blk", "cls", "v")
    val g = Eval.skillingsMack(general, "blk", "cls", "v").collect().head
    assert((g.getLong(0), g.getLong(1)) === ((3L, 3L)))
    assert(!g.getBoolean(2))
    assert(g.getLong(4) === 1000000000000L)
    // disconnected design: no common ranking scale → NULL sm
    val disc = Seq(("b1", "T1", 1L), ("b1", "T2", 2L),
      ("b2", "T3", 1L), ("b2", "T4", 2L)).toDF("blk", "cls", "v")
    val dd = Eval.skillingsMack(disc, "blk", "cls", "v").collect().head
    assert(dd.isNullAt(4))
    // singleton blocks carry no comparison — dropped, result unchanged
    val withSingleton = general
      .union(Seq(("b9", "T1", 7L)).toDF("blk", "cls", "v"))
    val s = Eval.skillingsMack(withSingleton, "blk", "cls", "v")
      .collect().head
    assert((s.getLong(0), s.getLong(4)) === ((3L, 1000000000000L)))
    // bounded treatment axis: the driver-side solve requires ≤ max
    val many = (0 until 70).map(i => ("b1", f"T$i%02d", i.toLong))
      .toDF("blk", "cls", "v")
    val e = intercept[IllegalArgumentException] {
      Eval.skillingsMack(many, "blk", "cls", "v")
    }
    assert(e.getMessage.contains("64 distinct"))
  }
}
