package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  // deterministic quality scores over the real corpus (same law the
  // registry's exact decile query uses)
  private lazy val scored = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.select(col("doc_id").cast("long"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .map { case (id, lang, text) =>
        (id, lang, graft.functions.TextFns.statsScala(text).quality)
      }
      .toDF("doc_id", "lang", "quality")
      .cache()
  }

  test("topFractionByStratum agrees with the exact percent_rank form up to threshold ties") {
    val kept = Quantiles.topFractionByStratum(scored, "quality", "lang", 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("quality"), col("doc_id"))
    val exact = scored.withColumn("pr", percent_rank().over(w))
      .filter(col("pr") >= 0.9)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // the two selections may only disagree on rows that TIE a stratum's
    // threshold value (inclusive-boundary vs rank-cut semantics)
    val thr = Quantiles.stratumThresholds(scored, "quality", "lang", 0.9)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val byId = scored.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    val disagree = (kept diff exact) union (exact diff kept)
    disagree.foreach { id =>
      val (lang, q) = byId(id)
      assert(q === thr(lang), s"doc $id (quality $q) disagrees but is not at threshold ${thr(lang)}")
    }
    // and the bulk agrees: kept is within a factor of the asked fraction
    val n = scored.count().toDouble
    assert(kept.size >= (0.05 * n).toInt && kept.size <= (0.25 * n).toInt,
      s"kept ${kept.size} of $n far from 10%")
  }

  test("thresholds frame is one row per stratum and deterministic") {
    val a = Quantiles.stratumThresholds(scored, "quality", "lang", 0.9)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = Quantiles.stratumThresholds(scored.repartition(11), "quality", "lang", 0.9)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a.keySet === scored.select("lang").distinct().collect().map(_.getString(0)).toSet)
    // GK sketch on small strata holds all values → exact and partition-independent
    assert(a === b)
  }

  test("plan: thresholds broadcast back, no window and no per-stratum sort") {
    val p = Quantiles.topFractionByStratum(scored, "quality", "lang", 0.1)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), s"scale path must not rank:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("winsorizeApprox: discrete-percentile bands, NULL law, exact-form agreement") {
    // stratum a: 1..100 (clean ranks); stratum b: constant + a NULL value
    val rows = (1 to 100).map(v => ("a", Some(v.toDouble), v.toLong)) ++
      Seq(("b", Some(7.0), 101L), ("b", Some(7.0), 102L), ("b", None, 103L))
    val df = rows.toDF("stratum", "value", "id")
    val out = Quantiles.winsorizeApprox(df, "value", "stratum").cache()

    // bands are ACTUAL data values at the discrete-percentile rank law
    // (smallest value with cumulative frequency >= q — what quantile_disc
    // and an exact-regime GK sketch both return)
    val a = out.filter(col("stratum") === "a").select("band_lo", "band_hi").head()
    assert(a.getDouble(0) === 5.0 && a.getDouble(1) === 95.0,
      s"bands ${a.toSeq} not the rank-5/95 order statistics")

    // NULL value: winsorized stays NULL (never clamps to the low band)
    val nullRow = out.filter(col("id") === 103L).select("winsorized").head()
    assert(nullRow.isNullAt(0), "NULL value must not clamp to band_lo")

    // agreement with the exact interpolated form: every row strictly inside
    // BOTH band pairs is untouched by both; disagreements live only between
    // a discrete threshold and its interpolated neighbor
    val exactLo = 1.0 + 0.05 * 99 // quantile_cont(0.05) of 1..100
    val exactHi = 1.0 + 0.95 * 99
    val got = out.filter(col("stratum") === "a")
      .select(col("id"), col("value"), col("winsorized")).collect()
    got.foreach { r =>
      val v = r.getDouble(1)
      val wv = r.getDouble(2)
      if (v >= math.max(5.0, exactLo) && v <= math.min(95.0, exactHi))
        assert(wv === v, s"interior value $v modified")
      else {
        val exact = math.min(math.max(v, exactLo), exactHi)
        assert(math.abs(wv - exact) <= 1.0,
          s"boundary row $v: approx $wv vs exact $exact differ beyond one rank step")
      }
    }
  }

  test("winsorizeApprox plan: sketch + broadcast clip, no window, no stratum sort") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val p = Quantiles.winsorizeApprox(ev, "value", "event_type")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), s"scale path must not rank:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  private def madOf(rows: Seq[(String, Long)]): Map[String, (Long, Long, Long, Long, Double)] = {
    import spark.implicits._
    Quantiles.madOutliers(rows.toDF("g", "v"), "v", "g")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
  }

  test("madOutliers: lower medians, integer MAD, dev > 3·mad flags") {
    val got = madOf(
      Seq("a" -> 1L, "a" -> 2L, "a" -> 3L, "a" -> 4L, "a" -> 100L,
        "b" -> 1L, "b" -> 2L, "b" -> 3L, "b" -> 10L))
    // a: med = pos 3 of (1,2,3,4,100) = 3; devs sorted (0,1,1,2,97) → mad 1;
    //    outlier iff dev > 3 → only 97
    assert(got("a") === ((5L, 3L, 1L, 1L, 0.2)))
    // b (even n): med = pos (4+1) div 2 = 2 of (1,2,3,10) = 2; devs sorted
    //    (0,1,1,8) → mad pos 2 = 1; outlier 8 > 3
    assert(got("b") === ((4L, 2L, 1L, 1L, 0.25)))
  }

  test("madOutliers: mad = 0 razor flags ANY deviation, constant stratum flags none") {
    val got = madOf(
      Seq("c" -> 5L, "c" -> 5L, "c" -> 5L,
        "d" -> 5L, "d" -> 5L, "d" -> 5L, "d" -> 9L))
    assert(got("c") === ((3L, 5L, 0L, 0L, 0.0)))
    // d: med 5, devs (0,0,0,4) → mad pos 2 = 0; dev 4 > 0 flags
    assert(got("d") === ((4L, 5L, 0L, 1L, 0.25)))
  }

  test("madOutliers excludes NULL values and NULL strata") {
    import spark.implicits._
    val df = Seq((Some("a"), Some(1L)), (Some("a"), Some(2L)), (Some("a"), Some(3L)),
      (Some("a"), None), (None, Some(99L)))
      .toDF("g", "v")
    val got = Quantiles.madOutliers(df, "v", "g").collect()
    assert(got.length === 1)
    assert(got.head.getLong(1) === 3L) // n counts only the non-NULL a rows
  }

  test("percentRankDeciles: pr = 1 lands in decile 9, distinct values spread") {
    import spark.implicits._
    val df = (0L until 10L).map(("s", _)).toDF("g", "v")
    val got = Quantiles.percentRankDeciles(df, "v", "g")
      .orderBy("decile")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // pr = k/9 → deciles floor(10k/9) hit 0..8 once each except 8 twice? —
    // k=8 → 8.88 → 8; k=9 → pr 1.0 → capped to 9
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))
    assert(got.forall(_._2 == 1L))
    assert(got.last === ((9L, 1L, 9L, 9L)))
  }

  test("percentRankDeciles: an all-tied stratum sits entirely in decile 0") {
    import spark.implicits._
    val df = Seq(("t", 7L), ("t", 7L), ("t", 7L)).toDF("g", "v")
    val got = Quantiles.percentRankDeciles(df, "v", "g").collect()
    assert(got.length === 1)
    assert((got.head.getLong(1), got.head.getLong(2)) === ((0L, 3L)))
  }

  test("lorenzDeciles: hand rank-overlap splits; constant corpus splits ties evenly; empty = no rows") {
    import spark.implicits._
    // values [1,1,2,6], N=4: boundaries floor(4d/10) put one row each in
    // deciles 3, 5, 8, 10 → masses 1,1,2,6, cumulative shares .1/.2/.4/1
    val df = Seq(1L, 1L, 2L, 6L).toDF("v")
    val got = Quantiles.lorenzDeciles(df, "v").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got === Map(
      3L -> ((1L, 1L, 1L, 100000L)), 5L -> ((1L, 1L, 2L, 200000L)),
      8L -> ((1L, 2L, 4L, 400000L)), 10L -> ((1L, 6L, 10L, 1000000L))))
    // a fully-tied corpus: the tie run splits across deciles by rank
    // overlap — no id tiebreak needed, sums are partition-independent
    val ties = Seq.fill(5)(5L).toDF("v")
    val t = Quantiles.lorenzDeciles(ties, "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(t.toSeq === Seq((2L, 1L, 200000L), (4L, 1L, 400000L),
      (6L, 1L, 600000L), (8L, 1L, 800000L), (10L, 1L, 1000000L)))
    assert(Quantiles.lorenzDeciles(
      Seq.empty[Long].toDF("v"), "v").count() === 0L)
  }

  test("hillTailIndex: hand ln-excess terms; flat top NULLs alpha; k+1 values required; non-positive drop") {
    import spark.implicits._
    // top-3 of {8, 4, 2, 1, 0, -3}: x_tail = 2, terms ln(4) + ln(2)
    val df = Seq((1L, 8L), (2L, 4L), (3L, 2L), (4L, 1L), (5L, 0L),
      (6L, -3L)).toDF("id", "v")
    val r = Quantiles.hillTailIndex(df, "v", "id", k = 2).collect().head
    val s = math.round(math.log(4.0) * 1e12) + math.round(math.log(2.0) * 1e12)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 2L, s)))
    assert(r.getLong(3) === math.round(2.0 * 1e15 / s))
    // flat top: no tail information — visible NULL, not a fake alpha
    val flat = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)).toDF("id", "v")
    val f = Quantiles.hillTailIndex(flat, "v", "id", k = 2).collect().head
    assert(f.getLong(2) === 0L)
    assert(f.isNullAt(3))
    // only k positive values: estimator undefined — no rows
    val short = Seq((1L, 9L), (2L, 3L)).toDF("id", "v")
    assert(Quantiles.hillTailIndex(short, "v", "id", k = 2).count() === 0L)
  }

  test("theilIndex: perfect equality is 0 everywhere; decomposition reproduces __all") {
    // equal masses in equal strata: every ln term is ln(1) = 0
    val eq = Seq(("a", 10L), ("a", 10L), ("b", 10L), ("b", 10L))
      .toDF("src", "v")
    val req = Quantiles.theilIndex(eq, "v", "src")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(req === Map("a" -> 0L, "b" -> 0L, "__all" -> 0L,
      "__between" -> 0L, "__within" -> 0L))
    // skewed: stratum a carries 4x stratum b's mass per row; within each
    // stratum values are equal, so ALL inequality is between strata
    val sk = Seq(("a", 400L), ("a", 400L), ("b", 100L), ("b", 100L))
      .toDF("src", "v")
    val m = Quantiles.theilIndex(sk, "v", "src")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(m("a") === 0L && m("b") === 0L && m("__within") === 0L)
    // T_between = 0.8·ln(1.6) + 0.2·ln(0.4) = exact hand value in picos
    val want = math.round((0.8 * math.log(1.6) + 0.2 * math.log(0.4)) * 1e12)
    assert(math.abs(m("__between") - want) <= 5L,
      s"between ${m("__between")} vs hand $want")
    assert(math.abs(m("__all") - (m("__between") + m("__within"))) <= 5L,
      "decomposition must reproduce __all up to quantization")
    // zero/negative masses drop; NULL stratum drops
    val dirty = Seq(("a", 0L), ("a", -5L), ("a", 10L), (null, 10L))
      .toDF("src", "v")
    val d = Quantiles.theilIndex(dirty, "v", "src")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(d.toMap.apply("a") === 1L, "only the positive-mass row survives")
  }

  test("qqTable: scaled-slice linearity, monotone deciles, one-sided-empty NULLs") {
    // B is A doubled: quantile interpolation is linear in the order
    // statistics, so v_b must equal 2·v_a BIT-exactly at every decile
    val df0 = Seq((0L, true), (10L, true), (0L, false), (20L, false))
      .toDF("v", "fa")
    val rows = Quantiles.qqTable(df0, "v", "fa").collect()
    assert(rows.length === 9)
    assert(rows.map(_.getLong(0)).toSeq === (1 to 9).map(_ * 10L))
    rows.foreach { r =>
      assert(r.getDouble(2) === 2.0 * r.getDouble(1))
      assert(r.getDouble(3) === r.getDouble(1) - r.getDouble(2))
    }
    val va = rows.map(_.getDouble(1))
    assert(va.zip(va.tail).forall { case (x, y) => x <= y },
      "deciles must be monotone")
    // a side with no rows: percentile over all-NULL input → NULL quantiles
    val oneSided = Seq((1L, true), (2L, true)).toDF("v", "fa")
    val r1 = Quantiles.qqTable(oneSided, "v", "fa").collect()
    assert(r1.forall(r => !r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3)))
  }

  test("gini: hand-checked rank law, tie block, equal mass 0, empty NULL") {
    // (1,2,3,4): R = Σ i·xᵢ = 30 → G = (60 − 5·10)/(4·10) = 0.25
    val r = Quantiles.gini(Seq(1L, 2L, 3L, 4L).toDF("v"), "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 10L, 60L)))
    assert(r.getLong(3) === 250000000000L)
    // tie block (1,1,2): 2R = 1·(2·3 − 0) + 2·(3·4 − 2·3) = 18 →
    // G = (18 − 4·4)/(3·4) = 1/6 — permutation-safe inside the tie
    val r2 = Quantiles.gini(Seq(1L, 1L, 2L).toDF("v"), "v").collect().head
    assert((r2.getLong(1), r2.getLong(2)) === ((4L, 18L)))
    assert(r2.getLong(3) === math.round(1.0 / 6.0 * 1e12))
    // equal values: perfect equality → exactly 0
    assert(Quantiles.gini(Seq(5L, 5L, 5L).toDF("v"), "v").collect().head
      .getLong(3) === 0L)
    // NULLs and negatives drop; empty mass → NULL gini, zero counts
    val dirty = Seq(Some(-3L), None, Some(-1L)).toDF("v")
    val r3 = Quantiles.gini(dirty, "v").collect().head
    assert((r3.getLong(0), r3.getLong(1)) === ((0L, 0L)))
    assert(r3.isNullAt(3))
  }
  test("quantileCi: exact order-statistic selection, clamped ranks, tie run, empty NULL") {
    import spark.implicits._
    // N = 100 over 1..100, q = 0.5: h = 1.96·5 → ranks 40 / 60 around
    // the type-1 median x_(50) = 50
    val d = (1L to 100L).toDF("v")
    val r = Quantiles.quantileCi(d, "v").collect().head
    assert(r.getLong(0) === 100L)
    assert((r.getLong(1), r.getLong(2)) === ((40L, 60L)))
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) ===
      ((50L, 40L, 60L)))
    // tiny N: the rank clamps keep the interval inside [x_(1), x_(N)]
    val small = (1L to 5L).toDF("v")
    val r2 = Quantiles.quantileCi(small, "v").collect().head
    assert((r2.getLong(3), r2.getLong(4), r2.getLong(5)) ===
      ((3L, 1L, 5L)))
    // a tied run collapses the interval onto the value
    val tie = Seq(5L, 5L, 5L).toDF("v")
    val r3 = Quantiles.quantileCi(tie, "v").collect().head
    assert((r3.getLong(3), r3.getLong(4), r3.getLong(5)) ===
      ((5L, 5L, 5L)))
    // empty input
    val none = Seq.empty[Long].toDF("v")
    val r4 = Quantiles.quantileCi(none, "v").collect().head
    assert(r4.getLong(0) === 0L && r4.isNullAt(3))
  }

}
