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
}
