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
}
