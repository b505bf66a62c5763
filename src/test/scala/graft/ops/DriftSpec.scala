package graft.ops

import org.scalacheck.{Gen, rng}

import graft.SparkSpec

/** TV-drift law: the engine's split-sum exact-integer formulation against
  * the textbook ½·Σ|p−q| replay, plus the boundary laws (one stratum → 0,
  * disjoint strata → the closed-form mass split).
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def engine(docs: Seq[(String, String)]): Map[String, (Long, Long, Double)] =
    Drift.tvDrift(docs.toDF("source", "text"), "source", "text")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("single stratum has zero drift; counts are exact") {
    val got = engine(Seq(("a", "x y z x"), ("a", "y z")))
    assert(got.keySet === Set("a"))
    val (n, v, tv) = got("a")
    assert(n === 6L && v === 3L)
    assert(tv === 0.0)
  }

  test("disjoint-vocabulary strata: closed form 1 - N_s/N") {
    // stratum distributions share no tokens, so TV(s) = ½(Σ_s p + Σ_rest q)
    // where the overlap of p and q on s's tokens is q restricted to s:
    // TV = ½·(Σ_{t∈s}(c/N_s − c/N) + (N−N_s)/N) = 1 − N_s/N
    val docs = Seq(("a", "x x x"), ("b", "y"), ("b", "z w u v"))
    val got = engine(docs)
    assert(math.abs(got("a")._3 - (1.0 - 3.0 / 8.0)) < 1e-12)
    assert(math.abs(got("b")._3 - (1.0 - 5.0 / 8.0)) < 1e-12)
  }

  test("blank/NULL text contributes nothing; token-free strata are absent") {
    val df = Seq(
      (Some("a"), Some("x y")),
      (Some("empty"), Some("   ")),
      (Some("nul"), Option.empty[String]),
      (Some("a"), Some("x"))).toDF("source", "text")
    val got = Drift.tvDrift(df, "source", "text").collect()
    assert(got.map(_.getString(0)).toSet === Set("a"))
    assert(got.head.getLong(1) === 3L)
  }

  test("property: engine TV matches the naive full-union replay on 30 random corpora") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val doc = for {
      s <- Gen.oneOf("s1", "s2", "s3")
      n <- Gen.chooseNum(0, 12)
      ws <- Gen.listOfN(n, word)
    } yield (s, ws.mkString(" "))
    val corpora = (0 until 30).map { i =>
      Gen.listOfN(14, doc).pureApply(Gen.Parameters.default, rng.Seed(7L + i))
    }
    corpora.foreach { docs =>
      val want = Drift.tvNaive(docs)
      val got = engine(docs)
      assert(got.keySet === want.keySet, s"strata for $docs")
      want.foreach { case (s, tv) =>
        assert(math.abs(got(s)._3 - tv) < 1e-9,
          s"stratum $s: engine ${got(s)._3} vs naive $tv in $docs")
      }
    }
  }

  test("ingestDriftReport: the shifted micro-batch alarms, the on-distribution one doesn't") {
    import java.nio.file.Files
    val store = Files.createTempDirectory("drift-ingest-store").toString
    val dedupStore = Files.createTempDirectory("drift-ingest-dedup").toString
    val sink = Files.createTempDirectory("drift-ingest-sink").toString
    // vetted baseline: a clean-vocabulary corpus trains the drift store
    val clean = (1L to 40L).map(i =>
      (i, s"the quick brown fox number $i jumps over the lazy dog"))
      .toDF("doc_id", "text")
    RefStore.writeTokenCounts(clean, "text", store)
    // the ingest loop's own exact-dedup store (empty initial corpus)
    RefStore.writeExact(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "text", dedupStore,
      expectedItems = 100L)
    // batch 0 on-distribution, batch 1 vocabulary-shifted junk
    graft.streaming.StreamIngest.ingestDedupedBatch(
      (100L to 104L).map(i => (i, s"quick brown fox $i over the lazy dog"))
        .toDF("doc_id", "text"),
      0L, dedupStore, sink, "doc_id", "text")
    graft.streaming.StreamIngest.ingestDedupedBatch(
      (200L to 204L).map(i => (i, s"zzz$i qqq$i www$i eee$i rrr$i ttt$i"))
        .toDF("doc_id", "text"),
      1L, dedupStore, sink, "doc_id", "text")
    val report = Drift.ingestDriftReport(spark, sink, store, "text",
        alarmAt = 0.5)
      .collect()
      .map(r => r.getAs[Any](0).toString.toLong ->
        ((r.getDouble(3), r.getBoolean(4)))).toMap
    assert(report.keySet === Set(0L, 1L))
    assert(!report(0L)._2,
      s"on-distribution batch must not alarm: tv=${report(0L)._1}")
    assert(report(1L)._2 && report(1L)._1 > 0.9,
      s"disjoint-vocabulary batch must alarm hard: tv=${report(1L)._1}")
    assert(report(0L)._1 < report(1L)._1)
  }
}
