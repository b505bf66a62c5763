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
}
