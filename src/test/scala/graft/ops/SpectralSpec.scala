package graft.ops

import graft.SparkSpec

class SpectralSpec extends SparkSpec {
  import spark.implicits._

  test("topComponentMicro: exact rank-1 corpus recovers the planted direction with share exactly 1") {
    // docs = t·(0.6, 0.8) for t ∈ {1, 2, −1}: the covariance is exactly
    // rank 1, so the top component is ±(0.6, 0.8) — max-abs micro form
    // (750000, 1000000) with the smallest-dim-positive sign law — and
    // the Rayleigh share is exactly 1
    val docs = Seq(
      (1L, Seq(0.6f, 0.8f)),
      (2L, Seq(1.2f, 1.6f)),
      (3L, Seq(-0.6f, -0.8f)))
      .toDF("id", "vec")
    val got = Spectral.topComponentMicro(docs, "id", "vec", rounds = 12)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    assert(got(0L) === ((750000L, Some(1000000000000L))))
    assert(got(1L) === ((1000000L, Some(1000000000000L))))
  }

  test("topComponentMicro: axis-aligned clusters pick the high-variance axis; share = var share; bad vectors drop") {
    // (±3, 0) and (0, ±1): diagonal covariance diag ∝ (18, 2) → top
    // component e₀, share = 18/20 = 0.9 exactly. A NULL vector and a
    // NaN-carrying vector must not perturb anything.
    val docs = Seq(
      (1L, Some(Seq(3.0f, 0.0f))),
      (2L, Some(Seq(-3.0f, 0.0f))),
      (3L, Some(Seq(0.0f, 1.0f))),
      (4L, Some(Seq(0.0f, -1.0f))),
      (5L, Option.empty[Seq[Float]]),
      (6L, Some(Seq(Float.NaN, 1.0f))))
      .toDF("id", "vec")
    val got = Spectral.topComponentMicro(docs, "id", "vec", rounds = 12)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    assert(got(0L) === ((1000000L, Some(900000000000L))))
    assert(got(1L) === ((0L, Some(900000000000L))))
  }

  test("effectiveRankMicro: isotropic 2-dim corpus reports PR exactly 2; rank-1 corpus exactly 1") {
    // (±1, 0), (0, ±1): C ∝ diag(2, 2)·n → λ equal → PR = 2 exactly
    val iso = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(-1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.0f, -1.0f)))
      .toDF("id", "vec")
    val r1 = Spectral.effectiveRankMicro(iso, "id", "vec").collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) === ((4L, 2L, 2000000L)))
    // rank-1 corpus: one eigenvalue → PR = 1 exactly
    val rank1 = Seq(
      (1L, Seq(0.6f, 0.8f)), (2L, Seq(1.2f, 1.6f)), (3L, Seq(-0.6f, -0.8f)))
      .toDF("id", "vec")
    val r2 = Spectral.effectiveRankMicro(rank1, "id", "vec").collect().head
    assert((r2.getLong(1), r2.getLong(2)) === ((2L, 1000000L)))
  }

  test("zOutliersMicro: planted outlier ranks first with hand-exact score; zero-variance dims contribute 0") {
    // dim 0: values (1, −1, 0, 0, 0) — planted doc 1 is the +1;
    // dim 1: CONSTANT 2.0 everywhere — zero variance, must add exactly 0
    // moments dim 0 (micro): n=5, m=0, S2=2e12 → den = 1e13·... per-doc
    // z² = (5q)²/(5·2e12) = 25q²/1e13; q=±1e6 → 2.5 exactly → 2500000
    val docs = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(-1.0f, 2.0f)), (3L, Seq(0.0f, 2.0f)),
      (4L, Seq(0.0f, 2.0f)), (5L, Seq(0.0f, 2.0f)))
      .toDF("id", "vec")
    val got = Spectral.zOutliersMicro(docs, "id", "vec", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // ties break by id: the two |q|=1e6 docs lead, zeros follow
    assert(got.take(2).toSeq === Seq((1L, 2500000L), (2L, 2500000L)))
    assert(got.drop(2).map(_._2).forall(_ === 0L),
      "zero-deviation docs score exactly 0 (constant dim contributes nothing)")
  }

  test("topComponentMicro: sign law — a direction whose natural iterate is negative on dim 0 flips") {
    // docs along (−0.8, 0.6): power iteration from e₀ converges to the
    // eigvec with some sign; the law pins loading at the smallest
    // nonzero dim POSITIVE → (1000000, −750000)
    val docs = Seq(
      (1L, Seq(-0.8f, 0.6f)),
      (2L, Seq(1.6f, -1.2f)),
      (3L, Seq(0.8f, -0.6f)))
      .toDF("id", "vec")
    val got = Spectral.topComponentMicro(docs, "id", "vec", rounds = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1000000L, 1L -> -750000L))
  }
}
