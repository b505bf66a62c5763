package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(reps: Map[String, Int]): Seq[(String, String)] =
    reps.toSeq.flatMap { case (tok, n) => Seq.fill(n)(("en", tok)) }
      .grouped(7).zipWithIndex
      .map { case (g, i) => ("en", g.map(_._2).mkString(" ")) }.toSeq

  test("count-min: exact on a collision-free fixture; absent token reads 0") {
    val docs = corpus(Map("alpha" -> 50, "beta" -> 20, "gamma" -> 1))
      .toDF("lang", "text")
    val got = Sketches.approxTokenCounts(docs, "lang", "text",
        probes = Seq("alpha", "beta", "gamma", "absent"))
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    // 3 distinct tokens in a 4×1024 sketch: no collisions, estimates exact
    assert(got("alpha") === ((50L, 71L)))
    assert(got("beta") === ((20L, 71L)))
    assert(got("gamma") === ((1L, 71L)))
    assert(got("absent")._1 === 0L)
  }

  test("count-min: partial+final merge is partitioning-independent") {
    val docs = corpus(Map("aa" -> 33, "bb" -> 7, "cc" -> 19)).toDF("lang", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.approxTokenCounts(df, "lang", "text", Seq("aa", "bb", "cc"))
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(run(docs.repartition(7)) === run(docs.coalesce(1)))
  }

  test("count-min: one-sided error bound under forced collisions") {
    // 2000-token vocabulary into a width-256 sketch: collisions guaranteed.
    // CM law: estimate ≥ true always; overshoot ≤ 3e·N/width per probe with
    // overwhelming (and, seeded, deterministic) probability.
    val rnd = new scala.util.Random(5L)
    val vocab = (0 until 2000).map(i => s"tok$i")
    val toks = Seq.fill(5000)(vocab(rnd.nextInt(vocab.size)))
    val docs = toks.grouped(10).map(g => ("en", g.mkString(" "))).toSeq
      .toDF("lang", "text")
    val truth = toks.groupBy(identity).map { case (t, l) => t -> l.size.toLong }
    val probes = truth.keys.take(12).toSeq
    val got = Sketches.approxTokenCounts(docs, "lang", "text", probes,
        depth = 4, width = 256)
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    val n = 5000L
    val cap = (3 * math.E * n / 256).toLong // 3e·N/width
    probes.foreach { p =>
      val (est, total) = got(p)
      assert(total === n)
      assert(est >= truth(p), s"$p: CM must never undercount")
      assert(est <= truth(p) + cap, s"$p: overshoot ${est - truth(p)} > $cap")
    }
  }

  test("kmvDistinct: exact below k, duplicate-invariant, deterministic, estimate near truth at k=256") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // below k: the estimator IS the exact distinct count
    val small = (1L to 10L).toDF("x")
    val s = Sketches.kmvDistinct(small, col("x"), k = 16).collect().head
    assert((s.getLong(1), s.getLong(3)) === ((10L, 10L)))
    // 5000 distinct values, k = 256: σ ≈ 1/√k ≈ 6.3% — accept ±25% (4σ)
    val big = (1L to 5000L).toDF("x")
    val b1 = Sketches.kmvDistinct(big, col("x"), k = 256).collect().head
    assert(b1.getLong(1) === 256L)
    val est = b1.getLong(3)
    assert(est > 3750L && est < 6250L, s"estimate $est far from 5000")
    // the law sees the DISTINCT set: tripling every row changes nothing
    val trip = big.union(big).union(big)
    val b2 = Sketches.kmvDistinct(trip, col("x"), k = 256).collect().head
    assert(b2 === b1)
    // empty input: no rows
    assert(Sketches.kmvDistinct(Seq.empty[Long].toDF("x"), col("x"), 16)
      .count() === 0L)
  }

  test("bottomKSimilarity: exact below k (identical 1e6, disjoint 0, half-overlap), estimate near truth above k") {
    // below k the union sketch holds EVERYTHING → the estimator is the
    // exact Jaccard of the item sets
    val small = Seq(("a", "x"), ("a", "y"), ("a", "z"),
      ("b", "x"), ("b", "y"), ("b", "z"), // identical to a
      ("c", "y"), ("c", "z"), ("c", "w"), // |∩ a| = 2, |∪| = 4
      ("d", "p"), ("d", "q")) // disjoint from all
      .toDF("src", "item")
    val got = Sketches.bottomKSimilarity(small, "src", col("item"), k = 16)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(("a", "b")) === ((3L, 3L, 1000000L)))
    assert(got(("a", "c")) === ((4L, 2L, 500000L)))
    assert(got(("a", "d")) === ((5L, 0L, 0L)))
    assert(got.size === 6)
    // above k: planted 50% overlap of 2000-item sets, k = 256 → estimate
    // within ~3σ ≈ 0.1 of the true 1/3 Jaccard
    val big = (0 until 2000).flatMap(i =>
      Seq(("p", s"s$i"), ("q", s"t$i"))) ++
      (0 until 2000).map(i => ("p", s"c$i")) ++
      (0 until 2000).map(i => ("q", s"c$i"))
    val est = Sketches.bottomKSimilarity(big.toDF("src", "item"),
      "src", col("item"), k = 256)
      .collect().head.getLong(4)
    assert(math.abs(est - 333333L) < 100000L,
      s"bottom-k estimate $est vs true 333333")
    // duplicate incidences can't move the sketch (distinct law)
    val dup = Sketches.bottomKSimilarity(
      small.unionByName(small), "src", col("item"), k = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(dup(("a", "c")) === 500000L)
  }
}
