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

  test("hllDistinct: naive md5 replay (registers, bits, both branches), duplicate-invariant, accuracy at 20k") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // full law replay: the small fixture lands on the LINEAR-COUNTING
    // branch (zeros > 0, raw ≤ 640), the exact path the sf-corpus rows
    // never exercise
    val items = (1 to 50).map(i => s"it$i")
    val regs = scala.collection.mutable.Map.empty[Long, Long]
    items.foreach { it =>
      val h = java.lang.Long.parseLong(md5hex("graft" + it).take(8), 16)
      val b = h >> 24
      val rest = h & 0xFFFFFFL
      val rho = if (rest == 0L) 25L
        else 25L - (64L - java.lang.Long.numberOfLeadingZeros(rest))
      regs(b) = math.max(regs.getOrElse(b, 0L), rho)
    }
    val zeros = 256L - regs.size
    val bits = regs.values.map(m => 1L << (40 - m)).sum + zeros * (1L << 40)
    val raw = Sketches.hllRawNumerator(8) / bits.toDouble
    val est = if (raw <= 640.0 && zeros > 0) 256.0 * math.log(256.0 / zeros)
      else raw
    val r = Sketches.hllDistinct(items.toDF("item"), col("item"), p = 8)
      .collect().head
    assert(r.getLong(0) === 256L)
    assert((r.getLong(1), r.getLong(2)) === ((regs.size.toLong, zeros)))
    assert(r.getLong(3) === bits)
    assert(r.getLong(4) === math.round(raw * 1000.0))
    assert(r.getLong(5) === math.round(est * 1000.0))
    assert(zeros > 0 && raw <= 640.0, "fixture must exercise linear counting")
    // duplicates can't move a max-of-ρ register file
    val r2 = Sketches.hllDistinct(
      (items ++ items ++ items).toDF("item"), col("item"), p = 8)
      .collect().head
    assert((r2.getLong(3), r2.getLong(5)) === ((bits, r.getLong(5))))
    // raw-branch accuracy: 20k distinct, expected rel-error ~1.04/√256
    val big = Sketches.hllDistinct(
      (1 to 20000).map(i => s"v$i").toDF("item"), col("item"), p = 8)
      .collect().head
    assert(big.getLong(2) === 0L, "20k items should fill all 256 registers")
    val e = big.getLong(5) / 1000.0
    assert(math.abs(e - 20000.0) / 20000.0 < 0.15,
      s"HLL estimate $e too far from 20000")
  }
}
