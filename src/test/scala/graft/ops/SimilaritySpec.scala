package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // planted corpus: 40 seeded random 32-dim vectors; vectors 100+i are
  // small perturbations of i (cos ≈ 0.999) for i < 5
  private lazy val vecs = {
    val rnd = new scala.util.Random(42)
    val base = (0 until 40).map(i => i.toLong -> Array.fill(32)(rnd.nextFloat() * 2 - 1))
    val twins = (0 until 5).map { i =>
      (100 + i).toLong -> base(i)._2.map(x => x * 0.99f + 0.001f)
    }
    (base ++ twins).toDF("vec_id", "embedding")
  }

  test("bruteForceTopK: planted twin is always the rank-1 neighbor") {
    val top = Similarity.bruteForceTopK(
      vecs, vecs.filter($"vec_id" < 5), "vec_id", "embedding", k = 3)
    val rank1 = top.filter($"rank" === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0 until 5).foreach(i => assert(rank1(i.toLong) === 100L + i))
    // all sims in [-1, 1], rank 1 sim ≈ 1 for twins
    val sims = top.filter($"rank" === 1).select("sim").as[Double].collect()
    sims.foreach(s => assert(s > 0.99))
  }

  test("lshTopK: recovers planted twins (the genuinely-near regime)") {
    val top = Similarity.lshTopK(
      vecs, vecs.filter($"vec_id" < 5), "vec_id", "embedding", k = 3)
    val rank1 = top.filter($"rank" === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val recovered = (0 until 5).count(i => rank1.get(i.toLong).contains(100L + i))
    assert(recovered >= 4, s"twin recall $recovered/5")
  }

  test("lshTopK: multi-probe recall dominates zero-probe in the uniform regime") {
    // the hard regime: TWIN-FREE uniform cloud (vec_id < 100 strips the
    // planted twins) — nearest neighbors sit at wide angles where
    // single-bucket LSH recall collapses; this is the regime the 0.30→0.68
    // AnnRecall gain lives in
    val uniform = vecs.filter($"vec_id" < 100)
    val exact = Similarity.bruteForceTopK(
      uniform, uniform.filter($"vec_id" < 5), "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(probes: Int): Double = {
      val got = Similarity.lshTopK(
        uniform, uniform.filter($"vec_id" < 5), "vec_id", "embedding", k = 3,
        probes = probes)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (got intersect exact).size.toDouble / exact.size
    }
    val r0 = recall(0)
    val r2 = recall(2)
    assert(r2 >= r0, s"multi-probe recall $r2 must not fall below zero-probe $r0")
    assert(r2 > 0.3, s"2-probe uniform-regime recall $r2 unexpectedly low")
  }

  test("ivfTopK: planted twins recovered; recall beats the probe fraction") {
    val top = Similarity.ivfTopK(
      vecs, vecs.filter($"vec_id" < 5), "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 3)
    val rank1 = top.filter($"rank" === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    // a twin lands in the same k-means cell as its original with near
    // certainty (cos ≈ 0.999 ⇒ same region) — all 5 must be recovered
    val recovered = (0 until 5).count(i => rank1.get(i.toLong).contains(100L + i))
    assert(recovered === 5, s"twin recall $recovered/5")
    // exact-cosine agreement with brute force on recovered pairs
    val bf = Similarity.bruteForceTopK(
      vecs, vecs.filter($"vec_id" < 5), "vec_id", "embedding", k = 1)
      .select("query_id", "sim").as[(Long, Double)].collect().toMap
    top.filter($"rank" === 1).select("query_id", "sim").as[(Long, Double)]
      .collect().foreach { case (qid, s) => assert(s === bf(qid)) }
  }

  test("pqTopK: planted twins recovered; reranked sims are exact cosines") {
    // 32-dim vectors, m=4 subspaces × 64 codes: a twin's PQ codes match its
    // original's (perturbation ≪ quantization cell), so ADC ranks it top
    val top = Similarity.pqTopK(
      vecs, vecs.filter($"vec_id" < 5), "vec_id", "embedding", k = 3,
      m = 4, nbits = 6)
    val rank1 = top.filter($"rank" === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0 until 5).foreach(i => assert(rank1(i.toLong) === 100L + i, s"query $i"))
    // rerank contract: the returned sim must equal the brute-force cosine
    val bf = Similarity.bruteForceTopK(
      vecs, vecs.filter($"vec_id" < 5), "vec_id", "embedding", k = 1)
      .filter($"rank" === 1)
      .select("query_id", "sim").as[(Long, Double)].collect().toMap
    top.filter($"rank" === 1).select("query_id", "sim").as[(Long, Double)]
      .collect().foreach { case (qid, s) => assert(s === bf(qid)) }
  }

  test("pqTopK: ADC shortlist recall beats random in the uniform regime") {
    val uniform = vecs.filter($"vec_id" < 100) // strip twins: hard regime
    val exact = Similarity.bruteForceTopK(
      uniform, uniform.filter($"vec_id" < 5), "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = Similarity.pqTopK(
      uniform, uniform.filter($"vec_id" < 5), "vec_id", "embedding", k = 3,
      m = 4, nbits = 6)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (got intersect exact).size.toDouble / exact.size
    // 3 random picks of 39 would land ~0.08; quantized dot products must do
    // far better even at wide angles
    assert(recall >= 0.5, s"uniform-regime PQ recall $recall")
  }

  test("cosineNearDupPairs: exactly the 5 planted near-dup pairs at 0.99") {
    val pairs = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === (0 until 5).map(i => (i.toLong, 100L + i)).toSet)
  }

  test("blockedNearDupPairs: finds twins only when they share a block") {
    // put each base vector i < 5 and its twin 100+i in block i%2; everything
    // else in block 9 — pairs can only form within blocks
    val blocked = vecs.withColumn("blk",
      when($"vec_id" < 5, $"vec_id" % 2)
        .when($"vec_id" >= 100, ($"vec_id" - 100) % 2)
        .otherwise(lit(9L)))
    val pairs = Similarity.blockedNearDupPairs(blocked, "vec_id", "embedding",
      "blk", threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === (0 until 5).map(i => (i.toLong, 100L + i)).toSet)

    // twin 100+0 moved to a different block than 0 → its pair disappears
    val split = blocked.withColumn("blk",
      when($"vec_id" === 100, lit(7L)).otherwise($"blk"))
    val pairs2 = Similarity.blockedNearDupPairs(split, "vec_id", "embedding",
      "blk", threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs2 === (1 until 5).map(i => (i.toLong, 100L + i)).toSet)
  }

  test("embedAgainst: semantic twins of the reference drop; block gates the comparison") {
    // incoming 0..4 are twins of reference 100..104 (same planted base);
    // block them together → all five incoming drop; everything else survives
    val blocked = vecs.withColumn("blk",
      when($"vec_id" < 5, $"vec_id" % 2)
        .when($"vec_id" >= 100, ($"vec_id" - 100) % 2)
        .otherwise(lit(9L)))
    val incoming = blocked.filter($"vec_id" < 100)
    val reference = blocked.filter($"vec_id" >= 100)
    val kept = Similarity.embedAgainst(incoming, reference, "vec_id",
      "embedding", "blk", threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === incoming.select("vec_id").as[Long].collect().toSet -- (0L until 5L))

    // move reference twin 100 out of incoming 0's block → 0 now survives
    val refSplit = reference.withColumn("blk",
      when($"vec_id" === 100, lit(7L)).otherwise($"blk"))
    val kept2 = Similarity.embedAgainst(incoming, refSplit, "vec_id",
      "embedding", "blk", threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(kept2.contains(0L) && !kept2.contains(1L))
  }

  test("clusterCentroidSums: exact integer accumulators, hand-checked") {
    val e = Seq(
      (1L, Array(1.0f, -2.0f)), (2L, Array(3.0f, 4.0f)),   // cluster 1
      (3L, Array(0.5f, 0.25f)),                            // cluster 3
      (4L, Array(9.0f, 9.0f))                              // unassigned
    ).toDF("vec_id", "embedding")
    val assign = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("doc_id", "cluster_id")
    val r = Similarity.clusterCentroidSums(e, assign, "vec_id", "embedding")
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> (x.getLong(2), x.getLong(3))).toMap
    assert(r((1L, 0L)) === (4000000L, 2L)) // 1e6 + 3e6
    assert(r((1L, 1L)) === (2000000L, 2L)) // -2e6 + 4e6
    assert(r((3L, 0L)) === (500000L, 1L))
    assert(r((3L, 1L)) === (250000L, 1L))
    assert(!r.keySet.exists(_._1 == 4L), "unassigned member must not appear")
    assert(r.size === 4)
  }

  test("embeddingDimStats: exact moments; NaN/Inf/NULL/huge counted not summed; degenerates at dim -1") {
    val e = spark.sql(
      """SELECT * FROM VALUES
        | (1L, array(float(1.0),  float(-2.0))),
        | (2L, array(float(3.0),  float('NaN'))),
        | (3L, array(float(0.5),  float('Infinity'))),
        | (4L, array(float(1e20), cast(NULL AS FLOAT))),
        | (5L, cast(NULL AS ARRAY<FLOAT>)),
        | (6L, array() ),
        | (7L, array(float(1.0e6), float(0.25)))
        |AS t(vec_id, embedding)""".stripMargin
          .replace("array() ", "cast(array() as array<float>) "))
    val r = Similarity.embeddingDimStats(e, "embedding")
      .collect().map(x => x.getLong(0) -> x).toMap
    val d0 = r(0L)
    // 1e20 AND 1e6 are finite but beyond the 3e3 quantization cutoff: BAD,
    // not a crash — 1e6 squared in micro-units would overflow BIGINT, the
    // exact ANSI ArithmeticException window the cutoff exists to close
    assert(d0.getAs[Long]("n") === 5L && d0.getAs[Long]("n_bad") === 2L)
    assert(d0.getAs[Long]("sum_micro") === 4500000L)      // (1 + 3 + 0.5)e6
    assert(d0.getAs[Double]("sumsq_micro2") === 1e12 + 9e12 + 25e10)
    assert(d0.getAs[Long]("min_micro") === 500000L && d0.getAs[Long]("max_micro") === 3000000L)
    val d1 = r(1L)
    assert(d1.getAs[Long]("n_bad") === 3L, "NaN, Inf AND element-NULL all count as bad")
    assert(d1.getAs[Long]("sum_micro") === -1750000L, "bad components must not poison sums")
    assert(d1.getAs[Long]("max_micro") === 250000L)
    val deg = r(-1L)
    assert(deg.getAs[Long]("n") === 2L, "NULL and empty vectors surface at dim -1")
    assert(deg.isNullAt(deg.fieldIndex("sum_micro")))
  }

  test("embeddingDimStats: near-cutoff components can't overflow the square sum") {
    // two components just under the 3e3 cutoff: each square ≈ 9e18 fits
    // BIGINT alone, but their SUM exceeds Long.Max — the decimal
    // accumulator must absorb it instead of throwing under ANSI
    val e = Seq(
      (1L, Array(2999.0f)),
      (2L, Array(2999.0f))).toDF("vec_id", "embedding")
    val r = Similarity.embeddingDimStats(e, "embedding").collect().head
    assert(r.getAs[Long]("n_bad") === 0L, "2999 is inside the cutoff — good")
    val q = BigInt(math.round(2999.0f.toDouble * 1000000.0))
    assert(r.getAs[Double]("sumsq_micro2") === (q * q * 2).toDouble)
    assert(r.getAs[Long]("sum_micro") === (q * 2).toLong)
  }

  test("hardNegatives: nearest DIFFERENT-label rows only; NULL label laws") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f), Some(7)),   // query
      (2L, Array(0.99f, 0.1f), Some(7)),  // same label — never a negative
      (3L, Array(0.95f, 0.2f), Some(8)),  // negative, cos ≈ 0.978
      (4L, Array(0.5f, 0.8f), Some(8)),   // easier negative
      (5L, Array(0.9f, 0.15f), None)      // NULL label — negative, cos ≈ 0.986
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(
        corpus, corpus.filter($"vec_id" === 1L), "vec_id", "embedding", "label", k = 2)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toMap
    assert(got === Map(1 -> 5L, 2 -> 3L),
      "same-label twin must be excluded; NULL label counts as different")
    // NULL-label query: every labeled row is a negative, NULL-vs-NULL is not
    val corpus2 = corpus.union(Seq(
      (6L, Array(1.0f, 0.01f), Option.empty[Int])).toDF("vec_id", "embedding", "label"))
    val gotNull = Similarity.hardNegatives(
        corpus2, corpus2.filter($"vec_id" === 5L), "vec_id", "embedding", "label", k = 10)
      .select("neighbor_id").as[Long].collect().toSet
    assert(gotNull === Set(1L, 2L, 3L, 4L), "NULL-vs-NULL is same-label, excluded")
  }

  test("mmrTopK: diversification reorders a near-dup pair; λ=1 degrades to relevance order") {
    // query points at x; a and b are near-duplicates of each other close to
    // the query; c is orthogonal. Pure relevance ranks (a, b, c); MMR at
    // λ=0.3 must interleave the orthogonal c before the redundant b.
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)),    // the query itself (self-excluded)
      (1L, Array(1.0f, 0.05f)),   // a: rel ≈ 0.99875
      (2L, Array(1.0f, 0.06f)),   // b: rel ≈ 0.99820, cos(a,b) ≈ 0.99995
      (3L, Array(0.0f, 1.0f))     // c: rel = 0, cos(a,c) ≈ 0.05
    ).toDF("vec_id", "embedding")
    val q = corpus.filter($"vec_id" === 0L)

    val diverse = Similarity.mmrTopK(corpus, q, "vec_id", "embedding",
        nCandidates = 3, k = 3, lambda = 0.3)
      .orderBy("rk").select("neighbor_id").as[Long].collect().toSeq
    assert(diverse === Seq(1L, 3L, 2L),
      "after picking a, the redundant twin b must fall behind orthogonal c")

    val relevanceOnly = Similarity.mmrTopK(corpus, q, "vec_id", "embedding",
        nCandidates = 3, k = 3, lambda = 1.0)
      .orderBy("rk").select("neighbor_id").as[Long].collect().toSeq
    assert(relevanceOnly === Seq(1L, 2L, 3L),
      "λ=1 is pure relevance — bruteForceTopK order")
  }

  test("mmrTopK laws on the planted corpus: rank-1 = brute-force rank-1, selections ⊆ candidates, k rows") {
    val queries = vecs.filter($"vec_id" < 5)
    val got = Similarity.mmrTopK(vecs, queries, "vec_id", "embedding",
      nCandidates = 10, k = 4, lambda = 0.5)
    val byQ = got.select("query_id", "rk", "neighbor_id")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    assert(byQ.size === 5 && byQ.values.forall(_.length === 4))
    // rk=1 is the relevance argmax — the planted twin
    byQ.foreach { case (qid, rows) =>
      assert(rows.find(_._2 == 1L).get._3 === 100L + qid)
    }
    // every selection came from the brute-force candidate pool
    val pool = Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(byQ.values.flatten.forall { case (q0, _, n0) => pool.contains((q0, n0)) })
    // no repeats within a query
    byQ.values.foreach(rows => assert(rows.map(_._3).distinct.length === rows.length))
  }

  test("property: every mmr pick maximizes the λ-objective against an independent recomputation") {
    val rnd = new scala.util.Random(23)
    val corpus = (0L until 30L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 3)
    val lam = 0.4
    val got = Similarity.mmrTopK(corpus, queries, "vec_id", "embedding",
        nCandidates = 12, k = 5, lambda = lam)
      .select("query_id", "rk", "neighbor_id", "score")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (q, rows) => q -> rows.sortBy(_._2) }
    // independent replay: brute candidates, then exhaustive argmax per step
    val vecs0 = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val cand = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 12)
      .select("query_id", "neighbor_id", "sim").as[(Long, Long, Double)].collect()
      .groupBy(_._1)
    got.foreach { case (q, picks) =>
      val pool = cand(q).map(c => c._2 -> c._3).toMap
      var selected = List.empty[Long]
      picks.foreach { case (_, rk, id, score) =>
        val best = pool.keys.filterNot(selected.contains).map { c =>
          val s = if (rk == 1L) pool(c)
            else lam * pool(c) - (1.0 - lam) * selected.map(s0 =>
              Similarity.cosineScala(vecs0(s0), vecs0(c))).max
          (c, s)
        }.maxBy { case (c, s) => (s, -c) } // score desc, id asc
        assert(best._1 === id && best._2 === score,
          s"query $q step $rk: greedy picked $id@$score, exhaustive says $best")
        selected ::= id
      }
    }
  }

  test("mmrRerank: zero-norm candidates (NaN cosine) stop the greedy early instead of crashing") {
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.1f)),
      (2L, Array(0.0f, 0.0f)),  // zero vector: every cosine involving it is NaN
      (3L, Array(0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cand = Seq((0L, 1L, 0.995), (0L, 2L, Double.NaN), (0L, 3L, Double.NaN))
      .toDF("query_id", "neighbor_id", "sim")
    val got = Similarity.mmrRerank(cand, corpus, "vec_id", "embedding", k = 3, lambda = 0.5)
      .select("rk", "neighbor_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L)),
      "only the finite candidate is selectable; NaN rows must not crash or rank")
  }

  test("mmrRerank: a finite-sim zero-norm candidate (all-NaN penalty) is unselectable, not +Infinity-first") {
    // a non-cosine candidate tier CAN hand a zero-norm vector a finite
    // sim; its diversity penalty is then NaN against every selected
    // vector — the score must be NaN (skip it), never -Inf flipping into
    // a +Inf score that would beat every honest candidate
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f)), // zero-norm but FINITE sim below
      (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val cand = Seq((0L, 1L, 0.9), (0L, 2L, 0.8), (0L, 3L, 0.7))
      .toDF("query_id", "neighbor_id", "sim")
    val got = Similarity.mmrRerank(cand, corpus, "vec_id", "embedding", k = 3, lambda = 0.5)
      .select("rk", "neighbor_id").as[(Long, Long)].collect().toSeq.sorted
    assert(got === Seq((1L, 1L), (2L, 3L)),
      "rk2 must pick the honest diverse candidate; the zero-norm one is " +
        "unselectable and the greedy stops at two")
    // the poisoned-selection arm: when the zero-norm vector WINS rank 1
    // (pure relevance, no penalty yet), every later candidate's penalty
    // involves an undefined similarity — all unselectable, greedy stops
    val cand2 = Seq((1L, 2L, 0.99), (1L, 1L, 0.9), (1L, 3L, 0.8))
      .toDF("query_id", "neighbor_id", "sim")
    val got2 = Similarity.mmrRerank(cand2, corpus, "vec_id", "embedding", k = 3, lambda = 0.5)
      .select("rk", "neighbor_id").as[(Long, Long)].collect().toSeq.sorted
    assert(got2 === Seq((1L, 2L)),
      "a zero-norm rank-1 pick poisons every later penalty: stop at one")
  }

  test("mmrRerank: any candidate tier composes — restricted pool respected, brute tier ≡ mmrTopK") {
    val queries = vecs.filter($"vec_id" < 3)
    val brute = Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", k = 10)
    val viaRerank = Similarity.mmrRerank(brute, vecs, "vec_id", "embedding", k = 4, lambda = 0.5)
      .select("query_id", "rk", "neighbor_id").as[(Long, Long, Long)].collect().toSet
    val direct = Similarity.mmrTopK(vecs, queries, "vec_id", "embedding",
        nCandidates = 10, k = 4, lambda = 0.5)
      .select("query_id", "rk", "neighbor_id").as[(Long, Long, Long)].collect().toSet
    assert(viaRerank === direct)
    // an ANN tier that misses the twin: MMR can only pick from what it got
    val noTwins = brute.filter($"neighbor_id" < 100L)
    val restricted = Similarity.mmrRerank(noTwins, vecs, "vec_id", "embedding", k = 4, lambda = 0.5)
      .select("neighbor_id").as[Long].collect().toSet
    assert(restricted.forall(_ < 100L), "selections must stay inside the candidate pool")
  }

  test("int8QuantizeFrame: roundtrip within half a step, clamp at ±127, zero vector safe") {
    val e = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),       // zero vector: scale 0, codes 0
      (3L, Array(1e-8f, -1e-8f, 1e-8f, 1e-8f))   // tiny but nonzero: still lawful
    ).toDF("vec_id", "embedding")
    val q = Similarity.int8QuantizeFrame(e, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // hand-checked: scale = 1/127; 0.5 → 63.5 → 64; -1 → -127; 0.25 → 32
    assert(q((1L, 1L))._1 === 64L && q((1L, 2L))._1 === -127L &&
      q((1L, 3L))._1 === 32L && q((1L, 4L))._1 === 0L)
    (1L to 4L).foreach(d => assert(q((2L, d)) === ((0L, 0.0))))
    // roundtrip error ≤ scale/2 everywhere (the quantization contract)
    val packed = Similarity.int8QuantizeFrame(e, "vec_id", "embedding", explode = false)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Long](2).toArray)).toSeq
    val orig = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    packed.foreach { case (id, scale, codes) =>
      codes.zip(orig(id)).foreach { case (c, x) =>
        assert(math.abs(c * scale - x.toDouble) <= scale / 2.0 + 1e-15,
          s"vec $id: code $c * $scale vs $x")
      }
    }
  }

  test("assignNearestCentroidNarrow ≡ join form: sims, ties, NaN guard, no-home NULLs") {
    val e = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    val assign = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)).toDF("doc_id", "cluster_id")
    // a zero-norm "cluster 9" (NaN centroid cosine) rides along: the narrow
    // form must skip it exactly like the join form's isnan filter
    val sums = Similarity.clusterCentroidSums(e, assign, "vec_id", "embedding")
      .unionByName(Seq((9L, 0L, 0L, 1L), (9L, 1L, 0L, 1L))
        .toDF("cluster_id", "dim", "sum_micro", "n_members"))
    val incoming = Seq(
      (10L, Array(0.95f, 0.05f)), (11L, Array(0.02f, 1.1f)),
      (12L, Array(-1.0f, -1.0f)), (13L, Array(0.0f, 0.0f)),
      (14L, null.asInstanceOf[Array[Float]])
    ).toDF("vec_id", "embedding")
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "cluster_id", "centroid_sim").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    val joinForm = norm(Similarity.assignNearestCentroid(
      incoming, sums, "vec_id", "embedding", minSim = 0.5))
    val narrow = norm(Similarity.assignNearestCentroidNarrow(
      incoming, sums, "vec_id", "embedding", minSim = 0.5))
    assert(narrow === joinForm, "narrow twin drifted from the join form")
    assert(joinForm.exists { case (id, c, _) => id == 10L && c == Some(1L) })
    assert(joinForm.exists { case (id, c, _) => id == 12L && c == None })
  }

  test("assignNearestCentroidNarrow: runs inside a streaming query, stream == batch") {
    val e = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val assign = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "cluster_id")
    val sums = Similarity.clusterCentroidSums(e, assign, "vec_id", "embedding")
    val incoming = Seq(
      (10L, Array(0.9f, 0.1f)), (11L, Array(0.1f, 0.9f)), (12L, Array(0.6f, 0.6f))
    ).toDF("vec_id", "embedding")
    val srcDir = java.nio.file.Files.createTempDirectory("assign-stream").toString
    incoming.write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(incoming.schema).parquet(srcDir)
    val q = Similarity.assignNearestCentroidNarrow(stream, sums, "vec_id", "embedding")
      .writeStream.outputMode("append").format("memory")
      .queryName("assign_stream_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("assign_stream_out")
      .select("vec_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Similarity.assignNearestCentroidNarrow(
      incoming, sums, "vec_id", "embedding")
      .select("vec_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got(10L) === 1L && got(11L) === 2L)
  }

  test("kmeansRefineSums: planted groups converge from adjacent seeds; sums exact") {
    // two tight direction-groups in 2-d; the two seeds (lowest ids 1,2) land
    // one in each group, so one round already separates them and the second
    // round is a fixed point
    val e = Seq(
      (1L, Array(1.0f, 0.05f)), (3L, Array(0.9f, 0.0f)), (5L, Array(1.0f, -0.05f)),
      (2L, Array(0.05f, 1.0f)), (4L, Array(0.0f, 1.1f)), (6L, Array(-0.05f, 1.0f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.kmeansRefineSums(e, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> (x.getLong(2), x.getLong(3))).toMap
    // cluster 1 = x-group {1,3,5}: dim0 = (1.0+0.9+1.0)e6, dim1 = (0.05+0-0.05)e6
    assert(r((1L, 0L)) === (2900000L, 3L))
    assert(r((1L, 1L)) === (0L, 3L))
    // cluster 2 = y-group {2,4,6}: float 1.1f widens to 1.100000023841858
    assert(r((2L, 0L)) === (0L, 3L))
    assert(r((2L, 1L)) === (3100000L, 3L))
    assert(r.size === 4)
  }

  test("kmeansRefineSums: zero-norm vectors never assign; empty clusters drop out") {
    // both seeds (ids 1,2) sit in the SAME direction-group: every point
    // assigns to the nearer seed 1 after normalization ties break low, and
    // seed 2's cluster empties; the zero vector has no cosine home
    val e = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)), (3L, Array(0.8f, 0.0f)),
      (4L, Array(0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.kmeansRefineSums(e, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> (x.getLong(2), x.getLong(3))).toMap
    assert(r((1L, 0L)) === (2800000L, 3L), "all unit-direction points join cluster 1")
    assert(!r.keySet.exists(_._1 == 2L), "emptied seed cluster must drop out")
    assert(r.values.forall(_._2 == 3L), "zero-norm vector must not be counted anywhere")
  }

  test("assignNearestCentroid: incremental assignment picks the right cluster; below minSim stays NULL") {
    // two axis-aligned clusters in 2-d; incoming vectors near each axis
    val e = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),    // cluster ~x
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.1f, 0.9f))     // cluster ~y
    ).toDF("vec_id", "embedding")
    val assign = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)).toDF("doc_id", "cluster_id")
    val sums = Similarity.clusterCentroidSums(e, assign, "vec_id", "embedding")
    val incoming = Seq(
      (10L, Array(0.95f, 0.05f)),   // → cluster 1
      (11L, Array(0.02f, 1.1f)),    // → cluster 3
      (12L, Array(-1.0f, -1.0f))    // opposite everything → below minSim
    ).toDF("vec_id", "embedding")
    val out = Similarity.assignNearestCentroid(incoming, sums, "vec_id", "embedding",
      minSim = 0.5)
      .select("vec_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(10L) === Some(1L))
    assert(out(11L) === Some(3L))
    assert(out(12L) === None, "no-home vector must keep a NULL cluster")
  }

  test("assignNearestCentroid: a zero-norm centroid cannot poison assignments (NaN guard)") {
    // cluster 9's members cancel to the zero vector → NaN cosine, which
    // sorts ABOVE every real sim in Spark — it must not win max_by
    val e = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (5L, Array(1.0f, 1.0f)), (6L, Array(-1.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val assign = Seq((1L, 1L), (2L, 1L), (5L, 9L), (6L, 9L)).toDF("doc_id", "cluster_id")
    val sums = Similarity.clusterCentroidSums(e, assign, "vec_id", "embedding")
    val incoming = Seq(
      (10L, Array(0.95f, 0.05f)),      // real best: cluster 1
      (11L, Array(0.0f, 0.0f))         // zero-norm incoming: NaN everywhere → NULL
    ).toDF("vec_id", "embedding")
    val out = Similarity.assignNearestCentroid(incoming, sums, "vec_id", "embedding",
      minSim = 0.5)
      .select("vec_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(10L) === Some(1L), "zero-norm centroid must not steal the assignment")
    assert(out(11L) === None, "zero-norm incoming vector has no home")
  }

  test("random projection: naive md5 replay, NULL/empty law, determinism") {
    def naive(seed: String, outDim: Int, v: Array[Float]): Array[Long] = {
      val d = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(outDim) { j =>
        var s = 0L
        var i = 0
        while (i < v.length) {
          d.reset()
          val h = d.digest(s"$seed:$j:$i".getBytes("UTF-8"))
          val sign = if ((h(0) & 0x80) == 0) 1L else -1L
          s += sign * math.floor(v(i).toDouble * 1000000.0 + 0.5).toLong
          i += 1
        }
        s
      }
    }
    val rnd = new scala.util.Random(7L)
    val vecs = (1L to 20L).map(id =>
      (id, Array.fill(16)(rnd.nextFloat() * 2f - 1f)))
    val df = (vecs :+ ((21L, null.asInstanceOf[Array[Float]]))
      :+ ((22L, Array.empty[Float]))).toDF("vec_id", "embedding")
    val got = Similarity.randomProjectFrame(df, "vec_id", "embedding", 4)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .groupBy(_._1)
    vecs.foreach { case (id, v) =>
      val want = naive("graft", 4, v)
      val rows = got(id).sortBy(_._2)
      assert(rows.length === 4)
      rows.foreach { case (_, j, comp) => assert(comp === Some(want(j.toInt))) }
    }
    // NULL and empty vectors each produce exactly one (NULL j, NULL comp) row
    Seq(21L, 22L).foreach { id =>
      assert(got(id).toList === List((id, -1L, None)), s"vec $id law")
    }
    // data-independent signs: a second frame with one shared vector agrees
    val again = Similarity.randomProjectFrame(
        Seq((99L, vecs.head._2)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", 4)
      .orderBy("j").collect().map(_.getLong(2)).toList
    assert(again === naive("graft", 4, vecs.head._2).toList)
  }

  test("random projection: JL sketch preserves relative cosine ordering on planted structure") {
    // 3 tight clusters far apart in 32-dim; after projecting to 8 the
    // nearest projected neighbor of each point must stay in-cluster
    val rnd = new scala.util.Random(11L)
    def base(k: Int) = Array.tabulate(32)(i => if (i % 3 == k) 5.0f else 0.0f)
    val vecs = for (k <- 0 until 3; n <- 0 until 6) yield
      (k * 10L + n,
        base(k).map(x => x + rnd.nextFloat() * 0.2f))
    val df = vecs.toDF("vec_id", "embedding")
    val proj = Similarity.randomProjectFrame(df, "vec_id", "embedding", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3.toDouble).toArray }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    vecs.foreach { case (id, _) =>
      val mine = proj(id)
      val best = proj.filter(_._1 != id)
        .maxBy { case (_, v) => cos(mine, v) }._1
      assert(best / 10L === id / 10L,
        s"projected nearest neighbor of $id left its cluster ($best)")
    }
  }

  test("cosine law: self-similarity 1, symmetry") {
    val a = Seq((1L, Array(1.0f, 2.0f, 3.0f)), (2L, Array(-3.0f, 2.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val self = a.select(Similarity.cosine($"embedding", $"embedding")).head.getDouble(0)
    assert(math.abs(self - 1.0) < 1e-12)
    val ab = a.agg(collect_list($"embedding")).head.getSeq[Seq[Float]](0)
    val cross = Similarity.bruteForceTopK(a, a, "vec_id", "embedding", 1)
      .select("sim").as[Double].collect()
    assert(cross(0) === cross(1)) // cos(a,b) == cos(b,a)
  }

  test("rrfFuseTopK: disagreeing systems fuse by the exact reciprocal-rank law") {
    val corpus = Seq(
      (1L, Array(3.0f, 0.0f)),   // cos rank 1 (exact direction), l2 rank 2
      (2L, Array(1.0f, 0.1f)),   // cos rank 2, l2 rank 1 (closest point)
      (3L, Array(0.0f, 5.0f)))   // rank 3 on both — off both shortlists
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.rrfFuseTopK(corpus, queries, "vec_id", "embedding",
        perSystemK = 2, k0 = 60, k = 3)
      .orderBy("rk").collect()
    // both shortlisted candidates score 1000000/61 + 1000000/62 = 32522;
    // the tie breaks on neighbor id; candidate 3 made neither shortlist
    assert(got.length === 2)
    assert(got.map(_.getLong(1)).toSeq === Seq(1L, 2L))
    assert(got.map(_.getLong(3)).toSeq === Seq(32522L, 32522L))
    assert((got(0).getLong(4), got(0).getLong(5)) === ((1L, 2L)))
    assert((got(1).getLong(4), got(1).getLong(5)) === ((2L, 1L)))
  }

  test("rrfFuseTopK: a one-system candidate carries a NULL rank for the other") {
    val corpus = Seq(
      (1L, Array(4.0f, 0.0f)),
      (2L, Array(0.5f, 0.4f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.rrfFuseTopK(corpus, queries, "vec_id", "embedding",
        perSystemK = 1, k0 = 60, k = 2)
      .orderBy("neighbor_id").collect()
    // id 1 tops cosine only, id 2 tops l2 only: each contributes 1000000/61
    assert(got.length === 2)
    assert(got(0).getLong(4) === 1L)
    assert(got(0).isNullAt(5), "cos-only candidate must carry NULL l2 rank")
    assert(got(1).isNullAt(4))
    assert(got(1).getLong(5) === 1L)
    assert(got.map(_.getLong(3)).toSeq === Seq(16393L, 16393L))
  }

  test("uniformNegatives: exact md5 draw, null-safe label law, bounded k") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Some(0)), (2L, Some(0)), (3L, Some(1)), (4L, Some(1)),
      (5L, None.asInstanceOf[Option[Int]]))
      .toDF("vec_id", "label")
    val queries = corpus.filter($"vec_id" === 1L)
    val got = Similarity.uniformNegatives(corpus, queries, "vec_id", "label", k = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // candidates: 3, 4 (label 1) and 5 (NULL label — negative for a
    // labeled query); 2 shares the label and 1 is the query itself
    def draw(q: Long, c: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      graft.functions.TextFns.hexBytes(
        md.digest(s"graft${q}_$c".getBytes("UTF-8")))
    }
    val want = Seq(3L, 4L, 5L).sortBy(c => (draw(1L, c), c)).take(2)
      .zipWithIndex.map { case (c, i) => (c, i + 1L) }
    assert(got.toSeq === want)
  }

  test("uniformNegatives: NULL-vs-NULL is same-label and never drawn") {
    import spark.implicits._
    val corpus = Seq((1L, None.asInstanceOf[Option[Int]]),
      (2L, None.asInstanceOf[Option[Int]]), (3L, Some(9)))
      .toDF("vec_id", "label")
    val got = Similarity.uniformNegatives(
        corpus, corpus.filter($"vec_id" === 1L), "vec_id", "label", k = 5)
      .collect().map(_.getLong(1)).toSet
    assert(got === Set(3L), "a NULL-label query must only draw labeled candidates")
  }
  test("cosineHistogram: planted identical/orthogonal/opposite pairs land in their bins; NaN drops") {
    import spark.implicits._
    // shift=10: pairs (0,10) identical -> bin 9; (1,11) orthogonal -> bin 0;
    // (2,12) opposite -> clamped bin -10; (3,13) zero-norm -> NaN, dropped
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (10L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f)), (11L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 0.0f)), (12L, Array(-1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f)), (13L, Array(1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.cosineHistogram(vecs, "vec_id", "embedding",
      shift = 10L, halfBins = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(9L -> ((1L, 333333L)), 0L -> ((1L, 333333L)),
      -10L -> ((1L, 333333L))))
  }
}
