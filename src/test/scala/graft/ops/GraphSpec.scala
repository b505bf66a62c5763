package graft.ops

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iterations: Int,
      symmetrize: Boolean = true): Map[Long, Long] = {
    val e = edges.toDF("s", "d")
    val in = if (symmetrize) Graph.symmetrized(e, "s", "d") else e
    Graph.pageRankMicro(in,
        if (symmetrize) "src" else "s", if (symmetrize) "dst" else "d",
        iterations)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("path graph matches the hand-computed integer law, two rounds") {
    // sym edges (1,2),(2,1),(2,3),(3,2); outdeg 1,2 / 2 / 1
    // r1: 1 -> 150000+425000, 2 -> 150000+850000+850000, 3 like 1
    // r2: 1 -> 150000+786250, 2 -> 150000+488750·2, 3 like 1
    assert(ranksOf(Seq((1L, 2L), (2L, 3L)), iterations = 1) ===
      Map(1L -> 575000L, 2L -> 1850000L, 3L -> 575000L))
    assert(ranksOf(Seq((1L, 2L), (2L, 3L)), iterations = 2) ===
      Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L))
  }

  test("directed edge: the sink receives, the source keeps only teleport mass") {
    assert(ranksOf(Seq((1L, 2L)), iterations = 1, symmetrize = false) ===
      Map(1L -> 150000L, 2L -> 1000000L))
  }

  test("duplicate, reversed and self-loop edges collapse under symmetrization") {
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (7L, 7L))
    // self-loop node 7 drops (no real edge); rest equals the clean path
    assert(ranksOf(noisy, iterations = 2) ===
      ranksOf(Seq((1L, 2L), (2L, 3L)), iterations = 2))
  }

  test("symmetric ranks are permutation-invariant and favor the hub") {
    // star: hub 10 connected to 11..15 — hub must outrank every leaf, and
    // all leaves tie by symmetry
    val star = (11L to 15L).map(l => (10L, l))
    val got = ranksOf(star, iterations = 5)
    val leaves = (11L to 15L).map(got)
    assert(leaves.distinct.size === 1, "symmetric leaves must tie exactly")
    assert(got(10L) > leaves.head)
  }

  test("seeded (TrustRank) form: mass flows only from seeds; unreachable nodes hold exactly 0") {
    import org.apache.spark.sql.functions.col
    // two components: 1-2-3 path (seed 1) and isolated pair 10-11 (no seed)
    val edges = Graph.symmetrized(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("s", "d"), "s", "d")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val got = Graph.pageRankMicro(edges, "src", "dst", iterations = 3,
        seeds = Some(seeds))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(10L) === 0L && got(11L) === 0L,
      s"nodes unreachable from the seed must hold exactly 0: $got")
    assert(got(1L) > 0L && got(2L) > 0L && got(3L) > 0L)
    // hand-check round 1: r0 = (1e6, 0, 0); outdeg 1→{2}: 1, 2→{1,3}: 2, 3: 1
    // r1(1) = 150000 + 0 (node 2 holds 0); r1(2) = 0 + 850000; r1(3) = 0
    val oneRound = Graph.pageRankMicro(edges, "src", "dst", iterations = 1,
        seeds = Some(seeds))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(oneRound === Map(1L -> 150000L, 2L -> 850000L, 3L -> 0L,
      10L -> 0L, 11L -> 0L))
  }

  test("seeded form with every node a seed equals the classic form") {
    import org.apache.spark.sql.functions.col
    val edges = Graph.symmetrized(
      Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d"), "s", "d")
    val allNodes = Seq(1L, 2L, 3L, 4L).map(Tuple1(_)).toDF("node")
    val classic = Graph.pageRankMicro(edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seeded = Graph.pageRankMicro(edges, "src", "dst", iterations = 3,
        seeds = Some(allNodes))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(classic === seeded)
  }

  test("the round-chain mechanism: lazy joins over ONE checkpointed frame reuse its exchange") {
    // the 100 TB property pageRankMicro's internal loop relies on (its
    // own final plan materializes eagerly so the working set can release
    // — not inspectable post-hoc): round subtrees over the same
    // checkpointed leaf are plan-identical, so the leaf's shuffle runs
    // once and later rounds read the reused stage. This pins the Spark
    // mechanism with the operator's exact shape. (A per-round
    // localCheckpoint was measured WORSE: block scans do not preserve
    // hash partitioning, so every round re-exchanged the edges.)
    import org.apache.spark.sql.functions._
    val (ewd, owned) = Clusters.ownedCheckpoint(
      spark.range(2000).select(col("id").as("src"),
        ((col("id") + 7L) % 2000L).as("dst"), lit(1L).as("outdeg")))
    try {
      var ranks = spark.range(2000).select(col("id").as("node"),
        lit(1000000L).as("rank_micro"))
      for (_ <- 1 to 3) {
        val contribs = ewd.join(ranks, ewd("src") === ranks("node"))
          .select(col("dst").as("node"),
            expr("(rank_micro * 85L) div (100L * outdeg)").as("_c"))
          .groupBy(col("node")).agg(sum(col("_c")).as("_in"))
        ranks = ranks.select(col("node"))
          .join(contribs, Seq("node"), "left")
          .select(col("node"),
            (lit(150000L) + coalesce(col("_in"), lit(0L))).as("rank_micro"))
      }
      ranks.collect()
      val p = ranks.queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange"),
        s"rounds stopped sharing the checkpointed frame's exchange:\n${p.take(4000)}")
      assert(!p.contains("CartesianProduct"), p.take(4000))
    } finally Clusters.release(owned)
  }

  test("checkpointEvery bounds plan depth without changing a single rank") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    def run(every: Int) = ranksOf(edges, iterations = 6) ->
      Graph.pageRankMicro(
        Graph.symmetrized(edges.toDF("s", "d"), "s", "d"), "src", "dst",
        iterations = 6, checkpointEvery = every)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (lazy8, cp2) = run(2) // checkpoints after rounds 2 and 4
    assert(lazy8 === cp2,
      "materialization cadence must be invisible to the integer law")
  }

  test("shared working set: two laws over one prepare() equal their edge-form twins") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)).toDF("s", "d")
    val seeds = Seq(1L).toDF("node")
    def m(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one prepared (symmetrized) working set feeds classic AND seeded law
    val ws = Graph.prepareWorkingSet(e, "s", "d", symmetrize = true)
    val classic = m(Graph.pageRankMicro(ws, 3, 85L, 100L, 1000000L, None,
      "node", 8))
    val seeded = m(Graph.pageRankMicro(ws, 3, 85L, 100L, 1000000L,
      Some(seeds), "node", 8))
    ws.release()
    // edge-form twins: symmetrize=true folds the undirected form into
    // the working-set build — must equal symmetrized()-then-rank
    assert(classic === m(Graph.pageRankMicro(
      Graph.symmetrized(e, "s", "d"), "src", "dst", iterations = 3)))
    assert(classic === m(Graph.pageRankMicro(e, "s", "d",
      iterations = 3, symmetrize = true)))
    assert(seeded === m(Graph.pageRankMicro(e, "s", "d",
      iterations = 3, seeds = Some(seeds), symmetrize = true)))
    assert(seeded !== classic,
      "seeded law must differ from classic on a non-trivial seed set")
  }

  test("total mass stays within floor-truncation of the invariant sum") {
    // mass conservation up to ≤1 micro lost per edge per round: the sum
    // after any round stays in (n·init − rounds·edges, n·init]
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val got = ranksOf(edges, iterations = 5)
    val total = got.values.sum
    val n = 4L
    val symEdgeCount = 10L // 5 undirected pairs, both directions
    assert(total <= n * 1000000L)
    assert(total > n * 1000000L - 5L * symEdgeCount * 2L)
  }

  test("degreeDistribution: exact counts, parallel edges collapse, self-loops/NULLs drop") {
    import spark.implicits._
    // 1->2, 1->3, 1->3 (parallel), 2->3, 3->3 (self), NULL row
    val e = Seq((1L, 2L), (1L, 3L), (1L, 3L), (2L, 3L), (3L, 3L))
      .toDF("s", "d")
      .unionByName(Seq((Option.empty[Long], Option(9L))).toDF("s", "d"))
    val got = Graph.degreeDistribution(e, "s", "d")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // out: node 1 deg 2, node 2 deg 1 -> {(out,2)->1, (out,1)->1}
    // in:  node 2 deg 1, node 3 deg 2 -> {(in,1)->1, (in,2)->1}
    assert(got === Map(("out", 2L) -> 1L, ("out", 1L) -> 1L,
      ("in", 1L) -> 1L, ("in", 2L) -> 1L), s"got $got")
    // row count bounded by distinct degrees, never |V|
    assert(Graph.degreeDistribution(e, "s", "d").count() === 4L)
  }

  test("triangleStats: planted triangle census; dup/reverse/self-loop edges collapse") {
    import spark.implicits._
    // triangle {1,2,3} + pendant 4 on 1 + isolated edge 5-6, contaminated
    // with a parallel duplicate, a reverse duplicate and a self-loop
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (2L, 3L), (2L, 3L), (1L, 4L),
      (5L, 6L), (3L, 3L)).toDF("s", "d")
    val r = Graph.triangleStats(e, "s", "d").collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(0) === 6L, "n_nodes")
    assert(row.getLong(1) === 5L, "n_edges")
    // degrees: 1:3, 2:2, 3:2, 4:1, 5:1, 6:1 -> wedges 3+1+1 = 5
    assert(row.getLong(2) === 5L, "n_wedges (DECIMAL(38,0) Σ, BIGINT output)")
    assert(row.getLong(3) === 1L, "n_triangles")
    // clustering = 3*1/5 = 0.6 exactly
    assert(row.getLong(4) === 600000000000L, "clustering_pico")
  }

  test("triangleStats: K4 counts all four triangles; empty graph reports zeros with NULL coefficient") {
    import spark.implicits._
    val k4 = (for (i <- 1 to 4; j <- 1 to 4 if i < j) yield (i.toLong, j.toLong))
      .toDF("s", "d")
    val row = Graph.triangleStats(k4, "s", "d").collect().head
    assert(row.getLong(3) === 4L, "K4 has C(4,3)=4 triangles")
    assert(row.getLong(2) === 12L, "K4 wedges: 4 nodes * C(3,2)")
    assert(row.getLong(4) === 1000000000000L, "K4 clustering is exactly 1")
    val empty = Seq.empty[(Long, Long)].toDF("s", "d")
    val z = Graph.triangleStats(empty, "s", "d").collect().head
    assert((z.getLong(0), z.getLong(1), z.getLong(2), z.getLong(3)) ===
      ((0L, 0L, 0L, 0L)))
    assert(z.isNullAt(4), "no wedges -> NULL coefficient, not a fake 0")
  }

  test("labelPropagation: bridged cliques stay separate communities; P2 converges via self-vote; star collapses to center") {
    import spark.implicits._
    // two K3s joined by a bridge 3-4: connected components would merge
    // them, LPA must not
    val bridged = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("s", "d")
    val lbl = Graph.labelPropagation(bridged, "s", "d", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl(1L) === lbl(2L) && lbl(2L) === lbl(3L))
    assert(lbl(4L) === lbl(5L) && lbl(5L) === lbl(6L))
    assert(lbl(1L) !== lbl(4L), "the bridge must not merge the cliques")
    // a single edge oscillates under plain synchronous LPA; the
    // self-inclusive vote converges both endpoints to the min label
    val p2 = Seq((7L, 9L)).toDF("s", "d")
    val l2 = Graph.labelPropagation(p2, "s", "d", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l2 === Map(7L -> 7L, 9L -> 7L))
    // star: everyone adopts the center's (minimal) label in one round
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("s", "d")
    val ls = Graph.labelPropagation(star, "s", "d", rounds = 2)
      .collect().map(_.getLong(1)).toSet
    assert(ls === Set(0L))
  }

  test("adamicAdar: path/square hand-scores, edge exclusion, apex-degree cap") {
    import spark.implicits._
    val invLn2 = math.round(1.0e12 / math.log(2.0))
    // path 1-2-3: only (1,3) shares a neighbor (apex 2, deg 2)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val p = Graph.adamicAdar(path, "s", "d").collect()
    assert(p.length === 1)
    assert((p.head.getLong(0), p.head.getLong(1), p.head.getLong(2),
      p.head.getLong(3)) === ((1L, 3L, 1L, invLn2)))
    // square 1-2-3-4: diagonals (1,3) and (2,4) each via TWO deg-2 apexes
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "d")
    val q = Graph.adamicAdar(sq, "s", "d").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(q === Map((1L, 3L) -> ((2L, 2 * invLn2)),
      (2L, 4L) -> ((2L, 2 * invLn2))))
    // star: the only shared-neighbor apex is the center — above the cap
    // it contributes nothing
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("s", "d")
    assert(Graph.adamicAdar(star, "s", "d", maxApexDegree = 2L).count() === 0L)
    assert(Graph.adamicAdar(star, "s", "d").count() === 3L)
  }

  test("adamicAdar: a top-k boundary INSIDE an equal-score plateau is deterministic by the (score desc, u, v) tiebreak") {
    import spark.implicits._
    // 12-leaf star: every leaf pair shares exactly the center (deg 12), so
    // ALL C(12,2) = 66 scored pairs sit on ONE plateau — k = 10 cuts
    // inside it, the registry's q_adamic_adar shape at sf0.01 (853-row
    // boundary plateau, r12 adjudication) in miniature. The law must
    // return the lexicographically-first k pairs, identically every run.
    val star12 = (1 to 12).map(i => (0L, i.toLong)).toDF("s", "d")
    val expect = (for (u <- 1L to 12L; v <- (u + 1) to 12L) yield (u, v))
      .sorted.take(10)
    (1 to 2).foreach { _ =>
      val got = Graph.adamicAdar(star12, "s", "d", k = 10).collect()
      assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq === expect)
      // the plateau premise: every returned score is the same pico value
      assert(got.map(_.getLong(3)).distinct.length === 1)
    }
  }

  test("localClustering: K4+pendant hand-law; deg<2 excluded; open wedge scores 0; tiebreak by node") {
    import spark.implicits._
    // K4 on 1-4 with pendant 5 on 1: per-node triangles 3 each in the K4;
    // lcc(1) = 3/C(4,2) = 0.5 (the pendant dilutes), lcc(2..4) = 3/3 = 1,
    // node 5 (deg 1) unrankable
    val k4p = ((for (i <- 1 to 4; j <- 1 to 4 if i < j)
      yield (i.toLong, j.toLong)) :+ ((1L, 5L))).toDF("s", "d")
    val ws = Graph.prepareUndirected(k4p, "s", "d")
    val got = try Graph.localClustering(ws, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    finally ws.release()
    assert(got.toSeq === Seq(
      (2L, 3L, 3L, 1000000000000L), (3L, 3L, 3L, 1000000000000L),
      (4L, 3L, 3L, 1000000000000L), (1L, 4L, 3L, 500000000000L)),
      "1.0-plateau orders by node; pendant node 5 excluded")
    // open path 1-2-3: apex 2 has deg 2, a wedge, and NO triangle → 0
    val path = Graph.prepareUndirected(
      Seq((1L, 2L), (2L, 3L)).toDF("s", "d"), "s", "d")
    val p = try Graph.localClustering(path, k = 5).collect()
    finally path.release()
    assert(p.map(r => (r.getLong(0), r.getLong(3))).toSeq === Seq((2L, 0L)))
  }

  test("linkPredictionScored: path/square hand-scores, full-degree Jaccard/PA beside the capped pair law") {
    import spark.implicits._
    def scores(edges: Seq[(Long, Long)], cap: Long = 256L) = {
      val ws = Graph.prepareUndirected(edges.toDF("s", "d"), "s", "d")
      try Graph.linkPredictionScored(ws, cap).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      finally ws.release()
    }
    // path 1-2-3: pair (1,3), apex 2 (deg 2): ra = 1e12 div 2; deg(1) =
    // deg(3) = 1 → jaccard = 1/(1+1−1) = 1 exactly; pa = 1·1
    assert(scores(Seq((1L, 2L), (2L, 3L))) ===
      Map((1L, 3L) -> ((1L, 500000000000L, 1000000000000L, 1L))))
    // square 1-2-3-4: diagonal (1,3) via apexes 2 and 4 (deg 2 each):
    // ra = 2·(1e12 div 2) = 1e12; jaccard = 2/(2+2−2) = 1; pa = 4
    val sq = scores(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(sq === Map((1L, 3L) -> ((2L, 1000000000000L, 1000000000000L, 4L)),
      (2L, 4L) -> ((2L, 1000000000000L, 1000000000000L, 4L))))
    // star: center above the cap contributes nothing (AA's cap law)
    assert(scores(Seq((0L, 1L), (0L, 2L), (0L, 3L)), cap = 2L).isEmpty)
    // kite 1-2-3 + 2-4: pair (1,3) apex 2 has FULL deg 3 (the capped
    // pair law) → ra = 1e12 div 3 = 333333333333 (truncating integral
    // division, not round — 0.333… would round to …33 anyway; deg 6
    // would differ: div → 166666666666, round → …67)
    val kite = scores(Seq((1L, 2L), (2L, 3L), (2L, 4L)))
    assert(kite((1L, 3L)) === ((1L, 333333333333L, 1000000000000L, 1L)))
  }

  test("corenessEstimate: converges exactly to planted core numbers; super-hub of pendants stays coreness 1") {
    import spark.implicits._
    // K4 on 1-4 with pendant 5: core numbers {3,3,3,3,1}
    val k4p = ((for (i <- 1 to 4; j <- 1 to 4 if i < j)
      yield (i.toLong, j.toLong)) :+ ((1L, 5L))).toDF("s", "d")
    val g1 = Graph.corenessEstimate(k4p, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g1 === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 1L))
    // triangle 1-2-3 with tail 3-4-5: degree says node 4 matters (deg 2),
    // coreness says it peels: {2,2,2,1,1}
    val triTail = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("s", "d")
    val g2 = Graph.corenessEstimate(triTail, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g2 === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
    // the degree-vs-coreness separation: a star hub has deg 40 and
    // coreness 1 — the pendant-spam super-node degree can't expose
    val star = (1L to 40L).map(i => (0L, i)).toDF("s", "d")
    val g3 = Graph.corenessEstimate(star, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g3.values.forall(_ === 1L), s"star coreness must be all 1: $g3")
  }

  test("hitsMicro: bipartite hand-computed rounds; sinks hold hub 0; empty sides stay 0") {
    import spark.implicits._
    // s1 -> {c1, c2}, s2 -> {c1}; suppliers 10/20, customers 31/32
    val e = Seq((10L, 31L), (10L, 32L), (20L, 31L)).toDF("s", "d")
    val got = Graph.hitsMicro(e, "s", "d", rounds = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // round 1: rawA c1=2e6, c2=1e6 -> auth 1e6 / 500000; rawH s1=1.5e6,
    // s2=1e6 -> hub 1e6 / 666667
    // round 2: rawA c1=1666667, c2=1e6 -> auth 1e6 / 600000;
    // rawH s1=1.6e6, s2=1e6 -> hub 1e6 / 625000
    assert(got(31L) === ((1000000L, 0L)), "c1: top authority, sink hub 0")
    assert(got(32L) === ((600000L, 0L)))
    assert(got(10L) === ((0L, 1000000L)), "s1: top hub, source auth 0")
    assert(got(20L) === ((0L, 625000L)))
  }

  test("assortativity: star is exactly -1, regular cycle is NULL, empty is NULL") {
    import spark.implicits._
    // S3 star: center 0, leaves 1..3; Newman's r = -1 for any star
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("s", "d")
    val s = Graph.assortativity(star, "s", "d").collect().head
    assert(s.getLong(0) === 6L, "m_directed = 2|E|")
    assert(s.getLong(1) === 12L, "sum of endpoint degrees over copies")
    assert(s.getLong(2) === -1000000000000L, "star assortativity is exactly -1")
    // C4 cycle: degree-regular -> zero variance -> NULL by law
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "d")
    val c = Graph.assortativity(cyc, "s", "d").collect().head
    assert(c.isNullAt(2), "regular graph has undefined assortativity")
    val empty = Seq.empty[(Long, Long)].toDF("s", "d")
    val z = Graph.assortativity(empty, "s", "d").collect().head
    assert(z.getLong(0) === 0L && z.getLong(1) === 0L && z.isNullAt(2))
  }

  test("edgeTriangleSupport: K4 edges support 2, pendant edge supports 0") {
    import spark.implicits._
    // K4 on 1..4 (every edge in exactly 2 triangles) + pendant 4-5
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("s", "d")
    val g = Graph.prepareUndirected(edges, "s", "d")
    try {
      val tri = Graph.triangleFrame(g)
      val got = Graph.edgeTriangleSupport(g, tri, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got((4L, 5L)) === 0L, "pendant edge closes no triangle")
      assert(got.filterNot(_._1 == ((4L, 5L))).values.toSet === Set(2L),
        "every K4 edge sits in exactly 2 triangles")
      assert(got.size === 7)
    } finally g.release()
  }

  test("partitionModularity: two disjoint triangles split by label; hand-exact Q") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), // triangle A
      (11L, 12L), (12L, 13L), (11L, 13L)) // triangle B
      .toDF("s", "d")
    val labels = Seq((1L, "A"), (2L, "A"), (3L, "A"),
      (11L, "B"), (12L, "B"), (13L, "B")).toDF("n", "l")
    val g = Graph.prepareUndirected(edges, "s", "d")
    try {
      val rows = Graph.partitionModularity(g, labels, "n", "l").collect()
      val m = rows.map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      // per community: e_c=3, d_c=6, m=6 → Q_c = 3/6 − (6/12)² = 0.25
      assert(m("A") === ((3L, 3L, 6L, 250000000000L)))
      assert(m("B") === ((3L, 3L, 6L, 250000000000L)))
      assert(m("__total") === ((6L, 6L, 12L, 500000000000L)))
      // ASCII: uppercase labels sort before '_', lowercase after
      assert(rows.last.getString(0) === "__total")
    } finally g.release()
  }

  test("partitionModularity: a cross-label bridge counts toward m and degrees only") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 11L), // bridge 3-11
      (11L, 12L), (12L, 13L), (11L, 13L)).toDF("s", "d")
    val labels = Seq((1L, "A"), (2L, "A"), (3L, "A"),
      (11L, "B"), (12L, "B"), (13L, "B")).toDF("n", "l")
    val g = Graph.prepareUndirected(edges, "s", "d")
    try {
      val m = Graph.partitionModularity(g, labels, "n", "l")
        .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
      // m=7; each side: e_c=3, d_c=7 → Q_c = 3/7 − (7/14)² = 3/7 − 1/4
      val want = math.round((3.0 / 7.0 - 0.25) * 1e12)
      assert(m("A") === want && m("B") === want)
      assert(m("__total") === 2L * want)
    } finally g.release()
  }

  test("richClub: K4 + pendant hand-exact profile; sub-2 club NULL phi") {
    // K4 on 1..4 (deg 3,3,3 and 4 for the pendant anchor) + pendant 5-1
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L)).toDF("src", "dst")
    val rows = Graph.richClub(edges, "src", "dst").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // thresholds 1, 2, 4 (≤ max degree 4)
    assert(rows.keySet === Set(1L, 2L, 4L))
    // deg > 1: the K4 nodes; all 6 K4 edges have min-endpoint degree 3;
    // the pendant edge (min deg 1) is outside the club → φ = 12/12 = 1
    assert(rows(1L) === ((4L, 6L, Some(1.0))))
    assert(rows(2L) === ((4L, 6L, Some(1.0))))
    // deg > 4: empty club — φ undefined, not 0
    assert(rows(4L) === ((0L, 0L, None)))
  }

  test("reciprocity: mutual fraction exact; self-loops and duplicates drop; empty NULL") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 3L), (4L, 4L))
      .toDF("src", "dst")
    val r = Graph.reciprocity(e, "src", "dst").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((3L, 2L)))
    assert(r.getDouble(2) === 2.0 / 3.0)
    val none = Graph.reciprocity(
      Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst")
      .collect().head
    assert(none.getLong(0) === 0L && none.isNullAt(2))
  }
}
