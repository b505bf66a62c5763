package graft.ops

import graft.SparkSpec

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponents(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two disjoint cliques get their min ids as labels") {
    val got = components(Seq((3L, 1L), (1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a long chain converges within the pointer-jumping bound") {
    // path graph 0-1-2-…-100: diameter 100. Plain min-propagation needs 100
    // rounds; the pointer-jumping variant must land well inside maxIter=32
    // (≈ log₂ 100 + slack). maxIter=12 proves the log behavior: if the jump
    // step regressed to linear propagation this returns unconverged labels.
    val chain = (0L until 100L).map(i => (i, i + 1))
    val got = Clusters.connectedComponents(chain.toDF("s", "d"), "s", "d", maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 101)
    assert(got.values.forall(_ === 0L))
  }

  test("self-loops and duplicate/reversed edges are harmless") {
    val got = components(Seq((5L, 5L), (7L, 6L), (6L, 7L), (7L, 6L)))
    // pure self-loop vertices are dropped (no actual edge); the 6-7 pair folds
    assert(got === Map(6L -> 6L, 7L -> 6L))
  }

  test("empty edge frame yields empty labels") {
    assert(components(Seq.empty) === Map.empty)
  }

  test("maxIter exhaustion throws instead of returning partial labels") {
    // diameter-4 path with maxIter=1: one neighbor-min + one jump round
    // cannot reach the far end, and silently-partial labels would let dedup
    // keep duplicate survivors — the contract is to fail loudly
    val chain = (0L until 5L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException] {
      Clusters.connectedComponents(chain.toDF("s", "d"), "s", "d", maxIter = 1)
        .collect()
    }
    assert(ex.getMessage.contains("maxIter=1"))
  }

  test("property: random graphs match a union-find reference") {
    // seeded random edge lists of varied density vs a driver-side disjoint-set
    // with min-id relabeling — the distributed fixpoint must agree exactly
    val rnd = new scala.util.Random(7L)
    for (trial <- 1 to 5) {
      val nVerts = 20 + rnd.nextInt(60)
      val nEdges = rnd.nextInt(2 * nVerts)
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(nVerts).toLong, rnd.nextInt(nVerts).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
        // min-id per root: path compression above may leave non-min roots,
        // so normalize by grouping members under their root first
        val expected = verts.groupBy(find).flatMap { case (_, members) =>
          val m = members.min
          members.map(_ -> m)
        }
        assert(components(edges) === expected, s"trial $trial")
      }
    }
  }

  test("dedupClusters: survivors are exactly one per component") {
    val pairs = Seq((1L, 2L), (2L, 4L), (9L, 8L)).toDF("id_a", "id_b")
    val cl = Clusters.dedupClusters(pairs)
    val byCluster = cl.collect().map(r => r.getLong(1) -> r.getLong(0))
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSet }
    assert(byCluster === Map(1L -> Set(1L, 2L, 4L), 8L -> Set(8L, 9L)))
    // survivor rule: id == cluster_id picks exactly one per component
    val survivors = cl.filter($"doc_id" === $"cluster_id").collect().map(_.getLong(0)).toSet
    assert(survivors === Set(1L, 8L))
  }

  test("a caller-checkpointed edges frame survives the internal cleanup") {
    // The internal checkpoint release must free ONLY the RDDs the fixpoint
    // itself created. Handing in a localCheckpoint()ed pair frame — the
    // idiomatic move when pairs are reused (cf. CurateDemo) — and then
    // reusing it after the call must not hit the caller's truncated-lineage
    // blocks (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND if cleanup overreaches).
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
      .localCheckpoint()
    val first = Clusters.dedupClusters(pairs).collect()
    assert(first.length === 5)
    // later uses of the caller's frame: a plain action AND a second full run
    assert(pairs.count() === 3L)
    val second = Clusters.dedupClusters(pairs).collect()
    assert(second.map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      first.map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("semdedup prune law: exactly one min-id exemplar per cluster; singletons keep themselves") {
    val rows = graft.queries.Registry.qSemdedupPrune(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    val corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    assert(rows.length.toLong === corpus, "every corpus vector must be classified")
    rows.groupBy(_._2).foreach { case (cid, members) =>
      val keepers = members.filter(_._3)
      assert(keepers.length === 1, s"cluster $cid must keep exactly one exemplar")
      assert(keepers.head._1 === cid, s"cluster $cid exemplar must be the min-id label")
      assert(members.map(_._1).min === cid, s"cluster $cid label must be its min member")
    }
    // the prune is non-trivial on this corpus: some cluster has >1 member
    assert(rows.exists(r => !r._3), "fixture corpus must contain at least one prunable near-dup")
  }
}
