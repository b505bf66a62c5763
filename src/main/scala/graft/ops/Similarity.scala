package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane-LSH bucketed variant as the scale path.
  *
  * Dot products and norms are explicit left-fold expression trees in DOUBLE
  * (cast from float first), so the arithmetic is reproducible bit-for-bit
  * across engines (the DuckDB oracle uses the same sequential formula).
  *
  * Scale shape: brute-force is queries × corpus — only viable with a small
  * broadcast query set (it is exactly the verification oracle). The LSH/IVF
  * top-k paths keep the corpus side NARROW (signatures/cells computed in one
  * pass, bounded query batch broadcast onto it); only the candidate set
  * reaches a shuffle. The all-pairs near-dup path shuffles both sides once
  * on the bucket key, turning the cross join into a per-bucket join; recall
  * is tuned by planes/probes.
  */
object Similarity {

  /** Σ aᵢ·bᵢ as a sequential left fold (order-stable). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Embedding dimensionality, read once at plan time (first row). */
  private def vecDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head().getInt(0)

  /** cosine(a,b) = dot/(norm(a)*norm(b)) — fixed op order. Declarative
    * fold form; the operators below use the codegen'd
    * [[graft.functions.CosineSimilarity]] expression (same op order, same
    * bits, one fused loop instead of an interpreted three-pass HOF chain).
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Native cosine, registering the function on first use. */
  private def nativeCosine(df: DataFrame, a: Column, b: Column): Column = {
    graft.functions.CosineSimilarity.register(df.sparkSession)
    graft.functions.CosineSimilarity.cosine(a, b)
  }

  /** The ANN query-side boundedness bound: every ANN entry point either
    * BROADCASTS the query frame ([[bruteForceTopK]], [[hardNegatives]],
    * the MMR family, LSH/IVF probes) or materializes per-query driver
    * state ([[pqTopK]]'s ADC lookup tables), so an unbounded query frame
    * is a driver/executor OOM at 100 TB, not a slow query. The bound is
    * ENFORCED (the [[Drift]] guardValueDomain posture — a contract in
    * the plan, not a scaladoc note): session-configurable via
    * `graft.ann.maxQueryRows`, raise it deliberately or batch your
    * queries (chunk the query frame, union the per-chunk top-k — ranks
    * are per-query, so the union IS the unbatched answer).
    */
  private[ops] def maxQueryRows(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.get("graft.ann.maxQueryRows", "4096").toInt

  /** In-plan guard on a query frame about to be broadcast: a 1-row count
    * crossed under the broadcast hint + `assert_true`, so the failure
    * fires inside the job that would have broadcast the oversized frame
    * (no extra driver job) with a batch-your-queries message.
    */
  private def guardQuerySide(q: DataFrame, op: String): DataFrame = {
    val bound = maxQueryRows(q.sparkSession)
    val nq = q.agg(count(lit(1)).as("_nq"))
    q.crossJoin(broadcast(nq))
      .filter(coalesce(
        assert_true(col("_nq") <= bound,
          lit(s"$op: query frame exceeds graft.ann.maxQueryRows=$bound rows — " +
            "the query side is broadcast by design; batch your queries " +
            "(chunk the query frame and union the per-chunk top-k) or raise " +
            "the bound deliberately")).cast("boolean"),
        lit(true)))
      .drop("_nq")
  }

  /** Shared broadcast-topk shape: corpus rows joined to the broadcast query
    * side under `cond` (built from the projected `_extra` query columns /
    * corpus columns), cosine-scored, per-query rank window, top k. Both
    * [[bruteForceTopK]] and [[hardNegatives]] are this with a different
    * join predicate — one definition so the tie law, broadcast hint and
    * rank filter can never drift apart. The query side carries the
    * [[guardQuerySide]] boundedness assert.
    */
  private def broadcastTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      extraCols: Seq[(String, String)], cond: Column): DataFrame = {
    val q = guardQuerySide(
      queries.select((Seq(col(idCol).as("query_id"), col(vecCol).as("_qv")) ++
        extraCols.map { case (c0, a) => col(c0).as(s"_q$a") }): _*),
      "broadcastTopK")
    val c = corpus.select((Seq(col(idCol).as("neighbor_id"), col(vecCol).as("_cv")) ++
      extraCols.map { case (c0, a) => col(c0).as(s"_c$a") }): _*)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), cond)
      .withColumn("sim", nativeCosine(corpus, col("_qv"), col("_cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Exact cosine top-k: for each query vector, the k nearest corpus rows.
    * `queries` should be small (it is broadcast); ties break on corpus id.
    * Output: (query_id, neighbor_id, sim, rank).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, excludeSelf: Boolean = true): DataFrame =
    broadcastTopK(corpus, queries, idCol, vecCol, k, Seq.empty,
      if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))

  /** Deterministic pseudo-random ±1 hyperplane component for (plane, dim):
    * +1 iff the top bit of md5("graftplane:plane:dim") is 0, i.e. iff the
    * first hex nibble is '0'-'7'. md5 rather than a splitmix avalanche
    * deliberately (r10 verdict task 1): md5 is THE hash both engines
    * share, so the hyperplanes — and with the fixed-order dot products,
    * every bucket id and the whole LSH top-k — replay exactly in the
    * DuckDB oracle. No RNG state, reproducible on any cluster; computed
    * once per (plane, dim) at PLAN time (tables·planes·dim calls, a few
    * thousand), never per row.
    */
  private[ops] def planeComponent(plane: Int, dim: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"graftplane:$plane:$dim"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if ((d(0) & 0x80) == 0) 1.0 else -1.0
  }

  /** Hyperplane as a literal vector — planes are plan-time constants, so the
    * per-row work is a plain fold (no per-element hashing inside the lambda,
    * which would run planes×dim interpreted hash calls per row).
    */
  private def planeLit(plane: Int, dim: Int): Column =
    typedLit((0 until dim).map(planeComponent(plane, _)))

  /** LSH bucket id: `planes` sign bits of hyperplane projections. `dim` must
    * match the embedding length (hyperplanes are plan-time literals);
    * `planeOffset` selects a disjoint slice of the plane index space so
    * independent tables use independent hyperplanes.
    */
  def lshBucket(vec: Column, planes: Int, dim: Int, planeOffset: Int = 0): Column = {
    val proj = (0 until planes).map { p =>
      val s = dot(vec, planeLit(planeOffset + p, dim))
      when(s >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    proj.reduce(_ + _)
  }

  /** Explode a frame into one row per (table, bucket) signature — per-table
    * planes use disjoint slices of the plane index space. Object-boundary
    * Scala (not expression folds): planes×tables interpreted HOF folds per
    * row are ~1000× a plain loop, and the closure is opaque to optimizer
    * expression duplication (cf. Dedup.shingleHashFrame).
    */
  private def bucketSignatures(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String, planes: Int, tables: Int, dim: Int,
      shuffle: Boolean = true, probes: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val planeVecs = Array.tabulate(tables * planes, dim)(planeComponent)
    val sigs = df.select(col(idCol).cast("long").as("_bid"), col(vecCol).as("_bv"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.flatMap { case (id, v) =>
        if (probes <= 0) {
          // corpus-side / near-dup path: keep the inner loop allocation-free
          (0 until tables).iterator.map { t =>
            var bucket = 0L
            var p = 0
            while (p < planes) {
              val plane = planeVecs(t * planes + p)
              var s = 0.0
              var i = 0
              val d = math.min(v.length, dim)
              while (i < d) { s += v(i).toDouble * plane(i); i += 1 }
              if (s >= 0) bucket |= (1L << p)
              p += 1
            }
            (id, v, t, bucket)
          }
        } else (0 until tables).iterator.flatMap { t =>
          var bucket = 0L
          val margins = new Array[Double](planes)
          var p = 0
          while (p < planes) {
            val plane = planeVecs(t * planes + p)
            var s = 0.0
            var i = 0
            val d = math.min(v.length, dim)
            while (i < d) { s += v(i).toDouble * plane(i); i += 1 }
            if (s >= 0) bucket |= (1L << p)
            margins(p) = math.abs(s)
            p += 1
          }
          // multi-probe: additionally emit the buckets across the `probes`
          // hyperplanes this vector is CLOSEST to (smallest |margin|) —
          // the buckets a true neighbor most likely fell into when it
          // landed on the other side of a near-miss plane
          Iterator.single((id, v, t, bucket)) ++
            margins.zipWithIndex.sortBy(_._1).iterator.take(probes)
              .map { case (_, pi) => (id, v, t, bucket ^ (1L << pi)) }
        }
      })
      .toDF(idAs, vecAs, "table", "bucket")
    // one shuffle on the join key, shared by every consumer via ReuseExchange
    // (skipped when the consumer broadcasts the other side instead)
    if (shuffle) sigs.repartition(col("table"), col("bucket")) else sigs
  }

  /** ANN top-k via hyperplane LSH: candidates share a bucket in ≥1 of
    * `tables` independent hash tables; exact cosine + top-k inside the
    * candidate set. Recall grows with tables; cost ~ bucket sizes, not n².
    *
    * Recall math (hyperplane LSH): a pair at angle θ collides per table with
    * p = (1-θ/π)^planes. Genuinely-near pairs (cos ≥ 0.95, θ ≤ 18°) reach
    * ≈99% over 8 tables; uniformly-random "nearest" pairs (cos ≈ 0.4) are
    * inherently LSH-hostile — that regime is what bruteForceTopK is for.
    *
    * `probes` enables multi-probe on the QUERY side only: each query also
    * checks the buckets across its `probes` nearest hyperplanes (the
    * standard recall/cost lever — Lv et al., "Multi-Probe LSH", VLDB'07).
    * Query signatures are broadcast, so extra probes cost candidate-join
    * fan-in, not another corpus pass; probes=2 roughly doubles candidate
    * volume for a large recall gain in the hard uniform regime.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 6, tables: Int = 8,
      probes: Int = 2): DataFrame = {
    val dim = vecDim(corpus, vecCol)
    // the query batch is bounded (like bruteForceTopK's contract): BROADCAST
    // its signatures, so the corpus side stays one narrow pass — no corpus
    // shuffle at all for a top-k query batch. Only the candidate set (tiny
    // vs corpus) reaches the dedup/window exchanges downstream.
    val c = bucketSignatures(corpus, idCol, vecCol, "neighbor_id", "_cv",
      planes, tables, dim, shuffle = false)
    // the guard sits UPSTREAM of the signature explosion, so the bound
    // counts queries (its contract), not query×table×probe rows
    val q = bucketSignatures(guardQuerySide(queries, "lshTopK"), idCol,
      vecCol, "query_id", "_qv", planes, tables, dim, shuffle = false,
      probes = probes)
    val cand = c.join(broadcast(q),
        c("table") === q("table") && c("bucket") === q("bucket") &&
          col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("_qv"), col("_cv"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cand
      .withColumn("sim", nativeCosine(corpus, col("_qv"), col("_cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Per-JVM centroid cache: repeated ivfTopK calls over the same corpus
    * (same canonicalized plan, same nlist) reuse the trained centroids
    * instead of refitting — training is the expensive part, and at scale the
    * corpus is static across many query batches.
    */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int), Array[(Int, Array[Double])]]()

  /** Train IVF coarse centroids on a BOUNDED sample of the corpus
    * (`maxTrainRows`, default 100k): k-means quality needs only a
    * representative sample, and an unbounded fit would scale training cost
    * linearly with corpus size — the one thing a coarse quantizer must not
    * do.
    *
    * The fit itself runs DRIVER-SIDE (seeded k-means++ init + fixed Lloyd
    * iterations over the collected sample): because the sample is bounded,
    * driver training is scale-safe by construction, deterministic, and
    * avoids the ~2 Spark jobs PER ITERATION a distributed fit schedules —
    * which dominated wall-clock at every corpus size (the work is tiny; the
    * job overhead isn't). Centroids are nlist × dim and broadcast from the
    * driver either way.
    */
  def trainIvfCentroids(corpus: DataFrame, vecCol: String, nlist: Int,
      maxTrainRows: Int = 100000): Array[(Int, Array[Double])] = {
    val key = (corpus.queryExecution.logical.canonicalized.toString + "#" + vecCol,
      nlist, maxTrainRows)
    if (centroidCache.size > 64) centroidCache.clear() // bounded across corpora
    centroidCache.computeIfAbsent(key, { _ =>
      // representative seeded sample across ALL partitions — a limit() would
      // be a partition PREFIX, and ordered/clustered corpora (by source,
      // topic, time) would train centroids on only the leading cluster.
      // Costs one extra narrow pass; amortized by the cache.
      val sample: Array[Array[Double]] = corpus
        .select(transform(col(vecCol), x => x.cast("double")).as("v"))
        .rdd.map(_.getSeq[Double](0).toArray)
        .takeSample(withReplacement = false, maxTrainRows, seed = 42L)
      lloyd(sample, nlist, iters = 15, seed = 42L).zipWithIndex.map(_.swap)
    })
  }

  /** Seeded k-means++ init + `iters` Lloyd iterations; empty clusters are
    * re-seeded to the point farthest from its center. Pure JVM, O(n·k·dim)
    * per iteration over the bounded sample.
    */
  private def lloyd(points: Array[Array[Double]], k: Int, iters: Int,
      seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "IVF training sample is empty")
    val n = points.length
    val dim = points(0).length
    val rng = new scala.util.Random(seed)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val m = math.min(a.length, b.length)
      while (i < m) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // k-means++ seeding
    val centers = new Array[Array[Double]](math.min(k, n))
    centers(0) = points(rng.nextInt(n)).clone()
    val minD = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < centers.length) {
      var i = 0
      var total = 0.0
      while (i < n) {
        val d = d2(points(i), centers(c - 1))
        if (d < minD(i)) minD(i) = d
        total += minD(i)
        i += 1
      }
      var target = rng.nextDouble() * total
      var pick = 0
      i = 0
      while (i < n && target > 0) { target -= minD(i); if (target > 0) pick = math.min(i + 1, n - 1); i += 1 }
      centers(c) = points(pick).clone()
      c += 1
    }
    // Lloyd iterations
    val assign = new Array[Int](n)
    var it = 0
    while (it < iters) {
      var i = 0
      while (i < n) {
        var best = 0; var bestD = Double.MaxValue
        var j = 0
        while (j < centers.length) {
          val d = d2(points(i), centers(j))
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(centers.length)(new Array[Double](dim))
      val counts = new Array[Int](centers.length)
      i = 0
      while (i < n) {
        val a = assign(i); counts(a) += 1
        val p = points(i); var j = 0
        while (j < math.min(dim, p.length)) { sums(a)(j) += p(j); j += 1 }
        i += 1
      }
      var j = 0
      while (j < centers.length) {
        if (counts(j) > 0) {
          var m = 0
          while (m < dim) { sums(j)(m) /= counts(j); m += 1 }
          centers(j) = sums(j)
        } else {
          // empty cluster: re-seed to the globally farthest point
          var far = 0; var farD = -1.0; var x = 0
          while (x < n) {
            val d = d2(points(x), centers(assign(x)))
            if (d > farD) { farD = d; far = x }
            x += 1
          }
          centers(j) = points(far).clone()
        }
        j += 1
      }
      it += 1
    }
    centers
  }

  /** IVF (inverted-file) ANN top-k: coarse k-means quantization of the
    * corpus into `nlist` cells; each query probes its `nprobe` nearest cells
    * and ranks candidates by exact cosine. The standard
    * recall-vs-cost dial for vector search at scale:
    *
    *   - centroids come from [[trainIvfCentroids]] — a bounded-sample fit,
    *     cached per corpus plan, tiny (nlist × dim) — they broadcast;
    *     assignment is one narrow pass;
    *   - the candidate join is `cell = cell` — a hash join whose right side
    *     is |corpus| × nprobe/nlist on average, never a cross join;
    *   - unlike hyperplane LSH, recall degrades gracefully on
    *     uniformly-random data (probing 1/4 of cells ⇒ ~1/4 recall floor).
    *
    * Uses Spark ML KMeans (public API) for training only; everything
    * per-row is the engine's own expressions.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      maxTrainRows: Int = 100000): DataFrame = {
    val centroids = trainIvfCentroids(corpus, vecCol, nlist, maxTrainRows)
    ivfProbe(assignIvfCells(corpus, idCol, vecCol, centroids),
      queries, idCol, vecCol, centroids, k, nprobe)
  }

  /** [[ivfTopK]] against a PERSISTED [[RefStore]] IVF index: the corpus-side
    * cell assignment — the narrow-but-whole-corpus pass — and the trained
    * centroids are computed when the index commits, not per query batch.
    * New vectors merge into the FIXED coarse quantizer ([[RefStore.mergeIvf]],
    * the standard IVF index contract), so query batches only pay the
    * bounded probe join.
    *
    * Default nprobe is 8 here (vs the live path's 4): a stored index is
    * typically trained on an EARLY slice of a growing corpus, so later
    * merges drift away from the quantizer and cell boundaries blur.
    * Measured on the testdata regime (AnnRecall, train-on-half store):
    * recall@10 = 0.54 / 0.69 / 0.79-0.81 / 0.87-0.89 at nprobe 4/6/8/10 —
    * 8 buys a ≥0.29 margin over the 0.5 Verify floor while still skipping
    * half the cells.
    */
  def ivfTopKStored(queries: DataFrame, storeDir: String, idCol: String,
      vecCol: String, k: Int, nprobe: Int = 8): DataFrame = {
    val (centroids, assigned) = RefStore.loadIvf(queries.sparkSession, storeDir)
    ivfProbe(assigned, queries, idCol, vecCol, centroids, k, nprobe)
  }

  private[graft] def nearestCells(centroids: Array[(Int, Array[Double])],
      v: Array[Float], n: Int): Seq[Int] =
    centroids.map { case (i, c) =>
      var d = 0.0; var j = 0
      val dim = math.min(v.length, c.length)
      while (j < dim) { val diff = v(j) - c(j); d += diff * diff; j += 1 }
      (i, d)
    }.sortBy(_._2).take(n).map(_._1).toSeq

  /** One narrow pass assigning each corpus row to its nearest coarse cell:
    * (neighbor_id, _cv, cell) — the persisted half of an IVF index.
    */
  private[ops] def assignIvfCells(corpus: DataFrame, idCol: String,
      vecCol: String, centroids: Array[(Int, Array[Double])]): DataFrame = {
    val assignCell = udf((v: Array[Float]) => nearestCells(centroids, v, 1).head)
    corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
      .withColumn("cell", assignCell(col("_cv")))
  }

  private def ivfProbe(assigned: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, centroids: Array[(Int, Array[Double])], k: Int,
      nprobe: Int): DataFrame = {
    val probeCells = udf((v: Array[Float]) => nearestCells(centroids, v, nprobe))
    // query batch is bounded → broadcast its probe cells; the corpus-side
    // cell assignment stays one narrow pass with no shuffle (the old
    // repartition(cell) only helped when both sides shuffled)
    val q = guardQuerySide(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv")),
      "ivfTopK")
      .withColumn("cell", explode(probeCells(col("_qv"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    assigned.join(broadcast(q), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", nativeCosine(queries, col("_qv"), col("_cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Per-JVM PQ codebook cache (same rationale as [[centroidCache]]). */
  private val pqCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Int, Int, Int), Array[Array[Array[Double]]]]()

  private def normalized(v: Array[Float]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(s)
    val out = new Array[Double](v.length)
    if (n > 0) { i = 0; while (i < v.length) { out(i) = v(i) / n; i += 1 } }
    out
  }

  /** Train product-quantization codebooks (Jégou, Douze & Schmid, "Product
    * Quantization for Nearest Neighbor Search", TPAMI'11): the vector is cut
    * into `m` subspaces and each gets its own 2^nbits-centroid k-means
    * codebook, fit on the same BOUNDED seeded sample discipline as
    * [[trainIvfCentroids]]. Training (and encoding) operates on
    * L2-NORMALIZED vectors, so the asymmetric-distance sum directly
    * approximates the cosine.
    */
  def trainPqCodebooks(corpus: DataFrame, vecCol: String, m: Int,
      nbits: Int, maxTrainRows: Int = 100000): Array[Array[Array[Double]]] = {
    require(m >= 1 && nbits >= 1 && nbits <= 12, "need m >= 1, 1 <= nbits <= 12")
    val key = (corpus.queryExecution.logical.canonicalized.toString + "#" + vecCol,
      m, nbits, maxTrainRows)
    if (pqCache.size > 64) pqCache.clear()
    pqCache.computeIfAbsent(key, { _ =>
      val sample: Array[Array[Double]] = corpus
        .select(col(vecCol))
        .rdd.map(r => normalized(r.getSeq[Float](0).toArray))
        .takeSample(withReplacement = false, maxTrainRows, seed = 42L)
      require(sample.nonEmpty, "PQ training sample is empty")
      val dim = sample(0).length
      require(dim % m == 0, s"vector dim $dim not divisible by m=$m")
      val sub = dim / m
      Array.tabulate(m) { j =>
        val pts = sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
        lloyd(pts, 1 << nbits, iters = 15, seed = 42L + j)
      }
    })
  }

  /** PQ ANN top-k — the compressed-domain scan that makes embedding search
    * payable when the vectors themselves no longer fit anywhere: the corpus
    * is encoded to `m` code bytes per vector (one narrow pass, codebooks in
    * the closure), each query carries an m×2^nbits table of per-centroid
    * dot contributions, and the scan accumulates `sim ≈ Σ_j tab(j)(code_j)`
    * keeping a bounded per-query heap PER PARTITION — so the shuffle after
    * the scan is only (numPartitions × k) rows per query, never the corpus.
    * With `rerank` (default) the shortlist is re-scored with the exact
    * native cosine, so returned sims are true cosines of PQ-recalled
    * candidates (rank quality comes from recall, not from ADC error).
    *
    * Query batch is BOUNDED by contract (collected to build ADC tables —
    * same boundedness the broadcast query side of [[lshTopK]]/[[ivfTopK]]
    * relies on). ADC ties at a partial heap's boundary may admit either
    * candidate depending on partitioning; the final rank window breaks all
    * surviving ties deterministically.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 16, nbits: Int = 6,
      rerank: Boolean = true, shortlistFactor: Int = 8,
      maxTrainRows: Int = 100000): DataFrame = {
    val books = trainPqCodebooks(corpus, vecCol, m, nbits, maxTrainRows)
    // rerank joins the RAW corpus (one plain pruned scan) — joining the
    // encode frame here would run the opaque pqEncode closure a second
    // time over every corpus row just to fetch vectors
    pqScan(pqEncodeFrame(corpus, idCol, vecCol, books),
      corpus.select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).as("_cv")),
      queries, idCol, vecCol, books, k, rerank, shortlistFactor)
  }

  /** [[pqTopK]] against a PERSISTED [[RefStore]] PQ index: codebooks train
    * and the corpus encodes to its `m` code bytes when the index COMMITS
    * ([[RefStore.writePq]]) — per query batch only the compressed-domain
    * ADC scan over the stored codes runs, plus the exact rerank of the
    * bounded shortlist. New vectors encode into the fixed codebooks on
    * merge, the same immutable-quantizer contract as the IVF store.
    */
  def pqTopKStored(queries: DataFrame, storeDir: String, idCol: String,
      vecCol: String, k: Int, rerank: Boolean = true,
      shortlistFactor: Int = 8): DataFrame = {
    val (books, encoded) = RefStore.loadPq(queries.sparkSession, storeDir)
    // here the encoded frame IS the cheap source of the rerank vectors —
    // a parquet scan of (_cv), no encode work
    pqScan(encoded, encoded.select(col("neighbor_id"), col("_cv")),
      queries, idCol, vecCol, books, k, rerank, shortlistFactor)
  }

  /** Encode one vector against the trained codebooks (nearest centroid per
    * subspace over the L2-normalized vector) — ONE definition shared by the
    * per-call scan and the persisted index, so stored codes can never drift
    * from on-the-fly codes.
    */
  private[ops] def pqEncode(books: Array[Array[Array[Double]]],
      v: Array[Float]): Array[Int] = {
    val m = books.length
    val sub = books(0)(0).length
    val vn = normalized(v)
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val book = books(j)
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < book.length) {
        var d = 0.0; var i = 0
        while (i < sub) { val t = vn(j * sub + i) - book(c)(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best; j += 1
    }
    codes
  }

  /** (neighbor_id, _cv, codes): the encoded corpus — one narrow pass. The
    * raw vectors ride along for the exact rerank (the standard PQ
    * deployment keeps full vectors for shortlist re-scoring).
    */
  private[ops] def pqEncodeFrame(corpus: DataFrame, idCol: String,
      vecCol: String, books: Array[Array[Array[Double]]]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) => (id, v, pqEncode(books, v)) })
      .toDF("neighbor_id", "_cv", "codes")
  }

  private def pqScan(encoded: DataFrame, rerankSrc: DataFrame,
      queries: DataFrame, idCol: String,
      vecCol: String, books: Array[Array[Array[Double]]], k: Int,
      rerank: Boolean, shortlistFactor: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val m = books.length
    val sub = books(0)(0).length
    // the ADC scan keeps shortlistFactor·k candidates per query and the
    // exact rerank cuts back to k — the standard recall lever: ADC error
    // reorders the boundary, so recall lives in the shortlist size (cost is
    // per-partition heap size only; the rerank join stays tiny)
    val shortlistK = if (rerank) math.max(k, shortlistFactor * k) else k
    // the collect happens at PLAN time on the driver, so the boundedness
    // guard must fire BEFORE it: limit(bound+1) keeps the check itself
    // bounded — at most bound+1 rows ever reach the driver, and one row
    // over the bound fails with the batch-your-queries message instead
    // of materializing a corpus-sized query frame + its ADC tables
    val bound = maxQueryRows(spark)
    val qRows = queries.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].limit(bound + 1).collect()
    require(qRows.length <= bound,
      s"pqScan: query frame exceeds graft.ann.maxQueryRows=$bound rows — " +
        "per-query ADC lookup tables materialize on the driver; batch your " +
        "queries (chunk the query frame and union the per-chunk top-k) or " +
        "raise the bound deliberately")
    val tables: Array[(Long, Array[Array[Double]])] = qRows.map { case (qid, qv) =>
      val qn = normalized(qv)
      qid -> Array.tabulate(m) { j =>
        books(j).map { c =>
          var s = 0.0; var i = 0
          while (i < sub) { s += qn(j * sub + i) * c(i); i += 1 }
          s
        }
      }
    }
    val kk = shortlistK
    val candidates = encoded.select(col("neighbor_id"), col("codes"))
      .as[(Long, Array[Int])]
      .mapPartitions { it =>
        // min-heap per query: head is the weakest kept candidate
        val heaps = tables.map { case (qid, _) =>
          qid -> scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
            Ordering.by((x: (Double, Long)) => -x._1))
        }
        it.foreach { case (nid, codes) =>
          var qi = 0
          while (qi < tables.length) {
            val (qid, tab) = tables(qi)
            if (qid != nid) {
              var s = 0.0; var jj = 0
              while (jj < m) { s += tab(jj)(codes(jj)); jj += 1 }
              val h = heaps(qi)._2
              if (h.size < kk) h.enqueue((s, nid))
              else if (s > h.head._1) { h.dequeue(); h.enqueue((s, nid)) }
            }
            qi += 1
          }
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.iterator.map { case (s, nid) => (qid, nid, s) }
        }
      }
      .toDF("query_id", "neighbor_id", "adc_sim")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_sim").desc, col("neighbor_id"))
    val shortlist = candidates
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= shortlistK)
    if (!rerank) {
      shortlist.select(col("query_id"), col("neighbor_id"),
        col("adc_sim").as("sim"), col("rank"))
    } else {
      val qdf = spark.createDataset(qRows.toSeq).toDF("query_id", "_qv")
      val wr = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id"))
      shortlist.select("query_id", "neighbor_id")
        .join(rerankSrc, "neighbor_id")
        .join(broadcast(qdf), "query_id")
        .withColumn("sim", nativeCosine(queries, col("_qv"), col("_cv")))
        .withColumn("rank", row_number().over(wr))
        .filter(col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    }
  }

  /** Exact embedding near-dup pairs within metadata blocks: candidates are
    * restricted to rows sharing `blockCol` (source, shard, language, …) and
    * verified with the native cosine — the classic blocking+verify dedup
    * shape when a cheap partition key bounds where duplicates can live.
    *
    * Scale: one shuffle of each side on the block key, then quadratic work
    * WITHIN each block only — total cost Σ|block|², so this is the right
    * tool for many small blocks (and the wrong one for megablocks: cap or
    * LSH-split any block whose size makes |block|² unpayable; cf.
    * [[cosineNearDupPairs]] for the unblocked LSH path).
    *
    * Contract: rows with a NULL block key are EXCLUDED — the equi-join is
    * null-rejecting, so NULL-block rows pair with nothing (not even each
    * other). Pre-`coalesce` a sentinel block if they should be compared.
    */
  def blockedNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(blockCol).as("_blk"), col(idCol).cast("long").as("id_a"),
      col(vecCol).as("_va"))
    val b = df.select(col(blockCol).as("_blk2"), col(idCol).cast("long").as("id_b"),
      col(vecCol).as("_vb"))
    a.join(b, col("_blk") === col("_blk2") && col("id_a") < col("id_b"))
      .withColumn("sim", nativeCosine(df, col("_va"), col("_vb")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** Semantic decontamination — [[Dedup.exactAgainst]]'s embedding-space
    * sibling: drop incoming rows whose cosine against ANY reference row in
    * the same metadata block reaches `threshold` (eval-set leakage that
    * survives text-level checks: paraphrases, translations, templated
    * restatements). Returns the SURVIVING incoming rows.
    *
    * Scale: block-keyed equi-join (one shuffle per side on the block key,
    * quadratic only within a block — [[blockedNearDupPairs]]'s shape), sim
    * by the codegen'd native cosine. NULL-block rows on either side pair
    * with nothing (null-rejecting equi-join) and therefore SURVIVE on the
    * incoming side; coalesce a sentinel block upstream to compare them.
    */
  def embedAgainst(incoming: DataFrame, reference: DataFrame, idCol: String,
      vecCol: String, blockCol: String, threshold: Double): DataFrame = {
    val i = incoming.select(col(blockCol).as("_blk"),
      col(idCol).cast("long").as("_iid"), col(vecCol).as("_vi"))
    val rf = reference.select(col(blockCol).as("_blk2"), col(vecCol).as("_vr"))
    val flagged = i.join(rf, col("_blk") === col("_blk2"))
      .filter(nativeCosine(incoming, col("_vi"), col("_vr")) >= threshold)
      .select(col("_iid")).distinct()
    incoming
      .withColumn("_eaid", col(idCol).cast("long"))
      .join(flagged, col("_eaid") === col("_iid"), "left_anti")
      .drop("_eaid")
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ threshold),
    * candidates via shared LSH bucket — the embedding analog of MinHash dedup.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, planes: Int = 8, tables: Int = 8): DataFrame = {
    val sigs = bucketSignatures(df, idCol, vecCol, "_id", "_v", planes, tables,
      vecDim(df, vecCol))
    sigs.as("a").join(sigs.as("b"),
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
          col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        col("a._v").as("_va"), col("b._v").as("_vb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("sim", nativeCosine(df, col("_va"), col("_vb")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** Per-dimension embedding health stats — the QA pass a pipeline runs on
    * every new embedding batch before it reaches ANN/dedup (a broken
    * encoder shows up as dead dimensions, exploded scales, or NaN/NULL
    * components long before recall metrics notice). One row per dimension:
    * exact micro-quantized BIGINT sums (mean) and sums of SQUARED micro
    * values (variance) — the squares are accumulated in DECIMAL(38,0)
    * (exact integers to 10³⁸: no row count a single stats batch can hold
    * overflows it) and the wire value is ONE cast of that exact integer
    * to DOUBLE, which both engines round identically — plus integer
    * min/max and a `n_bad` count of components that are NaN, ±Inf, NULL,
    * or beyond the quantization range (|x| > 3.0e3 — a finite "exploded
    * scale" must be REPORTED by the QA op, not crash). The cutoff is
    * `floor(sqrt(Long.Max)) / 1e6`: it keeps each single square inside
    * BIGINT, which the ORACLE side needs (DuckDB evaluates `qv·qv` in
    * BIGINT before its SUM promotes to HUGEINT). Bad components are
    * counted, never summed. Degenerate vectors (NULL or
    * empty) surface as one `dim = -1` row, so the whole profile is ONE
    * lazy pass: posexplode_outer → a map-side-combined hash aggregate to
    * `dims + 1` rows, no extra scan, no driver action. Everything on the
    * wire is BIGINT → hash-compares bit-for-bit.
    */
  def embeddingDimStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode_outer(col(vecCol)))
      .select(coalesce(col("pos").cast("long"), lit(-1L)).as("dim"),
        col("col").cast("double").as("_x"))
      .withColumn("_bad", col("_x").isNull || isnan(col("_x")) ||
        abs(col("_x")) > 3.0e3)
      .withColumn("_q", when(!col("_bad"),
        round(col("_x") * 1000000.0).cast("long")))
      .groupBy("dim")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("_bad"), 1L).otherwise(0L)).as("n_bad"),
        sum(col("_q")).as("sum_micro"),
        // cast BEFORE the multiply: two near-cutoff components would
        // overflow the BIGINT product sum under ANSI; decimal sums stay
        // exact and one final double cast matches DuckDB's HUGEINT→DOUBLE
        sum(col("_q").cast("decimal(38,0)") * col("_q").cast("decimal(38,0)"))
          .cast("double").as("sumsq_micro2"),
        min(col("_q")).as("min_micro"),
        max(col("_q")).as("max_micro"))

  /** Hard-negative mining for contrastive training: for each query vector,
    * the `k` most cosine-similar corpus rows whose label is DISTINCT from
    * the query's — the near-miss examples a contrastive or reranker
    * objective learns the most from (easy negatives are free; hard ones
    * need exactly this search). Same broadcast shape as
    * [[bruteForceTopK]]: the bounded query side broadcasts, the corpus
    * never shuffles into the join, per-query top-k via a rank window.
    * Label law: null-safe inequality (`IS DISTINCT FROM`) — a NULL-label
    * corpus row is a negative for every labeled query, NULL-vs-NULL is
    * same-label (excluded); SQL-mirrorable verbatim.
    * Output: (query_id, neighbor_id, sim, rank).
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame =
    broadcastTopK(corpus, queries, idCol, vecCol, k,
      extraCols = Seq(labelCol -> "l"),
      cond = col("neighbor_id") =!= col("query_id") && !(col("_cl") <=> col("_ql")))

  /** Maximal-marginal-relevance diverse top-k (Carbonell & Goldstein,
    * SIGIR 1998): greedily select `k` of the `nCandidates` most
    * query-similar corpus rows, each pick maximizing
    * `λ·rel − (1−λ)·max_{s∈selected} cos(c, s)` — the selection-diversity
    * operator a training-data curator uses to avoid filling a context or
    * a fine-tuning batch with near-duplicate retrievals. Pure relevance
    * (λ=1) degrades to [[bruteForceTopK]] prefixes; λ<1 trades relevance
    * for coverage.
    *
    * Exactly SQL-mirrorable (the oracle replays the greedy loop with a
    * recursive CTE): the first pick's score is its relevance; later
    * scores use the λ-mix; every cosine is the engine-wide double kernel
    * ([[cosineScala]] ≡ `graft_cosine` ≡ `list_dot_product/(√·√)`), ties
    * break on smaller id at every step. Output:
    * (query_id, rk, neighbor_id, score), rk 1..k per query (fewer iff
    * the candidate pool is smaller).
    *
    * Scale shape: stage 1 is the [[broadcastTopK]] discipline (bounded
    * query side broadcasts, corpus never shuffles); stage 2 re-attaches
    * candidate vectors by broadcasting the tiny candidate frame into a
    * hash join against the corpus scan; stage 3 shuffles only the
    * (queries × nCandidates) candidate rows — the greedy loop is
    * O(k·n·dim) per query inside one task, never a corpus-sized job.
    */
  def mmrTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, nCandidates: Int = 20, k: Int = 8,
      lambda: Double = 0.5): DataFrame = {
    require(nCandidates >= k, s"nCandidates=$nCandidates must be >= k=$k")
    mmrRerank(bruteForceTopK(corpus, queries, idCol, vecCol, nCandidates),
      corpus, idCol, vecCol, k, lambda)
  }

  /** The greedy half of [[mmrTopK]], decoupled from the candidate
    * generator: rerank ANY per-query candidate frame
    * `(query_id, neighbor_id, sim)` — brute-force, [[lshTopK]],
    * [[ivfTopKStored]], [[pqTopKStored]], all emit this shape — into an
    * MMR-diverse top `k`. At 100 TB the candidate tier is an ANN index;
    * diversification stays this same bounded post-pass: vectors
    * re-attach by broadcasting the tiny candidate frame against the
    * corpus scan, then only candidates shuffle to the greedy.
    */
  /** Domain note: the greedy's oracle-equivalence claim (q_mmr_select's
    * recursive-CTE replay) holds over NONZERO-NORM vectors — the cosine
    * law's domain. Zero-norm vectors make cosines NaN, and the two
    * engines' NaN TOTAL ORDERS differ (DuckDB sorts NaN above every
    * value; the JVM comparison makes NaN lose every test), so no
    * bit-equivalence is possible there. The engine's behavior on such
    * degenerate inputs is therefore its own spec-pinned law: a candidate
    * whose penalty involves ANY undefined similarity is unselectable
    * (NaN score), and the greedy stops early when nothing is selectable.
    */
  def mmrRerank(candidates: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, lambda: Double): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val cand = candidates.select(col("query_id"), col("neighbor_id"), col("sim"))
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      col(vecCol).as("_cv"))
    val withVec = c.join(broadcast(cand), Seq("neighbor_id"))
    val grouped = withVec.groupBy(col("query_id").cast("long").as("query_id"))
      .agg(collect_list(struct(col("sim").as("_1"),
        col("neighbor_id").cast("long").as("_2"), col("_cv").as("_3"))).as("_cands"))
    val spark0 = corpus.sparkSession
    import spark0.implicits._
    grouped.as[(Long, Seq[(Double, Long, Seq[Float])])]
      .flatMap { case (qid, cands0) =>
        // deterministic candidate order regardless of collect_list arrival
        val cands = cands0.toArray.map { case (rel, id, v) => (rel, id, v.toArray) }
          .sortBy { case (rel, id, _) => (-rel, id) }
        val n = cands.length
        val used = new Array[Boolean](n)
        val selVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
        var rk = 1
        while (rk <= math.min(k, n)) {
          var bestIdx = -1; var bestScore = Double.NegativeInfinity
          var bestId = Long.MaxValue
          var i = 0
          while (i < n) {
            if (!used(i)) {
              val (rel, id, v) = cands(i)
              val score =
                if (rk == 1) rel
                else {
                  // ANY selected↔candidate cosine NaN (a zero-norm vector
                  // on either side) poisons the penalty: max over a set
                  // containing an undefined similarity is undefined, so
                  // the score is NaN — unselectable below. One law for
                  // the mixed and all-NaN cases (skipping just the NaN
                  // terms would mean the penalty silently ignores the
                  // similarity to one of the SELECTED items; letting
                  // -Infinity through would flip into a +Infinity score
                  // that wins the argmax). See [[mmrRerank]]'s domain
                  // note: the SQL oracle law assumes nonzero norms.
                  var maxSim = Double.NegativeInfinity
                  var poisoned = false
                  selVecs.foreach { s =>
                    val cs = cosineScala(s, v)
                    if (cs.isNaN) poisoned = true
                    else if (cs > maxSim) maxSim = cs
                  }
                  if (poisoned || maxSim == Double.NegativeInfinity) Double.NaN
                  else lambda * rel - (1.0 - lambda) * maxSim
                }
              // (score DESC, id ASC) — the oracle's ORDER BY tie law at
              // every step, including the rk=1 relevance pick
              if (score > bestScore || (score == bestScore && id < bestId)) {
                bestScore = score; bestIdx = i; bestId = id
              }
            }
            i += 1
          }
          // every remaining candidate scored NaN (zero-norm vectors make
          // cosine NaN, and NaN wins no comparison): stop with what we
          // have rather than index with the -1 sentinel
          if (bestIdx < 0) rk = Int.MaxValue
          else {
            used(bestIdx) = true
            selVecs += cands(bestIdx)._3
            out += ((qid, rk.toLong, cands(bestIdx)._2, bestScore))
            rk += 1
          }
        }
        out
      }
      .toDF("query_id", "rk", "neighbor_id", "score")
  }

  /** Symmetric int8 quantization of an embedding column — the 4×
    * storage/bandwidth compressor a 100 TB embedding corpus ships and
    * serves (the standard max-abs scheme): per vector,
    * `scale = max|xᵢ| / 127`, `codeᵢ = clamp(⌊xᵢ/scale + 0.5⌋, ±127)`.
    * A zero vector quantizes to all-zero codes at scale 0 (no NaN leak).
    *
    * Every step is cross-engine exact — float→double casts, one max
    * fold, one division per element, and FLOOR(+0.5) rounding (chosen
    * over `round`, whose half-away/half-even convention differs across
    * engines) — so the exploded (vec_id, dim, code, scale) frame is
    * hash-oracle-able verbatim. Output dims are 1-based.
    *
    * Scale shape: ONE object-boundary pass per vector — no shuffle, no
    * join. An expression-tree form (array_max + transform) measured
    * O(dim²) here: the generator's non-empty/non-null constraint gets
    * inferred into the scan filter with the max fold INLINED INSIDE the
    * element lambda (the Catalyst HOF-duplication trap documented at
    * [[Dedup.shingleHashFrame]] — visible in the optimized plan as five
    * array_max copies). The exploded form is for the oracle gate; the
    * packed `codes` array is what a real pipeline persists.
    */
  def int8QuantizeFrame(df: DataFrame, idCol: String, vecCol: String,
      explode: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val packed = df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) =>
        if (v == null) (id, 0.0, null.asInstanceOf[Array[Long]])
        else {
        var maxAbs = 0.0
        var i = 0
        while (i < v.length) {
          val a = math.abs(v(i).toDouble)
          if (a > maxAbs) maxAbs = a
          i += 1
        }
        val scale = maxAbs / 127.0
        val codes = new Array[Long](v.length)
        if (scale != 0.0) {
          i = 0
          while (i < v.length) {
            codes(i) = math.min(127L, math.max(-127L,
              math.floor(v(i).toDouble / scale + 0.5).toLong))
            i += 1
          }
        }
        (id, scale, codes)
        }
      })
      .toDF("vec_id", "scale", "codes")
    if (!explode) packed
    else packed
      .select(col("vec_id"), col("scale"),
        posexplode(col("codes")).as(Seq("_pos", "code")))
      .select(col("vec_id"), (col("_pos") + 1).cast("long").as("dim"),
        col("code"), col("scale"))
  }

  /** Signed random projection (Achlioptas 2003's ±1 database-friendly
    * Johnson–Lindenstrauss form) of an embedding column down to `outDim`
    * components — the cheap sketch a 100 TB pipeline computes ONCE and
    * then filters/blocks/bands on instead of touching the full vector
    * (sign patterns of the projected components are exactly the
    * hyperplane-LSH bits; distances survive up to the JL distortion).
    *
    * Engine-exact law, no float dot products: component i is
    * micro-quantized first (`⌊x·10⁶ + 0.5⌋`, the int8/centroid FLOOR(+0.5)
    * discipline), the projection matrix entry for output j and input i is
    * `+1` when the first hex nibble of `md5("<seed>:<j>:<i>")` is 0–7 and
    * `-1` otherwise (i, j both 0-based — a data-independent coin both
    * engines flip identically), and output component j is the exact BIGINT
    * signed sum. NULL or empty vectors project to NULL.
    *
    * Scale shape: ONE object-boundary pass — the sign matrix is derived
    * per partition from (seed, outDim, vector length) alone (a few hundred
    * md5 calls, cached per length), no shuffle, no join, nothing on the
    * driver. Output is the exploded oracle-gate form
    * (vec_id, j, comp); a real pipeline would keep the packed array.
    */
  def randomProjectFrame(df: DataFrame, idCol: String, vecCol: String,
      outDim: Int, seed: String = "graft"): DataFrame = {
    require(outDim > 0, s"outDim=$outDim must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        // sign rows for the lengths seen in this partition: signs(j*len + i)
        val cache = scala.collection.mutable.HashMap.empty[Int, Array[Int]]
        def signs(len: Int): Array[Int] = cache.getOrElseUpdate(len, {
          val m = new Array[Int](outDim * len)
          var j = 0
          while (j < outDim) {
            var i = 0
            while (i < len) {
              digest.reset()
              val h = digest.digest(s"$seed:$j:$i".getBytes("UTF-8"))
              m(j * len + i) = if ((h(0) & 0x80) == 0) 1 else -1
              i += 1
            }
            j += 1
          }
          m
        })
        it.map { case (id, v) =>
          if (v == null || v.isEmpty) (id, null.asInstanceOf[Array[Long]])
          else {
            val len = v.length
            val m = signs(len)
            val q = new Array[Long](len)
            var i = 0
            while (i < len) {
              q(i) = math.floor(v(i).toDouble * 1000000.0 + 0.5).toLong
              i += 1
            }
            val out = new Array[Long](outDim)
            var j = 0
            while (j < outDim) {
              var s = 0L
              i = 0
              while (i < len) { s += m(j * len + i) * q(i); i += 1 }
              out(j) = s
              j += 1
            }
            (id, out)
          }
        }
      }
      .toDF("vec_id", "_proj")
      .select(col("vec_id"),
        posexplode_outer(col("_proj")).as(Seq("_pos", "comp")))
      .select(col("vec_id"), col("_pos").cast("long").as("j"), col("comp"))
  }

  /** Fixed-point centroid accumulators for semantic-dedup clusters: one row
    * per (cluster, dimension) with the exact BIGINT sum of members'
    * micro-quantized components and the member count. Quantizing each
    * component (`round(x·1e6)`, float→double cast and one double multiply —
    * both exact IEEE ops) BEFORE summing is part of the law: integer sums
    * are independent of partitioning and summation order, so the
    * accumulators reproduce bit-for-bit across runs and engines. The
    * caller derives the centroid component as `sum_micro / 1e6 / n_members`
    * in full double precision ([[assignNearestCentroid]] does).
    *
    * Scale: one hash join on the member id, posexplode to (cluster, dim)
    * keys, one partial-agg'd hash aggregate; output is clusters × dims
    * rows — tiny relative to the corpus, and mergeable across batches by
    * plain integer addition (the incremental-update property sums of
    * doubles would not have).
    */
  def clusterCentroidSums(embeddings: DataFrame, assignments: DataFrame,
      idCol: String, vecCol: String, memberCol: String = "doc_id",
      clusterCol: String = "cluster_id"): DataFrame = {
    val e = embeddings.select(col(idCol).cast("long").as("_mid"), col(vecCol).as("_v"))
    val a = assignments.select(col(memberCol).cast("long").as("_aid"),
      col(clusterCol).cast("long").as("cluster_id"))
    e.join(a, col("_mid") === col("_aid"))
      .select(col("cluster_id"), posexplode(col("_v")))
      .select(col("cluster_id"), col("pos").cast("bigint").as("dim"),
        round(col("col").cast("double") * 1000000.0).cast("bigint").as("_q"))
      .groupBy("cluster_id", "dim")
      .agg(sum(col("_q")).as("sum_micro"), count(lit(1)).as("n_members"))
  }

  /** Distributed Lloyd (k-means) refinement over embeddings, engine-exact:
    * `iters` rounds of assign-to-nearest + centroid recompute, returning the
    * final accumulator frame (cluster_id, dim, sum_micro, n_members) — the
    * same exact-BIGINT shape as [[clusterCentroidSums]].
    *
    * What makes a floating-point-iterative algorithm bit-exact across
    * engines: EVERY comparison and accumulation in the loop is integer.
    *   - Points are unit-normalized in double once, then quantized to 1e6
    *     micro-units (`_qv: array<bigint>`); centroids likewise each round.
    *   - Nearest-centroid is argmax over the INTEGER dot product
    *     `sum(_qv·_qc)` (≤ dim·1e12 — no overflow), ties to the smaller
    *     cluster id. Cosine order is preserved because both sides are
    *     unit-length before quantization.
    *   - Centroid update re-sums the RAW components micro-quantized —
    *     order-independent exact integers, mergeable across batches.
    * Seeds are the `k` lowest-id vectors as singleton clusters (cluster_id
    * = seed vec_id) — deterministic and SQL-expressible, so the whole
    * refinement unrolls into a DuckDB oracle (q_kmeans_refine). Zero-norm
    * vectors are excluded from assignment (no cosine home); a cluster that
    * loses all members simply drops out (standard Lloyd empty-cluster
    * behavior, identical in the oracle's GROUP BY).
    *
    * Scale shape: the corpus pays ONE exchange total (the `_vid` barrier
    * materializing raw + quantized components, reused by every round);
    * per round, the ≤k-row quantized codebook folds into a single
    * broadcast row and assignment is a narrow per-point projection
    * through the codegen'd [[graft.functions.NearestCentroid]] kernel
    * (corpus never shuffles for assignment, and the update reads the raw
    * components off the same row — no re-join); the update is one
    * posexplode + map-side-combined hash aggregate to k×dims rows. The driver holds nothing but the plan — `iters` is small
    * and fixed (curriculum: refine an existing coarse clustering, not
    * train-from-scratch — that is [[ivfIndex]]'s bounded-sample job).
    */
  def kmeansRefineSums(embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int = 4, iters: Int = 2, quant: Double = 1000000.0): DataFrame = {
    graft.functions.NearestCentroid.register(embeddings.sparkSession)
    val e = embeddings.select(col(idCol).cast("long").as("_vid"),
      col(vecCol).cast("array<double>").as("_v"))
    // quantized + raw components in ONE frame behind a _vid exchange
    // barrier: every round's assignment AND update read this single
    // ReusedExchange instead of re-running the scan + normalize +
    // quantize per round (and instead of a per-round corpus re-join to
    // recover the raw components — the update reads `_v` straight off
    // the assignment row)
    val pn = e
      .withColumn("_nrm", sqrt(aggregate(col("_v"), lit(0.0), (a, x) => a + x * x)))
      .filter(col("_nrm") > 0)
      .withColumn("_qv", transform(col("_v"),
        x => round(x / col("_nrm") * quant).cast("long")))
      .select("_vid", "_v", "_qv")
      .repartition(col("_vid"))
    var sums = e.orderBy("_vid").limit(k)
      .select(col("_vid").as("cluster_id"), posexplode(col("_v")))
      .select(col("cluster_id"), col("pos").cast("long").as("dim"),
        round(col("col") * quant).cast("long").as("_q"))
      .groupBy("cluster_id", "dim")
      .agg(sum(col("_q")).as("sum_micro"), count(lit(1)).as("n_members"))
    for (_ <- 1 to iters) {
      val cent = sums.groupBy("cluster_id")
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("sum_micro"), col("n_members")))),
          s => s.getField("sum_micro").cast("double") / quant /
            s.getField("n_members").cast("double")).as("_cv"))
        .withColumn("_cnrm", sqrt(aggregate(col("_cv"), lit(0.0), (a, x) => a + x * x)))
        .filter(col("_cnrm") > 0)
        .withColumn("_qc", transform(col("_cv"),
          x => round(x / col("_cnrm") * quant).cast("long")))
        .select("cluster_id", "_qc")
      // the whole ≤k-row codebook folds into ONE broadcast row; assignment
      // becomes a narrow per-point projection through the codegen'd
      // graft_nearest_centroid kernel (fused integer-dot argmax, ties to
      // the smaller id — same law as the max_by form it replaces), so the
      // per-round groupBy(_vid) exchange and the corpus re-join are gone
      val cb = cent.agg(sort_array(
        collect_list(struct(col("cluster_id"), col("_qc")))).as("_cb"))
      sums = pn.crossJoin(broadcast(cb))
        .select(graft.functions.NearestCentroid
          .nearest(col("_qv"), col("_cb")).as("cluster_id"), col("_v"))
        .filter(col("cluster_id").isNotNull)
        .select(col("cluster_id"), posexplode(col("_v")))
        .select(col("cluster_id"), col("pos").cast("long").as("dim"),
          round(col("col") * quant).cast("long").as("_q"))
        .groupBy("cluster_id", "dim")
        .agg(sum(col("_q")).as("sum_micro"), count(lit(1)).as("n_members"))
    }
    sums
  }

  /** Nearest-centroid assignment — the INCREMENTAL path of semantic dedup:
    * new documents join existing clusters without re-running pair
    * generation over the full corpus (the IVF coarse-assignment shape,
    * with [[clusterCentroidSums]] output as the codebook). Centroid
    * vectors are reassembled from the bounded accumulator frame and
    * BROADCAST; the incoming side stays narrow and never shuffles. Rows
    * whose best cosine falls below `minSim` keep a NULL cluster_id (no
    * home — downstream seeds new clusters from them). Ties break toward
    * the smaller cluster id. Output: incoming columns +
    * (cluster_id, centroid_sim).
    */
  def assignNearestCentroid(incoming: DataFrame, centroidSums: DataFrame,
      idCol: String, vecCol: String, minSim: Double = 0.0): DataFrame = {
    val cent = centroidSums
      .groupBy(col("cluster_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("sum_micro"), col("n_members")))),
        s => (s.getField("sum_micro").cast("double") / 1000000.0) /
          s.getField("n_members").cast("double"))
        // float codebook: the codegen'd graft_cosine kernel is float-typed,
        // and float precision is far beyond what a nearest-centroid
        // decision needs
        .cast("array<float>").as("_cv"))
    val inc = incoming.withColumn("_nid", col(idCol).cast("long"))
    val best = inc.select(col("_nid"), col(vecCol).as("_iv"))
      .crossJoin(broadcast(cent))
      .withColumn("_sim", nativeCosine(incoming, col("_iv"), col("_cv")))
      // NaN sorts ABOVE every real double in Spark orderings: a zero-norm
      // centroid (or incoming vector) would win max_by and poison the
      // assignment — degenerate sims drop here, the left join below turns
      // an all-NaN row into the NULL no-home verdict
      .filter(!isnan(col("_sim")))
      .groupBy("_nid")
      .agg(max_by(struct(col("_sim"), col("cluster_id")),
        struct(col("_sim"), -col("cluster_id"))).as("_b"))
      .select(col("_nid"),
        when(col("_b._sim") >= minSim, col("_b.cluster_id")).as("cluster_id"),
        when(col("_b._sim") >= minSim, col("_b._sim")).as("centroid_sim"))
    inc.join(best, Seq("_nid"), "left").drop("_nid")
  }

  /** Exact JVM twin of the `graft_cosine` kernel (double accumulation over
    * float inputs, sequential fold, dot/(√na·√nb)) — one definition so the
    * narrow scorer below can never drift from the codegen expression.
    */
  private[graft] def cosineScala(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** STREAM-SAFE narrow twin of [[assignNearestCentroid]]: same codebook
    * reassembly, same cosine kernel, same NaN/minSim/tie laws — but the
    * bounded accumulator frame is collected ONCE on the driver (the
    * IVF/PQ/BPE bounded-training discipline) and the assignment is a
    * single broadcast-backed projection. No join, no aggregate, no
    * shuffle, so it composes into a Structured Streaming query as-is:
    * each arriving micro-batch of documents joins the existing semantic
    * clusters row-by-row — the incremental-ingest path running
    * continuously. Equivalence with the join form is pinned in
    * SimilaritySpec (including the NaN-poisoning and no-home cases);
    * prefer the join form in batch jobs (keeps everything lazy), this one
    * in streams and small-batch loops.
    */
  def assignNearestCentroidNarrow(incoming: DataFrame, centroidSums: DataFrame,
      idCol: String, vecCol: String, minSim: Double = 0.0): DataFrame = {
    val codebook: Array[(Long, Array[Float])] = centroidSums
      .groupBy(col("cluster_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("sum_micro"), col("n_members")))),
        s => (s.getField("sum_micro").cast("double") / 1000000.0) /
          s.getField("n_members").cast("double"))
        .cast("array<float>").as("_cv"))
      .orderBy("cluster_id") // ascending scan + strict-greater = ties to smaller id
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val bc = incoming.sparkSession.sparkContext.broadcast(codebook)
    val assign = udf { v: scala.collection.Seq[Float] =>
      if (v == null) None
      else {
        val arr = v.toArray
        var bestId = -1L; var bestSim = Double.NegativeInfinity; var found = false
        for ((cid, cv) <- bc.value) {
          val s = cosineScala(arr, cv)
          // NaN never beats a real sim (the max_by guard's narrow twin)
          if (!s.isNaN && s > bestSim) { bestId = cid; bestSim = s; found = true }
        }
        if (found && bestSim >= minSim) Some((bestId, bestSim)) else None
      }
    }.withName("graft_assign_centroid")
    incoming
      .withColumn("_a", assign(col(vecCol)))
      .withColumn("cluster_id", col("_a._1"))
      .withColumn("centroid_sim", col("_a._2"))
      .drop("_a")
  }

  /** Reciprocal-rank-fusion hybrid retrieval (Cormack, Clarke & Büttcher,
    * SIGIR 2009): fuse TWO rankings of the corpus per query — cosine
    * similarity (direction) and euclidean distance (direction + magnitude,
    * the unnormalized-retriever stand-in) — by summing each system's
    * reciprocal rank. The law is exact-integer so any engine replays it:
    * a system contributes `1000000 div (k0 + rank)` micro-units iff the
    * candidate sits in its top `perSystemK`, else 0; fused rank orders by
    * the summed micro-score (ties on id).
    *
    * One corpus pass per query batch: the pairwise sims/distances are
    * computed once (queries broadcast — the small-side discipline), both
    * per-system ranks are windows over that one frame, and only rows that
    * made at least one shortlist survive to the fusion window. l2² is
    * derived from the same three dot products as cosine
    * (`(cc - 2·dot) + qq`, one fixed chain) so no second vector pass
    * exists.
    *
    * Output: (query_id, neighbor_id, rk, rrf_micro, rk_cos, rk_l2) — ranks
    * are NULL for the side that did not shortlist the candidate.
    */
  def rrfFuseTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, perSystemK: Int = 20, k0: Int = 60, k: Int = 10,
      excludeSelf: Boolean = true): DataFrame = {
    require(perSystemK >= 1 && k >= 1 && k0 >= 0,
      s"perSystemK=$perSystemK k=$k k0=$k0 out of range")
    val q = guardQuerySide(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv")),
      "rrfFuseTopK")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
    val wCos = Window.partitionBy(col("query_id"))
      .orderBy(col("_sim").desc, col("neighbor_id"))
    val wL2 = Window.partitionBy(col("query_id"))
      .orderBy(col("_l2sq").asc, col("neighbor_id"))
    val wFuse = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_micro").desc, col("neighbor_id"))
    val dotQC = dot(col("_qv"), col("_cv"))
    val dotCC = dot(col("_cv"), col("_cv"))
    val dotQQ = dot(col("_qv"), col("_qv"))
    c.join(broadcast(q),
        if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("_dot", dotQC)
      .withColumn("_sim", col("_dot") / (sqrt(dotQQ) * sqrt(dotCC)))
      .withColumn("_l2sq", (dotCC - lit(2.0) * col("_dot")) + dotQQ)
      .withColumn("_rkc", row_number().over(wCos))
      .withColumn("_rkl", row_number().over(wL2))
      .filter(col("_rkc") <= perSystemK || col("_rkl") <= perSystemK)
      .withColumn("rrf_micro",
        when(col("_rkc") <= perSystemK,
            expr(s"1000000L div (${k0}L + _rkc)")).otherwise(lit(0L)) +
        when(col("_rkl") <= perSystemK,
            expr(s"1000000L div (${k0}L + _rkl)")).otherwise(lit(0L)))
      .withColumn("rk", row_number().over(wFuse))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk").cast("long").as("rk"),
        col("rrf_micro"),
        when(col("_rkc") <= perSystemK, col("_rkc").cast("long")).as("rk_cos"),
        when(col("_rkl") <= perSystemK, col("_rkl").cast("long")).as("rk_l2"))
  }

  /** Per-query cosine AND euclidean rankings of the corpus — the two
    * systems [[rrfFuseTopK]] fuses, exposed as a rank frame for
    * ranking-similarity evaluation ([[Eval.rboAtK]]): ONE broadcast-join
    * corpus pass, the same fixed IEEE chains and tie laws as the fusion
    * (sim desc / l2sq asc, neighbor id breaks ties). Output: (query_id,
    * neighbor_id, rk_cos, rk_l2) for rows inside EITHER system's
    * top-`perSystemK`; a rank outside its own system's cut reports NULL.
    */
  def systemRankings(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, perSystemK: Int = 20,
      excludeSelf: Boolean = true): DataFrame = {
    require(perSystemK >= 1, s"perSystemK=$perSystemK out of range")
    val q = guardQuerySide(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv")),
      "systemRankings")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
    val wCos = Window.partitionBy(col("query_id"))
      .orderBy(col("_sim").desc, col("neighbor_id"))
    val wL2 = Window.partitionBy(col("query_id"))
      .orderBy(col("_l2sq").asc, col("neighbor_id"))
    val dotQC = dot(col("_qv"), col("_cv"))
    val dotCC = dot(col("_cv"), col("_cv"))
    val dotQQ = dot(col("_qv"), col("_qv"))
    c.join(broadcast(q),
        if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("_dot", dotQC)
      .withColumn("_sim", col("_dot") / (sqrt(dotQQ) * sqrt(dotCC)))
      .withColumn("_l2sq", (dotCC - lit(2.0) * col("_dot")) + dotQQ)
      .withColumn("_rkc", row_number().over(wCos))
      .withColumn("_rkl", row_number().over(wL2))
      .filter(col("_rkc") <= perSystemK || col("_rkl") <= perSystemK)
      .select(col("query_id"), col("neighbor_id"),
        when(col("_rkc") <= perSystemK, col("_rkc").cast("long")).as("rk_cos"),
        when(col("_rkl") <= perSystemK, col("_rkl").cast("long")).as("rk_l2"))
  }

  /** Uniform random negatives per query — the EASY half of a contrastive
    * training pair set ([[hardNegatives]] mines the near-misses; standard
    * recipes mix k uniform negatives in as well, and "uniform" must still
    * be a pure function of the pair or a re-run silently changes the
    * training set — the [[Sampling]] determinism contract). The draw
    * ranks candidates by `md5(salt ‖ query_id ‖ '_' ‖ candidate_id)` (the
    * unit-separator guard against id-concat collisions), so any engine
    * replays the exact pick.
    *
    * Same null-safe label law as [[hardNegatives]]: a candidate qualifies
    * iff its label IS DISTINCT FROM the query's (NULL-label candidates
    * are negatives for every labeled query; NULL-vs-NULL is same-label).
    *
    * Scale shape: the bounded query side broadcasts; candidates rank in
    * one per-query window (WindowGroupLimit bounds state at k); the
    * corpus never shuffles into the join.
    *
    * Output: (query_id, neighbor_id, rk).
    */
  def uniformNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      labelCol: String, k: Int, salt: String = "graft"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val q = guardQuerySide(
      queries.select(col(idCol).as("query_id"), col(labelCol).as("_ql")),
      "uniformNegatives")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(labelCol).as("_cl"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_draw"), col("neighbor_id"))
    c.join(broadcast(q), !(col("_cl") <=> col("_ql")))
      .withColumn("_draw", md5(concat(lit(salt),
        col("query_id").cast("string"), lit("_"),
        col("neighbor_id").cast("string"))))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"))
  }

  /** Embedding-space isotropy screen: the cosine distribution of a
    * DETERMINISTIC linear pair sample — Ethayarajh EMNLP '19 measures
    * exactly this surface ("how anisotropic are the representations":
    * random-pair cosine should center near 0 for a healthy space; a
    * collapsed encoder pushes the whole histogram toward 1, and that
    * failure is invisible to any per-vector stat).
    *
    * Law: vector v pairs with vector v+`shift` (ids that exist on both
    * sides — a deterministic O(n) pair sample, never all-pairs); cosine
    * is the shared `graft_cosine` kernel (sequential-fold dots, IEEE
    * bit-stable across engines); bins are `floor(cos·halfBins)` clamped
    * to [−halfBins, halfBins−1] (cos = 1.0 lands in the top bin);
    * non-finite cosines (zero-norm vectors) drop, counted nowhere.
    * `share_micro = round(n/total·10⁶)` per bin.
    *
    * Scale shape: ONE self-equi-join on the shifted id (hash join, no
    * broadcast needed — both sides are the corpus), one ≤2·halfBins-row
    * hash aggregate + broadcast total.
    *
    * Output: (bin, n_pairs, share_micro), ordered by bin.
    */
  def cosineHistogram(df: DataFrame, idCol: String, vecCol: String,
      shift: Long = 1009L, halfBins: Int = 10): DataFrame = {
    require(shift >= 1L, s"shift must be >= 1, got $shift")
    require(halfBins >= 1, s"halfBins must be >= 1, got $halfBins")
    val e = df.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("_id"), col(vecCol).as("_v"))
    val cosCol = nativeCosine(e, col("_va"), col("_vb"))
    val binned = e.select(col("_id"), col("_v").as("_va"))
      .join(e.select((col("_id") - shift).as("_id"), col("_v").as("_vb")),
        "_id")
      .select(cosCol.as("_cos"))
      .filter(!isnan(col("_cos")) && col("_cos").isNotNull)
      .select(least(greatest(floor(col("_cos") * halfBins),
        lit(-halfBins.toLong)), lit(halfBins.toLong - 1L))
        .cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_pairs"))
    binned.crossJoin(broadcast(binned.agg(sum(col("n_pairs")).as("_t"))))
      .select(col("bin"), col("n_pairs"),
        round(col("n_pairs").cast("double") / col("_t").cast("double")
          * 1.0e6).cast("long").as("share_micro"))
      .orderBy(col("bin"))
  }
}
