package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step a
  * training-data dedup pipeline runs AFTER candidate pairs are verified
  * (MinHash/SimHash/exact-Jaccard → pairs → components → one survivor per
  * component). The reference has no graph operator; this extends the engine
  * the same way the dedup family does (SURVEY.md §8).
  *
  * Algorithm: iterative min-label propagation with a pointer-jumping
  * (path-compression) join each round, the alternating-contraction idea of
  * the large-star/small-star MapReduce algorithm (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14). Per round:
  *
  *   1. neighbor-min: every node takes `min(own label, min of neighbors'
  *      labels)` — one shuffle join edges⋈labels + one hash aggregate;
  *   2. pointer jump: every node replaces its label by its LABEL'S label
  *      (`comp ← comp(comp)`, chasing the round-start map — synchronous
  *      doubling) — one join against the (tiny) checkpointed label frame.
  *
  * Step 2 is what turns O(diameter) rounds into O(log diameter): labels hop
  * toward the component minimum exponentially, so even a pathological chain
  * graph (diameter n) converges in ~log₂ n rounds (pinned by the chain
  * property test). Every round `localCheckpoint`s the label frame — the
  * driver loop holds plans, never data, exactly like [[Hierarchy]]'s
  * fixpoint.
  *
  * Scale: the working set is one (id, comp) row per VERTEX of the pair
  * graph (near-dup pairs, not the corpus — typically orders of magnitude
  * smaller than the document table), hash-partitioned by id; each round is
  * two shuffles of that frame. The round's starting label rides along as
  * `_prev`, so convergence detection is a filter over the already-
  * checkpointed frame (no extra join); quiet graphs (cliques — the common
  * near-dup shape) finish in 2 rounds.
  */
object Clusters {

  /** `localCheckpoint` a frame and capture the RDD this call just created,
    * so [[release]] frees exactly our own block-manager storage and never a
    * caller's. Walking a frame's plan leaves instead would also collect
    * checkpoint RDDs the CALLER owns (e.g. an edges frame the caller
    * localCheckpointed before handing it in) — unpersisting those truncates
    * their lineage-free blocks and any later use of the caller's frame dies
    * with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. Capturing at creation time is
    * immune: the just-checkpointed frame's only leaf is the RDD this call
    * made.
    */
  private[graft] def ownedCheckpoint(df: DataFrame): (DataFrame, Seq[RDD[_]]) = {
    val cp = df.localCheckpoint()
    val own = cp.queryExecution.analyzed.collectLeaves().collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    (cp, own.toSeq)
  }

  /** Eagerly drop the block-manager storage of RDDs [[ownedCheckpoint]]
    * created; without this, every round's checkpoint frames linger until RDD
    * garbage collection, which can lag on a long-lived driver.
    */
  private[graft] def release(rdds: Seq[RDD[_]]): Unit = rdds.foreach(_.unpersist(false))

  /** Components of the undirected graph given by `edges(srcCol, dstCol)`.
    * Returns one row per vertex: (id, component) where component is the
    * minimum vertex id reachable — deterministic, so oracle-comparable.
    *
    * Throws if `maxIter` is exhausted before convergence: silently returning
    * partially-merged labels would make dedup callers keep duplicate
    * survivors with no signal. At the default 32 rounds, pointer jumping
    * needs a component diameter beyond ~2^32 to trip this.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 32): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
    // undirected: keep both directions so "min over neighbors" sees the
    // whole neighborhood from either endpoint
    // edges are re-joined every round: cut re-compute + lineage
    val (bidir, bidirOwn) = ownedCheckpoint(
      e.union(e.select(col("d").as("s"), col("s").as("d")))
        .filter(col("s") =!= col("d")).distinct())
    var (labels, labelsOwn) = ownedCheckpoint(
      bidir.select(col("s").as("id")).distinct()
        .withColumn("comp", col("id")))
    var iter = 0
    var changed = !labels.isEmpty
    while (changed && iter < maxIter) {
      // 1. neighbor-min — carry the round's starting label through as
      // `_prev` so convergence below is a scan of the checkpointed frame,
      // not an extra shuffle join against the previous round
      val nmin = bidir.join(labels, bidir("s") === labels("id"))
        .groupBy(col("d").as("_id")).agg(min(col("comp")).as("_nmin"))
      val stepped = labels.join(nmin, col("id") === col("_id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("_nmin"), col("comp"))).as("comp"),
          col("comp").as("_prev"))
      // 2. pointer jump against the ROUND-START map — the classic
      // synchronous `p ← p∘p` doubling. Jumping on `labels` (already
      // checkpointed) instead of on `stepped` itself means `stepped` feeds
      // exactly one consumer and never needs its own eager materialization:
      // one checkpoint job per round instead of two. Labels only decrease
      // and only within a component, so chasing the older map stays correct;
      // the doubling argument (distance to the component min halves per
      // round) holds for the synchronous form, pinned by the chain test.
      val (jumped, jumpedOwn) = ownedCheckpoint(
        stepped.as("l").join(
            labels.select(col("id").as("_jid"), col("comp").as("_jcomp")),
            col("l.comp") === col("_jid"), "left")
          .select(col("l.id").as("id"),
            least(col("l.comp"), coalesce(col("_jcomp"), col("l.comp"))).as("comp"),
            col("l._prev")))
      changed = !jumped.filter(col("comp") =!= col("_prev")).isEmpty
      // `jumped` is materialized (eager checkpoint) and now carries the
      // state: release the previous round's label frame, or block-manager
      // storage accumulates across rounds
      release(labelsOwn)
      labels = jumped.select(col("id"), col("comp"))
      labelsOwn = jumpedOwn
      iter += 1
    }
    release(bidirOwn)
    if (changed)
      throw new IllegalStateException(
        s"connectedComponents: maxIter=$maxIter exhausted before convergence " +
          "— labels are partially merged")
    labels.select(col("id"), col("comp").as("component"))
  }

  /** Cluster assignment for a near-dup pair frame (id_a, id_b, …): every
    * document that participates in at least one verified pair, labeled with
    * its cluster id (= min doc id in the cluster). Downstream keeps
    * `id == cluster_id` rows as survivors and drops the rest.
    */
  def dedupClusters(pairs: DataFrame, idACol: String = "id_a",
      idBCol: String = "id_b", maxIter: Int = 32): DataFrame =
    connectedComponents(pairs, idACol, idBCol, maxIter)
      .select(col("id").as("doc_id"), col("component").as("cluster_id"))
}
