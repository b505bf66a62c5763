package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed spectral structure of an embedding corpus — the principal
  * direction a curation pipeline whitens against, monitors for collapse
  * (one dominant component ⇒ the embedder is degenerating), and uses to
  * explain centroid drift. The reference has no analog; this extends the
  * engine the same way [[Similarity]] does (SURVEY.md §8).
  *
  * Everything follows the engine's exact-integer discipline: components
  * micro-quantize BEFORE any Σ (the [[Similarity.embeddingDimStats]]
  * law), the covariance multiplies through by n² so every matrix cell is
  * an exact integer, and the power iteration is the [[Graph.hitsMicro]]
  * round shape — exact integer matrix-vector products with ONE fixed
  * max-abs normalization chain per round — so any engine replays the
  * loadings bit-for-bit.
  */
object Spectral {

  /** Effective rank (participation ratio) of the embedding covariance —
    * the one-number collapse metric `(Σλ)² / Σλ² = tr(C)² / tr(C²)`
    * (Gao et al., "participation ratio"; equals d for isotropic
    * embeddings, →1 as a single direction swallows the variance) —
    * computed WITHOUT any eigendecomposition: `tr(C²) = Σ_ij C_ij²`,
    * so the whole metric is one more aggregate over the exact covariance
    * cells of [[topComponentMicro]]'s law.
    *
    * Exact law: C_ij as in [[topComponentMicro]] (exact integers). The
    * square sum would outgrow ANY fixed decimal (C² ~ 10⁶⁰ at modest
    * corpora), so each cell first becomes the dimensionless ratio
    * `round((C_ij/tr C)² · 1e12)` — ONE fixed double chain per cell,
    * quantized BEFORE the Σ (the KL/RBO discipline; the Σ of d² pico
    * terms fits a long) — and `pr_micro = round(1e18 / Σ)`.
    *
    * Scale shape: the same configuration-bounded Gram expansion + one
    * d²-row aggregate; no iteration, no window, no driver state.
    *
    * Output: one row (n_rows, n_dims, pr_micro) — NULL pr for a
    * degenerate (zero-trace) corpus.
    */
  def effectiveRankMicro(df: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val (cMat, n) = covarianceCells(df, idCol, vecCol)
    val tr = cMat.filter(col("i") === col("j")).agg(sum(col("c")).as("_tr"))
    // the square is an explicit self-multiply, NOT pow(x, 2): libm pow
    // is a cross-engine last-ulp trap; an IEEE multiply is not
    val ratio = col("c").cast("double") / col("_tr").cast("double")
    val terms = cMat.crossJoin(broadcast(tr))
      .select(col("i"),
        when(col("_tr") > lit(java.math.BigDecimal.ZERO).cast(dec),
          round((ratio * ratio) * 1000000000000.0).cast("long")).as("_t"))
    terms.agg(
        countDistinct(col("i")).as("n_dims"),
        sum(col("_t")).as("_s"))
      .crossJoin(broadcast(n))
      .select(col("n_rows"), col("n_dims"),
        when(col("_s") > 0L,
          round(lit(1.0e18) / col("_s").cast("double")).cast("long"))
          .as("pr_micro"))
  }

  /** Per-document embedding outlier score: the diagonal-Mahalanobis
    * Σ_d z²_d over micro-quantized components — the screen that surfaces
    * corrupted embeddings, wrong-model rows and adversarial inserts
    * before they poison centroids or ANN training. Top `k` documents by
    * score.
    *
    * Exact law: with per-dim integer moments (n, m_d = Σq, S2_d = Σq²),
    * the z-square is the exact-integer ratio
    * `z²_d = (n·q_d − m_d)² / (n·S2_d − m_d²)` (both sides DECIMAL(38,0)
    * — variance·n² and deviation²·n² — so no mean ever divides early);
    * each dim's ratio quantizes to micros in ONE fixed double chain
    * BEFORE the Σ over dims (the KL/RBO discipline; d terms, fits a
    * long). A zero-variance dim contributes exactly 0 (no signal, not a
    * NaN). Boundary orders by (outlier_micro desc, id) — deterministic.
    *
    * Scale shape: ONE corpus pass for the moments (d-row result,
    * broadcast back), one narrow per-row rescan for the scores, top-k
    * via TakeOrdered. No corpus-sized join or window.
    *
    * Output: (idCol, outlier_micro) — top `k`.
    */
  def zOutliersMicro(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 25): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    zOutlierScores(df, idCol, vecCol)
      .orderBy(col("outlier_micro").desc, col(idCol))
      .limit(k)
  }

  /** The UN-limited per-document score frame behind [[zOutliersMicro]] —
    * the tie-plateau audit's probe surface.
    */
  def zOutlierScores(df: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val clean = df
      .filter(col(vecCol).isNotNull &&
        !exists(col(vecCol), x => isnan(x.cast("double"))))
      .select(col(idCol).as("_doc"), col(vecCol).as("_v"))
    val ex = clean.select(col("_doc"), posexplode(col("_v")))
      .select(col("_doc"), col("pos").cast("long").as("i"),
        round(col("col").cast("double") * 1000000.0).cast("long").as("q"))
    val stats = ex.groupBy(col("i"))
      .agg(count(lit(1)).as("_n"), sum(col("q")).as("_m"),
        sum((col("q") * col("q")).cast(dec)).as("_s2"))
      .select(col("i"), col("_n"), col("_m"),
        (col("_n").cast(dec) * col("_s2") -
          col("_m").cast(dec) * col("_m").cast(dec)).as("_den"))
    val devN = col("_n").cast(dec) * col("q").cast(dec) - col("_m").cast(dec)
    val term = when(col("_den") > lit(java.math.BigDecimal.ZERO).cast(dec),
      round((devN * devN).cast("double") / col("_den").cast("double")
        * 1000000.0).cast("long")).otherwise(lit(0L))
    ex.join(broadcast(stats), "i")
      .select(col("_doc"), term.as("_t"))
      .groupBy(col("_doc").as(idCol))
      .agg(sum(col("_t")).as("outlier_micro"))
  }

  /** Shared exact covariance cells: (d²-row frame (i, j, c), 1-row
    * (n_rows)) — the [[topComponentMicro]] law's first half, reused by
    * [[effectiveRankMicro]]. NOT checkpointed — single-pass callers
    * compose it lazily; the iterating caller checkpoints itself.
    */
  private def covarianceCells(df: DataFrame, idCol: String,
      vecCol: String): (DataFrame, DataFrame) = {
    val dec = "decimal(38,0)"
    val clean = df
      .filter(col(vecCol).isNotNull &&
        !exists(col(vecCol), x => isnan(x.cast("double"))))
      .select(col(idCol).as("_doc"), col(vecCol).as("_v"))
    val ex = clean.select(col("_doc"), posexplode(col("_v")))
      .select(col("_doc"), col("pos").cast("long").as("i"),
        round(col("col").cast("double") * 1000000.0).cast("long").as("q"))
    val moments = ex
      .join(ex.select(col("_doc"), col("i").as("j"), col("q").as("r")),
        Seq("_doc"))
      .groupBy(col("i"), col("j"))
      .agg(sum((col("q") * col("r")).cast(dec)).as("_m"))
    val nFrame = clean.agg(count(lit(1)).as("n_rows"))
    val meansN = ex.groupBy(col("i"))
      .agg(sum(col("q")).as("_mi"))
      .crossJoin(broadcast(nFrame.select(col("n_rows").as("_n"))))
    val cMat = moments
      .join(meansN.select(col("i"), col("_mi"), col("_n")), "i")
      .join(meansN.select(col("i").as("j"), col("_mi").as("_mj")), "j")
      .select(col("i"), col("j"),
        (col("_n").cast(dec) * col("_m") -
          col("_mi").cast(dec) * col("_mj").cast(dec)).as("c"))
    (cMat, nFrame)
  }

  /** Top principal component of the vector column by `rounds` of power
    * iteration over the exact n²-scaled covariance matrix, plus the
    * Rayleigh explained-variance share.
    *
    * Law, step by step (all replayable in SQL):
    *   - rows with a NULL vector or any non-finite component drop (they
    *     assert no direction);
    *   - components quantize to micro-units `q = round(x·1e6)` (long);
    *   - second moments `M_ij = Σ_docs q_i·q_j` and means `m_i = Σ q_i`
    *     aggregate exactly (DECIMAL(38,0)); the n²-scaled covariance is
    *     the exact integer `C_ij = n·M_ij − m_i·m_j`;
    *   - `v⁰ = e₀` (1e6 at dim 0); one round is the exact integer
    *     matrix-vector product `w_j = Σ_i C_ij·v_i` followed by max-abs
    *     micro normalization `v'_j = round(w_j / max|w| · 1e6)` — the
    *     hitsMicro chain (0 when the product is all zero);
    *   - sign convention: if the loading at the smallest dim with a
    *     nonzero loading is negative, all loadings flip (eigenvectors
    *     are sign-ambiguous; the law pins one);
    *   - `eigen_share_pico = round(vᵀCv / (vᵀv · trace C) · 1e12)` — the
    *     Rayleigh quotient's share of total variance, one fixed double
    *     chain over three exact integers (NULL for a zero trace).
    *
    * Scale shape: the per-row d² pair expansion (the standard Gram-matrix
    * shuffle, bounded by CONFIGURATION — d², not data) feeds one hash
    * aggregate into a d²-row matrix frame; every round is a broadcast-
    * joinable d²⋈d join + one d-row aggregate + a 1-row max broadcast.
    * The corpus is read ONCE; no driver state beyond plans.
    *
    * Output: (dim, loading_micro, eigen_share_pico) — one row per vector
    * dimension.
    *
    * Domain bound (explicit, the pqScan posture): with micro-quantized
    * unit-scale components, the Rayleigh quad form peaks at
    * ~n²·q⁴·d² ≈ 10³⁶ around n = 3·10⁸ rows — the DECIMAL(38,0) edge.
    * The spectral probe is a DIAGNOSTIC: past that, run it over a
    * deterministic sample (q_fixed_sample / hash-mod), which is how PCA
    * probes run on 100 TB corpora anyway; the law itself never needs the
    * full corpus to be meaningful.
    */
  def topComponentMicro(df: DataFrame, idCol: String, vecCol: String,
      rounds: Int = 12): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val dec = "decimal(38,0)"
    // C_ij = n·M_ij − m_i·m_j — exact integers via the shared
    // [[covarianceCells]] law, materialized ONCE; the rounds then start
    // from block scans (the GraphWorkingSet posture)
    val (cMat, cOwned) = Clusters.ownedCheckpoint(
      covarianceCells(df, idCol, vecCol)._1)
    var v = cMat.select(col("i").as("dim")).distinct()
      .select(col("dim"),
        when(col("dim") === 0L, lit(1000000L)).otherwise(lit(0L)).as("v"))
    var vOwned: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    for (r <- 1 to rounds) {
      val w = cMat.join(v.select(col("dim").as("i"), col("v")), "i")
        .groupBy(col("j").as("dim"))
        .agg(sum(col("c") * col("v").cast(dec)).as("_w"))
      val mx = w.agg(max(abs(col("_w"))).as("_mx"))
      v = w.crossJoin(broadcast(mx))
        .select(col("dim"),
          when(col("_mx") > lit(java.math.BigDecimal.ZERO).cast(dec),
            round(col("_w").cast("double") / col("_mx").cast("double")
              * 1000000.0).cast("long"))
            .otherwise(lit(0L)).as("v"))
      // the round plan references w TWICE (directly and through the
      // 1-row max), so a fully lazy composition would double per round —
      // the hitsMicro checkpoint discipline. Every 2 rounds bounds the
      // uncollapsed subtree at ×4 while halving the materialization
      // jobs (the frame is d rows; job LAUNCH overhead dominates, the
      // r13 sweep measured ~0.2 s per materialization)
      if (r % 2 == 0 || r == rounds) {
        val (cp, own) = Clusters.ownedCheckpoint(v)
        Clusters.release(vOwned)
        v = cp
        vOwned = own
      }
    }
    // sign convention: flip so the smallest nonzero-loading dim is positive
    val signRef = v.agg(min(when(col("v") =!= 0L, col("dim"))).as("_sd"))
    val signed = v.crossJoin(broadcast(
        v.crossJoin(broadcast(signRef))
          .filter(col("dim") === col("_sd"))
          .select(when(col("v") < 0L, lit(-1L)).otherwise(lit(1L)).as("_sg"))))
      .select(col("dim"), (col("v") * col("_sg")).as("loading_micro"))
    // Rayleigh share: vᵀCv / (vᵀv · trace C), all three exact integers
    val quad = cMat
      .join(signed.select(col("dim").as("i"), col("loading_micro").as("_vi")), "i")
      .join(signed.select(col("dim").as("j"), col("loading_micro").as("_vj")), "j")
      .agg(sum(col("c") * col("_vi").cast(dec) * col("_vj").cast(dec)).as("_num"))
    val vv = signed.agg(sum((col("loading_micro") * col("loading_micro"))
      .cast(dec)).as("_den"))
    val tr = cMat.filter(col("i") === col("j")).agg(sum(col("c")).as("_tr"))
    val out = signed.crossJoin(broadcast(quad)).crossJoin(broadcast(vv))
      .crossJoin(broadcast(tr))
      .select(col("dim"), col("loading_micro"),
        when(col("_tr") > lit(java.math.BigDecimal.ZERO).cast(dec) &&
            col("_den") > lit(java.math.BigDecimal.ZERO).cast(dec),
          round(col("_num").cast("double") / col("_den").cast("double")
            / col("_tr").cast("double") * 1000000000000.0).cast("long"))
          .as("eigen_share_pico"))
    val (res, _) = Clusters.ownedCheckpoint(out)
    Clusters.release(vOwned ++ cOwned)
    res
  }
}
