package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Collocation extraction by pointwise mutual information (Church & Hanks,
  * "Word Association Norms, Mutual Information, and Lexicography", 1990) —
  * the corpus-linguistics complement to RAKE: which adjacent word pairs
  * co-occur far more than chance ("san francisco", "machine learning").
  *
  * Law (shared verbatim with the SQL oracle):
  *  - words are [[TextFns.tokens]] of `lower(text)`; events are adjacent
  *    bigrams (the [[LangModel]] bigram law);
  *  - pmi = ln P(w1,w2) − ln P(w1) − ln P(w2) with P(w1,w2) = c12/Np
  *    (Np = total bigram occurrences) and P(w) = c/Nu (Nu = total token
  *    occurrences), expanded to a FIXED left-to-right chain over ln of
  *    exact integers:
  *    ((((ln c12 + ln Nu) + ln Nu) − ln Np) − ln c1) − ln c2,
  *    micro-quantized HALF-AWAY to BIGINT (the DSIR/[[LangModel]]
  *    discipline — identical per-pair values on both engines, and the
  *    ranking compares exact integers);
  *  - pairs below `minCount` are dropped (PMI is noise-dominated at tiny
  *    counts — the published practice);
  *  - top-k by (pmi_micro desc, w1, w2) — deterministic at the boundary.
  *
  * Scale shape: one narrow object-boundary bigram pass and one narrow
  * token pass (different laws — neither is a re-execution of the other);
  * counts are hash aggregates; the scoring joins are hash-keyed on w1/w2
  * with two 1-row total broadcasts; top-k is TakeOrderedAndProject.
  */
object Collocations {

  /** Top-k PMI collocations: (w1, w2, c12, pmi_micro). */
  def pmiTop(df: DataFrame, textCol: String, minCount: Long = 5L,
      k: Int = 25): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(minCount >= 1L && k >= 1, "need minCount >= 1, k >= 1")
    val lowered = df.select(lower(col(textCol).cast("string")).as("_t")).as[String]
    val c12 = lowered.mapPartitions(_.flatMap(LangModel.bigramsScala))
      .toDF("_w1", "_w2")
      .groupBy("_w1", "_w2").agg(count(lit(1)).as("_c12"))
    val uni = lowered.flatMap(t => TextFns.tokensScala(t))
      .toDF("_w")
      .groupBy("_w").agg(count(lit(1)).as("_c"))
    val np = c12.agg(sum(col("_c12")).as("_np"))
    val nu = uni.agg(sum(col("_c")).as("_nu"))
    def ln(c: org.apache.spark.sql.Column) = log(c.cast("double"))
    c12.filter(col("_c12") >= minCount)
      .join(uni.withColumnRenamed("_w", "_w1").withColumnRenamed("_c", "_c1"), "_w1")
      .join(uni.withColumnRenamed("_w", "_w2").withColumnRenamed("_c", "_c2"), "_w2")
      .crossJoin(broadcast(np))
      .crossJoin(broadcast(nu))
      .select(col("_w1").as("w1"), col("_w2").as("w2"), col("_c12").as("c12"),
        round((ln(col("_c12")) + ln(col("_nu")) + ln(col("_nu"))
          - ln(col("_np")) - ln(col("_c1")) - ln(col("_c2"))) * lit(1000000.0), 0)
          .cast("long").as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Naive replay of the whole law for property tests. */
  private[ops] def pmiNaive(texts: Seq[String], minCount: Long)
      : Map[(String, String), (Long, Long)] = {
    val low = texts.map(t =>
      if (t == null) null else t.toLowerCase(java.util.Locale.ROOT))
    val bis = low.flatMap(LangModel.bigramsScala(_))
    val unis = low.flatMap(TextFns.tokensScala)
    if (bis.isEmpty) return Map.empty
    val c12 = bis.groupBy(identity).map { case (kk, v) => (kk, v.size.toLong) }
    val c = unis.groupBy(identity).map { case (kk, v) => (kk, v.size.toLong) }
    val np = bis.size.toLong; val nu = unis.size.toLong
    c12.filter(_._2 >= minCount).map { case ((a, b), n12) =>
      val x = (((((math.log(n12.toDouble) + math.log(nu.toDouble))
        + math.log(nu.toDouble)) - math.log(np.toDouble))
        - math.log(c(a).toDouble)) - math.log(c(b).toDouble)) * 1000000.0
      ((a, b), (n12, java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()))
    }
  }

  /** DSIR-style cross-libm diagnostic over the actual scored pairs: the
    * minimum distance of any unquantized pmi·10⁶ from a HALF-AWAY
    * boundary. Callers pass the distinct (c12, c1, c2, np, nu) tuples.
    */
  private[ops] def minBoundaryMarginMicro(
      tuples: Seq[(Long, Long, Long, Long, Long)]): Double =
    tuples.map { case (c12, c1, c2, np, nu) =>
      val x = math.abs(((((math.log(c12.toDouble) + math.log(nu.toDouble))
        + math.log(nu.toDouble)) - math.log(np.toDouble))
        - math.log(c1.toDouble)) - math.log(c2.toDouble)) * 1000000.0
      math.abs((x - math.floor(x)) - 0.5)
    }.min
}
