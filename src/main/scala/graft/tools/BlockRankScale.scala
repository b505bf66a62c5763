package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Closed-form scale probe for the complete-block rank family
  * ([[graft.ops.Eval.pageTrendL]] / [[graft.ops.Eval.friedmanKendallW]]
  * / [[graft.ops.Eval.quadeTest]] — the q_page_trend / q_friedman_w /
  * q_quade scaffold), the VocabScale pattern: plant a block design
  * whose within-block ranks, block-range ranks and therefore ALL THREE
  * statistics are exact closed forms, assert the engine output EXACTLY
  * on two legs (×2 blocks), and require ~linear wall growth.
  *
  * Construction: n blocks × k = 5 classes, cell(b, j) = j·(b+1). Every
  * block ranks its classes 1..k in class order (no ties), every block
  * RANGE (k−1)(b+1) is distinct and ascending in b, and with midrank
  * doubling:
  *
  *   Page:     L2 = 2n·Σj² = 110n, E2 = 90n,
  *             z = 20n / √(100n)            (the engine's own chain)
  *   Friedman: χ² = (k−1)·40n² / 40n = 4n EXACTLY,  W = 1
  *   Quade:    A16 = 160·S2, B16n = 160·T² (T = n(n+1)/2,
  *             S2 = n(n+1)(2n+1)/6) →
  *             T3 = (n−1)·T²/(n·S2 − T²) = 3(n+1) EXACTLY
  *
  * The probe replays each engine double chain verbatim (exact BigInt
  * cumulants → the same nearest doubles → the same HALF_UP pico) — any
  * drift in the scaffold's cell/semi-filter/midrank/range-rank laws
  * fails the equality. The per-block windows run over ≤ k-row
  * partitions and Quade's range ranking rides the distributed prefix
  * sum, so wall time is ~linear in blocks — the committed scale
  * classification of the family (BENCH_SF1 ratios ≤ 1.8 at 10× rows).
  *
  * Usage: `sbt "runMain graft.tools.BlockRankScale [nBlocks]"`
  * (default 500000 → 2.5M cells leg 1, 5M leg 2).
  */
object BlockRankScale {

  private val K = 5

  private def plant(spark: SparkSession, n: Long) =
    spark.range(n).selectExpr("id AS blk",
      s"explode(sequence(1, $K)) AS cls")
      .selectExpr("blk", "cls", "cls * (blk + 1) AS v")

  /** Spark round's exact path on doubles: round() RETURNS A DOUBLE and
    * the long cast truncates THAT double — so past 2^53 the replay must
    * go back through doubleValue before the long conversion (the
    * Spectral.roundSpark form; a direct longValue reads the shortest-
    * decimal digits instead of the double's exact binary integer and
    * diverges in the last ulps at ~10^18).
    */
  private def roundSpark(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue.toLong

  private def leg(spark: SparkSession, name: String, n: Long): Double = {
    val df = plant(spark, n)
    val t0 = System.nanoTime()
    val page = graft.ops.Eval.pageTrendL(df, "blk", "cls", "v")
      .collect().head
    val fried = graft.ops.Eval.friedmanKendallW(df, "blk", "cls", "v")
      .collect().head
    val quade = graft.ops.Eval.quadeTest(df, "blk", "cls", "v")
      .collect().head
    val secs = (System.nanoTime() - t0) / 1e9

    // Page: exact integers, then the engine's (diff / sqrt(n·c)) chain
    require(page.getLong(0) == n && page.getLong(1) == K.toLong,
      s"$name page: design (n=${page.getLong(0)}, k=${page.getLong(1)})")
    require(page.getLong(2) == 110L * n && page.getLong(3) == 90L * n,
      s"$name page: L2/E2 drifted — got (${page.getLong(2)}, " +
        s"${page.getLong(3)}), want (${110 * n}, ${90 * n})")
    val zExp = roundSpark(
      (20.0 * n) / math.sqrt(100.0 * n) * 1.0e12)
    require(page.getLong(4) == zExp,
      s"$name page: z_pico ${page.getLong(4)} != $zExp")

    // Friedman: χ² = 4n exactly (the quotient is a representable
    // double), W = 1
    require(fried.getLong(2) == 40L * n * n && fried.getLong(3) == 220L * n,
      s"$name friedman: S4/A4 drifted — got (${fried.getLong(2)}, " +
        s"${fried.getLong(3)}), want (${40L * n * n}, ${220 * n})")
    require(fried.getLong(4) == 4L * n * 1000000000000L,
      s"$name friedman: chi2_pico ${fried.getLong(4)} != ${4L * n} e12")
    require(fried.getLong(5) == 1000000000000L,
      s"$name friedman: perfect concordance must read W = 1, " +
        s"got ${fried.getLong(5)}")

    // Quade: exact BigInt cumulants → the engine's one double chain
    val t = BigInt(n) * BigInt(n + 1) / 2
    val s2 = BigInt(n) * BigInt(n + 1) * BigInt(2 * n + 1) / 6
    val a16 = BigInt(160) * s2
    val b16n = BigInt(160) * t * t
    require(quade.getDouble(2) == a16.toDouble &&
        quade.getDouble(3) == b16n.toDouble,
      s"$name quade: A16/B16n drifted — got (${quade.getDouble(2)}, " +
        s"${quade.getDouble(3)}), want ($a16, $b16n)")
    val den = BigInt(n) * a16 - b16n
    val t3Exp = roundSpark(
      (n - 1).toDouble * b16n.toDouble / den.toDouble * 1.0e12)
    require(quade.getLong(4) == t3Exp,
      s"$name quade: t3_pico ${quade.getLong(4)} != $t3Exp " +
        s"(closed form 3(n+1) = ${3 * (n + 1)})")

    println(f"=== $name: $n blocks x $K classes (${n * K} cells) -> " +
      f"page z EXACT, friedman chi2 = ${4 * n} EXACT, W = 1, " +
      f"quade T3 = ${3 * (n + 1)} EXACT, $secs%.1f s ===")
    secs
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    require(n >= 1000 && n <= 50000000L, s"nBlocks out of range: $n")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t1 = leg(spark, "leg1", n)
    val t2 = leg(spark, "leg2 (2x blocks)", 2 * n)
    println(f"=== blocks 2x: time x${t2 / t1}%.2f (linear-in-blocks law) ===")
    require(t2 / t1 < 3.0,
      f"time grew ${t2 / t1}%.2f x at 2x blocks — the block-rank " +
        "family should be ~linear; investigate before trusting " +
        "q_page_trend/q_friedman_w/q_quade at scale")
    spark.stop()
  }
}
