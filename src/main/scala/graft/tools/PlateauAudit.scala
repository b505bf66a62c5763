package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}

/** Tie-plateau audit for the registry's top-k rows (r12 verdict task 5):
  * a top-k boundary that lands INSIDE an equal-score plateau is
  * deterministic only because the ORDER BY carries a unique tiebreak
  * suffix — and therefore maximally sensitive to any future law or engine
  * drift (one changed pico reorders the whole plateau). The r12
  * adjudication found exactly this on q_adamic_adar: at sf0.01 its top-25
  * boundary cuts an 853-row plateau of single-common-neighbor deg-42
  * pairs.
  *
  * For each probe surface ([[graft.queries.Registry.topKPlateauProbes]])
  * this audit reports:
  *   - the k-th (boundary) score and how many FULL-frame rows share it;
  *   - how many rows score strictly above the boundary;
  *   - whether the boundary cuts inside a plateau (above + plateau > k);
  * and HARD-ASSERTS the tiebreak's sufficiency: the registry query run
  * twice must return bit-identical ordered rows (a cut plateau with a
  * non-deterministic tiebreak would flap the correctness hash).
  *
  * Usage: `runMain graft.tools.PlateauAudit [sfDir]`
  * (default /root/testdata/sf0.01 — the correctness gate's scale).
  */
object PlateauAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.LogLevels.quietCheckpointRelease()

    def asBig(x: Any): java.math.BigDecimal = x match {
      case null => null
      case d: java.math.BigDecimal => d
      case l: java.lang.Long => java.math.BigDecimal.valueOf(l)
      case i: java.lang.Integer => java.math.BigDecimal.valueOf(i.longValue)
      case o => new java.math.BigDecimal(o.toString)
    }

    var failed = false
    println(f"${"query"}%-16s ${"k"}%4s ${"boundary"}%16s ${"above"}%9s " +
      f"${"plateau"}%9s cut-inside  deterministic")
    graft.queries.Registry.topKPlateauProbes(spark, sfDir).foreach {
      case (name, full, scoreCol, k) =>
        val run1 = graft.queries.Registry.queries(name)(spark, sfDir).collect()
        val run2 = graft.queries.Registry.queries(name)(spark, sfDir).collect()
        val deterministic = run1.toSeq == run2.toSeq
        if (!deterministic) failed = true
        if (run1.isEmpty) {
          println(f"$name%-16s $k%4d ${"(empty result)"}%16s")
          failed = true
        } else {
        val si = run1.head.fieldIndex(scoreCol)
        val boundary = run1.map(r => asBig(r.get(si))).min(
          Ordering.fromLessThan[java.math.BigDecimal](_.compareTo(_) < 0))
        val sc = col(scoreCol).cast("decimal(38,0)")
        val b = lit(boundary).cast("decimal(38,0)")
        val agg = full.select(
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.when(sc === b, 1L).otherwise(0L))
            .as("plat"),
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.when(sc > b, 1L).otherwise(0L))
            .as("above")).collect().head
        val plateau = Option(agg.get(0)).map(_.toString.toLong).getOrElse(0L)
        val above = Option(agg.get(1)).map(_.toString.toLong).getOrElse(0L)
        val cut = above + plateau > k
        println(f"$name%-16s $k%4d ${boundary.toString}%16s $above%9d " +
          f"$plateau%9d ${if (cut) "YES" else "no"}%-10s  " +
          f"${if (deterministic) "yes" else "NO — FAIL"}")
        }
    }
    spark.stop()
    if (failed) {
      System.err.println("[plateau] FAIL: a top-k row is not deterministic")
      sys.exit(1)
    }
    println("=== plateau audit complete: every top-k row deterministic ===")
  }
}
