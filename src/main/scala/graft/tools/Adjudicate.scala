package graft.tools

import org.apache.spark.sql.SparkSession

/** Equal-load adjudication probe (r11 verdict task 2, generalized per r12
  * verdict task 2): when a round's driver bench artifact shows a query
  * family drifting vs the committed baseline while its code is untouched,
  * this tool separates LOAD from REGRESSION. It measures the SUSPECT
  * queries against a fixed CALIBRATION set (stable queries whose code also
  * didn't change), best-of-N on one warmed JVM, so the box factor divides
  * out: suspect ratio ≈ calibration ratio ⇒ the drift was load; a ratio
  * that persists above the envelope ⇒ bisect.
  *
  * Usage:
  * {{{
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   runMain graft.tools.Adjudicate [suspectsCsv] [reps] [refJson]
  * }}}
  *  - `suspectsCsv` — comma-separated registry query names to adjudicate
  *    (default: the r11 pair `q_minhash_store,q_dedup_clusters`);
  *  - `reps` — best-of-N repetitions (default 5);
  *  - `refJson` — committed full-precision bench artifact holding the
  *    reference seconds (default `BENCH_FULL.json`, the repo-root
  *    committed baseline; any file in the `{"queries":{"q_x":sec,…}}`
  *    shape works).
  *
  * The r12 round needed exactly this (ANN family + coreness read ×2-7.5
  * in a polluted driver run) and the hard-coded r11 suspect list couldn't
  * target them without a code edit.
  */
object Adjudicate {

  /** Calibration queries: cheap-to-moderate, code-stable, spanning scan /
    * agg / join / pair-join / iterative shapes so the median ratio tracks
    * the box, not one workload class. Suspects are excluded from their
    * own calibration automatically.
    */
  private val calibrationSet = Seq("q_status_summary", "q_dedup_exact",
    "q_ngram_jaccard", "q_minhash_neardup", "q_cluster_survivors")

  /** Minimal extractor for the BENCH_FULL artifact shape: top-level or
    * nested `"q_name":<number>` pairs. Good enough for the committed
    * artifact this tool reads; no JSON library exists offline.
    */
  private[tools] def parseRef(json: String): Map[String, Double] =
    "\"(q_[A-Za-z0-9_]+)\"\\s*:\\s*(-?[0-9][0-9.eE+-]*)".r
      .findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .toMap

  def main(args: Array[String]): Unit = {
    val suspects = args.lift(0)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("q_minhash_store", "q_dedup_clusters"))
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val refPath = args.lift(2).getOrElse("BENCH_FULL.json")
    val unknown = suspects.filterNot(graft.queries.Registry.queries.contains)
    require(unknown.isEmpty, s"unknown registry queries: ${unknown.mkString(",")}")
    val ref = parseRef(java.nio.file.Files.readString(
      java.nio.file.Paths.get(refPath)))
    val missingRef = suspects.filterNot(ref.contains)
    require(missingRef.isEmpty,
      s"$refPath has no reference value for: ${missingRef.mkString(",")}")
    val calib = calibrationSet.filterNot(suspects.contains).filter(ref.contains)
    require(calib.nonEmpty, s"no calibration query has a value in $refPath")
    val names = calib ++ suspects

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.LogLevels.quietCheckpointRelease()
    // same warmup discipline as Bench: JVM/codegen first-touch, page-in
    // every table, one un-timed pass over the measured queries (which
    // also commits any _store query's artifact once per JVM)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    new java.io.File(sfDir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach(f => spark.read.parquet(f.getPath)
        .write.mode("overwrite").format("noop").save())
    names.foreach { n =>
      try { graft.queries.Registry.queries(n)(spark, sfDir).count(); () }
      catch { case e: Throwable => System.err.println(s"warmup $n: ${e.getMessage}") }
    }
    val results = (1 to reps).map { pass =>
      names.map { n =>
        val t0 = System.nanoTime()
        graft.queries.Registry.queries(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[adjudicate] pass $pass $n%-22s $dt%.3f s")
        n -> dt
      }.toMap
    }
    println(s"=== adjudication (best-of-$reps, sf=$sfDir, ref=$refPath) ===")
    val best = names.map(n => n -> results.map(_(n)).min).toMap
    names.foreach { n =>
      val ratio = best(n) / ref(n)
      println(f"$n%-22s best ${best(n)}%.3f s   ref ${ref(n)}%.3f s   ratio $ratio%.2f")
    }
    val calibRatios = calib.map(n => best(n) / ref(n)).sorted
    val boxFactor = calibRatios(calibRatios.size / 2)
    println(f"calibration box factor (median of ${calib.size}): $boxFactor%.2f")
    suspects.foreach { n =>
      val adj = best(n) / ref(n) / boxFactor
      println(f"$n%-22s box-corrected ratio $adj%.2f " +
        (if (adj <= 1.2) "(within envelope — load)" else "(PERSISTS — bisect)"))
    }
    spark.stop()
  }
}
