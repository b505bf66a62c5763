package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused per-query timer — the micro-bench behind constants audits:
  * runs the named registry queries round-robin for `passes` timed
  * passes after one discarded warm-up pass (the Bench discipline,
  * without the other ~250 queries around them), printing per-query
  * median/min/max. Used for the graph-family per-round cost
  * decompositions; NOT a replacement for `graft.Bench` (which is the
  * committed artifact format).
  *
  * Usage: `sbt "runMain graft.tools.QueryTime q_a,q_b [sfDir] [passes]"`
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq).getOrElse(
      Seq("q_label_prop", "q_hits", "q_top_component", "q_coreness"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.LogLevels.quietCheckpointRelease()
    val qs = names.map(n => n -> graft.SparkEntry.queries(n))
    // discarded warm-up
    qs.foreach { case (_, fn) => fn(spark, sfDir).count() }
    val times = (1 to passes).map { _ =>
      qs.map { case (n, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        n -> (System.nanoTime() - t0) / 1e9
      }.toMap
    }
    names.foreach { n =>
      val ts = times.map(_(n)).sorted
      println(f"=== $n median ${ts((ts.size - 1) / 2)}%.2f s " +
        f"min ${ts.head}%.2f max ${ts.last}%.2f ===")
    }
    spark.stop()
  }
}
