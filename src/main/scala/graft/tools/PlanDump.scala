package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Dumps `.explain("formatted")` for named registry queries to files —
  * the r19 optimization round's before/after plan evidence
  * (`plans/r19/<query>_<tag>.txt`). Mirrors the Bench session config
  * (master/shuffle partitions from SPARK_GRAFT_CPUS) so the captured
  * plans are the ones the bench actually executes.
  *
  * Usage: `sbt "runMain graft.tools.PlanDump <outDir> <tag> q_a,q_b [sfDir]"`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r19")
    val tag = args.lift(1).getOrElse("before")
    val names = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(Registry.queries.keys.toSeq.sorted)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = Registry.queries(n)(spark, sfDir)
      // the formatted EXECUTED-side plan string (pre-execution AQE root);
      // captured via the public explain surface so the file matches what
      // a user would see
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
        df.explain("formatted")
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${n}_$tag.txt"),
        out.toString("UTF-8"))
      println(s"[plandump] wrote $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
