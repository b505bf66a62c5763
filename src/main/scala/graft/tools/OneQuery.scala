package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query gate loop: dump ONE registry query's parquet + its oracle
  * SQL so the DuckDB compare can run on just that query instead of the
  * full 85-query `graft.Verify` pass — the oracle-authoring iteration
  * loop (seconds instead of minutes).
  *
  * Usage: `sbt "runMain graft.tools.OneQuery <q_name> [sfDir] [outDir]"`,
  * then compare with e.g.
  * `python3 scripts/check_verify.py <sfDir> <outDir>` (the out dir holds a
  * one-entry oracle_sql.json, so the checker only runs that query).
  */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(2).getOrElse("/tmp/oneq")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    graft.queries.Registry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    graft.queries.Registry.oracle.get(name).foreach { sql =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
        s"{${graft.Verify.jsonEscape(name)}: ${graft.Verify.jsonEscape(sql)}}")
    }
    println(s"=== dumped $name to $outDir ===")
    spark.stop()
  }
}
