package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ingest.{Coerce, ParquetRawSource, Quarantine, RawSource}
import graft.ops.{Enrich, Parents, Upsert}
import graft.views.Analytic

/** The reference's hard-coded main() call sequence
  * (SQLiteDirectImporter.java:109-221; SURVEY.md §3.1) as one composable
  * pipeline: scan → positional project → coerce → derive → upsert-dedup →
  * parent resolution → analytic views.
  *
  * Stage dataflow (physical): scan/coerce/enrich are narrow (per-split);
  * the upsert window is shuffle #1 (hash by key); `status_summary` is
  * shuffle #2 (hash agg); parent resolution is a broadcast join (no shuffle
  * of the big side); hierarchy is a bounded driver-loop of distributed
  * joins. That is the entire shuffle budget of the reference pipeline.
  */
object Pipeline {

  /** Ingest one batch of report data into the final analytical frame. */
  def run(spark: SparkSession, path: String, source: RawSource = ParquetRawSource): DataFrame =
    runWithQuarantine(spark, path, source)._1

  /** Same, but also surfaces the structurally-rejected rows (A6 error
    * channel) for the report.
    */
  def runWithQuarantine(spark: SparkSession, path: String,
      source: RawSource = ParquetRawSource): (DataFrame, DataFrame) = {
    val (good, bad) = Quarantine.split(source.load(spark, path))
    (resolve(Enrich(Coerce(good))), bad)
  }

  /** The post-ingest passes over an already-typed frame. */
  def resolve(typed: DataFrame): DataFrame = Parents(Upsert(typed))

  /** Run + bind the analytic layer (the reference's end state: a queryable
    * database).
    */
  def runAndRegister(spark: SparkSession, path: String): DataFrame = {
    val df = run(spark, path)
    Analytic.registerAll(spark, df)
    df
  }
}
