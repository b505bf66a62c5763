package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.TransferSchema._
import graft.pipeline.{Pipeline, PipelineFixture}

/** Adapter-equivalence: every source format must produce the same raw
  * contract, and the pipeline must produce identical resolved results from
  * any of them.
  */
class RawSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val viaParquet = {
    val dir = Files.createTempDirectory("graft-src-parquet").toString
    PipelineFixture.raw(spark).write.mode("overwrite").parquet(dir)
    Pipeline.run(spark, dir)
  }

  test("csv adapter: header skip + all-string typing reach the same result") {
    val dir = Files.createTempDirectory("graft-src-csv").toString
    PipelineFixture.raw(spark)
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)
    val resolved = Pipeline.run(spark, dir, CsvRawSource)
    assert(resolved.count() === viaParquet.count())
    val a = resolved.select("file_name", "file_status", "source_file_size", "level", "parent_id")
      .collect().map(_.toSeq).toSet
    val b = viaParquet.select("file_name", "file_status", "source_file_size", "level", "parent_id")
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("json adapter: name-addressed columns, absent columns become empty string") {
    val dir = Files.createTempDirectory("graft-src-json").toString
    // drop a column entirely: JSON objects are name-addressed, so the
    // adapter must fill the absent column with "" rather than shifting
    PipelineFixture.raw(spark)
      .drop("translated_file_name")
      .coalesce(1).write.mode("overwrite").json(dir)
    val resolved = Pipeline.run(spark, dir, JsonRawSource)
    assert(resolved.count() === viaParquet.count())
    assert(resolved.filter($"translated_file_name" =!= "").count() === 0)
    val a = resolved.select("file_name", "file_status", "level", "parent_id")
      .collect().map(_.toSeq).toSet
    val b = viaParquet.select("file_name", "file_status", "level", "parent_id")
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("parquet adapter synthesizes metadata when columns are missing") {
    val dir = Files.createTempDirectory("graft-src-bare").toString
    PipelineFixture.raw(spark).drop(metaColumns: _*)
      .write.mode("overwrite").parquet(dir)
    val raw = ParquetRawSource.load(spark, dir)
    assert(metaColumns.forall(raw.columns.contains))
    assert(raw.select(srcFileCol).distinct().count() >= 1) // from input_file_name
  }
}
