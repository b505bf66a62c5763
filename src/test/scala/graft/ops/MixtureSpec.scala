package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MixtureSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("epochCounts: head stratum runs once, tail strata scale up to the cap") {
    val counts = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMax = counts.values.max
    val epochs = Mixture.epochCounts(docs, "lang", maxEpochs = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(epochs.keySet === counts.keySet)
    val head = counts.maxBy(_._2)._1
    assert(epochs(head) === 1L, "largest stratum must run exactly one epoch")
    counts.foreach { case (lang, n) =>
      val want = math.min(4L, math.ceil(nMax.toDouble / n).toLong)
      assert(epochs(lang) === want, s"$lang: n=$n nMax=$nMax")
    }
  }

  test("upsampleEpochs: exact multiset — n_g * epochs_g rows per stratum, epochs 1..k") {
    val up = Mixture.upsampleEpochs(docs, "lang", maxEpochs = 4)
    val epochs = Mixture.epochCounts(docs, "lang", maxEpochs = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = up.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (lang, n) =>
      assert(got(lang) === n * epochs(lang), lang)
    }
    // every doc appears with the full dense epoch range of its stratum
    val bad = up.groupBy("doc_id", "lang")
      .agg(min("epoch").as("lo"), max("epoch").as("hi"), count(lit(1)).as("n"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n"))
    assert(bad.count() === 0)
  }

  test("writeJsonl: partition layout + round-trip through a JSON reader") {
    val out = Files.createTempDirectory("graft-jsonl").toString
    val withSplit = Splits.withSplit(docs.select("doc_id", "lang", "n_chars"), "doc_id")
    TrainExport.writeJsonl(withSplit, out, partitionBy = Seq("split"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs === Set("split=train", "split=val", "split=test"))
    // payload lines are valid JSON carrying the non-partition columns
    val back = spark.read.json(s"$out/split=train/")
    assert(back.columns.sorted.toSeq === Seq("doc_id", "lang", "n_chars"))
    val wantTrain = withSplit.filter(col("split") === "train")
    assert(back.count() === wantTrain.count())
    assert(back.agg(sum("n_chars")).head.getLong(0) ===
      wantTrain.agg(sum("n_chars")).head.getLong(0))
  }

  test("writeJsonl: gzip codec round-trips (the trainer-handoff compression path)") {
    val out = Files.createTempDirectory("graft-jsonl-gz").toString
    val withSplit = Splits.withSplit(docs.select("doc_id", "n_chars"), "doc_id")
    TrainExport.writeJsonl(withSplit, out, partitionBy = Seq("split"),
      codec = Some("gzip"))
    val files = new java.io.File(s"$out/split=train").listFiles()
      .filter(_.getName.endsWith(".gz"))
    assert(files.nonEmpty, "gzip codec should produce .gz part files")
    val back = spark.read.json(s"$out/split=train/") // text source decompresses by extension
    assert(back.count() === withSplit.filter(col("split") === "train").count())
  }
}
