package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.ops.Dedup

/** Scratch profiler for operator stages (dev tool). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // `runMain graft.tools.Prof q_x q_y`: best-of-2 time just those registry
    // queries (the single-query perf iteration loop) and exit
    if (args.nonEmpty) {
      val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      args.foreach { q =>
        (1 to 2).foreach { i =>
          time(s"$q#$i")(graft.queries.Registry.queries(q)(spark, dir).count())
        }
      }
      spark.stop()
      return
    }

    time("tokens")(docs.select(TextFns.tokens(col("text")).as("t")).count())
    time("shingles")(docs.select(TextFns.shingles(col("text"), 3).as("s")).count())
    time("shingles.materialize")(
      docs.select(explode(TextFns.shingles(col("text"), 3))).count())
    time("sig16")(docs.select(Dedup.minhashSignature(col("text"), 16, 3)).count())
    time("sig64")(docs.select(Dedup.minhashSignature(col("text"), 64, 3)).count())
    time("minhash-full")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 64, 16, 3, 0.8).count())
    time("ngram-full")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count())
    time("simhash64")(docs.select(Dedup.simhash64(col("text"))).count())

    val dir = "/root/testdata/sf0.1"
    import graft.queries.Registry
    time("q_excel_dates")(Registry.qExcelDates(spark, dir).count())
    time("q_excel_dates.noorder")(Registry.qExcelDates(spark, dir)
      .drop("excel_ts").count())
    val events = spark.read.parquet(s"$dir/events.parquet")
    time("events.read")(events.count())
    time("events.ts-conv")(graft.queries.Registry.microsTs(events)
      .select(col("ts")).distinct().count())
    import graft.functions.ExcelSerial
    time("excel-conv-only")(events
      .select(ExcelSerial.excelSerialToTimestamp(col("value")).as("t"))
      .groupBy("t").count().count())
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    time("emb.count")(emb.count())
    time("lsh-buckets")(graft.ops.Similarity.lshTopK(
      emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10).count())
    // ngram stage breakdown
    val shf = docs.select(col("doc_id").as("_id"), TextFns.tokens(col("text")).as("_tk"))
      .repartition(col("_id"))
      .select(col("_id"), TextFns.shingleHashesFromTokens(col("_tk"), 3).as("_sh"))
      .repartition(col("_id"))
      .filter(size(col("_sh")) > 0)
      .withColumn("_n", size(col("_sh")).cast("bigint"))
    time("ng.sh")(shf.count())
    val exx = shf.select(col("_id"), col("_n"), explode(col("_sh")).as("_s"))
      .repartition(col("_s"))
    time("ng.explode")(exx.count())
    val joined = exx.as("a").join(exx.as("b"),
      col("a._s") === col("b._s") && col("a._id") < col("b._id"))
    time("ng.join")(joined.count())
    time("ng.group")(joined
      .groupBy(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .agg(count(lit(1)).as("_shared"), first(col("a._n")).as("_na"),
        first(col("b._n")).as("_nb")).count())
    spark.stop()
  }
}
