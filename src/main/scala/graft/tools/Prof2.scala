package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.ops.Dedup

/** Isolated ngram profile (dev tool). */
object Prof2 {
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

    val tk = docs.select(col("doc_id").as("_id"), TextFns.tokens(col("text")).as("_tk"))
    time("tokens.shuffled")(tk.repartition(col("_id")).count())
    val sh1 = tk.repartition(col("_id"))
      .select(col("_id"), TextFns.shingleHashesFromTokens(col("_tk"), 3).as("_sh"))
    time("tokens+hashes.shuffled")(sh1.repartition(col("_id")).count())
    time("ngram-full-1st")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count())
    time("ngram-full-2nd")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count())
    time("minhash-full")(Dedup.minhashLshPairs(docs, "doc_id", "text", 64, 16, 3, 0.8).count())
    spark.stop()
  }
}
