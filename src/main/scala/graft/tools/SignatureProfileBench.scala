package graft.tools

import org.apache.spark.sql.SparkSession

/** Measured oracle-vs-production throughput of the SimHash token-hash
  * profiles (r11 verdict task 7): the md5 profile buys bit-for-bit DuckDB
  * replay at the price of a cryptographic digest per token; the xxhash64
  * profile is the production flag. This probe hashes the documents table
  * under both profiles (same tokenizer, same signature law) and prints
  * per-profile wall time + the ratio — the number the round appendix
  * records. Also asserts the two profiles produce the SAME pair count on
  * planted exact duplicates (the law, not the hash, decides recall of
  * Hamming-0 pairs).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain
  * graft.tools.SignatureProfileBench [reps]`
  */
object SignatureProfileBench {
  def main(args: Array[String]): Unit = {
    val reps = args.lift(0).map(_.toInt).getOrElse(3)
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    docs.write.mode("overwrite").format("noop").save() // page-in
    val n = docs.count()
    def timeProfile(profile: String): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.ops.Dedup.simhashFrame(docs, "doc_id", "text", profile)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    // warm both paths once (JIT) before timing
    timeProfile(graft.ops.Dedup.Md5Profile)
    timeProfile(graft.ops.Dedup.XxProfile)
    val md5T = timeProfile(graft.ops.Dedup.Md5Profile)
    val xxT = timeProfile(graft.ops.Dedup.XxProfile)
    println(f"=== simhash signature pass over $n rows (best-of-$reps) ===")
    println(f"md5 (oracle) profile:       $md5T%.3f s  (${n / md5T}%.0f rows/s)")
    println(f"xxhash64 (prod) profile:    $xxT%.3f s  (${n / xxT}%.0f rows/s)")
    println(f"production speedup:         ${md5T / xxT}%.2f x")
    // law check at scale: both profiles must catch every planted
    // Hamming-0 pair (identical text ⇒ identical signature, any hash)
    import spark.implicits._
    val planted = (0 until 200).flatMap { p =>
      val t = s"planted adjudication pair $p content ${p * 31}"
      Seq((900000L + p, t), (910000L + p, t))
    }.toDF("doc_id", "text")
    Seq(graft.ops.Dedup.Md5Profile, graft.ops.Dedup.XxProfile).foreach { pr =>
      val got = graft.ops.Dedup.simhashPairs(planted, "doc_id", "text",
          profile = pr)
        .filter($"id_a" >= 900000L && $"id_b" >= 910000L && $"hamming" === 0)
        .count()
      require(got >= 200L, s"profile $pr missed planted pairs: $got/200")
      println(s"profile $pr planted-pair recall: $got/200 OK")
    }
    spark.stop()
  }
}
