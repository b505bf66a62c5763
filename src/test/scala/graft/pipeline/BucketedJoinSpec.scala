package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Evidence for the co-located-join scale claim: two tables bucketed on the
  * join key join WITHOUT a shuffle on either side — the layout every
  * repeatedly-joined 100 TB table should be written in (the static-layout
  * sibling of AQE's runtime choices). Bucket info only flows through the
  * catalog, so this uses `saveAsTable` with external paths.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two tables bucketed on the key runs with zero Exchange") {
    val base = Files.createTempDirectory("graft-bucketed").toString
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    try {
      orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$base/orders").saveAsTable("b_orders")
      lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/lineitem").saveAsTable("b_lineitem")

      // force the sort-merge path (hint on the JOIN INPUT) so the bucket
      // layout — not a broadcast — is what eliminates the exchanges
      val noBroadcast = spark.table("b_orders").hint("merge")
        .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(sum(col("l_quantity")).as("qty"))
      val p = noBroadcast.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      // neither join input may re-shuffle: bucket layout == join distribution.
      // (the post-join aggregate exchange is expected and allowed)
      val exchanges = "Exchange hashpartitioning\\((o_orderkey|l_orderkey)".r
        .findAllIn(p).toList
      assert(exchanges.isEmpty,
        s"bucketed join still shuffles its inputs: $exchanges\n$p")

      // correctness unchanged vs the plain (non-bucketed) join
      val want = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(sum(col("l_quantity")).as("qty"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = noBroadcast.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got === want)
    } finally {
      // the session catalog is shared across suites: never leak the tables
      // (or the on-disk bucketed copies) past this test, pass or fail
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(base))
    }
  }
}
