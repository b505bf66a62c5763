package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave on the driver. */
  private def zRef(x: Long, y: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    val (xm, ym) = (x & mask, y & mask)
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((xm >> i) & 1L) << (2 * i)) | (((ym >> i) & 1L) << (2 * i + 1))
    }
  }

  test("zValue matches the reference bit-interleave, incl. masking") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1023L, 1023L),
      (1024L, 0L) /* masked back to 0 */, (65535L, 12345L))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 10).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) === zRef(x, y, 10), s"($x, $y)")
    }
    // spot-pin the canonical small values: z(1,0)=1, z(0,1)=2, z(1,1)=3
    assert(got((1L, 0L)) === 1L && got((0L, 1L)) === 2L)
  }

  test("clusterByZ gives box-query locality that unclustered placement lacks") {
    // 64×64 grid, 16 range partitions on z. The 8×8 box at the origin is one
    // contiguous z-run (z < 64 of 4096) → lands in 1 partition (≤2 if a
    // sampled range boundary happens to split the run); round-robin placement
    // scatters the same 64 rows across essentially every partition — the
    // min/max-pruning contrast a writer gets from clustering.
    // Materialize through a real write/read: lazily, Catalyst pushes the box
    // filter BELOW the repartition and the comparison measures nothing.
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    def filesHit(layout: org.apache.spark.sql.DataFrame, dir: String): Long = {
      layout.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
        .filter(col("x") < 8 && col("y") < 8)
        .select(input_file_name()).distinct().count()
    }
    val base = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val zFiles = filesHit(
      Layout.clusterByZ(grid, "x", "y", bits = 6, numPartitions = 16), s"$base/z")
    assert(zFiles <= 2L, s"z-order box should hit ≤2 files, hit $zFiles")
    val ctrlFiles = filesHit(grid.repartition(16), s"$base/ctrl")
    assert(ctrlFiles >= 8L, s"unclustered control should scatter, hit $ctrlFiles")
  }

  test("property: zValue round-trips through de-interleaving (random points)") {
    // inverse law: collecting even bits gives x&mask, odd bits gives y&mask —
    // a z-value that loses or mixes bits would fail some random point
    def deinterleave(z: Long, bits: Int): (Long, Long) = {
      var (x, y) = (0L, 0L)
      for (i <- 0 until bits) {
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (x, y)
    }
    val rnd = new scala.util.Random(11L)
    val pts = Seq.fill(200)((rnd.nextLong().abs, rnd.nextLong().abs))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mask = (1L << 16) - 1
    got.foreach { case (x, y, z) =>
      assert(deinterleave(z, 16) === ((x & mask, y & mask)), s"($x, $y) -> $z")
    }
  }

  test("clusterByZ preserves rows and columns") {
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val out = Layout.clusterByZ(grid, "x", "y", bits = 4, numPartitions = 4)
    assert(out.columns.toSeq === Seq("x", "y"))
    assert(out.count() === 256L)
  }

  test("bucketed co-located join: ZERO exchanges, results identical to the shuffled join") {
    val dir = java.nio.file.Files.createTempDirectory("graft-buckets").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '$dir'")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the exchange-free claim is about
      // BUCKETING, not about one side being small enough to broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
      val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select("o_orderkey", "o_totalprice")
      Layout.writeBucketed(li, "bucketdb.lineitem_b", "l_orderkey", buckets = 8)
      Layout.writeBucketed(ord.withColumnRenamed("o_orderkey", "l_orderkey"),
        "bucketdb.orders_b", "l_orderkey", buckets = 8)

      val joined = spark.table("bucketdb.lineitem_b")
        .join(spark.table("bucketdb.orders_b"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      // co-bucketed scan satisfies the join's distribution: no shuffle at all
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("SelectedBucketsCount"), plan)

      // and it computes the same thing as the plain shuffled join
      val expected = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")
    }
  }

  test("shardBalance: totals, weights and skew ratios are exact") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, 10L)).toDF("id", "w")
    val got = Layout.shardBalance(df, "id", "w", nShards = 8).collect()
    assert(got.map(_.getLong(1)).sum === 200L, "row mass must be conserved")
    assert(got.map(_.getLong(2)).sum === 2000L, "weight mass must be conserved")
    got.foreach { r =>
      assert(r.getLong(0) >= 0L && r.getLong(0) < 8L)
      assert(r.getDouble(3) === r.getLong(1).toDouble * 8.0 / 200.0)
    }
    // md5 on 200 ids over 8 shards: every shard should be populated
    assert(got.length === 8)
  }

  test("shardBalance shard assignment is the Importance.bucketOf md5 law") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (1L to 50L).map(i => (i, 1L)).toDF("id", "w")
    val viaOp = Layout.shardBalance(df, "id", "w", nShards = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = df
      .select(Importance.bucketOf(col("id").cast("string"), 4).as("b"))
      .groupBy("b").count()
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    assert(viaOp === direct)
  }

  test("shardBalance: a NULL weight contributes rows but zero weight") {
    import spark.implicits._
    val df = Seq((1L, Some(5L)), (2L, None)).toDF("id", "w")
    val got = Layout.shardBalance(df, "id", "w", nShards = 1).collect()
    assert(got.length === 1)
    assert(got.head.getLong(1) === 2L)
    assert(got.head.getLong(2) === 5L)
  }
  test("idGapReport: holes inside the observed span count, open flanks don't, duplicates collapse") {
    import spark.implicits._
    // bucket 0 (ids 0,1,2,5,9): span 10, missing 5; bucket 2 (20..24):
    // contiguous, missing 0 (the 25..29 flank is unobservable by law)
    val ids = Seq(0L, 1L, 2L, 5L, 9L, 9L, 20L, 21L, 22L, 23L, 24L).toDF("id")
    val got = Layout.idGapReport(ids, "id", bucketSize = 10L, k = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(0L) === ((5L, 0L, 9L, 5L)))
    assert(got(2L) === ((5L, 20L, 24L, 0L)))
    assert(got.size === 2)
  }
}
