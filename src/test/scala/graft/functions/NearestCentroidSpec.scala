package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  private def cb(entries: (Long, Seq[Long])*) =
    array(entries.map { case (id, qc) =>
      struct(lit(id).as("cluster_id"),
        array(qc.map(lit): _*).cast("array<bigint>").as("_qc"))
    }: _*)

  test("codegen kernel ≡ the declarative max_by law it replaced (random frames)") {
    NearestCentroid.register(spark)
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 200)
      .map(i => (i.toLong, Array.fill(16)(rnd.nextInt(2000001).toLong - 1000000L)))
      .toDF("id", "qv")
    val cents = (0 until 8)
      .map(i => (i.toLong, Array.fill(16)(rnd.nextInt(2000001).toLong - 1000000L)))
    val codebook = cb(cents.map { case (i, a) => i -> a.toSeq }: _*)
    val centsDf = cents.toDF("cluster_id", "qc")
    // declarative twin: explode the codebook, interpreted-HOF dot, max_by
    val declared = vecs.crossJoin(broadcast(centsDf))
      .withColumn("_dot", aggregate(zip_with(col("qv"), col("qc"), (a, b) => a * b),
        lit(0L), (a, x) => a + x))
      .groupBy("id")
      .agg(max_by(col("cluster_id"),
        struct(col("_dot"), (-col("cluster_id")).as("_nc"))).as("cluster_id"))
      .as[(Long, Long)].collect().toMap
    val native = vecs
      .select(col("id"), NearestCentroid.nearest(col("qv"), codebook).as("c"))
      .as[(Long, Long)].collect().toMap
    assert(native === declared)
  }

  test("tie law: equal dots go to the SMALLER cluster id, order-independently") {
    NearestCentroid.register(spark)
    val v = Seq((1L, Seq(1000000L, 0L))).toDF("id", "qv")
      .withColumn("qv", col("qv").cast("array<bigint>"))
    // two identical centroids, listed large-id first: the small id must win
    val r = v.select(NearestCentroid.nearest(col("qv"),
      cb(9L -> Seq(500000L, 500000L), 2L -> Seq(500000L, 500000L))).as("c"))
      .as[Long].head()
    assert(r === 2L)
  }

  test("null laws: null vec/codebook → null; empty or all-invalid codebook → null") {
    NearestCentroid.register(spark)
    val df = Seq(Tuple1(Seq(1L, 2L))).toDF("qv")
      .withColumn("qv", col("qv").cast("array<bigint>"))
    assert(df.select(NearestCentroid.nearest(lit(null).cast("array<bigint>"),
      cb(1L -> Seq(1L, 1L)))).head().isNullAt(0))
    assert(df.select(NearestCentroid.nearest(col("qv"),
      array().cast("array<struct<cluster_id:bigint,_qc:array<bigint>>>")))
      .head().isNullAt(0), "empty codebook must yield the no-home NULL")
  }

  test("SQL surface resolves after registration") {
    NearestCentroid.register(spark)
    Seq(Tuple1(Seq(3L, 4L))).toDF("qv")
      .withColumn("qv", col("qv").cast("array<bigint>"))
      .createOrReplaceTempView("nc_vecs")
    val r = spark.sql(
      """SELECT graft_nearest_centroid(qv,
        |  array(named_struct('cluster_id', 7L, '_qc', array(1L, 1L)))) AS c
        |FROM nc_vecs""".stripMargin).as[Long].head()
    assert(r === 7L)
  }
}
