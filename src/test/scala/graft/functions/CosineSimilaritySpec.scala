package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Similarity

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    val rnd = new scala.util.Random(7)
    (0 until 50).map(i => (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v")
  }

  test("native codegen expression is bit-identical to the declarative fold") {
    CosineSimilarity.register(spark)
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .select(
        CosineSimilarity.cosine(col("a.v"), col("b.v")).as("native"),
        Similarity.cosine(col("a.v"), col("b.v")).as("fold"))
      .collect()
    assert(pairs.length === 2500)
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0))
        === java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("SQL surface: graft_cosine resolves after registration") {
    CosineSimilarity.register(spark)
    vecs.createOrReplaceTempView("cos_vecs")
    val self = spark.sql(
      "SELECT graft_cosine(v, v) AS s FROM cos_vecs").as[Double].collect()
    self.foreach(s => assert(math.abs(s - 1.0) < 1e-12))
  }

  test("null law: null array input → null result") {
    CosineSimilarity.register(spark)
    val r = Seq((Some(Array(1.0f, 2.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(CosineSimilarity.cosine(col("a"), col("b")))
      .head
    assert(r.isNullAt(0))
  }

  test("type check: non-float-array arguments rejected at analysis") {
    CosineSimilarity.register(spark)
    val err = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(CosineSimilarity.cosine(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }
}
