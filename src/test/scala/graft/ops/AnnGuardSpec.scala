package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The ANN query-side boundedness guard (r11 verdict task 1): every ANN
  * entry point broadcasts its query frame or materializes per-query driver
  * state, so an oversized query frame must FAIL FAST with a
  * batch-your-queries message instead of OOMing the driver at scale. The
  * bound is `graft.ann.maxQueryRows` (session conf, default 4096).
  */
class AnnGuardSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    val rnd = new scala.util.Random(7)
    (0 until 40).map(i => i.toLong -> Array.fill(16)(rnd.nextFloat() * 2 - 1))
      .toDF("vec_id", "embedding")
  }

  /** Run `body` with the guard bound lowered to `n`, restoring after. */
  private def withBound[A](n: Int)(body: => A): A = {
    spark.conf.set("graft.ann.maxQueryRows", n.toString)
    try body finally spark.conf.unset("graft.ann.maxQueryRows")
  }

  private def assertGuardFires(op: String)(body: => Unit): Unit = {
    val e = intercept[Throwable](body)
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    val msgs = chain(e).map(t => Option(t.getMessage).getOrElse(""))
    assert(msgs.exists(m => m.contains("graft.ann.maxQueryRows") &&
        m.contains("batch your queries")),
      s"$op: expected the boundedness message, got: ${msgs.mkString(" | ")}")
  }

  test("broadcastTopK family: oversized query frame fails with the batch message") {
    withBound(8) {
      assertGuardFires("bruteForceTopK") {
        Similarity.bruteForceTopK(vecs, vecs, "vec_id", "embedding", k = 3)
          .collect()
      }
    }
  }

  test("pqScan: oversized query frame fails BEFORE the driver collect") {
    withBound(8) {
      assertGuardFires("pqTopK") {
        Similarity.pqTopK(vecs, vecs, "vec_id", "embedding", k = 3, m = 4,
          nbits = 3).collect()
      }
    }
  }

  test("lshTopK / ivfTopK: guard counts QUERIES, not exploded signature rows") {
    // 10 queries at bound 8 fails; 5 queries at bound 8 passes even though
    // tables×probes explodes them well past 8 signature rows
    withBound(8) {
      assertGuardFires("lshTopK") {
        Similarity.lshTopK(vecs, vecs.filter($"vec_id" < 10), "vec_id",
          "embedding", k = 3).collect()
      }
      assertGuardFires("ivfTopK") {
        Similarity.ivfTopK(vecs, vecs.filter($"vec_id" < 10), "vec_id",
          "embedding", k = 3).collect()
      }
      assert(Similarity.lshTopK(vecs, vecs.filter($"vec_id" < 5), "vec_id",
        "embedding", k = 3).count() > 0)
    }
  }

  test("rrf / negatives family: guard fires on the projected query side") {
    withBound(8) {
      assertGuardFires("rrfFuseTopK") {
        Similarity.rrfFuseTopK(vecs, vecs, "vec_id", "embedding").collect()
      }
      assertGuardFires("systemRankings") {
        Similarity.systemRankings(vecs, vecs, "vec_id", "embedding").collect()
      }
      assertGuardFires("uniformNegatives") {
        Similarity.uniformNegatives(
          vecs.withColumn("label", $"vec_id" % 3),
          vecs.withColumn("label", $"vec_id" % 3),
          "vec_id", "label", k = 2).collect()
      }
    }
  }

  test("guard is invisible under the bound: results identical to unguarded law") {
    // the default bound (4096) admits every registry/test query frame; a
    // bound exactly AT the frame size admits it too (<= law, not <)
    val q = vecs.filter($"vec_id" < 5)
    val base = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    val atBound = withBound(5) {
      Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", k = 3)
        .orderBy("query_id", "rank").collect().toSeq
    }
    assert(base === atBound)
    assert(base.nonEmpty)
  }
}
