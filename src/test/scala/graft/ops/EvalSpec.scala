package graft.ops

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("aucByGroup: separation, inversion, tie half-credit, degenerate NULL, NULL exclusion") {
    val rows = Seq(
      // a: perfect separation → 1.0
      ("a", 3.0, true), ("a", 4.0, true), ("a", 1.0, false), ("a", 2.0, false),
      // b: perfectly inverted → 0.0
      ("b", 1.0, true), ("b", 2.0, false),
      // c: full ties → 0.5 (average-rank law)
      ("c", 1.0, true), ("c", 2.0, true), ("c", 1.0, false), ("c", 2.0, false),
      // d: positives only → NULL auc
      ("d", 1.0, true), ("d", 2.0, true))
      .toDF("g", "score", "label")
      // a NULL score must not perturb group a
      .union(Seq(("a", null.asInstanceOf[java.lang.Double], true))
        .toDF("g", "score", "label"))

    val got = Eval.aucByGroup(rows, "score", "label", "g")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got("a") === ((2L, 2L, Some(1.0))))
    assert(got("b") === ((1L, 1L, Some(0.0))))
    assert(got("c") === ((2L, 2L, Some(0.5))))
    assert(got("d") === ((2L, 0L, None)))
  }

  test("auc agrees with the pair-counting definition on a random frame") {
    val rnd = new scala.util.Random(23L)
    val rows = Seq.fill(300)((rnd.nextInt(20).toDouble, rnd.nextBoolean()))
    val df = rows.toDF("score", "label")
    val got = Eval.auc(df, "score", "label").select("auc").head.getDouble(0)
    // P(pos > neg) + P(tie)/2 by brute force over all pairs
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val want = wins / (pos.size.toDouble * neg.size)
    assert(math.abs(got - want) < 1e-12, s"$got vs $want")
  }
}
