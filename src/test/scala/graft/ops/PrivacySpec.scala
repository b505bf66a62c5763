package graft.ops

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymityCells: strict threshold, NULL QI values form their own class, bounded output") {
    // cells: (US, A) ×3, (US, B) ×2, (DE, A) ×1, (NULL, A) ×2 — k = 3
    // flags everything but (US, A); the NULL nation is a LINKABLE class,
    // not an exemption
    val rows = Seq(
      (Some("US"), "A"), (Some("US"), "A"), (Some("US"), "A"),
      (Some("US"), "B"), (Some("US"), "B"),
      (Some("DE"), "A"),
      (None, "A"), (None, "A"))
      .toDF("nation", "segment")
    val got = Privacy.kAnonymityCells(rows, Seq("nation", "segment"), k = 3L)
      .collect()
      .map(r => (Option(r.getString(0)), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.size === 4, "output bounded by distinct QI cells")
    assert(got((Some("US"), "A")) === ((3L, false)), "n_rows == k is safe (strict <)")
    assert(got((Some("US"), "B")) === ((2L, true)))
    assert(got((Some("DE"), "A")) === ((1L, true)))
    assert(got((None, "A")) === ((2L, true)), "NULL QI groups as its own class")
  }

  test("lDiversityCells: homogeneous big cell flagged, NULL sensitive excluded, QI/sensitive overlap rejected") {
    // (US): 3 rows, all segment A → k-anonymous at 3 but 1-diverse → risky
    // (DE): 2 rows, segments A/B → 2-diverse → safe at l=2
    // (FR): 2 rows, one NULL sensitive → distinct count 1 → risky
    val rows = Seq(
      ("US", Some("A")), ("US", Some("A")), ("US", Some("A")),
      ("DE", Some("A")), ("DE", Some("B")),
      ("FR", Some("A")), ("FR", Option.empty[String]))
      .toDF("nation", "segment")
    val got = Privacy.lDiversityCells(rows, Seq("nation"), "segment", l = 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got("US") === ((3L, 1L, true)), "homogeneous cell is the l-diversity attack")
    assert(got("DE") === ((2L, 2L, false)))
    assert(got("FR") === ((2L, 1L, true)), "NULL sensitive asserts no value")
    intercept[IllegalArgumentException] {
      Privacy.lDiversityCells(rows, Seq("segment"), "segment", l = 2L)
    }
  }

  test("tClosenessCells: hand-computed categorical EMD; exact-t boundary is NOT at risk (strict >); NULLs drop") {
    // cells: a = (x2, y1, z1), b = (x2, y2, z2), c = (z5 + one NULL).
    // Non-null corpus: Nx=4, Ny=3, Nz=8, N=15.
    //   a (nc=4): d = |30−16| + |15−12| + |15−32| = 34 → 34/120 = 0.28333…
    //   b (nc=6): d = |30−24| + |30−18| + |30−48| = 36 → 36/180 = 0.2 EXACTLY
    //   c (nc=5): present z only: |75−40| + 5·(15−8) = 70 → 70/150 = 0.4666…
    // at t = 0.2 the boundary cell b must NOT flag (strict pico compare).
    val rows = (Seq.fill(2)(("a", Some("x"))) ++ Seq(("a", Some("y")), ("a", Some("z"))) ++
      Seq.fill(2)(("b", Some("x"))) ++ Seq.fill(2)(("b", Some("y"))) ++
      Seq.fill(2)(("b", Some("z"))) ++
      Seq.fill(5)(("c", Some("z"))) :+ (("c", Option.empty[String])))
      .toDF("qi", "v")
    val got = Privacy.tClosenessCells(rows, Seq("qi"), "v",
        tPico = 200000000000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got === Map(
      "a" -> ((4L, 283333333333L, true)),
      "b" -> ((6L, 200000000000L, false)),
      "c" -> ((5L, 466666666667L, true))))
    // an all-NULL-sensitive cell has no distribution: no row
    val withEmpty = rows.union(Seq(("d", Option.empty[String])).toDF("qi", "v"))
    assert(Privacy.tClosenessCells(withEmpty, Seq("qi"), "v", 0L)
      .filter($"qi" === "d").count() === 0L)
    intercept[IllegalArgumentException] {
      Privacy.tClosenessCells(rows, Seq("v"), "v", 0L)
    }
  }

  test("kAnonymityCells: k=1 flags nothing; invalid arguments rejected") {
    val rows = Seq(("x", 1L), ("y", 2L)).toDF("q", "v")
    assert(Privacy.kAnonymityCells(rows, Seq("q"), k = 1L)
      .filter(org.apache.spark.sql.functions.col("at_risk")).count() === 0L)
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityCells(rows, Seq.empty, k = 3L)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityCells(rows, Seq("q"), k = 0L)
    }
  }
}
