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
