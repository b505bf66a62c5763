package graft.queries

import graft.SparkSpec

/** Pins the engine-exact FLOOR-division week law the cohort-retention
  * query uses: `(d − pmod(d, w)) div w`. Spark's `div` truncates toward
  * zero while DuckDB's `//` floors — a bare `div` would merge weeks −1
  * and 0 into one double-width bucket for any pre-origin event. The pmod
  * form makes the numerator an exact multiple of w, so both engines'
  * division semantics agree for ALL timestamps.
  */
class FloorDivLawSpec extends SparkSpec {

  test("pmod floor-division law: pre-origin deltas land in their own negative week") {
    val w = 7L
    val got = spark.sql(
      s"""SELECT d, (d - pmod(d, ${w}L)) div ${w}L AS wk FROM VALUES
         | (-15L), (-8L), (-7L), (-1L), (0L), (6L), (7L), (13L) AS t(d)""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Map(-15L -> -3L, -8L -> -2L, -7L -> -1L, -1L -> -1L,
      0L -> 0L, 6L -> 0L, 7L -> 1L, 13L -> 1L)
    assert(got === expect, s"floor weeks must match math.floorDiv: $got")
    // the law IS math.floorDiv
    expect.foreach { case (d, wk) => assert(math.floorDiv(d, w) === wk) }
  }
}
