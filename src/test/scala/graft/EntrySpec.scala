package graft

/** Driver-contract smoke: `entry` must return rows on sf0.001 and every
  * registered query must have either an oracle or a documented rows-only
  * rationale.
  */
class EntrySpec extends SparkSpec {

  test("entry: flagship query returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("status_name"))
  }

  test("oracle map: every key exists in queries; rows-only set is exactly the intended one") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without query: ${o -- q}")
    assert((q -- o) === Set("q_simhash_neardup", "q_ann_lsh", "q_ann_ivf"),
      "rows-only queries drifted — add an oracle or update the rationale")
  }

  test("every query runs on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, name) // near-dup pair sets may legitimately be empty
    }
  }
}
