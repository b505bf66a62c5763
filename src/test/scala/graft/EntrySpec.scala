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
    // rows-only rationale: only the TRAINED-centroid laws remain — IVF's
    // coarse k-means decides WHICH cells are probed, which no covering
    // contract can bypass and ANSI SQL cannot replay — plus
    // q_compress_ratio (zlib byte counts are implementation constants;
    // Verify gates the 3-point ordering invariant instead). The r11 md5
    // disciplines graduated everything else: simhash (md5 token-hash
    // signature law, both live and stored), q_ann_lsh (md5 hyperplane
    // signs), q_ann_pq_store (exact-rerank contract at shortlistFactor
    // 16). Verify keeps recall/planted floors for every ANN/simhash row.
    assert((q -- o) === Set("q_ann_ivf", "q_ann_ivf_store",
      "q_compress_ratio"),
      "rows-only queries drifted — add an oracle or update the rationale")
  }

  test("every query runs on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, name) // near-dup pair sets may legitimately be empty
    }
  }

  test("q_map_ops: a user missing event types yields 0s, not an ANSI element_at error") {
    // sf-corpus users happen to have every event type, so the driver gate
    // can't see this; under ANSI (this build's default) a plain element_at
    // THROWS on the missing keys — try_element_at is load-bearing
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-mapops").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Seq((1L, ts, 7L, "view", 1.0, "{}"),
      // a user whose ONLY event type is NULL: map_from_entries would throw
      // on the NULL key; the law keeps the user with an empty map (n_types 0,
      // matching the oracle's COUNT(DISTINCT) null-exclusion)
      (2L, ts, 8L, null.asInstanceOf[String], 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = graft.queries.Registry.qMapOps(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(rows === Map(7L -> ((0L, 0L, 0L, 1L)), 8L -> ((0L, 0L, 0L, 0L))))
  }
}
