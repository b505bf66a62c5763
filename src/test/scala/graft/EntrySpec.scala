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

  test("every query runs on sf0.001 and its output schema is hash-portable") {
    // HASH-PORTABILITY LAW (root cause of the r12/r13 driver-gate AA /
    // triangle hash mismatches): the driver hashes string renderings of
    // the engine parquet and the DuckDB oracle result, read through
    // DIFFERENT readers — a parquet DECIMAL renders `N` under pyarrow
    // but `N.0` under a DuckDB float64 read, so identical values hash
    // apart. Output schemas therefore carry only types every reader
    // renders identically: integral, double, string, boolean, date,
    // timestamp. DECIMAL stays an INTERNAL Σ type only (cast to long at
    // the output projection); arrays/structs/maps/binary are likewise
    // reader-dependent renderings and must be presented as primitives.
    import org.apache.spark.sql.types._
    def portable(dt: DataType): Boolean = dt match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
           _: DoubleType | _: FloatType | _: StringType | _: BooleanType |
           _: DateType | _: TimestampType => true
      case _ => false
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      val bad = df.schema.fields.filterNot(f => portable(f.dataType))
      assert(bad.isEmpty,
        s"$name emits non-hash-portable output columns: " +
          bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", "))
      val n = df.count()
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
