package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof: latest prior-or-equal right row per key; no prior → null") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 11:00:00")),
      (3L, 10L, ts("2024-01-01 09:00:00")), // before any right row
      (4L, 20L, ts("2024-01-01 12:00:00"))  // other key
    ).toDF("id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:30:00"), 1.5),
      (101L, 10L, ts("2024-01-01 10:00:00"), 2.5), // ties left id=1 → inclusive
      (102L, 10L, ts("2024-01-01 10:30:00"), 3.5),
      (103L, 30L, ts("2024-01-01 00:00:00"), 9.9)  // different key, never matches
    ).toDF("event_id", "user_id", "ts", "value")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))

    val out = TemporalJoin.asof(left, right, Seq("user_id"), "ts", "ts",
      Seq("event_id", "value"))
      .collect().map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[java.lang.Long]("asof_event_id")).map(_.toLong),
         Option(r.getAs[java.lang.Double]("asof_value")).map(_.toDouble))).toMap
    assert(out(1L) === (Some(101L), Some(2.5))) // equal ts is inclusive
    assert(out(2L) === (Some(102L), Some(3.5)))
    assert(out(3L) === (None, None))
    assert(out(4L) === (None, None)) // key 20 has no right rows
  }

  test("rangeJoin: half-open containment, intervals spanning buckets, exact pairs") {
    val points = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // == start → in
      (2L, 10L, ts("2024-01-01 10:59:59")), // just inside
      (3L, 10L, ts("2024-01-01 11:00:00")), // == end → out (half-open)
      (4L, 10L, ts("2024-01-01 10:30:00")), // inside BOTH overlapping windows
      (5L, 20L, ts("2024-01-01 10:30:00"))  // other key → out
    ).toDF("pid", "user_id", "ts")
    val intervals = Seq(
      (100L, 10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (101L, 10L, ts("2024-01-01 10:20:00"), ts("2024-01-01 11:20:00"))
    ).toDF("wid", "user_id", "w_start", "w_end")

    val out = TemporalJoin.rangeJoin(points, intervals, Seq("user_id"),
      "ts", "w_start", "w_end", Seq("wid"), bucketSeconds = 600) // intervals span 6+ buckets
      .select("pid", "ivl_wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 100L), (2L, 100L), (2L, 101L), (3L, 101L),
      (4L, 100L), (4L, 101L)))
  }
}
