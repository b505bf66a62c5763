package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two traversal forms against each other: the level loop (reference
  * semantics, one join per level) and path doubling (O(log depth) rounds)
  * must produce the identical tree — including the degenerate cases the
  * join structure implies (orphans dropped, cycles never emitted).
  */
class HierarchySpec extends SparkSpec {
  import spark.implicits._

  private def forest(rows: Seq[(String, Long, Option[Long], Int)]) =
    rows.toDF("file_name", "target_file_id", "_p", "level")
      .withColumn("parent_id", col("_p").cast("string")).drop("_p")

  test("byDoubling == level loop on a random forest") {
    val rnd = new scala.util.Random(7L)
    // 400 nodes, each non-root parented onto a strictly earlier node —
    // random shape, depth emerges ~log n
    val rows = (0L until 400L).map { id =>
      val parent = if (id < 5) None else Some(rnd.nextLong(id))
      (s"n$id", 1000L + id, parent.map(_ + 1000L), 1)
    }
    val df = forest(rows)
    val a = Hierarchy(df).collect().map(_.toSeq).toSet
    val b = Hierarchy.byDoubling(df).collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.size === 400)
  }

  test("byDoubling: orphans and cycle members are dropped, like the level loop") {
    val df = forest(Seq(
      ("root", 1L, None, 1),
      ("kid", 2L, Some(1L), 1),
      ("orphan", 3L, Some(999L), 1),       // parent id resolves to no row
      ("orphan_child", 4L, Some(3L), 1),   // dangles transitively
      ("cycA", 5L, Some(6L), 1),           // 2-cycle
      ("cycB", 6L, Some(5L), 1),
      ("cyc_child", 7L, Some(5L), 1)))     // hangs off the cycle
    val loop = Hierarchy(df, maxDepth = 16).select("file_name")
      .collect().map(_.getString(0)).toSet
    val dbl = Hierarchy.byDoubling(df, maxRounds = 16).select("file_name")
      .collect().map(_.getString(0)).toSet
    assert(loop === Set("root", "kid"))
    assert(dbl === loop)
  }

  test("byDoubling: adversarial 500-deep chain resolves in logarithmic rounds, bounded time") {
    val chain = spark.range(500).select(
      concat(lit("c"), col("id")).as("file_name"),
      (col("id") + 10L).as("target_file_id"),
      when(col("id") === 0, lit(null).cast("string"))
        .otherwise((col("id") + 9L).cast("string")).as("parent_id"),
      lit(1).as("level"))
    val t0 = System.nanoTime()
    val r = Hierarchy.byDoubling(chain)
      .agg(count(lit(1)), max(col("depth")), max(length(col("path")))).head()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(r.getLong(0) === 500L)
    assert(r.getInt(1) === 499)
    // full breadcrumb survives the segment concatenation: 500 names + separators
    assert(r.getInt(2) > 500 * 3)
    // ~9 doubling rounds; a per-level loop would be 500 sequential jobs.
    // Generous bound — this fails only if doubling degenerates to linear.
    assert(secs < 120.0, f"deep chain took $secs%.1f s")
  }
}
