package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("inclusive matches the single-task window exactly (long weights, gaps, negatives)") {
    // 10k distinct keys with gaps and negative keys; weights vary — test
    // session runs 4 shuffle partitions, so the range split is exercised
    val df = spark.range(10000)
      .select((col("id") * 7 - 35000).as("k"), (col("id") % 97 + 1).as("w"))
    val got = PrefixSum.inclusive(df, "k", col("w"), "cum")
      .select(col("k"), col("cum"))
    val ref = df.withColumn("cum",
      sum(col("w")).over(Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("k"), col("cum"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
    assert(got.count() === 10000L)
  }

  test("inclusive matches under decimal(38,0) weights") {
    val dec = "decimal(38,0)"
    val df = spark.range(500).select(col("id").as("k"),
      (col("id") * col("id")).cast(dec).as("w"))
    val got = PrefixSum.inclusive(df, "k", col("w"), "cum")
      .select(col("k"), col("cum"))
    val ref = df.withColumn("cum",
      sum(col("w")).over(Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("k"), col("cum"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("inclusive: empty input and single row") {
    val empty = spark.range(0).select(col("id").as("k"), lit(1L).as("w"))
    assert(PrefixSum.inclusive(empty, "k", col("w"), "cum").count() === 0L)
    val one = spark.range(1).select(col("id").as("k"), lit(7L).as("w"))
    val r = PrefixSum.inclusive(one, "k", col("w"), "cum").collect().head
    assert(r.getAs[Long]("cum") === 7L)
  }

  test("inclusiveAll: two weights share one range pass; totals are exact grand sums") {
    // the KS shape: two cumulatives + both grand totals in one pass
    val df = spark.range(5000)
      .select(col("id").as("k"), (col("id") % 13 + 1).as("wa"),
        (col("id") % 7).as("wb"))
    val got = PrefixSum.inclusiveAll(df, "k",
      Seq(col("wa") -> "ca", col("wb") -> "cb"), withTotals = true)
    val wRef = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df.withColumn("ca", sum(col("wa")).over(wRef))
      .withColumn("cb", sum(col("wb")).over(wRef))
    val cmp = got.select("k", "ca", "cb")
    val refCmp = ref.select("k", "ca", "cb")
    assert(cmp.exceptAll(refCmp).isEmpty && refCmp.exceptAll(cmp).isEmpty)
    // grand totals: identical on every row, equal to the plain aggregate
    val tots = got.select("ca_total", "cb_total").distinct().collect()
    assert(tots.length === 1)
    val expect = df.agg(sum("wa"), sum("wb")).head
    assert(tots.head.getLong(0) === expect.getLong(0))
    assert(tots.head.getLong(1) === expect.getLong(1))
    // ONE range shuffle at runtime — now BY CONSTRUCTION, not by AQE
    // heuristic: the ranged+pid frame is localCheckpointed, so both the
    // window branch and the offsets branch read the SAME materialized
    // RDD (one boundary set; un-reused range exchanges can sample
    // DIFFERENT boundaries and corrupt the joined offsets — the
    // q_ansari_bradley r18 incident). The executed plan must show the
    // checkpoint scan and NO live range exchange in either branch.
    got.collect()
    val p = got.queryExecution.executedPlan.toString
    assert(p.contains("ExistingRDD"),
      s"prefix-sum support no longer the checkpointed frame:\n$p")
    assert(!p.toLowerCase.contains("rangepartitioning"),
      s"a live range exchange re-appeared above the checkpoint:\n$p")
  }

  test("r19 bucketing: keys past 2^53 stay EXACT (double-cast bucket collapse is balance-only)") {
    // adjacent longs above 2^53 collapse to ONE double, so they land in
    // the same bucket — the law must still order them by the TRUE long
    // key inside the bucket's window. 40 consecutive keys at the cliff.
    val base = (1L << 53) - 10L
    val df = spark.range(40).select((lit(base) + col("id")).as("k"),
      (col("id") + 1L).as("w"))
    val got = PrefixSum.inclusive(df, "k", col("w"), "cum")
      .select(col("k"), col("cum"))
    val ref = df.withColumn("cum",
      sum(col("w")).over(Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("k"), col("cum"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("r19 bucketing: an all-tied boundary axis degrades to one bucket, never a wrong sum") {
    // every quantile boundary equal (single hot key region): the bucket
    // expression must keep tied keys together and the result exact
    val df = spark.range(1000)
      .select(when(col("id") < 990, lit(7L)).otherwise(col("id")).as("k0"))
      .groupBy(col("k0")).agg(count(lit(1)).as("w"))
      .select(col("k0").as("k"), col("w"))
    val got = PrefixSum.inclusive(df, "k", col("w"), "cum")
      .select(col("k"), col("cum"))
    val ref = df.withColumn("cum",
      sum(col("w")).over(Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("k"), col("cum"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("r19 bucketing: exactly ONE data-sized exchange in the executed plan") {
    // the rewrite's point: the window's hashpartitioning(_ps_pid)
    // exchange is the only shuffle of the data-sized frame — the old
    // range exchange (inside the checkpoint) and its follow-up hash
    // exchange are gone. Remaining exchanges must be the bounded totals
    // table's (SinglePartition over an aggregate of ≤ buckets rows).
    val df = spark.range(5000).select(col("id").as("k"), lit(1L).as("w"))
    val q = PrefixSum.inclusive(df, "k", col("w"), "cum")
    q.collect()
    // the adaptive plan string prints Final AND Initial sections —
    // count exchanges in the executed (final) section only
    val p = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // two hashpartitioning(_ps_pid) exchanges are legitimate: the
    // window's (data-sized) and the totals aggregate's (map-side
    // partials only — ≤ buckets rows per task cross it). Three would
    // mean the old double-shuffle came back.
    val pidExchanges = "hashpartitioning\\(_ps_pid".r.findAllIn(p).size
    assert(pidExchanges <= 2,
      s"expected at most two _ps_pid exchanges, got $pidExchanges:\n$p")
    assert(!p.toLowerCase.contains("rangepartitioning"),
      s"a range exchange re-appeared:\n$p")
  }

  test("no corpus-sized single-partition window in the executed plan") {
    // the point of the rewrite: every window in the plan is either
    // partitioned by the materialized pid or runs over the bounded
    // per-partition totals table (whose input is an aggregate, ≤ nParts
    // rows). Assert the plan has a window partitioned by _ps_pid.
    val df = spark.range(1000).select(col("id").as("k"), lit(1L).as("w"))
    val plan = PrefixSum.inclusive(df, "k", col("w"), "cum")
      .queryExecution.executedPlan.toString
    assert(plan.contains("_ps_pid"), "pid-partitioned window missing:\n" + plan)
  }
}
