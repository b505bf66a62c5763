package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SplitsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("withSplit: total partition, roughly 13/2/1, reproducible under repartitioning") {
    val n = docs.count()
    val split = Splits.withSplit(docs, "doc_id")
    assert(split.count() === n) // every row lands in exactly one split
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    val trainFrac = counts("train").toDouble / n
    assert(trainFrac > 0.65 && trainFrac < 0.95, s"train fraction $trainFrac far from 13/16")
    assert(counts("val") > counts("test"), "val (2/16) should exceed test (1/16) at this n")
    // pure function of the id: identical assignment on any partitioning
    val again = Splits.withSplit(docs.repartition(17), "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = split.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(first === again)
  }

  test("withSplit: membership is stable under corpus growth (split decided by id alone)") {
    val half = docs.filter(col("doc_id") % 2 === 0)
    val fromHalf = Splits.withSplit(half, "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val fromFull = Splits.withSplit(docs, "doc_id")
      .filter(col("doc_id") % 2 === 0)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fromHalf === fromFull, "adding documents must not move existing ones across splits")
  }

  test("shuffleShards: positions are a 1..n permutation per shard, deterministic") {
    val sharded = Splits.shuffleShards(docs, "doc_id", nShards = 4)
    assert(sharded.count() === docs.count())
    assert(sharded.select("shard").distinct().collect().map(_.getInt(0)).toSet
      .subsetOf((0 until 4).toSet))
    // per shard: pos is exactly 1..count(shard) with no gaps or dups
    val bad = sharded.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("d"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n") || col("d") =!= col("n"))
    assert(bad.count() === 0, "pos must be a dense 1..n permutation within each shard")
    // deterministic: identical (shard, pos) under a different partitioning
    val a = sharded.select("doc_id", "shard", "pos").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val b = Splits.shuffleShards(docs.repartition(13), "doc_id", nShards = 4)
      .select("doc_id", "shard", "pos").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(a === b)
  }

  test("shuffleShards: duplicate ids stay deterministic when keyCols disambiguate") {
    // the upsampled shape: one row per (doc_id, epoch) — doc_id alone is
    // NOT unique, so epoch must join the fingerprint and the tiebreak
    val up = Mixture.upsampleEpochs(docs, "lang", maxEpochs = 3)
    def run(d: org.apache.spark.sql.DataFrame) =
      Splits.shuffleShards(d, "doc_id", nShards = 4, keyCols = Seq("epoch"))
        .select("doc_id", "epoch", "shard", "pos").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getInt(2), r.getLong(3)))).toMap
    val a = run(up)
    val b = run(up.repartition(13))
    assert(a === b, "positions must be a pure function of (doc_id, epoch)")
    // epoch copies of one doc scatter rather than sitting adjacent: at least
    // one multi-epoch doc must have non-consecutive positions in its shard
    val scattered = a.groupBy { case ((id, _), _) => id }
      .exists { case (_, copies) =>
        val byShard = copies.values.groupBy(_._1)
        byShard.exists { case (_, ps) =>
          val sorted = ps.map(_._2).toSeq.sorted
          sorted.size > 1 && sorted.sliding(2).exists { case Seq(x, y) => y != x + 1 }
        }
      }
    assert(scattered, "epoch copies should spread across the order, not cluster")
  }

  test("shuffleShards: the order is a shuffle, not the id order") {
    val sharded = Splits.shuffleShards(docs, "doc_id", nShards = 1)
    val inOrder = sharded.orderBy("pos").select("doc_id").collect().map(_.getLong(0))
    assert(!(inOrder sameElements inOrder.sorted),
      "fingerprint order coinciding with id order would mean no shuffle happened")
  }

  test("withGroupSplit: every row of a group shares ONE split — no leakage") {
    import spark.implicits._
    val df = (0L until 600L).map(i => (i, s"grp${i % 60}")).toDF("id", "grp")
    val out = Splits.withGroupSplit(df, "grp")
    val perGroup = out.groupBy("grp")
      .agg(org.apache.spark.sql.functions.countDistinct($"split").as("ns"))
      .collect().map(_.getLong(1))
    assert(perGroup.forall(_ === 1L), "a group straddling splits leaks eval data")
    // the group's split equals the row-split of the group VALUE itself
    val want = Splits.withSplit(
        (0 until 60).map(g => Tuple1(s"grp$g")).toDF("grp"), "grp")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val got = out.select("grp", "split").distinct()
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === want)
    // grp0..grp59 inhabit all three splits (13/2/1 law; checked offline)
    assert(got.values.toSet === Set("train", "val", "test"))
  }

  test("leakageReport: planted duplicate straddling the id-split boundary is caught; content-keyed split is leak-free by construction") {
    import spark.implicits._
    // md5 last-nibble law: ids 1,2,3 land in train, ids 16,24 in test —
    // so one duplicated text planted at ids (1, 16) leaks under the
    // row-id split. Unique filler at 2, 3, 24.
    val docs = Seq(
      (1L, "the planted duplicate text"),
      (16L, "the planted duplicate text"),
      (2L, "unique filler alpha"),
      (3L, "unique filler beta"),
      (24L, "unique filler gamma"))
      .toDF("doc_id", "text")
    val byId = Splits.leakageReport(
      Splits.withSplit(docs, "doc_id"), "text", "split").collect().head
    assert((byId.getLong(0), byId.getLong(1), byId.getLong(2),
      byId.getLong(3), byId.getLong(4)) === ((3L, 2L, 4L, 1L, 1L)),
      "one fingerprint spans train and eval; one eval row contaminated")
    // same corpus under the content-keyed group split: zero leaks, as an
    // algebraic identity (every copy of a fingerprint gets ONE split)
    val withFp = docs.withColumn("_k",
      graft.functions.TextFns.fingerprintMd5($"text"))
    val byContent = Splits.leakageReport(
      Splits.withGroupSplit(withFp, "_k"), "text", "split").collect().head
    assert(byContent.getLong(3) === 0L && byContent.getLong(4) === 0L)
    assert(byContent.getLong(2) === 4L, "4 distinct fingerprints either way")
    // whitespace/case variants are the SAME fingerprint (the dedup law)
    val variants = Seq((1L, "Hello  World"), (16L, "hello world "))
      .toDF("doc_id", "text")
    val v = Splits.leakageReport(
      Splits.withSplit(variants, "doc_id"), "text", "split").collect().head
    assert(v.getLong(3) === 1L, "normalized variants leak as one family")
  }
}
