package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def pack(rows: Seq[(Long, Long)], budget: Long, nRanges: Int = 1) =
    Packing.packGreedy(rows.toDF("doc_id", "cost"), "doc_id", col("cost"),
      budget, pmod(col("doc_id"), lit(nRanges)), nRanges)

  test("greedy law: fill to budget, overflow starts a new pack") {
    val out = pack(Seq((1L, 300L), (2L, 400L), (3L, 400L), (4L, 100L)), budget = 800)
      .orderBy("doc_id").collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pack_no"))
    // 300+400=700 fits; +400 would be 1100 → new pack; +100=500 fits
    assert(out.toSeq === Seq(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("oversized doc gets its own pack; packing continues after") {
    val out = pack(Seq((1L, 100L), (2L, 5000L), (3L, 100L)), budget = 800)
      .orderBy("doc_id").collect().map(_.getAs[Long]("pack_no"))
    assert(out.toSeq === Seq(0L, 1L, 2L))
  }

  test("zero-cost doc at a pack start does not absorb an over-budget follower") {
    // exact oracle law: split iff acc + cost > budget — no acc>0 carve-out
    val out = pack(Seq((1L, 0L), (2L, 5000L), (3L, 0L)), budget = 800)
      .orderBy("doc_id").collect().map(_.getAs[Long]("pack_no"))
    assert(out.toSeq === Seq(0L, 1L, 2L)) // 5000 overflows pack 0; 0-cost after overflows pack 1
  }

  test("ranges pack independently; pack_id is globally unique") {
    val rows = (0L until 40L).map(i => (i, 300L))
    val out = pack(rows, budget = 800, nRanges = 4)
    // per range: 10 docs × 300 → packs of 2 (600), 5 packs per range
    val stats = Packing.packStats(out, budget = 800)
    assert(stats.count() === 20)
    assert(stats.agg(max("utilization")).head.getDouble(0) <= 1.0)
    assert(out.select("pack_id").distinct().count() === 20)
    // per-range pack content is the same regardless of input partitioning
    val repartitioned = Packing.packGreedy(
      rows.toDF("doc_id", "cost").repartition(13), "doc_id", col("cost"),
      800, pmod(col("doc_id"), lit(4)), 4)
    assert(out.orderBy("doc_id").collect().toSeq ===
      repartitioned.orderBy("doc_id").collect().toSeq)
  }

  test("lengthBucketBatches: homogeneous batches, exact fill arithmetic, reorder-invariant, NULL excluded") {
    import spark.implicits._
    val docs = ((1L to 37L).map(i => (i, Some(i * 20))) :+
      (99L, Option.empty[Long])).toDF("doc_id", "len")
    val got = Packing.lengthBucketBatches(docs, "doc_id", "len",
      bucketWidth = 256L, batchSize = 4)
    val rows = got.select("doc_id", "bucket", "batch_idx", "pos_in_batch")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 37, "the NULL-length row must be excluded")
    // bucket law: len div 256
    rows.foreach { case (id, b, _, _) => assert(b === (id * 20) / 256) }
    // batches are within-bucket and never overfull; full-batch count exact
    rows.groupBy(r => (r._2, r._3)).foreach { case ((b, bi), members) =>
      assert(members.length <= 4, s"batch ($b,$bi) overfull")
      assert(members.map(_._4).sorted.toSeq === (0 until members.length).map(_.toLong),
        "positions must be a dense 0..n-1")
    }
    rows.groupBy(_._2).foreach { case (b, members) =>
      val full = members.groupBy(_._3).count(_._2.length == 4)
      assert(full === members.length / 4, s"bucket $b full-batch arithmetic")
    }
    // corpus order never matters: reversed input, identical assignment
    val rev = Packing.lengthBucketBatches(docs.orderBy(col("doc_id").desc),
      "doc_id", "len", bucketWidth = 256L, batchSize = 4)
      .select("doc_id", "bucket", "batch_idx", "pos_in_batch")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rev.sortBy(_._1).toSeq === rows.sortBy(_._1).toSeq)
  }

  test("lengthBucketBatches: a length column whose name needs quoting still works") {
    import spark.implicits._
    val docs = (1L to 8L).map(i => (i, i * 300)).toDF("doc_id", "doc len")
    val got = Packing.lengthBucketBatches(docs, "doc_id", "doc len",
      bucketWidth = 256L, batchSize = 4)
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1L to 8L).map(i => i -> (i * 300) / 256).toMap,
      "the non-identifier column name must splice quoted, same div law")
  }

  test("maskSpans: stratified spans never overlap, stay in range, cover ~15%") {
    import spark.implicits._
    // 100-token doc → n_spans = 100·15/300 = 5, strata of 20
    val docs = Seq((7L, (1 to 100).map(i => s"t$i").mkString(" "))).toDF("id", "text")
    val got = Packing.maskSpans(docs, "id", "text")
      .orderBy("span_idx").collect()
      .map(r => (r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.length === 5)
    got.zipWithIndex.foreach { case ((idx, start, end), i) =>
      assert(idx === i.toLong)
      assert(end === start + 3L)
      assert(start >= i * 20L && end <= (i + 1) * 20L,
        s"span $idx [$start,$end) left its stratum [${i * 20}, ${(i + 1) * 20})")
    }
    // deterministic across invocations
    val again = Packing.maskSpans(docs, "id", "text")
      .orderBy("span_idx").collect().map(r => (r.getLong(4), r.getLong(5)))
    assert(again.toSeq === got.map(t => (t._2, t._3)).toSeq)
  }

  test("maskSpans: short documents emit nothing; threshold sits at one full span") {
    import spark.implicits._
    // 19 tokens → 19·15/300 = 0 spans; 20 tokens → 1 span
    val docs = Seq(
      (1L, (1 to 19).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 20).map(i => s"b$i").mkString(" ")))
      .toDF("id", "text")
    val got = Packing.maskSpans(docs, "id", "text")
      .collect().map(r => r.getLong(0)).toSeq
    assert(got === Seq(2L))
  }

  test("concatChunks: offsets tile each shard stream exactly, EOS included") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, (1 to (i % 5 + 1).toInt).map(j => s"w$j").mkString(" ")))
      .toDF("id", "text")
    val got = Packing.concatChunks(docs, "id", "text", seqLen = 8L, nShards = 4)
      .orderBy("shard", "pos").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getBoolean(7)))
    // per shard: start_off of pos 1 is 0, and each next start_off is the
    // previous start_off + previous n_tokens + 1 (the EOS) — no gaps, no
    // overlaps (the tiling law a dataloader depends on)
    got.groupBy(_._1).foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.head._4 === 0L, s"shard $shard stream must start at 0")
      sorted.sliding(2).foreach {
        case Array((_, _, n1, o1, _, _, _), (_, _, _, o2, _, _, _)) =>
          assert(o2 === o1 + n1 + 1L, s"shard $shard stream has a gap")
        case _ =>
      }
    }
    // chunk span law
    got.foreach { case (_, _, n, off, first, last, crosses) =>
      assert(first === off / 8L)
      assert(last === (off + n) / 8L)
      assert(crosses === (first != last))
    }
  }
}
