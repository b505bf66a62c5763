package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.asMedia(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
    "doc_id", "text", kind = "video")

  test("asMedia: schema carries opaque payload + typed metadata") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("duration_ms").dataType.typeName === "long")
    assert(media.count() === 500)
  }

  test("decodeFeatures: batched mapPartitions, fixed feature dim, deterministic") {
    val f1 = Multimodal.decodeFeatures(media, batchSize = 7).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(f1.size === 500)
    assert(f1.values.forall(_.size === Multimodal.FeatureDim))
    // histogram is L1-normalized
    assert(f1.values.forall(v => math.abs(v.sum - 1.0) < 1e-3))
    // batch size must not change results (pure per-row codec, batching is
    // an execution concern) — and a different partitioning must not either
    val f2 = Multimodal.decodeFeatures(media.repartition(11), batchSize = 64)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(f1 === f2)
  }

  test("resize: metadata updated, payload untouched") {
    val r = Multimodal.resize(media, 224, 224).head()
    assert(r.width === Some(224) && r.height === Some(224))
    assert(r.payload.nonEmpty)
  }

  test("frameSample: one frame per step across duration, deterministic digests") {
    val one = media.filter($"media_id" === 0).cache()
    val dur = one.head().duration_ms.get
    val frames = Multimodal.frameSample(one, everyMs = 1000L).collect()
    assert(frames.length === (dur / 1000L + 1))
    assert(frames.map(_.frame_ts_ms).sorted.toSeq === (0L to dur by 1000L).toSeq)
    val again = Multimodal.frameSample(one, everyMs = 1000L).collect()
    assert(frames.map(_.frame_payload.toSeq).toSet === again.map(_.frame_payload.toSeq).toSet)
  }

  test("partitionForDecode: bounded rows per partition") {
    val parted = Multimodal.partitionForDecode(media, targetRowsPerPartition = 100)
    assert(parted.rdd.getNumPartitions === 5)
  }
}
