package graft.multimodal

import graft.SparkSpec

/** Byte-level fixtures for the REAL codecs — built independently of the
  * decoder (the test's own model of the formats).
  */
object MediaFixture {
  /** 24-bit bottom-up BI_RGB BMP with solid quadrant colors. */
  def bmp(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val size = 54 + stride * h
    val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(stride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (yUp <- (h - 1) to 0 by -1; x <- 0 until w) {
      val (r, g, bl) = px(x, yUp)
      val off = 54 + (h - 1 - yUp) * stride + x * 3
      b.put(off, bl.toByte); b.put(off + 1, g.toByte); b.put(off + 2, r.toByte)
    }
    b.array()
  }

  def ppm(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      val off = header.length + (y * w + x) * 3
      out(off) = r.toByte; out(off + 1) = g.toByte; out(off + 2) = b.toByte
    }
    out
  }

  /** Minimal 16-bit PCM WAV. */
  def wav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    b.put("data".getBytes).putInt(dataSize)
    samples.foreach(b.putShort)
    b.array()
  }
}

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

  test("resize: metadata updated, payload untouched for non-decodable kinds") {
    val r = Multimodal.resize(media, 224, 224).head()
    assert(r.width === Some(224) && r.height === Some(224))
    assert(r.payload.nonEmpty)
  }

  test("real codec: BMP and PPM decode to identical pixels; quadrant features") {
    def quad(x: Int, y: Int): (Int, Int, Int) =
      if (x < 4 && y < 4) (255, 255, 255) else (0, 0, 0) // white TL, black rest
    val viaBmp = Codec.decodeImage(MediaFixture.bmp(8, 8, quad)).get
    val viaPpm = Codec.decodeImage(MediaFixture.ppm(8, 8, quad)).get
    assert(viaBmp.width === 8 && viaBmp.height === 8)
    assert(viaBmp.rgb.toSeq === viaPpm.rgb.toSeq) // two containers, same pixels
    val f = Codec.imageFeatures(viaBmp)
    assert(f.length === 16)
    assert(f(0) > 0.9f) // top-left grid cell is white
    assert(f(15) < 0.1f) // bottom-right is black
  }

  test("real codec: resize resamples actual pixels and re-encodes as PPM") {
    def quad(x: Int, y: Int): (Int, Int, Int) =
      if (x < 4 && y < 4) (200, 10, 30) else (0, 0, 0)
    val img = Codec.decodeImage(MediaFixture.bmp(8, 8, quad)).get
    val resized = Codec.decodeImage(Codec.resizeToPpm(img, 4, 4)).get
    assert(resized.width === 4 && resized.height === 4)
    // top-left quadrant color survives the downsample
    assert((resized.rgb(0) & 0xFF) === 200)
    assert((resized.rgb((3 * 4 + 3) * 3) & 0xFF) === 0)

    // the Spark-level resize stage actually transforms decodable payloads
    val mediaImg = Multimodal.asMedia(
      Seq((1L, MediaFixture.bmp(8, 8, quad))).toDF("id", "img"), "id", "img", "image")
    val out = Multimodal.resize(mediaImg, 4, 4).head()
    assert(Codec.decodeImage(out.payload).get.width === 4)
  }

  test("real codec: PCM WAV sample rate, duration, amplitude features") {
    val samples = Array.tabulate[Short](8000)(i =>
      (math.sin(i * 2 * math.Pi / 100) * 16000).toShort)
    val a = Codec.decodeWav(MediaFixture.wav(8000, samples)).get
    assert(a.sampleRate === 8000 && a.channels === 1)
    assert(Codec.audioDurationMs(a) === 1000L) // 8000 samples @ 8kHz = 1s
    val f = Codec.audioFeatures(a)
    assert(f.length === 16 && math.abs(f.sum - 1.0f) < 1e-3)
    // decodeFeatures integrates the real audio path
    val mediaWav = Multimodal.asMedia(
      Seq((7L, MediaFixture.wav(8000, samples))).toDF("id", "wav"), "id", "wav", "audio")
    val feats = Multimodal.decodeFeatures(mediaWav).head()
    assert(feats.features.toSeq === f.toSeq)
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
