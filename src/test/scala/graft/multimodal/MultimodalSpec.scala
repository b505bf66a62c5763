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

  /** Real PNG, encoded by the JDK's own writer — an independent producer
    * for the decode path (round-tripping our decoder against itself would
    * prove nothing).
    */
  def png(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
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

  test("real codec: PNG decodes to the same pixels and features as the BMP twin") {
    def quad(x: Int, y: Int): (Int, Int, Int) =
      if (x < 4 && y < 4) (255, 255, 255) else (0, 0, 0)
    val pngBytes = MediaFixture.png(8, 8, quad)
    assert(Codec.sniff(pngBytes) === "png")
    val viaPng = Codec.decodeImage(pngBytes).get
    val viaBmp = Codec.decodeImage(MediaFixture.bmp(8, 8, quad)).get
    assert(viaPng.width === 8 && viaPng.height === 8)
    // PNG is lossless → bit-identical RGB frame and features law as BMP
    assert(viaPng.rgb.toSeq === viaBmp.rgb.toSeq)
    assert(Codec.imageFeatures(viaPng).toSeq === Codec.imageFeatures(viaBmp).toSeq)

    // through the Spark stage: real decode (true dims), resize transforms it
    val m = Multimodal.asMedia(
      Seq((3L, pngBytes)).toDF("id", "b"), "id", "b", "image")
    val feats = Multimodal.decodeFeatures(m).head()
    assert(feats.width === 8 && feats.height === 8)
    assert(feats.features.toSeq === Codec.imageFeatures(viaPng).toSeq)
    val resized = Multimodal.resize(m, 4, 4).head()
    assert(Codec.decodeImage(resized.payload).get.width === 4)

    // a truncated PNG falls back, never throws
    assert(Codec.decodeImage(pngBytes.take(20)).isEmpty)
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

  test("real codec: corrupt/hostile payloads fall back, never throw") {
    // BMP magic with garbage header fields (negative offsets, huge dims)
    val hostile = Array.tabulate[Byte](200)(i => if (i == 0) 'B'.toByte
      else if (i == 1) 'M'.toByte else 0xEE.toByte)
    assert(Codec.decodeImage(hostile).isEmpty)
    // truncated WAV, tiny fmt chunk
    val shortWav = ("RIFF" + "\u0000" * 4 + "WAVE" + "fmt ").getBytes("ISO-8859-1")
    assert(Codec.decodeWav(shortWav).isEmpty)
    // PPM claiming absurd dimensions (w*h*3 overflows Int)
    assert(Codec.decodeImage("P6\n65536 65536\n255\nxx".getBytes).isEmpty)
    // and through the Spark stage: falls back to deterministic fake features
    val m = Multimodal.asMedia(Seq((1L, hostile)).toDF("id", "b"), "id", "b", "image")
    val f = Multimodal.decodeFeatures(m).head()
    assert(f.features.length === Multimodal.FeatureDim)
  }

  test("decode dispatch is gated by declared kind") {
    def quad(x: Int, y: Int): (Int, Int, Int) = (10, 20, 30)
    val bmp = MediaFixture.bmp(4, 4, quad)
    // same payload, declared audio → must NOT get image semantics
    val asAudio = Multimodal.decodeFeatures(
      Multimodal.asMedia(Seq((1L, bmp)).toDF("id", "b"), "id", "b", "audio")).head()
    val asImage = Multimodal.decodeFeatures(
      Multimodal.asMedia(Seq((1L, bmp)).toDF("id", "b"), "id", "b", "image")).head()
    assert(asImage.width === 4 && asImage.height === 4)
    assert(asAudio.features.toSeq !== asImage.features.toSeq) // fake vs real grid
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
  // ---- MP4 metadata probe (hand-built minimal ISO BMFF fixtures) ----

  private def be32(v: Long): Array[Byte] =
    Array[Byte](((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def box(typ: String, content: Array[Byte]): Array[Byte] =
    be32(content.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ content

  /** Minimal valid MP4: ftyp(isom) + moov(mvhd v0 + trak(tkhd v0)). */
  private def minimalMp4(timescale: Long = 1000L, duration: Long = 5000L,
      w: Int = 640, h: Int = 360): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(0) ++
      "isom".getBytes("ISO-8859-1"))
    // mvhd v0 content: ver+flags, creation, modification, timescale,
    // duration, rate, volume+reserved, 2x reserved, 36B matrix,
    // 24B predefined, next track id = 100 bytes
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++
      be32(duration) ++ be32(0x00010000L) ++ be32(0x01000000L) ++
      new Array[Byte](8) ++ new Array[Byte](36) ++ new Array[Byte](24) ++ be32(2))
    // tkhd v0 content: ver+flags, creation, modification, track id,
    // reserved, duration, 8B reserved, layer/alt/volume/reserved,
    // 36B matrix, width, height (16.16) = 84 bytes
    val tkhd = box("tkhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(1) ++
      be32(0) ++ be32(duration) ++ new Array[Byte](8) ++ new Array[Byte](8) ++
      new Array[Byte](36) ++ be32(w.toLong << 16) ++ be32(h.toLong << 16))
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
  }

  test("mp4 probe: brand, duration, display dims from a hand-built container") {
    val mp4 = minimalMp4()
    assert(Codec.sniff(mp4) === "mp4")
    assert(Codec.probeMp4(mp4) === Some(Codec.Mp4Meta("isom", 5000L, 640, 360)))
    // odd timescale: integer ms floor law
    assert(Codec.probeMp4(minimalMp4(timescale = 600L, duration = 901L)).get
      .durationMs === 1501L)
  }

  test("mp4 probe: v1 (64-bit) mvhd/tkhd variant parses identically") {
    val ftyp = box("ftyp", "mp42".getBytes("ISO-8859-1") ++ be32(0) ++
      "mp42".getBytes("ISO-8859-1"))
    val mvhd = box("mvhd", Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++
      be32(1000L) ++ be32(0) ++ be32(7000L) ++ be32(0x00010000L) ++
      be32(0x01000000L) ++ new Array[Byte](8) ++ new Array[Byte](36) ++
      new Array[Byte](24) ++ be32(2))
    val tkhd = box("tkhd", Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++
      be32(1) ++ be32(0) ++ be32(0) ++ be32(7000L) ++ new Array[Byte](8) ++
      new Array[Byte](8) ++ new Array[Byte](36) ++
      be32(1920L << 16) ++ be32(1080L << 16))
    val mp4 = ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
    assert(Codec.probeMp4(mp4) === Some(Codec.Mp4Meta("mp42", 7000L, 1920, 1080)))
  }

  test("mp4 probe: hostile/malformed payloads return None, never throw") {
    val good = minimalMp4()
    assert(Codec.probeMp4(Array[Byte](1, 2, 3)) === None, "too short")
    assert(Codec.probeMp4(good.take(40)) === None, "truncated mid-moov")
    // a lying box size pointing past the end truncates the walk -> no moov
    val lying = good.clone()
    System.arraycopy(be32(0x7FFFFFFFL), 0, lying, good.indexOfSlice("moov".getBytes) - 4, 4)
    assert(Codec.probeMp4(lying) === None, "oversized moov claim")
    // zero-size chain must terminate (cap), not loop
    val zeros = box("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes) ++
      new Array[Byte](64)
    assert(Codec.probeMp4(zeros) === None)
    // audio-only: real duration, 0x0 dims
    val audioOnly = box("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes) ++
      box("moov", box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(1000L) ++
        be32(2500L) ++ new Array[Byte](80)))
    assert(Codec.probeMp4(audioOnly) === Some(Codec.Mp4Meta("isom", 2500L, 0, 0)))
  }

  test("decode dispatch: video rows get real MP4 metadata, fake features") {
    val mp4 = minimalMp4()
    val df = Seq((50L, mp4)).toDF("media_id", "payload")
    val media = Multimodal.asMedia(df, "media_id", "payload", "video")
    val feats = Multimodal.decodeFeatures(media).head()
    assert(feats.width === 640 && feats.height === 360,
      "probed display dims must reach the feature row")
    assert(feats.features.toSeq === Multimodal.FakeCodec.decode(mp4)._3.toSeq,
      "frame-level features remain the declared deterministic fake")
  }

  // ---- MJPEG-in-AVI (hand-built RIFF fixtures, JDK-written JPEG frames) ----

  private def le32(v: Long): Array[Byte] =
    Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def riffChunk(id: String, body: Array[Byte]): Array[Byte] =
    id.getBytes("ISO-8859-1") ++ le32(body.length.toLong) ++ body ++
      (if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
  private def riffList(typ: String, body: Array[Byte]): Array[Byte] =
    riffChunk("LIST", typ.getBytes("ISO-8859-1") ++ body)

  /** A solid-color JPEG written by the JDK's own encoder — real pixels. */
  private def jpegFrame(rgb: Int, w: Int = 32, h: Int = 24): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Minimal MJPEG AVI: RIFF(AVI LIST(hdrl avih) LIST(movi 00dc*)). */
  private def mjpegAvi(frames: Seq[Array[Byte]], usPerFrame: Long,
      w: Int = 32, h: Int = 24): Array[Byte] = {
    val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w.toLong) ++ le32(h.toLong) ++ new Array[Byte](16)
    val hdrl = riffList("hdrl", riffChunk("avih", avih))
    val movi = riffList("movi",
      frames.toArray.flatMap(f => riffChunk("00dc", f)))
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
    "RIFF".getBytes("ISO-8859-1") ++ le32(body.length.toLong) ++ body
  }

  // ---- MJPEG-in-MOV (hand-built BMFF fixture, same JDK JPEG frames) ----

  private def bmffBox(typ: String, body: Array[Byte]): Array[Byte] =
    box(typ, body)

  /** Minimal MJPEG QuickTime: ftyp('qt  ') mdat(frames) moov(mvhd
    * trak(tkhd mdia(mdhd minf(stbl(stsd stts stsc stsz stco))))).
    * Samples laid out in TWO chunks (2 + rest) so the stsc run table is
    * genuinely exercised, not just a one-run degenerate.
    */
  private def mjpegMov(frames: Seq[Array[Byte]], timescale: Long = 1000L,
      delta: Long = 100L, codec: String = "jpeg"): Array[Byte] = {
    val ftyp = bmffBox("ftyp", "qt  ".getBytes("ISO-8859-1") ++ be32(0))
    val mdat = bmffBox("mdat", frames.toArray.flatten)
    val off1 = (ftyp.length + 8).toLong
    val off2 = off1 + frames.take(2).map(_.length).sum
    val dur = delta * frames.length
    val mvhd = bmffBox("mvhd", new Array[Byte](12) ++ be32(timescale) ++ be32(dur))
    val tkhd = bmffBox("tkhd",
      new Array[Byte](76) ++ be32(32L << 16) ++ be32(24L << 16))
    val mdhd = bmffBox("mdhd",
      new Array[Byte](12) ++ be32(timescale) ++ be32(dur) ++ new Array[Byte](4))
    val stsd = bmffBox("stsd", be32(0) ++ be32(1) ++
      be32(16L) ++ codec.getBytes("ISO-8859-1") ++ new Array[Byte](8))
    val stts = bmffBox("stts",
      be32(0) ++ be32(1) ++ be32(frames.length.toLong) ++ be32(delta))
    val stsc = bmffBox("stsc", be32(0) ++ be32(2) ++
      be32(1) ++ be32(2) ++ be32(1) ++
      be32(2) ++ be32(math.max(frames.length - 2, 1).toLong) ++ be32(1))
    val stsz = bmffBox("stsz", be32(0) ++ be32(0) ++
      be32(frames.length.toLong) ++
      frames.toArray.flatMap(f => be32(f.length.toLong)))
    val stco = bmffBox("stco", be32(0) ++ be32(2) ++ be32(off1) ++ be32(off2))
    val stbl = bmffBox("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val trak = bmffBox("trak",
      tkhd ++ bmffBox("mdia", mdhd ++ bmffBox("minf", stbl)))
    ftyp ++ mdat ++ bmffBox("moov", mvhd ++ trak)
  }

  test("mov mjpeg split: sample tables locate frames bit-exact; stts clock; non-JPEG refused") {
    val planted = Seq(jpegFrame(0xFF0000), jpegFrame(0x00FF00), jpegFrame(0x0000FF))
    val mov = mjpegMov(planted) // timescale 1000, delta 100 → 10 fps, 300 ms
    assert(Codec.sniff(mov) === "mp4")
    // metadata through the ordinary BMFF probe: brand, duration, tkhd dims
    assert(Codec.probeMp4(mov) === Some(Codec.Mp4Meta("qt  ", 300L, 32, 24)))
    val got = Codec.mjpegMovFrames(mov).get
    assert(got.usPerFrame === 100000L,
      "frame clock must be stts delta over the mdhd timescale")
    assert(got.frames.map(_.toSeq) === planted.map(_.toSeq),
      "stsc/stsz/stco-located samples must be the planted JPEG bytes, bit-exactly")
    assert(Codec.decodeImage(got.frames.head).get.width === 32)
    // a compressed codec in stsd must refuse (fake seam, not masquerade)
    assert(Codec.mjpegMovFrames(mjpegMov(planted, codec = "avc1")) === None)
    // stsd claims jpeg but samples are not JPEG bytes: refuse on sniff
    assert(Codec.mjpegMovFrames(
      mjpegMov(Seq(Array[Byte](1, 2, 3, 4)))) === None)
    // malformed payloads: None, never a throw
    assert(Codec.mjpegMovFrames(mov.take(40)) === None)
    assert(Codec.mjpegMovFrames(Array[Byte](1, 2, 3)) === None)
  }

  test("frameSample + features: MJPEG-in-MOV rows emit real frames under the stts clock") {
    val planted = Seq(jpegFrame(0xFF0000), jpegFrame(0x00FF00), jpegFrame(0x0000FF))
    val mov = mjpegMov(planted)
    val media = Multimodal.asMedia(
      Seq((80L, mov)).toDF("media_id", "payload"), "media_id", "payload", "video")
    val frames = Multimodal.frameSample(media, everyMs = 100L).collect()
      .sortBy(_.frame_ts_ms)
    assert(frames.map(_.frame_ts_ms).toSeq === Seq(0L, 100L, 200L, 300L))
    assert(frames.map(_.frame_payload.toSeq).toSeq ===
      Seq(planted(0), planted(1), planted(2), planted(2)).map(_.toSeq),
      "sampled MOV frames must be the planted JPEGs, bit-exactly, clamped at the tail")
    val feats = Multimodal.decodeFeatures(media).head()
    assert(feats.width === 32 && feats.height === 24)
    assert(feats.features.toSeq ===
      Codec.imageFeatures(Codec.decodeImage(planted.head).get).toSeq,
      "MOV video features must be the real first-frame image features")
  }

  test("avi probe + mjpeg split: meta from avih; frame chunks bit-exact; non-MJPEG refused") {
    val planted = Seq(jpegFrame(0xFF0000), jpegFrame(0x00FF00), jpegFrame(0x0000FF))
    val avi = mjpegAvi(planted, usPerFrame = 100000L) // 10 fps, 300 ms
    assert(Codec.sniff(avi) === "avi")
    assert(Codec.probeAvi(avi) === Some(Codec.AviMeta(100000L, 3, 32, 24)))
    assert(Codec.probeAvi(avi).get.durationMs === 300L)
    val got = Codec.mjpegFrames(avi).get
    assert(got.map(_.toSeq) === planted.map(_.toSeq),
      "split frames must be the planted JPEG bytes, bit-exactly")
    // every split frame is REAL pixels through the existing JPEG decoder
    val img = Codec.decodeImage(got.head).get
    assert(img.width === 32 && img.height === 24)
    // dc chunks that are not JPEG (a cinepak/raw AVI) must refuse — the
    // fake seam handles those, not a masquerading splitter
    val notMjpeg = mjpegAvi(Seq(Array[Byte](1, 2, 3, 4)), 100000L)
    assert(Codec.mjpegFrames(notMjpeg) === None)
    // malformed payloads: None, never a throw
    assert(Codec.probeAvi(avi.take(20)) === None)
    assert(Codec.mjpegFrames(Array[Byte](1, 2, 3)) === None)
  }

  test("frameSample: MJPEG rows emit real frames under the avih clock; others keep the fake digest") {
    val planted = Seq(jpegFrame(0xFF0000), jpegFrame(0x00FF00), jpegFrame(0x0000FF))
    val avi = mjpegAvi(planted, usPerFrame = 100000L) // 10 fps, 300 ms
    val df = Seq((60L, avi)).toDF("media_id", "payload")
    val media = Multimodal.asMedia(df, "media_id", "payload", "video")
    val frames = Multimodal.frameSample(media, everyMs = 100L).collect()
      .sortBy(_.frame_ts_ms)
    // ts 0,100,200,300 → frame idx 0,1,2,clamp(3→2)
    assert(frames.map(_.frame_ts_ms).toSeq === Seq(0L, 100L, 200L, 300L))
    assert(frames.map(_.frame_payload.toSeq).toSeq ===
      Seq(planted(0), planted(1), planted(2), planted(2)).map(_.toSeq),
      "sampled frames must be the planted JPEGs, bit-exactly, clamped at the tail")
    // features now come from the FIRST real frame's pixels (solid red →
    // every 4x4 grid cell carries the same gray), not the byte histogram
    val feats = Multimodal.decodeFeatures(media).head()
    assert(feats.width === 32 && feats.height === 24)
    assert(feats.features.toSeq ===
      Codec.imageFeatures(Codec.decodeImage(planted.head).get).toSeq,
      "video features must be the real first-frame image features")
    // a non-AVI video row still uses the declared deterministic fake
    val mp4 = minimalMp4()
    val fakeMedia = Multimodal.asMedia(
      Seq((61L, mp4)).toDF("media_id", "payload"), "media_id", "payload", "video")
    val fakeFrames = Multimodal.frameSample(fakeMedia, everyMs = 2000L).collect()
    assert(fakeFrames.forall(f =>
      f.frame_payload.toSeq === Multimodal.FakeCodec.frameAt(mp4, f.frame_ts_ms).toSeq))
  }

  test("frameSample: a hostile avih clock cannot make one row emit unbounded frames") {
    // avih claims ~2^31 frames at ~2^32 us each, but the movi list holds
    // ONE real JPEG: the sampling clock must follow the real chunks (and
    // the hard per-row cap), not the lying header
    val avih = le32(0xFFFFFFFFL) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(0x7FFFFFFFL) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(32L) ++ le32(24L) ++ new Array[Byte](16)
    val hostile = {
      val hdrl = riffList("hdrl", riffChunk("avih", avih))
      val movi = riffList("movi", riffChunk("00dc", jpegFrame(0x123456)))
      val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
      "RIFF".getBytes("ISO-8859-1") ++ le32(body.length.toLong) ++ body
    }
    val media = Multimodal.asMedia(
      Seq((70L, hostile)).toDF("media_id", "payload"), "media_id", "payload", "video")
    val n = Multimodal.frameSample(media, everyMs = 1000L).count()
    // honest duration = 1 real frame x ~4295 s -> ~4.3k samples, not ~10^13
    assert(n > 0 && n < 5000L,
      s"lying header must be bounded by the real chunk count, emitted $n rows")
  }

  test("dHash law: gradient directions pin every bit; grid-deficient images have no hash") {
    // 18x16 -> every 9x8 grid cell is exactly 2x2 px; brightness strictly
    // increasing left-to-right => every cell darker than its right
    // neighbor => all 64 bits set
    def gray(v: Int): (Int, Int, Int) = (v, v, v)
    val inc = Codec.decodeImage(MediaFixture.ppm(18, 16, (x, _) => gray(x * 14))).get
    assert(Codec.dhash64(inc) === Some(-1L))
    // decreasing and constant images: no cell is darker than its right
    val dec = Codec.decodeImage(MediaFixture.ppm(18, 16, (x, _) => gray(252 - x * 14))).get
    assert(Codec.dhash64(dec) === Some(0L))
    val flat = Codec.decodeImage(MediaFixture.ppm(18, 16, (_, _) => gray(77))).get
    assert(Codec.dhash64(flat) === Some(0L))
    // vertical gradient: rows vary, left==right everywhere -> 0
    val vert = Codec.decodeImage(MediaFixture.ppm(18, 16, (_, y) => gray(y * 15))).get
    assert(Codec.dhash64(vert) === Some(0L))
    // smaller than the 9x8 grid: undefined cells, no hash
    assert(Codec.dhash64(
      Codec.decodeImage(MediaFixture.ppm(8, 8, (_, _) => gray(10))).get) === None)
  }

  test("image near-dup: PNG≡BMP same picture pairs at 0, perturbed copy within 3, reverse gradient unpaired") {
    import spark.implicits._
    def gray(v: Int): (Int, Int, Int) = (v, v, v)
    val px: (Int, Int) => (Int, Int, Int) = (x, _) => gray((x * 254) / 35)
    val pngA = MediaFixture.png(36, 16, px)
    val bmpA = MediaFixture.bmp(36, 16, px)
    // brighten one interior 4x2 cell by 60 - crosses the ~28-level
    // neighbor gap, flipping that cell's own comparisons only
    val perturbed = MediaFixture.png(36, 16, (x, y) =>
      if (x >= 8 && x < 12 && y >= 4 && y < 6) gray(math.min(254, (x * 254) / 35 + 60))
      else px(x, y))
    val reverse = MediaFixture.png(36, 16, (x, _) => gray(254 - (x * 254) / 35))
    val tiny = MediaFixture.png(6, 6, (_, _) => gray(9))
    val rows = Seq(
      (1L, pngA, "image"), (2L, bmpA, "image"), (3L, perturbed, "image"),
      (4L, reverse, "image"), (5L, tiny, "image"),
      (6L, pngA, "audio"),                     // wrong kind: gated out
      (7L, Array[Byte](1, 2, 3), "image"))     // undecodable: dropped
    val ds = rows.groupBy(_._3).map { case (kind, rs) =>
      Multimodal.asMedia(
        rs.map(r => (r._1, r._2)).toDF("media_id", "payload"),
        "media_id", "payload", kind)
    }.reduce(_ union _)

    // signature frame law: exactly the decodable, grid-sufficient images
    val sigs = Multimodal.imageDhashFrame(ds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.keySet === Set(1L, 2L, 3L, 4L))
    assert(sigs(1L) === sigs(2L), "PNG and BMP of the same pixels must hash identically")

    val pairs = Multimodal.imageNearDupPairs(ds, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2).toLong).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) === 0L)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 3L)
    assert(pairs.contains((2L, 3L)))
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L },
      s"reverse gradient must pair with nothing: $pairs")
    // op's hamming agrees with the codec-level law
    assert(pairs((1L, 3L)) ===
      java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)).toLong)
  }

  test("stored image guard: re-encoded/perturbed copies of stored pictures drop; unrelated and unhashable rows survive") {
    import spark.implicits._
    def gray(v: Int): (Int, Int, Int) = (v, v, v)
    val px: (Int, Int) => (Int, Int, Int) = (x, _) => gray((x * 254) / 35)
    val store = java.nio.file.Files.createTempDirectory("imgdhash-store").toString
    // initial corpus: the PNG original
    Multimodal.commitImageDhash(
      Multimodal.asMedia(Seq((1L, MediaFixture.png(36, 16, px)))
        .toDF("media_id", "payload"), "media_id", "payload", "image"),
      store, write = true)
    // merge a second committed image (and replay it — consumers re-distinct)
    val second = Multimodal.asMedia(
      Seq((2L, MediaFixture.png(36, 16, (x, y) => gray(((x + y) * 254) / 50))))
        .toDF("media_id", "payload"), "media_id", "payload", "image")
    Multimodal.commitImageDhash(second, store)
    Multimodal.commitImageDhash(second, store)
    // incoming batch: BMP re-encode of stored #1, perturbed copy of #1,
    // an unrelated reverse gradient, a grid-deficient tiny image, audio
    val incoming =
      Multimodal.asMedia(Seq(
          (10L, MediaFixture.bmp(36, 16, px)),
          (11L, MediaFixture.png(36, 16, (x, y) =>
            if (x >= 8 && x < 12 && y >= 4 && y < 6)
              gray(math.min(254, (x * 254) / 35 + 60)) else px(x, y))),
          (12L, MediaFixture.png(36, 16, (x, _) => gray(254 - (x * 254) / 35))),
          (13L, MediaFixture.png(6, 6, (_, _) => gray(9))))
          .toDF("media_id", "payload"), "media_id", "payload", "image")
        .union(Multimodal.asMedia(
          Seq((14L, MediaFixture.png(36, 16, px)))
            .toDF("media_id", "payload"), "media_id", "payload", "audio"))
    val survivors = Multimodal.imageNearDupAgainstStored(incoming, store)
      .collect().map(_.media_id).toSet
    assert(survivors === Set(12L, 13L, 14L),
      s"re-encode and perturbed copy must drop, rest survive: $survivors")
    // wrong-law merge fails fast (the param-mismatch posture)
    val err = intercept[IllegalArgumentException] {
      graft.ops.RefStore.mergeHashSig(
        Seq((99L, 0L)).toDF("_id", "_sh"), store, "some-other-law")
    }
    assert(err.getMessage.contains("some-other-law"))
    // compact folds the replayed append; answers identical; fsck green
    val before = graft.ops.RefStore.loadHashSig(spark, store, Multimodal.DhashLaw)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.ops.RefStore.compact(spark, store)
    val after = graft.ops.RefStore.loadHashSig(spark, store, Multimodal.DhashLaw)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === before && after.map(_._1) === Set(1L, 2L))
    val fsckBad = graft.ops.RefStore.fsck(spark, store)
      .filter(!org.apache.spark.sql.functions.col("ok")).collect()
    assert(fsckBad.isEmpty, s"fsck failures: ${fsckBad.mkString(";")}")
  }

  test("audio QA: planted clipping/silence/square-wave WAVs produce exact hand counts") {
    import spark.implicits._
    // 1: pure silence (all zero) - fully silent, one run, zero energy
    val silence = MediaFixture.wav(8000, Array.fill(100)(0.toShort))
    // 2: full-rail square wave - every sample clipped, none silent,
    //    sum_sq exact: 50*32767^2 + 50*32768^2
    val square = MediaFixture.wav(8000,
      Array.tabulate(100)(i => if (i % 2 == 0) 32767.toShort else (-32768).toShort))
    // 3: mixed - 10 leading silent, then 80 at +1000, then 10 trailing
    //    silent: silent=20, longest run=10, no clips
    val mixed = MediaFixture.wav(16000,
      (Array.fill(10)(0.toShort) ++ Array.fill(80)(1000.toShort)
        ++ Array.fill(10)(0.toShort)))
    val rows = Seq((1L, silence), (2L, square), (3L, mixed),
      (4L, Array[Byte](9, 9, 9))) // undecodable: dropped
    val media = Multimodal.asMedia(rows.toDF("media_id", "payload"),
        "media_id", "payload", "audio")
      .union(Multimodal.asMedia( // wrong kind: gated out
        Seq((5L, silence)).toDF("media_id", "payload"),
        "media_id", "payload", "image"))
    val got = Multimodal.audioQaFrame(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    val s1 = got(1L)
    assert(s1.getAs[Long]("n_silent") === 100L &&
      s1.getAs[Long]("longest_silence") === 100L &&
      s1.getAs[Long]("sum_sq") === 0L &&
      s1.getAs[Double]("silence_frac") === 1.0 &&
      s1.getAs[Double]("rms") === 0.0)
    val s2 = got(2L)
    assert(s2.getAs[Long]("n_clipped") === 100L &&
      s2.getAs[Double]("clip_frac") === 1.0 &&
      s2.getAs[Long]("n_silent") === 0L)
    assert(s2.getAs[Long]("sum_sq") ===
      50L * 32767L * 32767L + 50L * 32768L * 32768L)
    assert(s2.getAs[Long]("dc_sum") === 50L * 32767L - 50L * 32768L)
    val s3 = got(3L)
    assert(s3.getAs[Int]("sample_rate") === 16000 &&
      s3.getAs[Long]("n_clipped") === 0L &&
      s3.getAs[Long]("n_silent") === 20L &&
      s3.getAs[Long]("longest_silence") === 10L &&
      s3.getAs[Long]("sum_sq") === 80L * 1000L * 1000L &&
      s3.getAs[Double]("dc_offset") === 800.0)
  }
}
