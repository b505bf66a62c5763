package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL dependency-free media codecs — plain JDK only:
  *
  *   - PPM (P6 binary): ASCII header + raw RGB triplets (hand parser);
  *   - BMP (BITMAPINFOHEADER, uncompressed 24/32-bit BI_RGB): bottom-up
  *     BGR(A) rows with 4-byte stride padding (hand parser);
  *   - PNG / JPEG / GIF: `javax.imageio` — in the JDK itself, so still
  *     zero external dependencies — normalized to the same RGB frame;
  *   - WAV (RIFF, PCM 8/16-bit): fmt + data chunk walk (hand parser).
  *
  * Payloads in other containers (MP4, webm…) fall back to the
  * deterministic [[Multimodal.FakeCodec]] — the dispatch seam is the same
  * one a JNI/ffmpeg codec would drop into. Features are real where decode
  * is real: images → 4×4 mean-gray grid (16 dims), audio → 16-bin
  * normalized amplitude histogram.
  */
object Codec {

  final case class Image(width: Int, height: Int, rgb: Array[Byte])
  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Container sniffing by magic bytes. */
  def sniff(payload: Array[Byte]): String =
    if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '6') "ppm"
    else if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M') "bmp"
    else if (payload.length >= 8 && (payload(0) & 0xFF) == 0x89 &&
      payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G') "png"
    else if (payload.length >= 3 && (payload(0) & 0xFF) == 0xFF &&
      (payload(1) & 0xFF) == 0xD8 && (payload(2) & 0xFF) == 0xFF) "jpeg"
    else if (payload.length >= 4 && payload(0) == 'G' && payload(1) == 'I' &&
      payload(2) == 'F' && payload(3) == '8') "gif"
    else if (payload.length >= 12 && payload(0) == 'R' && payload(1) == 'I' &&
      payload(2) == 'F' && payload(3) == 'F' && payload(8) == 'W' &&
      payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E') "wav"
    else if (payload.length >= 12 && payload(4) == 'f' && payload(5) == 't' &&
      payload(6) == 'y' && payload(7) == 'p') "mp4"
    else if (payload.length >= 12 && payload(0) == 'R' && payload(1) == 'I' &&
      payload(2) == 'F' && payload(3) == 'F' && payload(8) == 'A' &&
      payload(9) == 'V' && payload(10) == 'I' && payload(11) == ' ') "avi"
    else "unknown"

  // -------------------------------------------------------------- images --

  /** None on anything malformed — a corrupt payload must FALL BACK, never
    * throw out of a Spark task (the drop-folder contains what it contains).
    */
  def decodeImage(payload: Array[Byte]): Option[Image] =
    try sniff(payload) match {
      case "ppm" => decodePpm(payload)
      case "bmp" => decodeBmp(payload)
      case "png" | "jpeg" | "gif" => decodeViaImageIO(payload)
      case _ => None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Compressed containers via the JDK's own `javax.imageio` readers —
    * normalized to the same packed RGB frame as the hand parsers, so
    * every downstream law (features, resize) is format-agnostic. Alpha is
    * dropped (composited as-is, matching the BMP 32-bit path, which also
    * ignores the A byte).
    *
    * Declared dimensions are checked from the HEADER (ImageReader
    * getWidth/getHeight — no pixel decode) BEFORE the full read: a 1 KB
    * decompression bomb declaring 50000×50000 would otherwise allocate
    * its raster inside `ImageIO.read` and OOM the task, past any
    * after-the-fact guard.
    */
  private val MaxDecodedPixels = 64L * 1024 * 1024 // 64 MPx ≈ 192 MB RGB

  private def decodeViaImageIO(b: Array[Byte]): Option[Image] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    if (!readers.hasNext) { iis.close(); return None }
    val reader = readers.next()
    val img =
      try {
        reader.setInput(iis)
        val (w0, h0) = (reader.getWidth(0), reader.getHeight(0))
        if (w0 <= 0 || h0 <= 0 || w0.toLong * h0 > MaxDecodedPixels) null
        else reader.read(0)
      } finally { reader.dispose(); iis.close() }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0 || w.toLong * h * 3 > Int.MaxValue) return None
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      rgb(i * 3) = ((p >> 16) & 0xFF).toByte
      rgb(i * 3 + 1) = ((p >> 8) & 0xFF).toByte
      rgb(i * 3 + 2) = (p & 0xFF).toByte
      i += 1
    }
    Some(Image(w, h, rgb))
  }

  private def decodePpm(b: Array[Byte]): Option[Image] = {
    // header: "P6" <ws> width <ws> height <ws> maxval <single ws> data
    var i = 2
    val fields = new Array[Int](3)
    var f = 0
    while (f < 3 && i < b.length) {
      while (i < b.length && (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t')) i += 1
      if (i < b.length && b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
      else {
        var v = 0
        var any = false
        while (i < b.length && b(i) >= '0' && b(i) <= '9') { v = v * 10 + (b(i) - '0'); i += 1; any = true }
        if (!any) return None
        fields(f) = v; f += 1
      }
    }
    if (f < 3 || i >= b.length) return None
    i += 1 // the single whitespace after maxval
    val (w, h, maxval) = (fields(0), fields(1), fields(2))
    // only the 8-bit form (maxval 255); 2-byte-per-sample PPMs would be
    // silently misread as half an image. Long math: w*h*3 must not overflow.
    if (w <= 0 || h <= 0 || maxval != 255) return None
    val need = w.toLong * h * 3
    if (need > Int.MaxValue || b.length - i < need) return None
    Some(Image(w, h, java.util.Arrays.copyOfRange(b, i, i + need.toInt)))
  }

  private def decodeBmp(b: Array[Byte]): Option[Image] = {
    if (b.length < 54) return None
    val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val w = buf.getInt(18)
    val hRaw = buf.getInt(22)
    val bpp = buf.getShort(28).toInt
    val compression = buf.getInt(30)
    if (w <= 0 || hRaw == 0 || compression != 0 || (bpp != 24 && bpp != 32)) return None
    val h = math.abs(hRaw)
    val bottomUp = hRaw > 0
    val bytesPerPx = bpp / 8
    val stride = ((w * bytesPerPx + 3) / 4) * 4
    // dataOffset must point past the headers; all arithmetic in Long so a
    // hostile/corrupt header can't wrap negative and pass the bound check
    if (dataOffset < 54 || w.toLong * h * 3 > Int.MaxValue ||
      dataOffset.toLong + stride.toLong * h > b.length) return None
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = dataOffset + stride * (if (bottomUp) h - 1 - y else y)
      var x = 0
      while (x < w) {
        val s = srcRow + x * bytesPerPx
        val d = (y * w + x) * 3
        rgb(d) = b(s + 2) // BGR(A) → RGB
        rgb(d + 1) = b(s + 1)
        rgb(d + 2) = b(s)
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, rgb))
  }

  /** Nearest-neighbor resample; result re-encoded as canonical P6 PPM (the
    * format this codec can WRITE without libraries).
    */
  def resizeToPpm(img: Image, w: Int, h: Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.height / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.width / w).toInt
        val s = (sy * img.width + sx) * 3
        val d = header.length + (y * w + x) * 3
        out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** 4×4 mean-gray grid feature (16 dims, [0,1]). */
  def imageFeatures(img: Image): Array[Float] = {
    val sums = new Array[Double](16)
    val counts = new Array[Long](16)
    var y = 0
    while (y < img.height) {
      val gy = math.min(3, y * 4 / math.max(1, img.height))
      var x = 0
      while (x < img.width) {
        val gx = math.min(3, x * 4 / math.max(1, img.width))
        val s = (y * img.width + x) * 3
        val gray = ((img.rgb(s) & 0xFF) + (img.rgb(s + 1) & 0xFF) + (img.rgb(s + 2) & 0xFF)) / 3.0
        sums(gy * 4 + gx) += gray
        counts(gy * 4 + gx) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(16)(i =>
      if (counts(i) == 0) 0f else (sums(i) / counts(i) / 255.0).toFloat)
  }

  /** 64-bit difference hash (dHash) of a decoded image — the perceptual
    * fingerprint for image near-dup detection: re-encodes (PNG↔BMP),
    * metadata edits and mild recompression keep the hash identical or
    * within a few bits, while distinct pictures differ in ~32.
    *
    * Deterministic integer law (no float resize, no libm): the image is
    * box-partitioned into a 9×8 grid of cells; each cell's brightness is
    * the exact integer sum of per-pixel luma `299·R + 587·G + 114·B` over
    * the cell; bit `y·8 + x` is set iff cell (x,y) is darker than its
    * right neighbor, compared in exact rational form
    * `sumL·cntR < sumR·cntL` (cells may differ in pixel count when the
    * dimensions don't divide evenly). Images smaller than the 9×8 grid
    * have empty cells and no meaningful gradient — `None`.
    */
  def dhash64(img: Image): Option[Long] = {
    val w = img.width; val h = img.height
    if (w < 9 || h < 8) return None
    val sums = new Array[Long](9 * 8)
    val cnts = new Array[Long](9 * 8)
    var y = 0
    while (y < h) {
      val gy = math.min(7, y * 8 / h)
      var x = 0
      while (x < w) {
        val gx = math.min(8, x * 9 / w)
        val s = (y * w + x) * 3
        val luma = 299L * (img.rgb(s) & 0xFF) + 587L * (img.rgb(s + 1) & 0xFF) +
          114L * (img.rgb(s + 2) & 0xFF)
        sums(gy * 9 + gx) += luma
        cnts(gy * 9 + gx) += 1
        x += 1
      }
      y += 1
    }
    var sig = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        val l = gy * 9 + gx
        // darker-than-right-neighbor in exact rationals
        if (sums(l) * cnts(l + 1) < sums(l + 1) * cnts(l))
          sig |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    Some(sig)
  }

  // --------------------------------------------------------------- audio --

  def decodeWav(b: Array[Byte]): Option[Audio] = try {
    if (sniff(b) != "wav") return None
    val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var samples: Array[Short] = null
    while (pos + 8 <= b.length) {
      val id = new String(b, pos, 4, "US-ASCII")
      val size = buf.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > b.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val fmt = buf.getShort(pos + 8).toInt
          channels = buf.getShort(pos + 10).toInt
          sampleRate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22).toInt
          if (fmt != 1 || (bits != 8 && bits != 16)) return None // PCM only
        case "data" if sampleRate > 0 =>
          val n = size / (bits / 8)
          samples = new Array[Short](n)
          var i = 0
          if (bits == 16) {
            while (i < n) { samples(i) = buf.getShort(pos + 8 + i * 2); i += 1 }
          } else {
            while (i < n) { samples(i) = (((b(pos + 8 + i) & 0xFF) - 128) << 8).toShort; i += 1 }
          }
        case _ => ()
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (sampleRate <= 0 || channels <= 0 || samples == null) None
    else Some(Audio(sampleRate, channels, samples))
  } catch { case scala.util.control.NonFatal(_) => None }

  def audioDurationMs(a: Audio): Long =
    a.samples.length.toLong * 1000 / (a.sampleRate.toLong * a.channels)

  /** 16-bin normalized absolute-amplitude histogram. */
  def audioFeatures(a: Audio): Array[Float] = {
    val hist = new Array[Float](16)
    a.samples.foreach { s =>
      val v = math.min(15, math.abs(s.toInt) * 16 / 32768)
      hist(v) += 1f
    }
    val n = math.max(1, a.samples.length).toFloat
    hist.map(_ / n)
  }

  final case class AudioQa(
      nSamples: Long, nClipped: Long, nSilent: Long, longestSilenceRun: Long,
      sumSq: Long, dcSum: Long)

  /** Audio batch-QA counters over decoded PCM — the "is this recording
    * usable training audio" panel: rail-clipping (dead-compressed or
    * overdriven sources), near-silence fraction and the longest silent
    * run (dead segments, truncated recordings), plus the exact integer
    * moments (Σs, Σs²) the caller renders RMS / DC offset from.
    *
    * Deterministic integer law: a sample clips iff it sits ON a 16-bit
    * rail (32767 / −32768 — re-encoded lossy audio lands NEAR the rail,
    * but near-rail thresholds vary by codec; the rail itself is
    * codec-free), and is silent iff |s| ≤ `silenceThreshold` (default
    * 327 ≈ 1% full scale). Σs² fits a Long to ~8.6 billion samples
    * (~50 hours at 48 kHz) — a per-FILE bound, not a corpus bound.
    */
  def audioQa(a: Audio, silenceThreshold: Int = 327): AudioQa = {
    var clipped = 0L; var silent = 0L; var run = 0L; var maxRun = 0L
    var sumSq = 0L; var dc = 0L
    var i = 0
    while (i < a.samples.length) {
      val s = a.samples(i).toLong
      if (s == 32767L || s == -32768L) clipped += 1
      if (math.abs(s) <= silenceThreshold) {
        silent += 1; run += 1; if (run > maxRun) maxRun = run
      } else run = 0
      sumSq += s * s
      dc += s
      i += 1
    }
    AudioQa(a.samples.length.toLong, clipped, silent, maxRun, sumSq, dc)
  }

  // --------------------------------------------------------------- video --

  /** Metadata from an ISO BMFF (MP4/MOV) container. */
  final case class Mp4Meta(brand: String, durationMs: Long, width: Int, height: Int)

  /** ISO BMFF box walk — METADATA ONLY, no frame decode (that stays behind
    * the [[Multimodal.FakeCodec]] seam a real JNI/ffmpeg codec drops into).
    * Pure JDK byte walking, the CFB/BIFF discipline: every box boundary is
    * bounds-checked against its parent, a lying size field truncates the
    * walk instead of reading out of range, box counts are capped (a crafted
    * zero-size chain must not loop), and nothing allocates proportionally
    * to DECLARED sizes — so a hostile payload costs at most one pass over
    * its actual bytes.
    *
    *   - `ftyp` → major brand (also the sniff gate);
    *   - `moov/mvhd` (v0 + v1) → timescale + duration → duration in ms;
    *   - first `moov/trak/tkhd` (v0 + v1) with nonzero 16.16 fixed-point
    *     width/height → display dimensions (audio-only files legitimately
    *     probe as 0×0 with a real duration).
    *
    * None on anything that does not parse as BMFF — the caller falls back,
    * never throws out of a task (same contract as [[decodeImage]]).
    */
  /** Direct BMFF box children of [start, end): (type, contentStart,
    * contentEnd) — the shared walker of [[probeMp4]] and
    * [[mjpegMovFrames]]. Same defensive discipline as [[riffChildren]]:
    * bounds checked against the parent, lying sizes stop the walk, box
    * count capped.
    */
  private def bmffChildren(payload: Array[Byte], start: Int, end: Int)
      : List[(String, Int, Int)] = {
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
    def u32(off: Int): Long = bb.getInt(off) & 0xFFFFFFFFL
    val buf = List.newBuilder[(String, Int, Int)]
    var off = start
    var n = 0
    var bad = false
    while (!bad && off + 8 <= end && n < 10000) {
      val sz0 = u32(off)
      val (hdr, sz): (Int, Long) =
        if (sz0 == 1L && off + 16 <= end) (16, bb.getLong(off + 8))
        else if (sz0 == 0L) (8, (end - off).toLong)
        else (8, sz0)
      if (sz < hdr || off + sz > end) bad = true // lying size: stop the walk
      else {
        buf += ((new String(payload, off + 4, 4, "ISO-8859-1"),
          off + hdr, (off + sz).toInt))
        off = (off + sz).toInt
        n += 1
      }
    }
    buf.result()
  }

  def probeMp4(payload: Array[Byte]): Option[Mp4Meta] = try {
    if (payload.length < 16 || sniff(payload) != "mp4") return None
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
    def u32(off: Int): Long = bb.getInt(off) & 0xFFFFFFFFL
    def children(start: Int, end: Int): List[(String, Int, Int)] =
      bmffChildren(payload, start, end)
    val top = children(0, payload.length)
    val brand = top.collectFirst { case ("ftyp", cs, ce) if ce - cs >= 4 =>
      new String(payload, cs, 4, "ISO-8859-1")
    }.getOrElse(return None)
    val (moovS, moovE) = top.collectFirst { case ("moov", cs, ce) => (cs, ce) }
      .getOrElse(return None)
    val moov = children(moovS, moovE)
    val durationMs = moov.collectFirst { case ("mvhd", cs, ce) => (cs, ce) }
      .flatMap { case (cs, ce) =>
        val v = payload(cs) & 0xFF
        if (v == 0 && ce - cs >= 20) {
          val ts = u32(cs + 12); val d = u32(cs + 16)
          if (ts > 0) Some(d * 1000L / ts) else None
        } else if (v == 1 && ce - cs >= 32) {
          val ts = u32(cs + 20); val d = bb.getLong(cs + 24)
          // d·1000 must not wrap: a crafted 2^63-ish tick count would
          // otherwise surface a negative "real" duration instead of None
          if (ts > 0 && d >= 0 && d <= Long.MaxValue / 1000L)
            Some(d * 1000L / ts)
          else None
        } else None
      }.getOrElse(return None)
    val wh = moov.collect { case ("trak", cs, ce) => children(cs, ce) }
      .flatten
      .collectFirst(Function.unlift {
        case ("tkhd", cs, ce) =>
          val v = payload(cs) & 0xFF
          // width/height are 16.16 fixed point after version+flags, the
          // time/id fields (v1 carries three 64-bit times: +12), reserved
          // words and the 36-byte matrix
          val wOff = if (v == 1) cs + 88 else cs + 76
          if (ce - wOff >= 8) {
            val w = (u32(wOff) >> 16).toInt
            val h = (u32(wOff + 4) >> 16).toInt
            if (w > 0 && h > 0) Some((w, h)) else None
          } else None
        case _ => None
      })
    val (w, h) = wh.getOrElse((0, 0))
    Some(Mp4Meta(brand, durationMs, w, h))
  } catch { case scala.util.control.NonFatal(_) => None }

  // ---------------------------------------------------- AVI / MJPEG video --

  /** Metadata from a RIFF AVI container's `avih` main header. */
  final case class AviMeta(usPerFrame: Long, nFrames: Int, width: Int, height: Int) {
    def durationMs: Long =
      if (usPerFrame <= 0 || nFrames <= 0) 0L else usPerFrame * nFrames / 1000L
  }

  /** Direct children of a RIFF byte range: (fourcc, contentStart,
    * contentEnd); `LIST` containers report as `LIST:<listType>` with
    * content starting AFTER the 4-byte list type. Same defensive walk
    * discipline as [[probeMp4]]'s box children — every boundary checked
    * against the parent, a lying size truncates the walk, chunk count
    * capped, sizes little-endian (RIFF) unlike BMFF.
    */
  private def riffChildren(b: Array[Byte], start: Int, end: Int)
      : List[(String, Int, Int)] = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val buf = List.newBuilder[(String, Int, Int)]
    var off = start.toLong
    var n = 0
    while (off + 8 <= end && n < 100000) {
      val id = new String(b, off.toInt, 4, "ISO-8859-1")
      val sz = bb.getInt(off.toInt + 4) & 0xFFFFFFFFL
      if (off + 8 + sz > end) { off = end.toLong } // lying size: stop the walk
      else {
        if (id == "LIST" && sz >= 4)
          buf += ((s"LIST:${new String(b, off.toInt + 8, 4, "ISO-8859-1")}",
            off.toInt + 12, (off + 8 + sz).toInt))
        else buf += ((id, off.toInt + 8, (off + 8 + sz).toInt))
        off = off + 8 + sz + (sz & 1L) // chunks are word-aligned
        n += 1
      }
    }
    buf.result()
  }

  /** AVI main-header metadata: `LIST hdrl` → `avih` →
    * (dwMicroSecPerFrame @+0, dwTotalFrames @+16, dwWidth @+32,
    * dwHeight @+36). None on anything that does not parse as RIFF AVI —
    * the caller falls back, never throws out of a task.
    */
  def probeAvi(payload: Array[Byte]): Option[AviMeta] = try {
    if (sniff(payload) != "avi") return None
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val riffEnd = math.min(payload.length.toLong,
      8L + (bb.getInt(4) & 0xFFFFFFFFL)).toInt
    riffChildren(payload, 12, riffEnd)
      .collectFirst { case ("LIST:hdrl", cs, ce) => riffChildren(payload, cs, ce) }
      .flatMap(_.collectFirst { case ("avih", cs, ce) if ce - cs >= 40 =>
        AviMeta(
          usPerFrame = bb.getInt(cs) & 0xFFFFFFFFL,
          nFrames = bb.getInt(cs + 16),
          width = bb.getInt(cs + 32),
          height = bb.getInt(cs + 36))
      })
  } catch { case scala.util.control.NonFatal(_) => None }

  /** The video frame payloads of an MJPEG-in-AVI stream, in stream order:
    * `LIST movi` → `##dc`/`##db` chunks (one level of `LIST rec ` record
    * grouping honored — interleaved-stream AVIs wrap frames there). Each
    * chunk's bytes ARE a complete JPEG image ([[decodeImage]] handles
    * them) — that containment is what makes MJPEG the one video format a
    * dependency-free splitter can decode to REAL pixels. Returns None
    * unless the first video chunk actually sniffs as JPEG (a non-MJPEG
    * codec in dc chunks must fall back to the fake seam, not masquerade
    * as decodable frames). Memory: frame slices of one payload — bounded
    * by the row, the [[Multimodal]] decode-batching contract.
    */
  def mjpegFrames(payload: Array[Byte]): Option[IndexedSeq[Array[Byte]]] = try {
    if (sniff(payload) != "avi") return None
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val riffEnd = math.min(payload.length.toLong,
      8L + (bb.getInt(4) & 0xFFFFFFFFL)).toInt
    def isFrameChunk(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        id(2) == 'd' && (id(3) == 'c' || id(3) == 'b')
    val frames = riffChildren(payload, 12, riffEnd)
      .collectFirst { case ("LIST:movi", cs, ce) => riffChildren(payload, cs, ce) }
      .map(_.flatMap {
        case (id, cs, ce) if isFrameChunk(id) =>
          Seq(java.util.Arrays.copyOfRange(payload, cs, ce))
        case ("LIST:rec ", cs, ce) => riffChildren(payload, cs, ce).collect {
          case (id, fs, fe) if isFrameChunk(id) =>
            java.util.Arrays.copyOfRange(payload, fs, fe)
        }
        case _ => Nil
      }.toIndexedSeq)
    frames.filter(f => f.nonEmpty && sniff(f.head) == "jpeg")
  } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------ MOV / QuickTime MJPEG --

  /** MJPEG-in-MOV frame split result: the frame payloads in sample order
    * plus the `stts`/`mdhd`-derived frame clock (µs per frame).
    */
  final case class MovMjpeg(frames: IndexedSeq[Array[Byte]], usPerFrame: Long)

  /** The video frame payloads of an MJPEG QuickTime/MOV file — the OTHER
    * common MJPEG container beside AVI ([[mjpegFrames]]): samples located
    * through the `stbl` sample tables (`stsd` codec gate on
    * jpeg/mjpa/MJPG, `stsz` sizes, `stsc` sample→chunk runs, `stco`/
    * `co64` chunk offsets), each sample's bytes a complete JPEG image.
    * The frame clock comes from `mdhd` timescale + the first `stts`
    * delta. Same defensive walk discipline as [[probeMp4]]: every sample
    * slice is bounds-checked against the payload, a lying table
    * truncates the split at the last honest frame, counts are capped —
    * and the split is refused entirely (None) unless the first sample
    * actually sniffs as JPEG, so a compressed codec lying in `stsd`
    * falls back to the [[graft.multimodal.Multimodal.FakeCodec]] seam
    * instead of masquerading as decodable frames.
    */
  def mjpegMovFrames(payload: Array[Byte]): Option[MovMjpeg] = try {
    if (payload.length < 16 || sniff(payload) != "mp4") return None
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
    def u32(off: Int): Long = bb.getInt(off) & 0xFFFFFFFFL
    val top = bmffChildren(payload, 0, payload.length)
    val (moovS, moovE) = top.collectFirst { case ("moov", cs, ce) => (cs, ce) }
      .getOrElse(return None)
    val traks = bmffChildren(payload, moovS, moovE)
      .collect { case ("trak", cs, ce) => (cs, ce) }
    val maxSamples = 100000
    val result = traks.iterator.flatMap { case (tcs, tce) =>
      val mdia = bmffChildren(payload, tcs, tce)
        .collectFirst { case ("mdia", a, b) => bmffChildren(payload, a, b) }
        .getOrElse(Nil)
      val timescale = mdia.collectFirst { case ("mdhd", a, b) => (a, b) }
        .flatMap { case (a, b) =>
          val v = payload(a) & 0xFF
          if (v == 0 && b - a >= 16) Some(u32(a + 12))
          else if (v == 1 && b - a >= 28) Some(u32(a + 20))
          else None
        }.getOrElse(0L)
      val stbl = mdia
        .collectFirst { case ("minf", a, b) => bmffChildren(payload, a, b) }
        .getOrElse(Nil)
        .collectFirst { case ("stbl", a, b) => bmffChildren(payload, a, b) }
        .getOrElse(Nil)
      val fmt = stbl.collectFirst { case ("stsd", a, b) if b - a >= 16 =>
        new String(payload, a + 12, 4, "ISO-8859-1")
      }.getOrElse("")
      if (timescale <= 0 ||
        !(fmt == "jpeg" || fmt == "mjpa" || fmt == "MJPG")) Iterator.empty
      else {
        // frame clock: first stts run's tick delta over the media timescale
        val usPerFrame = stbl.collectFirst {
          case ("stts", a, b) if b - a >= 16 && u32(a + 4) >= 1 =>
            u32(a + 12) * 1000000L / timescale
        }.getOrElse(0L)
        // sample sizes: uniform, or the per-sample table (capped)
        val sizes: IndexedSeq[Long] = stbl.collectFirst {
          case ("stsz", a, b) if b - a >= 12 =>
            val uniform = u32(a + 4)
            val n = math.min(u32(a + 8), maxSamples.toLong).toInt
            if (uniform > 0L) IndexedSeq.fill(n)(uniform)
            else (0 until n).takeWhile(i => a + 12 + 4 * i + 4 <= b)
              .map(i => u32(a + 12 + 4 * i))
        }.getOrElse(IndexedSeq.empty)
        // chunk offsets (stco u32 / co64 u64) and sample→chunk runs
        val offsets: IndexedSeq[Long] = stbl.collectFirst {
          case ("stco", a, b) if b - a >= 8 =>
            val n = math.min(u32(a + 4), maxSamples.toLong).toInt
            (0 until n).takeWhile(i => a + 8 + 4 * i + 4 <= b)
              .map(i => u32(a + 8 + 4 * i))
          case ("co64", a, b) if b - a >= 8 =>
            val n = math.min(u32(a + 4), maxSamples.toLong).toInt
            (0 until n).takeWhile(i => a + 8 + 8 * i + 8 <= b)
              .map(i => bb.getLong(a + 8 + 8 * i))
        }.getOrElse(IndexedSeq.empty)
        val stscRuns: IndexedSeq[(Long, Long)] = stbl.collectFirst {
          case ("stsc", a, b) if b - a >= 8 =>
            val n = math.min(u32(a + 4), maxSamples.toLong).toInt
            (0 until n).takeWhile(i => a + 8 + 12 * i + 12 <= b)
              .map(i => (u32(a + 8 + 12 * i), u32(a + 8 + 12 * i + 4)))
        }.getOrElse(IndexedSeq.empty)
        if (sizes.isEmpty || offsets.isEmpty || stscRuns.isEmpty ||
          usPerFrame <= 0) Iterator.empty
        else {
          // expand stsc runs to samples-per-chunk, walk chunks in order,
          // slice each sample — any out-of-range slice truncates at the
          // last honest frame (the lying-size discipline). The sample
          // tables are untrusted: offsets may describe overlapping
          // extents, so the walk ALSO caps cumulative emitted bytes at
          // payload.length — honest non-overlapping samples can never
          // exceed it, and a hostile table that re-slices the payload
          // 100k times truncates instead of allocating 100k copies
          def samplesIn(chunk1: Long): Long = {
            var spc = stscRuns.head._2
            stscRuns.foreach { case (first, s) => if (first <= chunk1) spc = s }
            spc
          }
          val frames = IndexedSeq.newBuilder[Array[Byte]]
          var sample = 0
          var honest = true
          var c = 0
          var emitted = 0L
          while (honest && c < offsets.length && sample < sizes.length) {
            var off = offsets(c)
            var s = 0L
            val spc = samplesIn(c + 1L)
            while (honest && s < spc && sample < sizes.length) {
              val sz = sizes(sample)
              if (off < 0 || sz <= 0 || off + sz > payload.length ||
                emitted + sz > payload.length) honest = false
              else {
                frames += java.util.Arrays.copyOfRange(
                  payload, off.toInt, (off + sz).toInt)
                emitted += sz
                off += sz
                sample += 1
                s += 1
              }
            }
            c += 1
          }
          val fs = frames.result()
          if (fs.nonEmpty && sniff(fs.head) == "jpeg")
            Iterator.single(MovMjpeg(fs, usPerFrame))
          else Iterator.empty
        }
      }
    }.take(1).toList.headOption
    result
  } catch { case scala.util.control.NonFatal(_) => None }
}
