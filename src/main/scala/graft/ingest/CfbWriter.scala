package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal Compound File Binary (MS-CFB v3) WRITER — just enough container
  * to rebuild a legacy `.xls` workbook after sheet surgery
  * ([[OverviewExtract]]'s `.xls` leg; the reference does the equivalent via
  * POI's HSSFWorkbook.write, TransferOverviewExtractor.java:516-519).
  *
  * Spec-shaped v3 output: 512-byte sectors, 64-byte mini sectors for
  * streams under the 4096-byte cutoff (held in the root entry's
  * ministream, linked by a miniFAT), header-resident DIFAT (≤109 FAT
  * sectors ⇒ ~7k regular sectors ⇒ far beyond any legacy workbook this
  * path rewrites). The directory sibling tree is the balanced
  * name-sorted BST the spec mandates (collation: UTF-16 length, then
  * uppercased code-unit compare — MS-CFB §2.6.4); slots keep insertion
  * order, only the sibling/child ids encode the tree. Nodes are colored
  * black — strict red-black coloring is not required by readers (POI
  * writes all-black too) and the tree is height-balanced by
  * construction. Zero-length streams get ENDOFCHAIN as their start
  * sector (not the next stream's first sector), so chain-walking
  * readers cannot bleed into a neighbour's data.
  */
object CfbWriter {

  private val SECTOR = 512
  private val MINI = 64
  private val MINI_CUTOFF = 4096
  private val ENDOFCHAIN = 0xFFFFFFFE
  private val FREESECT = 0xFFFFFFFF
  private val FATSECT = 0xFFFFFFFD

  /** Serialize `streams` (directory order preserved) into a CFB container. */
  def write(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(streams.nonEmpty, "CFB container needs at least one stream")
    streams.foreach { case (n, _) =>
      require(n.getBytes("UTF-16LE").length <= 62, s"CFB name too long: $n")
    }
    val big = streams.filter(_._2.length >= MINI_CUTOFF)
    val small = streams.filter(_._2.length < MINI_CUTOFF)

    // ministream: small streams padded to 64-byte mini sectors, in order
    val miniCounts = small.map { case (_, b) => sectors(b.length, MINI) }
    val nMiniTotal = miniCounts.sum
    val ministream = new Array[Byte](nMiniTotal * MINI)
    var miniPos = 0
    val miniStarts = small.zip(miniCounts).map { case ((_, b), n) =>
      // an empty stream owns no mini sectors: its start MUST be ENDOFCHAIN,
      // not the next stream's first sector (a chain-walking reader would
      // read the neighbour's data)
      val start = if (n == 0) ENDOFCHAIN else miniPos / MINI
      System.arraycopy(b, 0, ministream, miniPos, b.length)
      miniPos += n * MINI
      start
    }
    val nMiniFatSectors = sectors(nMiniTotal * 4, SECTOR)
    val nMiniStreamSectors = sectors(ministream.length, SECTOR)
    val nDirSectors = sectors((1 + streams.length) * 128, SECTOR)
    val bigCounts = big.map { case (_, b) => sectors(b.length, SECTOR) }

    // sector budget: FAT first, then directory, miniFAT, ministream, big
    // streams. FAT count is self-referential (FAT sectors occupy FAT
    // entries too) — iterate to the fixed point.
    val nonFat = nDirSectors + nMiniFatSectors + nMiniStreamSectors + bigCounts.sum
    var nFat = 1
    while (sectors((nonFat + nFat) * 4, SECTOR) > nFat)
      nFat = sectors((nonFat + nFat) * 4, SECTOR)
    require(nFat <= 109, s"container too large for header DIFAT ($nFat FAT sectors)")

    val totalSectors = nFat + nonFat
    val fat = Array.fill(nFat * SECTOR / 4)(FREESECT)
    var next = 0
    def alloc(n: Int): Int = { val s = next; next += n; s }
    def chain(start: Int, n: Int): Unit = {
      var i = 0
      while (i < n - 1) { fat(start + i) = start + i + 1; i += 1 }
      if (n > 0) fat(start + n - 1) = ENDOFCHAIN
    }
    val fatStart = alloc(nFat)
    (0 until nFat).foreach(i => fat(fatStart + i) = FATSECT)
    val dirStart = alloc(nDirSectors); chain(dirStart, nDirSectors)
    val miniFatStart =
      if (nMiniFatSectors == 0) ENDOFCHAIN
      else { val s = alloc(nMiniFatSectors); chain(s, nMiniFatSectors); s }
    val miniStreamStart =
      if (nMiniStreamSectors == 0) ENDOFCHAIN
      else { val s = alloc(nMiniStreamSectors); chain(s, nMiniStreamSectors); s }
    val bigStarts = big.zip(bigCounts).map { case (_, n) =>
      if (n == 0) ENDOFCHAIN // unreachable (big ⇒ ≥ cutoff), kept for symmetry
      else { val s = alloc(n); chain(s, n); s }
    }
    require(next == totalSectors, s"sector accounting drift: $next != $totalSectors")

    val out = ByteBuffer.allocate(SECTOR + totalSectors * SECTOR)
      .order(ByteOrder.LITTLE_ENDIAN)

    // header
    out.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    out.position(24)
    out.putShort(0x3E.toShort) // minor
    out.putShort(3)            // major (v3)
    out.putShort(0xFFFE.toShort)
    out.putShort(9)            // sector shift
    out.putShort(6)            // mini sector shift
    out.position(44)
    out.putInt(nFat)
    out.putInt(dirStart)
    out.putInt(0)              // transaction signature
    out.putInt(MINI_CUTOFF)
    out.putInt(miniFatStart)
    out.putInt(nMiniFatSectors)
    out.putInt(ENDOFCHAIN)     // first DIFAT sector (header-resident only)
    out.putInt(0)              // DIFAT sector count
    var i = 0
    while (i < 109) {
      out.putInt(if (i < nFat) fatStart + i else FREESECT)
      i += 1
    }

    def sectorBase(s: Int): Int = SECTOR + s * SECTOR

    // FAT
    out.position(sectorBase(fatStart))
    fat.foreach(out.putInt)

    // directory: root + one entry per stream. Slots keep insertion order;
    // sibling pointers form the balanced name-sorted BST the spec mandates
    val streamStartsAndSizes: Seq[(Int, Long)] = {
      var bi = 0; var si = 0
      streams.map { case (_, b) =>
        if (b.length >= MINI_CUTOFF) { val r = (bigStarts(bi), b.length.toLong); bi += 1; r }
        else { val r = (miniStarts(si), b.length.toLong); si += 1; r }
      }
    }
    def putDirEntry(slot: Int, name: String, objType: Int, leftSib: Int,
        rightSib: Int, childId: Int, start: Int, size: Long): Unit = {
      val base = sectorBase(dirStart) + slot * 128
      val nb = name.getBytes("UTF-16LE")
      out.position(base)
      out.put(nb)
      out.position(base + 64)
      out.putShort((nb.length + 2).toShort)
      out.put(objType.toByte)
      out.put(1.toByte) // black
      out.putInt(leftSib)
      out.putInt(rightSib)
      out.putInt(childId)
      out.position(base + 116)
      out.putInt(start)
      out.putInt(size.toInt)
      out.putInt(0) // v3: high 32 bits of size MUST be 0
    }
    // balanced BST over the collation-sorted stream indices; left/right
    // hold directory ids (stream idx + 1), -1 = no sibling
    val order = streams.indices.sortWith((i, j) => nameLt(streams(i)._1, streams(j)._1))
    val leftSib = Array.fill(streams.length)(-1)
    val rightSib = Array.fill(streams.length)(-1)
    def buildTree(lo: Int, hi: Int): Int =
      if (lo > hi) -1
      else {
        val mid = (lo + hi) >>> 1
        val idx = order(mid)
        leftSib(idx) = buildTree(lo, mid - 1)
        rightSib(idx) = buildTree(mid + 1, hi)
        idx + 1
      }
    val rootChild = buildTree(0, streams.length - 1)
    putDirEntry(0, "Root Entry", 5, -1, -1, rootChild,
      if (nMiniStreamSectors == 0) ENDOFCHAIN else miniStreamStart,
      ministream.length.toLong)
    streams.zipWithIndex.foreach { case ((name, _), idx) =>
      val (start, size) = streamStartsAndSizes(idx)
      putDirEntry(idx + 1, name, 2, leftSib(idx), rightSib(idx), -1, start, size)
    }
    // unused tail slots of the directory sector: objType 0, name len 0 —
    // already zeroed by allocation

    // miniFAT
    if (nMiniFatSectors > 0) {
      out.position(sectorBase(miniFatStart))
      small.indices.foreach { si =>
        val start = miniStarts(si)
        val n = miniCounts(si)
        var j = 0
        while (j < n - 1) { out.putInt(start + j + 1); j += 1 }
        if (n > 0) out.putInt(ENDOFCHAIN)
      }
      var rest = nMiniTotal
      while (rest < nMiniFatSectors * (SECTOR / 4)) { out.putInt(FREESECT); rest += 1 }
    }

    // ministream + big streams
    if (nMiniStreamSectors > 0) {
      out.position(sectorBase(miniStreamStart))
      out.put(ministream)
    }
    big.zip(bigStarts).foreach { case ((_, b), s) =>
      out.position(sectorBase(s))
      out.put(b)
    }
    out.array()
  }

  private def sectors(bytes: Int, unit: Int): Int = (bytes + unit - 1) / unit

  /** MS-CFB §2.6.4 directory-entry collation: shorter UTF-16 name first;
    * equal length → per-code-unit uppercase compare (NOT locale casing —
    * each UTF-16 code unit uppercased individually).
    */
  private[ingest] def nameLt(a: String, b: String): Boolean = {
    if (a.length != b.length) a.length < b.length
    else {
      var i = 0
      while (i < a.length) {
        val ca = Character.toUpperCase(a.charAt(i))
        val cb = Character.toUpperCase(b.charAt(i))
        if (ca != cb) return ca < cb
        i += 1
      }
      false
    }
  }
}
