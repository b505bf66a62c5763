package graft.ingest

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

/** Minimal Compound File Binary (MS-CFB) reader — the container format of
  * legacy `.xls` workbooks. Dependency-free: CFB is a FAT filesystem in a
  * file (512-byte sectors, FAT chains, a directory, and a 64-byte-sector
  * "mini stream" for streams under the 4096-byte cutoff). Only reading is
  * supported, and only what BIFF8 extraction needs: locate a named stream
  * and return its bytes.
  *
  * Whole-file in memory: legacy workbooks are bounded artifacts (the
  * reference loads the entire HSSFWorkbook into heap the same way —
  * SQLiteDirectImporter.java:389-391); the streaming path at scale is the
  * modern `.xlsx` reader ([[Xlsx]]).
  */
object Cfb {

  private val ENDOFCHAIN = 0xFFFFFFFE
  private val FREESECT = 0xFFFFFFFF

  final case class Entry(name: String, objType: Int, startSector: Int, size: Long,
      id: Int = -1, leftSib: Int = -1, rightSib: Int = -1, childId: Int = -1)

  /** Bytes of the first stream whose name is in `names` (as stored), or None. */
  def readStream(file: File, names: Seq[String]): Option[Array[Byte]] =
    readStream(Files.readAllBytes(file.toPath), names)

  /** Every stream in the container as (name, bytes), directory order —
    * nested storages flattened (reader convenience).
    */
  def allStreams(bytes: Array[Byte]): Seq[(String, Array[Byte])] =
    withParsed(bytes) { (entries, read) =>
      entries.filter(_.objType == 2).map(e => e.name -> read(e))
    }

  /** Only the ROOT-LEVEL streams (direct children of the root entry, via
    * the red-black sibling tree) — what a FLAT container rewrite
    * ([[CfbWriter]]) can faithfully carry. Streams nested inside storages
    * (VBA projects, embedded OLE objects) are NOT included: flattening
    * them would collide names and orphan their storage structure.
    */
  def rootStreams(bytes: Array[Byte]): Seq[(String, Array[Byte])] =
    withParsed(bytes) { (entries, read) =>
      val byId = entries.map(e => e.id -> e).toMap
      val root = entries.find(_.objType == 5)
      val out = Seq.newBuilder[(String, Array[Byte])]
      def walk(id: Int, guard: Int): Unit = {
        if (guard > (1 << 16) || id < 0) return
        byId.get(id).foreach { e =>
          walk(e.leftSib, guard + 1)
          if (e.objType == 2) out += e.name -> read(e)
          walk(e.rightSib, guard + 1)
        }
      }
      root.foreach(r => walk(r.childId, 0))
      out.result()
    }

  /** True when the container holds nested storages (objType 1) — content a
    * flat rewrite cannot preserve.
    */
  def hasStorages(bytes: Array[Byte]): Boolean =
    withParsed(bytes) { (entries, _) => entries.exists(_.objType == 1) }

  /** Same, over in-memory container bytes (the streaming drop-folder path
    * delivers workbooks as `binaryFile` content).
    */
  def readStream(bytes: Array[Byte], names: Seq[String]): Option[Array[Byte]] =
    withParsed(bytes) { (entries, read) =>
      entries.find(e => e.objType == 2 && names.contains(e.name)).map(read)
    }

  /** Parse the container once; hand `f` the directory entries and a
    * stream-entry reader (FAT or mini-FAT chain as size dictates).
    */
  private def withParsed[A](bytes: Array[Byte])(
      f: (Seq[Entry], Entry => Array[Byte]) => A): A = {
    require(bytes.length >= 512 &&
      (bytes(0) & 0xFF) == 0xD0 && (bytes(1) & 0xFF) == 0xCF &&
      (bytes(2) & 0xFF) == 0x11 && (bytes(3) & 0xFF) == 0xE0,
      "not a compound (CFB) file")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

    val sectorShift = buf.getShort(30).toInt // 9 → 512-byte sectors (v3), 12 → 4096 (v4)
    require(sectorShift == 9 || sectorShift == 12,
      s"unsupported CFB sector shift $sectorShift (spec allows 9 or 12)")
    val sectorSize = 1 << sectorShift
    val firstDirSector = buf.getInt(48)
    val miniCutoff = buf.getInt(56)
    val firstMiniFat = buf.getInt(60)
    val firstDifat = buf.getInt(68)

    // MS-CFB §2.1: sector n starts at (n + 1) << sectorShift — the header
    // occupies exactly one sector-sized slot even in v4 (4096-byte sectors),
    // so the previous `512 + n * sectorSize` form only held for v3
    def sectorOffset(sector: Int): Int = (sector + 1) << sectorShift

    // FAT sector list: 109 header DIFAT entries, then chained DIFAT sectors
    val fatSectors: IndexedSeq[Int] = {
      val b = IndexedSeq.newBuilder[Int]
      var i = 0
      while (i < 109) {
        val s = buf.getInt(76 + i * 4)
        if (s != FREESECT && s != ENDOFCHAIN) b += s
        i += 1
      }
      var difat = firstDifat
      var guard = 0
      while (difat != ENDOFCHAIN && difat != FREESECT && guard < (1 << 16)) {
        val base = sectorOffset(difat)
        var j = 0
        while (j < sectorSize / 4 - 1) {
          val s = buf.getInt(base + j * 4)
          if (s != FREESECT && s != ENDOFCHAIN) b += s
          j += 1
        }
        difat = buf.getInt(base + sectorSize - 4)
        guard += 1
      }
      b.result()
    }
    val entriesPerFat = sectorSize / 4
    def fatAt(sector: Int): Int = {
      val fs = fatSectors(sector / entriesPerFat)
      buf.getInt(sectorOffset(fs) + (sector % entriesPerFat) * 4)
    }

    def readChain(start: Int, size: Long): Array[Byte] = {
      val out = new Array[Byte](size.toInt)
      var sector = start
      var pos = 0
      var guard = 0
      while (sector != ENDOFCHAIN && sector != FREESECT && pos < out.length &&
          guard < (1 << 24)) {
        val n = math.min(sectorSize, out.length - pos)
        System.arraycopy(bytes, sectorOffset(sector), out, pos, n)
        pos += n
        sector = fatAt(sector)
        guard += 1
      }
      out
    }

    // directory entries (128 bytes each) across the directory chain; ids
    // are the SLOT indices (what sibling/child pointers reference)
    val entries: Seq[Entry] = {
      val b = Seq.newBuilder[Entry]
      var sector = firstDirSector
      var guard = 0
      var slot = 0
      while (sector != ENDOFCHAIN && sector != FREESECT && guard < (1 << 20)) {
        val base = sectorOffset(sector)
        var e = 0
        while (e < sectorSize / 128) {
          val off = base + e * 128
          val nameLen = buf.getChar(off + 64).toInt // bytes incl. terminator
          if (nameLen >= 2 && nameLen <= 64) {
            val name = new String(bytes, off, nameLen - 2, "UTF-16LE")
            val objType = bytes(off + 66) & 0xFF
            val start = buf.getInt(off + 116)
            val size = buf.getInt(off + 120).toLong & 0xFFFFFFFFL // v3: low 32 bits
            b += Entry(name, objType, start, size, id = slot,
              leftSib = buf.getInt(off + 68), rightSib = buf.getInt(off + 72),
              childId = buf.getInt(off + 76))
          }
          e += 1
          slot += 1
        }
        sector = fatAt(sector)
        guard += 1
      }
      b.result()
    }

    val root = entries.find(_.objType == 5)
    lazy val ministream: Array[Byte] = {
      // the root entry's regular-FAT chain holds 64-byte mini sectors
      val r = root.getOrElse(sys.error("CFB: no root directory entry"))
      readChain(r.startSector, r.size)
    }
    lazy val miniFatBuf: ByteBuffer = {
      val miniFat: Array[Byte] =
        if (firstMiniFat == ENDOFCHAIN || firstMiniFat == FREESECT) Array.empty
        else {
          // walk the miniFAT chain to its full length
          var n = 0
          var s = firstMiniFat
          var guard = 0
          while (s != ENDOFCHAIN && s != FREESECT && guard < (1 << 16)) {
            n += 1; s = fatAt(s); guard += 1
          }
          readChain(firstMiniFat, n.toLong * sectorSize)
        }
      ByteBuffer.wrap(miniFat).order(ByteOrder.LITTLE_ENDIAN)
    }
    def readEntry(e: Entry): Array[Byte] =
      if (e.size >= miniCutoff) readChain(e.startSector, e.size)
      else {
        // mini stream: the miniFAT (its own regular-FAT chain) links the
        // 64-byte mini sectors inside the root's ministream
        val out = new Array[Byte](e.size.toInt)
        var mini = e.startSector
        var pos = 0
        var guard = 0
        while (mini != ENDOFCHAIN && mini != FREESECT && pos < out.length &&
            guard < (1 << 20)) {
          val n = math.min(64, out.length - pos)
          System.arraycopy(ministream, mini * 64, out, pos, n)
          pos += n
          mini = miniFatBuf.getInt(mini * 4)
          guard += 1
        }
        out
      }
    f(entries, readEntry)
  }
}
