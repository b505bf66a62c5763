package graft.ingest

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable

/** Writes REAL legacy `.xls` workbooks (CFB container + BIFF8 records, all
  * hand-assembled) for the [[Xls]] reader tests — the test's independent
  * model of the format. Supports shared strings (with an optional CONTINUE
  * split, both between strings and mid-string), NUMBER doubles, RK/MULRK
  * packing, booleans, sparse cells, and multiple sheets.
  */
object XlsFixture {

  private val numeric = "^-?[0-9]+(\\.[0-9]+)?$".r
  // numeric cells only for CANONICAL renderings ("0123" must stay a string)
  private def isRkInt(v: String): Boolean =
    numeric.findFirstIn(v).isDefined && !v.contains(".") &&
      (try { math.abs(v.toLong) < (1L << 28) && v.toLong.toString == v }
       catch { case _: NumberFormatException => false })
  private def isCanonicalNum(v: String): Boolean =
    numeric.findFirstIn(v).isDefined &&
      (try Xls.formatNum(v.toDouble) == v catch { case _: NumberFormatException => false })

  private class Rec(val id: Int) {
    val b = new ByteArrayOutputStream()
    def u8(v: Int): Rec = { b.write(v & 0xFF); this }
    def u16(v: Int): Rec = { u8(v); u8(v >> 8); this }
    def u32(v: Int): Rec = { u16(v); u16(v >> 16); this }
    def f64(v: Double): Rec = {
      val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      bb.putDouble(v); b.write(bb.array()); this
    }
    def ascii(s: String): Rec = { b.write(s.getBytes("ISO-8859-1")); this }
    def bytes: Array[Byte] = {
      val data = b.toByteArray
      val out = new Array[Byte](4 + data.length)
      out(0) = (id & 0xFF).toByte; out(1) = ((id >> 8) & 0xFF).toByte
      out(2) = (data.length & 0xFF).toByte; out(3) = ((data.length >> 8) & 0xFF).toByte
      System.arraycopy(data, 0, out, 4, data.length)
      out
    }
  }

  /** BIFF8 Workbook stream. `sstSplitAt`: byte budget for the SST record
    * body — later strings/chars spill into a CONTINUE record (a mid-string
    * spill re-specifies the flags byte, the BIFF8 quirk).
    */
  private def workbookStream(sheets: Seq[(String, Seq[Seq[String]])],
      sstSplitAt: Option[Int]): Array[Byte] = {
    val sst = mutable.LinkedHashMap.empty[String, Int]
    var sstRefs = 0
    sheets.foreach { case (_, rows) =>
      rows.foreach(_.foreach { v =>
        if (v != null && v.nonEmpty && v != "TRUE" && v != "FALSE" &&
            !isRkInt(v) && !isCanonicalNum(v)) {
          sst.getOrElseUpdate(v, sst.size); sstRefs += 1
        }
      })
    }

    def sheetStream(rows: Seq[Seq[String]]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(new Rec(0x809).u16(0x600).u16(0x10).u16(0).u16(0).u32(0).u32(0).bytes)
      rows.zipWithIndex.foreach { case (cells, ri) =>
        var ci = 0
        while (ci < cells.length) {
          val v = cells(ci)
          if (v == null || v.isEmpty) ci += 1 // sparse: omit
          else if (isRkInt(v)) {
            // coalesce a run of RK-able ints: run ≥ 2 → MULRK, else RK
            var end = ci
            while (end + 1 < cells.length && cells(end + 1) != null &&
                cells(end + 1).nonEmpty && isRkInt(cells(end + 1))) end += 1
            if (end > ci) {
              val r = new Rec(0xBD).u16(ri).u16(ci)
              (ci to end).foreach(j => r.u16(0).u32((cells(j).toInt << 2) | 2))
              r.u16(end)
              out.write(r.bytes)
            } else
              out.write(new Rec(0x27E).u16(ri).u16(ci).u16(0)
                .u32((v.toInt << 2) | 2).bytes)
            ci = end + 1
          } else if (v == "TRUE" || v == "FALSE") {
            out.write(new Rec(0x205).u16(ri).u16(ci).u16(0)
              .u8(if (v == "TRUE") 1 else 0).u8(0).bytes)
            ci += 1
          } else if (isCanonicalNum(v)) {
            out.write(new Rec(0x203).u16(ri).u16(ci).u16(0).f64(v.toDouble).bytes)
            ci += 1
          } else {
            out.write(new Rec(0xFD).u16(ri).u16(ci).u16(0).u32(sst(v)).bytes)
            ci += 1
          }
        }
      }
      out.write(new Rec(0x0A).bytes)
      out.toByteArray
    }

    // SST body split into [record, continue?] at the byte budget
    def sstRecords: Array[Byte] = {
      val strings = sst.keys.toSeq
      val budget = sstSplitAt.getOrElse(Int.MaxValue)
      val first = new ByteArrayOutputStream()
      val cont = new ByteArrayOutputStream()
      var spilled = false
      val pre = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      pre.putInt(sstRefs); pre.putInt(strings.size)
      first.write(pre.array())
      strings.foreach { s =>
        val high = s.exists(_ > 0xFF)
        val bytes = s.getBytes(if (high) "UTF-16LE" else "ISO-8859-1")
        val charBytes = if (high) 2 else 1
        def header(to: ByteArrayOutputStream): Unit = {
          to.write(s.length & 0xFF); to.write((s.length >> 8) & 0xFF)
          to.write(if (high) 1 else 0)
        }
        if (spilled) { header(cont); cont.write(bytes) }
        else if (first.size() + 3 > budget) {
          // between-strings split: CONTINUE starts with the next header
          spilled = true
          header(cont); cont.write(bytes)
        } else {
          header(first)
          val fitChars = math.max(0,
            math.min(s.length, (budget - first.size()) / charBytes))
          if (fitChars < s.length) {
            // mid-string split: CONTINUE re-specifies the flags byte
            spilled = true
            first.write(bytes, 0, fitChars * charBytes)
            cont.write(if (high) 1 else 0)
            cont.write(bytes, fitChars * charBytes, (s.length - fitChars) * charBytes)
          } else first.write(bytes)
        }
      }
      val out = new ByteArrayOutputStream()
      def rec(id: Int, body: Array[Byte]): Unit = {
        out.write(id & 0xFF); out.write((id >> 8) & 0xFF)
        out.write(body.length & 0xFF); out.write((body.length >> 8) & 0xFF)
        out.write(body)
      }
      rec(0xFC, first.toByteArray)
      if (cont.size() > 0) rec(0x3C, cont.toByteArray)
      out.toByteArray
    }

    val sheetStreams = sheets.map { case (_, rows) => sheetStream(rows) }
    val bof = new Rec(0x809).u16(0x600).u16(0x5).u16(0).u16(0).u32(0).u32(0).bytes
    val bounds = sheets.map { case (name, _) =>
      new Rec(0x85).u32(0).u16(0).u8(name.length).u8(0).ascii(name).bytes
    }
    val sstBytes = sstRecords
    val eof = new Rec(0x0A).bytes
    val globalsLen = bof.length + bounds.map(_.length).sum + sstBytes.length + eof.length

    val out = new ByteArrayOutputStream()
    out.write(bof)
    var sheetPos = globalsLen
    bounds.zip(sheetStreams).foreach { case (b, ss) =>
      val patched = b.clone()
      patched(4) = (sheetPos & 0xFF).toByte
      patched(5) = ((sheetPos >> 8) & 0xFF).toByte
      patched(6) = ((sheetPos >> 16) & 0xFF).toByte
      patched(7) = ((sheetPos >> 24) & 0xFF).toByte
      out.write(patched)
      sheetPos += ss.length
    }
    out.write(sstBytes)
    out.write(eof)
    sheetStreams.foreach(out.write)
    out.toByteArray
  }

  /** Minimal v3 CFB container (regular FAT only; stream zero-padded past
    * the 4096-byte mini cutoff so it lives in the regular FAT).
    */
  private def cfb(streamName: String, stream0: Array[Byte]): Array[Byte] = {
    val stream = if (stream0.length >= 4096) stream0
      else java.util.Arrays.copyOf(stream0, 4096)
    val nStream = (stream.length + 511) / 512
    require(2 + nStream <= 128, "fixture stream too large for one FAT sector")
    val total = 512 * (1 + 1 + 1 + nStream) // header + FAT + dir + stream
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    buf.putShort(24, 0x3E.toShort) // minor version
    buf.putShort(26, 3.toShort) // major version 3 → 512-byte sectors
    buf.putShort(28, 0xFFFE.toShort) // byte order mark
    buf.putShort(30, 9.toShort) // sector shift
    buf.putShort(32, 6.toShort) // mini sector shift
    buf.putInt(44, 1) // one FAT sector
    buf.putInt(48, 1) // first directory sector
    buf.putInt(56, 4096) // mini stream cutoff
    buf.putInt(60, -2) // no miniFAT (ENDOFCHAIN)
    buf.putInt(64, 0)
    buf.putInt(68, -2) // no DIFAT chain
    buf.putInt(72, 0)
    buf.putInt(76, 0) // DIFAT[0]: FAT at sector 0
    var i = 1
    while (i < 109) { buf.putInt(76 + i * 4, -1); i += 1 }
    // FAT (sector 0): dir at 1, stream from sector 2
    buf.putInt(512, -3) // FATSECT
    buf.putInt(512 + 4, -2) // directory chain end
    var s = 0
    while (s < nStream) {
      buf.putInt(512 + (2 + s) * 4, if (s == nStream - 1) -2 else 2 + s + 1)
      s += 1
    }
    var rest = 2 + nStream
    while (rest < 128) { buf.putInt(512 + rest * 4, -1); rest += 1 }
    // directory (sector 1)
    def dirEntry(off: Int, name: String, objType: Int, start: Int, size: Int,
        child: Int): Unit = {
      val nb = name.getBytes("UTF-16LE")
      var j = 0
      while (j < nb.length) { buf.put(off + j, nb(j)); j += 1 }
      buf.putShort(off + 64, (nb.length + 2).toShort)
      buf.put(off + 66, objType.toByte)
      buf.put(off + 67, 1.toByte)
      buf.putInt(off + 68, -1); buf.putInt(off + 72, -1)
      buf.putInt(off + 76, child)
      buf.putInt(off + 116, start)
      buf.putInt(off + 120, size)
    }
    dirEntry(1024, "Root Entry", 5, -2, 0, 1)
    dirEntry(1024 + 128, streamName, 2, 2, stream.length, -1)
    var p = 0
    while (p < stream.length) { buf.put(1536 + p, stream(p)); p += 1 }
    buf.array()
  }

  def write(file: File, sheets: Seq[(String, Seq[Seq[String]])],
      sstSplitAt: Option[Int] = None): Unit = {
    val bytes = cfb("Workbook", workbookStream(sheets, sstSplitAt))
    val out = new FileOutputStream(file)
    try out.write(bytes) finally out.close()
  }
}
