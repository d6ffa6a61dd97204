package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable.ArrayBuffer

/** Dependency-free legacy `.xls` (BIFF8 + BIFF5/BIFF7) reader — the
  * other half of the reference's `pd.read_excel` surface (etl_ui.py:850
  * accepts both `.xls` and `.xlsx` uploads; pandas dispatches to xlrd
  * for the former, and xlrd reads Excel 5.0/95 "Book" streams too).
  * Like [[Xlsx]], workbooks are MB-scale human artifacts, so parsing
  * happens on the driver and the cluster gets the DataFrame.
  *
  * Scope is the same "common subset" contract as the XLSX reader: the
  * cell grid of one worksheet — shared strings (BIFF8 SST + CONTINUE
  * spanning), inline labels, NUMBER/RK/MULRK numerics, BOOLERR, cached
  * FORMULA results — with date-formatted numerics surfaced as ISO
  * strings through the exact [[Xlsx.serialToIso]]/[[Xlsx.isDateFormat]]
  * logic the XLSX path uses (one date policy, not two).
  *
  * BIFF5/BIFF7 ("Book" stream, Excel 5.0/95, r11 — previously a typed
  * convert-me error): the record grid is the BIFF8 one except that
  * every string is a CODEPAGE-encoded byte string (no SST/LABELSST —
  * labels are inline, FORMAT/BOUNDSHEET/STRING carry 8/16-bit byte
  * strings) and the BOF version is 0x0500. Both stream versions share
  * one parser parameterized on the string decoding. Encrypted
  * workbooks and unknown BOF versions still fail with a typed error
  * telling the user to convert, never a bare parse crash.
  *
  * Format references are the public [MS-XLS] and [MS-CFB] specs (plus
  * the OpenOffice "Excel file format" documentation of the BIFF5
  * byte-string records).
  */
object Biff {

  /** Magic number of an OLE2/CFB compound file (every legacy .xls). */
  private val CfbMagic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)

  def isCfb(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && java.util.Arrays.equals(bytes.take(8), CfbMagic)

  /** Raw cell grid of sheet `sheet` (1-based, workbook manifest order):
    * rows carrying at least one cell, in row order, each padded to its
    * last non-null column — the same surface as [[Xlsx.readRows]].
    */
  def readRows(path: String, sheet: Int = 1): Vector[Array[String]] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    require(isCfb(bytes),
      s"$path is not an OLE2 compound file — not a legacy .xls workbook")
    val cfb = new Cfb(bytes)
    cfb.stream("Workbook") match {
      case Some(wb) => parseWorkbook(wb, sheet, biff5 = false)
      case None =>
        val book = cfb.stream("Book").getOrElse {
          throw new IllegalArgumentException(
            s"$path has no Workbook stream — not an Excel workbook " +
              "(or an encrypted one); convert to .xlsx or CSV")
        }
        parseWorkbook(book, sheet, biff5 = true)
    }
  }

  // ---- CFB (OLE2 compound file) container ---------------------------

  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF

  /** Minimal CFB reader: FAT chains, the directory, and the mini
    * stream/miniFAT (streams under the 4096-byte cutoff live there —
    * small real-world workbooks do).
    */
  private final class Cfb(bytes: Array[Byte]) {
    private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    private def u16(off: Int): Int = buf.getShort(off) & 0xFFFF
    private def i32(off: Int): Int = buf.getInt(off)

    private val sectorShift = u16(30)
    private val sectorSize = 1 << sectorShift
    private val miniShift = u16(32)
    private val miniSize = 1 << miniShift
    private val miniCutoff = i32(56)
    require(sectorShift == 9 || sectorShift == 12,
      s"unsupported CFB sector size ${1 << sectorShift}")

    // [MS-CFB] 2.1: sector n starts at (n + 1) << sectorShift — the
    // header occupies exactly ONE sector-sized slot, so for v4 files
    // (4096-byte sectors) sector 0 is at 4096, not 512. The previous
    // `512 + n * sectorSize` happened to be correct only for v3.
    private def sectorOff(sector: Int): Int = (sector + 1) * sectorSize

    private def corrupt(what: String): Nothing =
      throw new IllegalArgumentException(
        s"corrupt .xls workbook ($what) — open it in a spreadsheet tool " +
          "and save as .xlsx or CSV")

    // FAT: sector numbers listed in the header DIFAT (109 entries) plus
    // DIFAT continuation sectors (85+ MB files only — supported anyway)
    private val fat: Array[Int] = {
      val fatSectors = ArrayBuffer.empty[Int]
      var i = 0
      while (i < 109) {
        val s = i32(76 + i * 4)
        if (s != FreeSect && s >= 0) fatSectors += s
        i += 1
      }
      var difat = i32(68)
      var guard = 0
      while (difat != EndOfChain && difat != FreeSect && guard < 10000) {
        val base = sectorOff(difat)
        var j = 0
        while (j < sectorSize / 4 - 1) {
          val s = i32(base + j * 4)
          if (s != FreeSect && s >= 0) fatSectors += s
          j += 1
        }
        difat = i32(base + sectorSize - 4)
        guard += 1
      }
      val entries = Array.newBuilder[Int]
      fatSectors.foreach { s =>
        val base = sectorOff(s)
        var j = 0
        while (j < sectorSize / 4) { entries += i32(base + j * 4); j += 1 }
      }
      entries.result()
    }

    /** Concatenated bytes of a regular-FAT chain. */
    private def chain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(math.max(size.toInt, sectorSize))
      var s = start
      var guard = 0
      while (s != EndOfChain && s >= 0 && guard < fat.length + 1) {
        // a chain entry pointing past the FAT (or the file) is corrupt
        // data, not a reader bug — typed error, never a bare AIOOBE
        if (s >= fat.length) corrupt(s"FAT chain entry $s outside the FAT")
        val off = sectorOff(s)
        if (off >= bytes.length) corrupt(s"sector $s outside the file")
        out.write(bytes, off, math.min(sectorSize, bytes.length - off))
        s = fat(s)
        guard += 1
      }
      val a = out.toByteArray
      if (size >= 0 && size < a.length) java.util.Arrays.copyOf(a, size.toInt) else a
    }

    // directory entries: (name, objectType, startSector, size)
    private val dirEntries: Vector[(String, Int, Int, Long)] = {
      val dirBytes = chain(i32(48), -1L)
      val n = dirBytes.length / 128
      val db = ByteBuffer.wrap(dirBytes).order(ByteOrder.LITTLE_ENDIAN)
      (0 until n).map { i =>
        val base = i * 128
        val nameLen = db.getShort(base + 64) & 0xFFFF // bytes incl. NUL
        val name =
          if (nameLen >= 2)
            new String(dirBytes, base, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
          else ""
        val objType = dirBytes(base + 66) & 0xFF
        val start = db.getInt(base + 116)
        val size = db.getInt(base + 120).toLong & 0xFFFFFFFFL
        (name, objType, start, size)
      }.toVector
    }

    // the root entry owns the mini stream container
    private lazy val miniStreamBytes: Array[Byte] =
      dirEntries.find(_._2 == 5)
        .map(root => chain(root._3, root._4))
        .getOrElse(Array.empty)

    private lazy val miniFat: Array[Int] = {
      val mf = chain(i32(60), -1L)
      val mb = ByteBuffer.wrap(mf).order(ByteOrder.LITTLE_ENDIAN)
      Array.tabulate(mf.length / 4)(i => mb.getInt(i * 4))
    }

    private def miniChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(math.max(size.toInt, miniSize))
      var s = start
      var guard = 0
      while (s != EndOfChain && s >= 0 && guard < miniFat.length + 1) {
        if (s >= miniFat.length) corrupt(s"miniFAT chain entry $s outside the miniFAT")
        val off = s * miniSize
        if (off >= miniStreamBytes.length) corrupt(s"mini sector $s outside the mini stream")
        out.write(miniStreamBytes, off,
          math.min(miniSize, miniStreamBytes.length - off))
        s = miniFat(s)
        guard += 1
      }
      val a = out.toByteArray
      if (size < a.length) java.util.Arrays.copyOf(a, size.toInt) else a
    }

    /** Stream bytes by directory-entry name (flat scan — storage tree
      * structure is irrelevant for the two well-known workbook names).
      */
    def stream(name: String): Option[Array[Byte]] =
      dirEntries.find(e => e._2 == 2 && e._1 == name).map { case (_, _, start, size) =>
        if (size < miniCutoff) miniChain(start, size) else chain(start, size)
      }
  }

  // ---- BIFF8 record stream -------------------------------------------

  private object Rec {
    val BOF = 0x0809
    val EOF = 0x000A
    val CONTINUE = 0x003C
    val SST = 0x00FC
    val BOUNDSHEET = 0x0085
    val FORMAT = 0x041E
    val XF = 0x00E0
    val DATE1904 = 0x0022
    val CODEPAGE = 0x0042
    val FILEPASS = 0x002F
    val LABELSST = 0x00FD
    val LABEL = 0x0204
    val NUMBER = 0x0203
    val RK = 0x027E
    val MULRK = 0x00BD
    val BOOLERR = 0x0205
    val FORMULA = 0x0006
    val STRING = 0x0207
  }

  private final case class Record(id: Int, data: Array[Byte])

  private def records(wb: Array[Byte], from: Int): Iterator[Record] =
    new Iterator[Record] {
      private val buf = ByteBuffer.wrap(wb).order(ByteOrder.LITTLE_ENDIAN)
      private var pos = from
      def hasNext: Boolean = pos + 4 <= wb.length
      def next(): Record = {
        val id = buf.getShort(pos) & 0xFFFF
        val len = buf.getShort(pos + 2) & 0xFFFF
        val data = java.util.Arrays.copyOfRange(wb, pos + 4, math.min(pos + 4 + len, wb.length))
        pos += 4 + len
        Record(id, data)
      }
    }

  /** Cursor over one logical byte stream spanning a record plus its
    * CONTINUE records. BIFF8 unicode strings RESTART their compression
    * flag at each CONTINUE boundary ([MS-XLS] 2.5.293), so the cursor
    * exposes the boundary to the string decoder.
    */
  private final class Cursor(parts: Vector[Array[Byte]]) {
    private var part = 0
    private var off = 0
    def atBoundary: Boolean = off == 0 && part > 0
    def hasMore: Boolean =
      part < parts.length && (off < parts(part).length || part + 1 < parts.length)
    private def ensure(): Unit = {
      while (part < parts.length && off >= parts(part).length) { part += 1; off = 0 }
      if (part >= parts.length)
        throw new IllegalArgumentException(
          "truncated BIFF record (string data runs past the record and its " +
            "CONTINUE records) — the workbook is corrupt or uses an " +
            "unsupported layout; convert it to .xlsx or CSV")
    }
    def u8(): Int = { ensure(); val v = parts(part)(off) & 0xFF; off += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Long = u16().toLong | (u16().toLong << 16)
    /** `n` UTF-16 code units, compressed (1 byte/unit) or not, honoring
      * the per-CONTINUE flag restart.
      */
    def chars(n: Int, highByteFirst: Boolean): String = {
      val sb = new java.lang.StringBuilder(n)
      var high = highByteFirst
      var i = 0
      while (i < n) {
        ensure()
        if (atBoundary) high = (u8() & 1) == 1 // new grbit at the boundary
        val c = if (high) (u8() | (u8() << 8)).toChar else u8().toChar
        sb.append(c)
        i += 1
      }
      sb.toString
    }
    def skip(n: Long): Unit = { var i = 0L; while (i < n) { u8(); i += 1 } }
    /** `n` raw bytes (BIFF5 byte strings — no compression flag). */
    def bytes(n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) { out(i) = u8().toByte; i += 1 }
      out
    }
  }

  /** The charset a BIFF5 CODEPAGE record names; 1252 is the de-facto
    * default when the record is absent (what xlrd assumes too). Unknown
    * or JDK-unsupported pages degrade to windows-1252 rather than
    * failing the whole workbook on exotic text.
    */
  private def charsetFor(codepage: Int): java.nio.charset.Charset = {
    val name = codepage match {
      case 1200 => "UTF-16LE"
      case 367 => "US-ASCII"
      case 10000 => "x-MacRoman"
      case n => s"windows-$n"
    }
    try java.nio.charset.Charset.forName(name)
    catch { case _: Exception => java.nio.charset.Charset.forName("windows-1252") }
  }

  /** BIFF5 byte string at the cursor: cch (8- or 16-bit) + codepage
    * bytes. No flags, no rich/ext tails.
    */
  private def readByteString(
      cur: Cursor, cchBytes: Int, cs: java.nio.charset.Charset): String = {
    val cch = if (cchBytes == 1) cur.u8() else cur.u16()
    new String(cur.bytes(cch), cs)
  }

  /** XLUnicodeRichExtendedString at the cursor ([MS-XLS] 2.5.293). */
  private def readUnicodeString(cur: Cursor, cchBytes: Int): String = {
    val cch = if (cchBytes == 1) cur.u8() else cur.u16()
    val flags = cur.u8()
    val high = (flags & 0x01) == 1
    val ext = (flags & 0x04) != 0
    val rich = (flags & 0x08) != 0
    val cRun = if (rich) cur.u16() else 0
    val cbExt = if (ext) cur.u32() else 0L
    val s = cur.chars(cch, high)
    cur.skip(cRun * 4L + cbExt)
    s
  }

  /** RK-encoded number ([MS-XLS] 2.5.218): 30-bit int or truncated
    * float64 high bits, optionally /100.
    */
  private[sources] def decodeRk(raw: Int): Double = {
    val base =
      if ((raw & 0x2) != 0) (raw >> 2).toDouble // fInt: signed 30-bit
      else java.lang.Double.longBitsToDouble((raw & 0xFFFFFFFCL) << 32)
    if ((raw & 0x1) != 0) base / 100.0 else base
  }

  /** Integral doubles render without the trailing ".0" — the literal a
    * user sees in the cell, matching what the XLSX path reads from a
    * `<v>` element for the same content.
    */
  private def renderNum(v: Double): String =
    if (v.isWhole && math.abs(v) < 1e15) v.toLong.toString else v.toString

  // ---- workbook parse --------------------------------------------------

  private def parseWorkbook(
      wb: Array[Byte], sheet: Int, biff5: Boolean): Vector[Array[String]] = {
    // globals substream: verify the stream version, collect SST (BIFF8),
    // XF formats, custom FORMATs, CODEPAGE (BIFF5), DATE1904, BOUNDSHEETs
    val first = records(wb, 0).next()
    require(first.id == Rec.BOF && first.data.length >= 4,
      "workbook stream does not start with a BOF record")
    val version = ByteBuffer.wrap(first.data).order(ByteOrder.LITTLE_ENDIAN).getShort(0) & 0xFFFF
    val wanted = if (biff5) 0x0500 else 0x0600
    require(version == wanted,
      f"BIFF version 0x$version%04X in a ${if (biff5) "Book" else "Workbook"} " +
        f"stream (expected 0x$wanted%04X) — " +
        "convert the workbook to .xlsx or CSV")

    var sst = Vector.empty[String]
    val customFmt = scala.collection.mutable.Map.empty[Int, String]
    val xfIfmt = Vector.newBuilder[Int]
    val sheetPos = Vector.newBuilder[Int]
    var date1904 = false
    var codepage = 1252

    // one string policy per stream version: BIFF8 unicode strings,
    // BIFF5 codepage byte strings (FORMAT carries an 8-bit length in
    // BIFF5, 16-bit unicode in BIFF8; LABEL/STRING are 16-bit in both)
    def readStr(cur: Cursor, cchBytes: Int): String =
      if (biff5) readByteString(cur, cchBytes, charsetFor(codepage))
      else readUnicodeString(cur, cchBytes)
    val fmtCch = if (biff5) 1 else 2

    val it = records(wb, 0).buffered
    while (it.hasNext && it.head.id != Rec.EOF) {
      val r = it.next()
      r.id match {
        case Rec.FILEPASS =>
          throw new IllegalArgumentException(
            "encrypted .xls workbook — remove the password and save as .xlsx or CSV")
        case Rec.CODEPAGE =>
          if (r.data.length >= 2)
            codepage = ByteBuffer.wrap(r.data).order(ByteOrder.LITTLE_ENDIAN).getShort(0) & 0xFFFF
        case Rec.SST =>
          val conts = Vector.newBuilder[Array[Byte]]
          conts += r.data
          while (it.hasNext && it.head.id == Rec.CONTINUE) conts += it.next().data
          val cur = new Cursor(conts.result())
          cur.skip(4) // cstTotal
          val unique = cur.u32()
          val out = Vector.newBuilder[String]
          var i = 0L
          while (i < unique && cur.hasMore) {
            out += readUnicodeString(cur, cchBytes = 2)
            i += 1
          }
          sst = out.result()
        case Rec.FORMAT =>
          val cur = new Cursor(Vector(r.data))
          val ifmt = cur.u16()
          customFmt(ifmt) = readStr(cur, cchBytes = fmtCch)
        case Rec.XF =>
          // ifmt sits at bytes 2-3 in both BIFF5 and BIFF8 XF layouts
          if (r.data.length >= 4)
            xfIfmt += (ByteBuffer.wrap(r.data).order(ByteOrder.LITTLE_ENDIAN).getShort(2) & 0xFFFF)
        case Rec.DATE1904 =>
          date1904 = r.data.nonEmpty && (r.data(0) & 1) == 1
        case Rec.BOUNDSHEET =>
          sheetPos += ByteBuffer.wrap(r.data).order(ByteOrder.LITTLE_ENDIAN).getInt(0)
        case _ =>
      }
    }

    val positions = sheetPos.result()
    require(sheet >= 1 && sheet <= positions.length,
      s"workbook has ${positions.length} sheet(s); sheet $sheet requested")
    val xfs = xfIfmt.result()
    val dateXf: Int => Boolean = { ixfe =>
      xfs.lift(ixfe).exists(ifmt => Xlsx.isDateFormat(ifmt, customFmt.get(ifmt)))
    }
    // 1904 system: serials count from 1904-01-01; +1462 days re-bases
    // them onto the 1900 system serialToIso expects
    def numCell(ixfe: Int, v: Double): String =
      if (dateXf(ixfe)) {
        val serial = if (date1904) v + 1462 else v
        Xlsx.serialToIso(serial.toString).getOrElse(renderNum(v))
      } else renderNum(v)

    // sheet substream: cell records until EOF
    val cells = scala.collection.mutable.TreeMap.empty[Int, scala.collection.mutable.TreeMap[Int, String]]
    def put(row: Int, colIdx: Int, v: String): Unit =
      if (v != null)
        cells.getOrElseUpdate(row, scala.collection.mutable.TreeMap.empty) += colIdx -> v

    val sit = records(wb, positions(sheet - 1)).buffered
    val sheetBof = sit.next()
    require(sheetBof.id == Rec.BOF, "worksheet substream does not start with BOF")
    var done = false
    while (sit.hasNext && !done) {
      val r = sit.next()
      val b = ByteBuffer.wrap(r.data).order(ByteOrder.LITTLE_ENDIAN)
      r.id match {
        case Rec.EOF => done = true
        case Rec.LABELSST =>
          val (rw, c, _) = (b.getShort(0) & 0xFFFF, b.getShort(2) & 0xFFFF, ())
          val isst = b.getInt(6)
          put(rw, c, sst.lift(isst).orNull)
        case Rec.LABEL =>
          val cur = new Cursor(Vector(java.util.Arrays.copyOfRange(r.data, 6, r.data.length)))
          put(b.getShort(0) & 0xFFFF, b.getShort(2) & 0xFFFF,
            readStr(cur, cchBytes = 2))
        case Rec.NUMBER =>
          put(b.getShort(0) & 0xFFFF, b.getShort(2) & 0xFFFF,
            numCell(b.getShort(4) & 0xFFFF, b.getDouble(6)))
        case Rec.RK =>
          put(b.getShort(0) & 0xFFFF, b.getShort(2) & 0xFFFF,
            numCell(b.getShort(4) & 0xFFFF, decodeRk(b.getInt(6))))
        case Rec.MULRK =>
          val rw = b.getShort(0) & 0xFFFF
          val colFirst = b.getShort(2) & 0xFFFF
          val nCells = (r.data.length - 6) / 6
          var i = 0
          while (i < nCells) {
            val ixfe = b.getShort(4 + i * 6) & 0xFFFF
            val rk = b.getInt(6 + i * 6)
            put(rw, colFirst + i, numCell(ixfe, decodeRk(rk)))
            i += 1
          }
        case Rec.BOOLERR =>
          val isErr = (r.data(7) & 0xFF) != 0
          if (!isErr) // errors surface as null, like empty cells
            put(b.getShort(0) & 0xFFFF, b.getShort(2) & 0xFFFF,
              if ((r.data(6) & 0xFF) != 0) "TRUE" else "FALSE")
        case Rec.FORMULA =>
          val rw = b.getShort(0) & 0xFFFF
          val c = b.getShort(2) & 0xFFFF
          val ixfe = b.getShort(4) & 0xFFFF
          if ((b.getShort(12) & 0xFFFF) == 0xFFFF) {
            // cached non-numeric result: byte 6 says which kind
            (r.data(6) & 0xFF) match {
              case 0 => // string: the value arrives in the next STRING record
                var found = false
                while (sit.hasNext && !found && sit.head.id != Rec.EOF) {
                  if (sit.head.id == Rec.STRING) {
                    val s = sit.next()
                    // a long cached result spans CONTINUE records: gather
                    // them into one logical stream (the SST discipline —
                    // BIFF8 restarts the compression grbit per part, which
                    // Cursor.chars honors; BIFF5 byte strings continue raw)
                    val parts = Vector.newBuilder[Array[Byte]]
                    parts += s.data
                    while (sit.hasNext && sit.head.id == Rec.CONTINUE)
                      parts += sit.next().data
                    put(rw, c, readStr(new Cursor(parts.result()), cchBytes = 2))
                    found = true
                  } else if (sit.head.id == Rec.FORMULA) found = true // malformed; bail
                  else sit.next()
                }
              case 1 => put(rw, c, if ((r.data(8) & 0xFF) != 0) "TRUE" else "FALSE")
              case _ => // error / blank cached value -> null
            }
          } else put(rw, c, numCell(ixfe, b.getDouble(6)))
        case _ =>
      }
    }

    cells.iterator.map { case (_, byCol) =>
      val width = byCol.lastKey + 1
      val row = Array.fill[String](width)(null)
      byCol.foreach { case (c, v) => row(c) = v }
      row
    }.toVector
  }
}
