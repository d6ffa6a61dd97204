package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import graft.SparkSpec

/** Legacy `.xls` ingest (VERDICT r6 ask #3 — etl_ui.py:850 parity).
  * The container has no external writer in this environment, so the
  * fixtures are hand-assembled byte-for-byte from the public [MS-CFB] /
  * [MS-XLS] layouts: a real OLE2 compound file (FAT, directory, miniFAT
  * + mini stream for the small variant) holding a real BIFF8 workbook
  * stream (SST with a CONTINUE split, RK/MULRK/NUMBER numerics, XF/
  * FORMAT date styles, cached formula results, BOOLERR).
  */
object BiffFixture {

  private def u16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def u32(v: Long): Array[Byte] =
    Array.tabulate(4)(i => ((v >> (8 * i)) & 0xFF).toByte)
  private def f64(v: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.putDouble(v); b.array()
  }
  private def cat(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
  private def rec(id: Int, payload: Array[Byte]): Array[Byte] =
    cat(u16(id), u16(payload.length), payload)
  /** XLUnicodeString, compressed (latin-1) chars. */
  private def str16(s: String): Array[Byte] =
    cat(u16(s.length), Array(0.toByte), s.getBytes("ISO-8859-1"))
  private def str8(s: String): Array[Byte] =
    cat(Array(s.length.toByte, 0.toByte), s.getBytes("ISO-8859-1"))

  private def bof(dt: Int): Array[Byte] =
    rec(0x0809, cat(u16(0x0600), u16(dt), u16(0), u16(0), u32(0), u32(0)))
  private def xf(ifmt: Int): Array[Byte] =
    rec(0x00E0, cat(u16(0), u16(ifmt), Array.fill[Byte](16)(0)))
  private def cell(id: Int, row: Int, colIdx: Int, ixfe: Int, rest: Array[Byte]): Array[Byte] =
    rec(id, cat(u16(row), u16(colIdx), u16(ixfe), rest))

  def rkInt(v: Int): Int = (v << 2) | 0x2
  def rkInt100(cents: Int): Int = (cents << 2) | 0x3
  def rkFloat(v: Double): Int =
    ((java.lang.Double.doubleToLongBits(v) >>> 32) & 0xFFFFFFFCL).toInt

  /** The workbook stream: globals (SST split across a CONTINUE inside a
    * string, custom date FORMAT, XFs 0=general 1=custom-date 2=builtin-
    * date) + one sheet exercising every cell record the reader handles.
    */
  def workbookStream(pad: Int = 0): Array[Byte] = {
    // SST: 3 strings; the third splits mid-characters across a CONTINUE
    // (the continuation re-states the compression grbit, [MS-XLS]
    // 2.5.293). "header_b" -> two fragments "head" / "er_b".
    val sstPayload = cat(u32(3), u32(3),
      str16("header_a"), str16("olá açúcar"),
      u16(8), Array(0.toByte), "head".getBytes("ISO-8859-1"))
    val sstRec = cat(u16(0x00FC), u16(sstPayload.length), sstPayload)
    val contRec = rec(0x003C, cat(Array(0.toByte), "er_b".getBytes("ISO-8859-1")))

    val globalsNoBoundsheet = cat(
      bof(dt = 0x0005),
      rec(0x0022, u16(0)),                       // Date1904: 1900 system
      rec(0x041E, cat(u16(0xA4), str16("dd/mm/yyyy"))), // custom date fmt
      xf(0), xf(0xA4), xf(14),                   // XF 0/1/2
      sstRec, contRec)

    val sheet = cat(
      bof(dt = 0x0010),
      cell(0x00FD, 0, 0, 0, u32(0)),             // LABELSST -> "header_a"
      cell(0x00FD, 0, 1, 0, u32(2)),             // LABELSST -> split string
      cell(0x0204, 0, 2, 0, str16("inline label")), // LABEL
      cell(0x0203, 1, 0, 0, f64(3.25)),          // NUMBER, general
      cell(0x027E, 1, 1, 0, u32(rkInt(42).toLong & 0xFFFFFFFFL)), // RK int
      // MULRK: cols 2..3 — int/100 and truncated float
      rec(0x00BD, cat(u16(1), u16(2),
        u16(0), u32(rkInt100(12345).toLong & 0xFFFFFFFFL),
        u16(0), u32(rkFloat(1.5).toLong & 0xFFFFFFFFL),
        u16(3))),
      cell(0x0203, 2, 0, 2, f64(45000)),         // NUMBER, builtin date 14
      cell(0x027E, 2, 1, 1, u32(rkInt(45000).toLong & 0xFFFFFFFFL)), // RK, custom date
      cell(0x0205, 2, 2, 0, Array(1.toByte, 0.toByte)),  // BOOLERR TRUE
      // FORMULA with cached numeric result (rgce empty)
      cell(0x0006, 3, 0, 0, cat(f64(7.5), u16(0), u32(0), u16(0))),
      // FORMULA with cached STRING result + the STRING record
      cell(0x0006, 3, 1, 0, cat(
        Array(0.toByte, 0.toByte), u32(0), u16(0xFFFF), // special marker
        u16(0), u32(0), u16(0))),
      rec(0x0207, str16("computed")),
      rec(0x000A, Array.empty))                  // sheet EOF

    // BOUNDSHEET needs the sheet's absolute offset: globals + boundsheet
    // record + globals EOF precede it
    val sheetName = str8("Sheet1")
    val boundsheetLen = 4 + 4 + 2 + sheetName.length
    val eofLen = 4
    val sheetPos = globalsNoBoundsheet.length + boundsheetLen + eofLen + pad
    val boundsheet = rec(0x0085, cat(u32(sheetPos), u16(0), sheetName))
    val padding = // harmless unknown records to inflate past the mini cutoff
      if (pad > 0) {
        require(pad % 516 == 0, "pad must be a multiple of 516")
        cat(Seq.fill(pad / 516)(rec(0x005C, Array.fill[Byte](512)(0x20))): _*) // WRITEACCESS
      } else Array.empty[Byte]
    cat(globalsNoBoundsheet, boundsheet, rec(0x000A, Array.empty), padding, sheet)
  }

  /** A BIFF5 (Excel 5.0/95) workbook stream — the "Book" sibling of
    * [[workbookStream]]: BOF version 0x0500, CODEPAGE-encoded byte
    * strings everywhere (no SST/LABELSST; labels inline, FORMAT with an
    * 8-bit length, STRING/LABEL with 16-bit lengths, BOUNDSHEET name
    * bare cch+bytes), same numerics/date-style/formula surface.
    * Deliberately includes cp1252 high-byte characters so the codepage
    * decode is pinned, not just ASCII pass-through.
    */
  def workbookStream5(): Array[Byte] = {
    val cp = "windows-1252"
    def bof5(dt: Int): Array[Byte] =
      rec(0x0809, cat(u16(0x0500), u16(dt), u16(0), u16(0)))
    def bstr8(s: String): Array[Byte] = {
      val bs = s.getBytes(cp); cat(Array(bs.length.toByte), bs)
    }
    def bstr16(s: String): Array[Byte] = {
      val bs = s.getBytes(cp); cat(u16(bs.length), bs)
    }

    val globalsNoBoundsheet = cat(
      bof5(dt = 0x0005),
      rec(0x0042, u16(1252)),                    // CODEPAGE
      rec(0x0022, u16(0)),                       // Date1904: 1900 system
      rec(0x041E, cat(u16(0xA4), bstr8("dd/mm/yyyy"))), // custom date fmt
      xf(0), xf(0xA4), xf(14))                   // XF 0/1/2 (same layout)

    val sheet = cat(
      bof5(dt = 0x0010),
      cell(0x0204, 0, 0, 0, bstr16("cabeçalho")),    // LABEL, cp1252 ç
      cell(0x0204, 0, 1, 0, bstr16("olá açúcar")),   // LABEL, cp1252 á/ç/ú
      cell(0x0203, 1, 0, 0, f64(3.25)),              // NUMBER, general
      cell(0x027E, 1, 1, 0, u32(rkInt(42).toLong & 0xFFFFFFFFL)), // RK int
      rec(0x00BD, cat(u16(1), u16(2),                // MULRK cols 2..3
        u16(0), u32(rkInt100(12345).toLong & 0xFFFFFFFFL),
        u16(0), u32(rkFloat(1.5).toLong & 0xFFFFFFFFL),
        u16(3))),
      cell(0x0203, 2, 0, 2, f64(45000)),             // NUMBER, builtin date
      cell(0x027E, 2, 1, 1, u32(rkInt(45000).toLong & 0xFFFFFFFFL)), // RK, custom date
      cell(0x0205, 2, 2, 0, Array(1.toByte, 0.toByte)), // BOOLERR TRUE
      cell(0x0006, 3, 0, 0, cat(f64(7.5), u16(0), u32(0), u16(0))), // FORMULA num
      cell(0x0006, 3, 1, 0, cat(                     // FORMULA cached string
        Array(0.toByte, 0.toByte), u32(0), u16(0xFFFF),
        u16(0), u32(0), u16(0))),
      rec(0x0207, bstr16("computado")),              // STRING (byte string)
      rec(0x000A, Array.empty))

    val sheetName = {
      val bs = "Folha1".getBytes(cp); cat(Array(bs.length.toByte), bs)
    }
    val boundsheetLen = 4 + 4 + 2 + sheetName.length
    val eofLen = 4
    val sheetPos = globalsNoBoundsheet.length + boundsheetLen + eofLen
    val boundsheet = rec(0x0085, cat(u32(sheetPos), u16(0), sheetName))
    cat(globalsNoBoundsheet, boundsheet, rec(0x000A, Array.empty), sheet)
  }

  /** Minimal BIFF8 workbook whose one cell is a cached-formula STRING
    * split across a CONTINUE mid-string, with the continuation flipping
    * the compression grbit to uncompressed UTF-16 — the [MS-XLS]
    * STRING-record continuation case ("abcd" 8-bit + "efgh" 16-bit).
    */
  def workbookStreamContinuedString(): Array[Byte] = {
    val globalsNoBoundsheet = cat(bof(dt = 0x0005), xf(0))
    val sheet = cat(
      bof(dt = 0x0010),
      cell(0x0006, 0, 0, 0, cat(
        Array(0.toByte, 0.toByte), u32(0), u16(0xFFFF),
        u16(0), u32(0), u16(0))),
      rec(0x0207, cat(u16(8), Array(0.toByte), "abcd".getBytes("ISO-8859-1"))),
      rec(0x003C, cat(Array(1.toByte),
        "efgh".flatMap(ch => Seq(ch.toByte, 0.toByte)).toArray)),
      rec(0x000A, Array.empty))
    val sheetName = str8("Sheet1")
    val boundsheetLen = 4 + 4 + 2 + sheetName.length
    val sheetPos = globalsNoBoundsheet.length + boundsheetLen + 4
    val boundsheet = rec(0x0085, cat(u32(sheetPos), u16(0), sheetName))
    cat(globalsNoBoundsheet, boundsheet, rec(0x000A, Array.empty), sheet)
  }

  /** The BIFF5 twin: the cached STRING is a CODEPAGE byte string whose
    * bytes continue RAW across the CONTINUE boundary (no grbit byte —
    * the byte-string layout has no compression flag to restate).
    */
  def workbookStream5ContinuedString(): Array[Byte] = {
    val cp = "windows-1252"
    def bof5(dt: Int): Array[Byte] =
      rec(0x0809, cat(u16(0x0500), u16(dt), u16(0), u16(0)))
    val full = "computado até"
    val bytes = full.getBytes(cp)
    val (head, tail) = bytes.splitAt(4)
    val globalsNoBoundsheet = cat(bof5(dt = 0x0005), rec(0x0042, u16(1252)), xf(0))
    val sheet = cat(
      bof5(dt = 0x0010),
      cell(0x0006, 0, 0, 0, cat(
        Array(0.toByte, 0.toByte), u32(0), u16(0xFFFF),
        u16(0), u32(0), u16(0))),
      rec(0x0207, cat(u16(bytes.length), head)),
      rec(0x003C, tail),
      rec(0x000A, Array.empty))
    val sheetName = {
      val bs = "Folha1".getBytes(cp); cat(Array(bs.length.toByte), bs)
    }
    val boundsheetLen = 4 + 4 + 2 + sheetName.length
    val sheetPos = globalsNoBoundsheet.length + boundsheetLen + 4
    val boundsheet = rec(0x0085, cat(u32(sheetPos), u16(0), sheetName))
    cat(globalsNoBoundsheet, boundsheet, rec(0x000A, Array.empty), sheet)
  }

  private val Free = 0xFFFFFFFFL
  private val Eoc = 0xFFFFFFFEL
  private val FatSect = 0xFFFFFFFDL

  private def dirEntry(name: String, objType: Int, start: Long, size: Long,
      child: Long = Free): Array[Byte] = {
    val e = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
    val n = name.getBytes("UTF-16LE")
    e.put(n)
    e.putShort(64, (if (name.isEmpty) 0 else n.length + 2).toShort)
    e.put(66, objType.toByte)
    e.put(67, 1.toByte) // black
    e.putInt(68, Free.toInt); e.putInt(72, Free.toInt) // siblings
    e.putInt(76, child.toInt)
    e.putInt(116, start.toInt)
    e.putInt(120, size.toInt)
    e.array()
  }

  /** Wrap a workbook stream in a v3 CFB container. Streams under the
    * 4096-byte cutoff go through the miniFAT + mini stream (like small
    * real-world files); larger ones chain through the regular FAT.
    */
  def cfb(stream: Array[Byte], streamName: String = "Workbook"): Array[Byte] = {
    val mini = stream.length < 4096
    def fatSector(entries: Seq[Long]): Array[Byte] = {
      val b = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
      (0 until 128).foreach(i => b.putInt(i * 4, entries.lift(i).getOrElse(Free).toInt))
      b.array()
    }
    def header(numFat: Int, firstDir: Int, firstMiniFat: Long, numMiniFat: Int,
        difat: Seq[Long]): Array[Byte] = {
      val h = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
      h.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
      h.putShort(24, 0x003E.toShort); h.putShort(26, 3.toShort)
      h.putShort(28, 0xFFFE.toShort)
      h.putShort(30, 9.toShort); h.putShort(32, 6.toShort)
      h.putInt(44, numFat); h.putInt(48, firstDir)
      h.putInt(56, 4096)
      h.putInt(60, firstMiniFat.toInt); h.putInt(64, numMiniFat)
      h.putInt(68, Eoc.toInt); h.putInt(72, 0)
      (0 until 109).foreach(i => h.putInt(76 + i * 4, difat.lift(i).getOrElse(Free).toInt))
      h.array()
    }
    if (mini) {
      val nMini = (stream.length + 63) / 64
      val miniBytes = nMini * 64
      val nContainer = (miniBytes + 511) / 512
      // sectors: 0 FAT, 1 directory, 2 miniFAT, 3.. mini stream container
      val fat = Seq(FatSect, Eoc, Eoc) ++
        (0 until nContainer).map(i => if (i == nContainer - 1) Eoc else (4 + i).toLong)
      val miniFat = (0 until nMini).map(i => if (i == nMini - 1) Eoc else (i + 1).toLong)
      val container = java.util.Arrays.copyOf(stream, nContainer * 512)
      val dir = cat(
        dirEntry("Root Entry", 5, start = 3, size = miniBytes.toLong, child = 1),
        dirEntry(streamName, 2, start = 0, size = stream.length.toLong),
        dirEntry("", 0, Free, 0), dirEntry("", 0, Free, 0))
      cat(header(1, 1, 2, 1, Seq(0L)), fatSector(fat), dir, fatSector(miniFat), container)
    } else {
      val nSect = (stream.length + 511) / 512
      require(2 + nSect <= 128, "fixture stream too large for one FAT sector")
      // sectors: 0 FAT, 1 directory, 2.. stream
      val fat = Seq(FatSect, Eoc) ++
        (0 until nSect).map(i => if (i == nSect - 1) Eoc else (3 + i).toLong)
      val dir = cat(
        dirEntry("Root Entry", 5, start = Eoc, size = 0, child = 1),
        dirEntry(streamName, 2, start = 2, size = stream.length.toLong),
        dirEntry("", 0, Free, 0), dirEntry("", 0, Free, 0))
      cat(header(1, 1, Eoc, 0, Seq(0L)),
        fatSector(fat), dir, java.util.Arrays.copyOf(stream, nSect * 512))
    }
  }

  /** Wrap a (>= 4096-byte) workbook stream in a v4 CFB container:
    * 4096-byte sectors, so sector n lives at (n+1) << 12 — the header
    * occupies a FULL sector-sized slot, not 512 bytes. Pins the
    * [MS-CFB] 2.1 addressing (r7 ADVICE: the old `512 + n*size` only
    * happened to be right for v3).
    */
  def cfbV4(stream: Array[Byte], streamName: String = "Workbook"): Array[Byte] = {
    val S = 4096
    require(stream.length >= S, "v4 fixture keeps the stream in the regular FAT")
    def fatSector(entries: Seq[Long]): Array[Byte] = {
      val b = ByteBuffer.allocate(S).order(ByteOrder.LITTLE_ENDIAN)
      (0 until S / 4).foreach(i => b.putInt(i * 4, entries.lift(i).getOrElse(Free).toInt))
      b.array()
    }
    val header = {
      val h = ByteBuffer.allocate(S).order(ByteOrder.LITTLE_ENDIAN) // 512 used, rest zero
      h.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
      h.putShort(24, 0x003E.toShort); h.putShort(26, 4.toShort) // major version 4
      h.putShort(28, 0xFFFE.toShort)
      h.putShort(30, 12.toShort); h.putShort(32, 6.toShort) // sectorShift 12
      h.putInt(40, 1) // v4: number of directory sectors
      h.putInt(44, 1); h.putInt(48, 1) // one FAT sector; directory at sector 1
      h.putInt(56, 4096)
      h.putInt(60, Eoc.toInt); h.putInt(64, 0) // no miniFAT
      h.putInt(68, Eoc.toInt); h.putInt(72, 0)
      (0 until 109).foreach(i => h.putInt(76 + i * 4, (if (i == 0) 0L else Free).toInt))
      h.array()
    }
    val nSect = (stream.length + S - 1) / S
    // sectors: 0 FAT, 1 directory, 2.. stream
    val fat = Seq(FatSect, Eoc) ++
      (0 until nSect).map(i => if (i == nSect - 1) Eoc else (3 + i).toLong)
    val dir = java.util.Arrays.copyOf(cat(
      dirEntry("Root Entry", 5, start = Eoc, size = 0, child = 1),
      dirEntry(streamName, 2, start = 2, size = stream.length.toLong)), S)
    cat(header, fatSector(fat), dir, java.util.Arrays.copyOf(stream, nSect * S))
  }

  def write(bytes: Array[Byte]): String = {
    val f = Files.createTempFile("graft", ".xls")
    Files.write(f, bytes)
    f.toString
  }
}

class BiffSpec extends SparkSpec {

  private def expectGrid(rows: Vector[Array[String]]): Unit = {
    assert(rows(0).toSeq == Seq("header_a", "header_b", "inline label"))
    assert(rows(1).toSeq == Seq("3.25", "42", "123.45", "1.5"))
    // date-styled cells (builtin 14 and the custom dd/mm/yyyy) surface
    // as ISO through the same serialToIso the xlsx path uses
    assert(rows(2).toSeq == Seq("2023-03-15", "2023-03-15", "TRUE"))
    assert(rows(3).toSeq == Seq("7.5", "computed"))
  }

  test("small .xls (mini-stream CFB): full cell-record surface decodes") {
    val path = BiffFixture.write(BiffFixture.cfb(BiffFixture.workbookStream()))
    expectGrid(Biff.readRows(path))
  }

  test("large .xls (regular FAT chain): same grid") {
    // pad the globals past the 4096-byte mini cutoff so the stream
    // chains through the regular FAT — the other container path
    val stream = BiffFixture.workbookStream(pad = 516 * 10)
    assert(stream.length >= 4096)
    val path = BiffFixture.write(BiffFixture.cfb(stream))
    expectGrid(Biff.readRows(path))
  }

  test("Xlsx.read dispatches .xls by magic bytes and feeds the same pipeline surface") {
    val path = BiffFixture.write(BiffFixture.cfb(BiffFixture.workbookStream()))
    val df = Xlsx.read(spark, path)
    assert(df.columns.toSeq == Seq("header_a", "header_b", "inline label", "row_id"))
    assert(df.count() == 3)
  }

  test("BIFF5 'Book' workbook reads: codepage labels, numerics, dates, cached formulas") {
    val path = BiffFixture.write(
      BiffFixture.cfb(BiffFixture.workbookStream5(), streamName = "Book"))
    val rows = Biff.readRows(path)
    assert(rows(0).toSeq == Seq("cabeçalho", "olá açúcar"))
    assert(rows(1).toSeq == Seq("3.25", "42", "123.45", "1.5"))
    assert(rows(2).toSeq == Seq("2023-03-15", "2023-03-15", "TRUE"))
    assert(rows(3).toSeq == Seq("7.5", "computado"))
  }

  test("BIFF5 path dispatches from Xlsx.read like any .xls") {
    val path = BiffFixture.write(
      BiffFixture.cfb(BiffFixture.workbookStream5(), streamName = "Book"))
    val df = Xlsx.read(spark, path)
    assert(df.columns.toSeq == Seq("cabeçalho", "olá açúcar", "row_id"))
    assert(df.count() == 3)
  }

  test("BIFF8 cached-formula STRING spans a CONTINUE with a grbit restart") {
    // the carried NEXT.md case: a long cached result's STRING record
    // continues, the continuation restating the compression flag
    // ("abcd" compressed + "efgh" uncompressed UTF-16)
    val path = BiffFixture.write(
      BiffFixture.cfb(BiffFixture.workbookStreamContinuedString()))
    val rows = Biff.readRows(path)
    assert(rows(0).toSeq == Seq("abcdefgh"))
  }

  test("BIFF5 cached-formula byte STRING continues raw across a CONTINUE") {
    // byte strings carry no compression flag, so the continuation is
    // raw codepage bytes — incl. a cp1252 high byte after the split
    val path = BiffFixture.write(
      BiffFixture.cfb(BiffFixture.workbookStream5ContinuedString(),
        streamName = "Book"))
    val rows = Biff.readRows(path)
    assert(rows(0).toSeq == Seq("computado até"))
  }

  test("version mismatch in a Book stream fails typed, not a parse crash") {
    // a BIFF8-versioned stream under the legacy name: the reader must
    // say what it found and what it expected, not misparse strings
    val path = BiffFixture.write(
      BiffFixture.cfb(BiffFixture.workbookStream(), streamName = "Book"))
    val e = intercept[IllegalArgumentException] { Biff.readRows(path) }
    assert(e.getMessage.contains("0x0600") && e.getMessage.contains("0x0500"))
    assert(e.getMessage.contains(".xlsx or CSV"))
  }

  test("encrypted workbook (FilePass) fails loudly") {
    // splice a FILEPASS record right after the globals BOF
    val ws = BiffFixture.workbookStream()
    val bofLen = 4 + 16
    val withPass = ws.take(bofLen) ++
      Array[Byte](0x2F, 0x00, 0x02, 0x00, 0x01, 0x00) ++ ws.drop(bofLen)
    val path = BiffFixture.write(BiffFixture.cfb(withPass))
    val e = intercept[IllegalArgumentException] { Biff.readRows(path) }
    assert(e.getMessage.contains("encrypted"))
  }

  test("non-workbook bytes fail with a typed error from the dispatching reader") {
    val f = Files.createTempFile("graft", ".xls")
    Files.write(f, "id;nome\n1;abc\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] { Xlsx.readRows(f.toString) }
    assert(e.getMessage.contains("neither an OOXML"))
  }

  test("v4 CFB (4096-byte sectors): sector n at (n+1)<<12 per [MS-CFB]") {
    val ws = BiffFixture.workbookStream(pad = 516 * 8) // push past one 4096-byte sector
    assert(ws.length >= 4096)
    val path = BiffFixture.write(BiffFixture.cfbV4(ws))
    expectGrid(Biff.readRows(path))
  }

  test("corrupt FAT chain fails typed, never a bare ArrayIndexOutOfBounds") {
    // point the directory's start sector far outside the FAT
    val good = BiffFixture.cfb(
      BiffFixture.workbookStream(pad = 516 * 9), streamName = "Workbook")
    val buf = ByteBuffer.wrap(good).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(48, 12345) // header: first directory sector
    val path = BiffFixture.write(good)
    val e = intercept[IllegalArgumentException] { Biff.readRows(path) }
    assert(e.getMessage.contains("corrupt"))
  }

  test("BIFF and XLSX readers agree cell-for-cell on equivalent workbooks (one date policy)") {
    // The same grid expressed in both containers: the BIFF fixture's
    // XF/FORMAT date routing (builtin 14, custom dd/mm/yyyy) must land
    // in the same serialToIso the xlsx styles.xml path uses — a
    // divergence in date-style DETECTION shows up here even though the
    // serial conversion is shared by construction. (The BOOLERR cell is
    // expressed as the string it surfaces as: xlsx `t="b"` cells keep
    // their raw 0/1 text by design, matching pandas' read of typed
    // bools only through the writer's own round-trip.)
    val xlsPath = BiffFixture.write(BiffFixture.cfb(BiffFixture.workbookStream()))

    val f = Files.createTempFile("graft-parity", ".xlsx").toFile
    val zip = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(f))
    def put(name: String, content: String): Unit = {
      zip.putNextEntry(new java.util.zip.ZipEntry(name))
      zip.write(content.getBytes("UTF-8")); zip.closeEntry()
    }
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheets><sheet name="S" sheetId="1"/></sheets></workbook>""".stripMargin)
    put("xl/styles.xml",
      """<?xml version="1.0"?><styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<numFmts count="1"><numFmt numFmtId="164" formatCode="dd/mm/yyyy"/></numFmts>
        |<cellXfs count="3">
        |<xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/>
        |<xf numFmtId="164" applyNumberFormat="1"/>
        |</cellXfs></styleSheet>""".stripMargin)
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>header_a</t></is></c><c r="B1" t="inlineStr"><is><t>header_b</t></is></c><c r="C1" t="inlineStr"><is><t>inline label</t></is></c></row>
        |<row r="2"><c r="A2"><v>3.25</v></c><c r="B2"><v>42</v></c><c r="C2"><v>123.45</v></c><c r="D2"><v>1.5</v></c></row>
        |<row r="3"><c r="A3" s="1"><v>45000</v></c><c r="B3" s="2"><v>45000</v></c><c r="C3" t="inlineStr"><is><t>TRUE</t></is></c></row>
        |<row r="4"><c r="A4"><v>7.5</v></c><c r="B4" t="inlineStr"><is><t>computed</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zip.close()

    val a = Biff.readRows(xlsPath)
    val b = Xlsx.readRows(f.getAbsolutePath)
    assert(a.size == b.size)
    a.zip(b).zipWithIndex.foreach { case ((ra, rb), i) =>
      assert(ra.toSeq == rb.toSeq, s"row $i diverged: ${ra.toSeq} vs ${rb.toSeq}")
    }
  }
}
