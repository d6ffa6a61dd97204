package graft.sources

import java.io.InputStream
import java.util.zip.ZipFile

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import scala.collection.mutable.ArrayBuffer

/** Dependency-free XLSX source (SURVEY.md S1). The reference ingests one
  * survey workbook per year (`pd.read_excel`, etl_ui.py:861); workbooks
  * are MB-scale, so parsing on the driver and parallelizing the rows is
  * the architecturally honest port (the cluster never needed to scan the
  * spreadsheet — it needs the DataFrame that comes out of it).
  *
  * Supports the common subset: sheet1, shared strings, inline strings,
  * numeric cells. Every value lands as a string — identical to the CSV
  * path (cells are heterogeneous; coercion is per-column downstream).
  */
object Xlsx {

  /** Read sheet `sheet` (1-based) of an .xlsx into a DataFrame: first row
    * = headers, all-string schema, ingest `row_id` attached (file order).
    */
  def read(spark: SparkSession, path: String, sheet: Int = 1): DataFrame = {
    val rows = readRows(path, sheet)
    require(rows.nonEmpty, s"empty workbook: $path")
    val headers = rows.head.map(h => if (h == null) "" else h)
    val width = headers.length
    val data = rows.tail.map { r =>
      val padded = r.padTo(width, null).take(width)
      Row.fromSeq(padded)
    }
    val schema = StructType(headers.map(h => StructField(h, StringType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq), schema)
    Readers.withRowId(df)
  }

  /** Raw cell grid of sheet `sheet` (1-based; driver-side). */
  def readRows(path: String, sheet: Int = 1): Vector[Array[String]] = {
    val zip = new ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip.getInputStream(e)))
        .getOrElse(Vector.empty)
      val sheetEntry = Option(zip.getEntry(s"xl/worksheets/sheet$sheet.xml"))
        .getOrElse(throw new IllegalArgumentException(s"no sheet$sheet in $path"))
      parseSheet(zip.getInputStream(sheetEntry), shared)
    } finally zip.close()
  }

  /** Sheet names declared in the workbook manifest, in order. */
  def sheetNames(path: String): Vector[String] = {
    val zip = new ZipFile(path)
    try {
      val wb = Option(zip.getEntry("xl/workbook.xml"))
        .getOrElse(throw new IllegalArgumentException(s"no workbook.xml in $path"))
      val reader = secureFactory().createXMLStreamReader(zip.getInputStream(wb))
      val out = Vector.newBuilder[String]
      try {
        while (reader.hasNext) {
          if (reader.next() == XMLStreamConstants.START_ELEMENT &&
              reader.getLocalName == "sheet")
            out += Option(reader.getAttributeValue(null, "name")).getOrElse("")
        }
      } finally reader.close()
      out.result()
    } finally zip.close()
  }

  /** StAX factory with DTD and external-entity resolution disabled: a
    * crafted workbook must not be able to read local files or trigger
    * network fetches (XXE) — .xlsx frequently arrives from untrusted
    * senders.
    */
  private def secureFactory(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    f
  }

  private def parseSharedStrings(in: InputStream): Vector[String] = {
    val reader = secureFactory().createXMLStreamReader(in)
    val out = Vector.newBuilder[String]
    var current: StringBuilder = null
    var inT = false
    try {
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            reader.getLocalName match {
              case "si" => current = new StringBuilder
              case "t" if current != null => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inT =>
            current.append(reader.getText)
          case XMLStreamConstants.END_ELEMENT =>
            reader.getLocalName match {
              case "t" => inT = false
              case "si" if current != null => out += current.toString; current = null
              case _ =>
            }
          case _ =>
        }
      }
    } finally reader.close()
    out.result()
  }

  /** Column index from an A1-style reference ("BC12" -> 54). */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  // ---- writer (S7: the reference's multi-sheet export,
  //      etl_ui.py:2144-2159) -------------------------------------------

  /** Write one DataFrame as a single-sheet workbook. Values are written
    * as inline strings (`String.valueOf` of the cell), matching the
    * all-string read convention; null cells are omitted.
    */
  def write(df: DataFrame, path: String, sheetName: String = "Sheet1"): Unit =
    writeSheets(Seq(sheetName -> df), path)

  /** Multi-sheet workbook export — the writer complement of [[read]].
    * Like the reader, the workbook is assembled on the driver (MB-scale
    * artifact for humans, not cluster data); rows stream through
    * `toLocalIterator`, so only one partition is resident at a time.
    * The output is a minimal but complete OPC package ([Content_Types],
    * rels, workbook manifest, one worksheet part per sheet) that
    * [[read]]/[[readRows]] round-trip and spreadsheet tools accept.
    */
  def writeSheets(sheets: Seq[(String, DataFrame)], path: String): Unit = {
    require(sheets.nonEmpty, "writeSheets needs at least one sheet")
    val out = new java.util.zip.ZipOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    def entry(name: String)(body: StringBuilder => Unit): Unit = {
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      val sb = new StringBuilder
      body(sb)
      out.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.closeEntry()
    }
    val n = sheets.length
    try {
      entry("[Content_Types].xml") { sb =>
        sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
        sb ++= """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">"""
        sb ++= """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>"""
        sb ++= """<Default Extension="xml" ContentType="application/xml"/>"""
        sb ++= """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>"""
        (1 to n).foreach(i => sb ++=
          s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
        sb ++= "</Types>"
      }
      entry("_rels/.rels") { sb =>
        sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
        sb ++= """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">"""
        sb ++= """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>"""
        sb ++= "</Relationships>"
      }
      entry("xl/workbook.xml") { sb =>
        sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
        sb ++= """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>"""
        sheets.zipWithIndex.foreach { case ((name, _), i) =>
          sb ++= s"""<sheet name="${escapeXml(sanitizeSheetName(name))}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }
        sb ++= "</sheets></workbook>"
      }
      entry("xl/_rels/workbook.xml.rels") { sb =>
        sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
        sb ++= """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">"""
        (1 to n).foreach(i => sb ++=
          s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
        sb ++= "</Relationships>"
      }
      sheets.zipWithIndex.foreach { case ((_, df), i) =>
        out.putNextEntry(new java.util.zip.ZipEntry(s"xl/worksheets/sheet${i + 1}.xml"))
        val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
          out, java.nio.charset.StandardCharsets.UTF_8))
        w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
        w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
        def writeRow(rowIdx: Int, cells: Seq[Any]): Unit = {
          w.write(s"""<row r="$rowIdx">""")
          cells.zipWithIndex.foreach { case (v, c) =>
            if (v != null) {
              w.write(s"""<c r="${colName(c)}$rowIdx" t="inlineStr"><is><t>""")
              w.write(escapeXml(String.valueOf(v)))
              w.write("</t></is></c>")
            }
          }
          w.write("</row>")
        }
        writeRow(1, df.columns.toSeq)
        var r = 2
        val it = df.toLocalIterator()
        while (it.hasNext) { writeRow(r, it.next().toSeq); r += 1 }
        w.write("</sheetData></worksheet>")
        w.flush()
        out.closeEntry()
      }
    } finally out.close()
  }

  /** A1-style column name from a 0-based index (54 -> "BC"); inverse of
    * [[colIndex]].
    */
  private[sources] def colName(idx: Int): String = {
    var i = idx
    val sb = new StringBuilder
    while (i >= 0) {
      sb.insert(0, ('A' + i % 26).toChar)
      i = i / 26 - 1
    }
    sb.toString
  }

  /** XML 1.0 text/attribute escape; control chars XML forbids are
    * dropped rather than emitted as ill-formed output.
    */
  private def escapeXml(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    s.foreach {
      case '&' => sb ++= "&amp;"
      case '<' => sb ++= "&lt;"
      case '>' => sb ++= "&gt;"
      case '"' => sb ++= "&quot;"
      case c if c >= ' ' || c == '\t' || c == '\n' || c == '\r' => sb += c
      case _ =>
    }
    sb.toString
  }

  /** Excel sheet-name constraints: no []:*?/\ and at most 31 chars. */
  private def sanitizeSheetName(s: String): String = {
    val cleaned = s.map(c => if ("[]:*?/\\".contains(c)) '_' else c).take(31)
    if (cleaned.isEmpty) "Sheet" else cleaned
  }

  private def parseSheet(in: InputStream, shared: Vector[String]): Vector[Array[String]] = {
    val reader = secureFactory().createXMLStreamReader(in)
    val rows = Vector.newBuilder[Array[String]]
    var row: ArrayBuffer[String] = null
    var cellCol = -1
    var cellType: String = null
    var cellValue: StringBuilder = null
    var inV = false
    var inIs = false
    try {
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            reader.getLocalName match {
              case "row" => row = ArrayBuffer.empty
              case "c" =>
                cellCol = Option(reader.getAttributeValue(null, "r"))
                  .map(colIndex).getOrElse(row.length)
                cellType = reader.getAttributeValue(null, "t")
                cellValue = null
              case "v" => inV = true; cellValue = new StringBuilder
              case "is" => inIs = true
              case "t" if inIs => inV = true; cellValue = new StringBuilder
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inV =>
            cellValue.append(reader.getText)
          case XMLStreamConstants.END_ELEMENT =>
            reader.getLocalName match {
              case "v" => inV = false
              case "t" if inIs => inV = false
              case "is" => inIs = false
              case "c" =>
                val v: String =
                  if (cellValue == null) null
                  else cellType match {
                    case "s" => shared.lift(cellValue.toString.trim.toInt).orNull
                    case _ => cellValue.toString
                  }
                if (v != null) {
                  while (row.length < cellCol) row += null
                  if (row.length == cellCol) row += v else row(cellCol) = v
                }
              case "row" if row != null =>
                rows += row.toArray; row = null
              case _ =>
            }
          case _ =>
        }
      }
    } finally reader.close()
    rows.result()
  }
}
