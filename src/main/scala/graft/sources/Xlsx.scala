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

  /** Read `sheet1` of an .xlsx into a DataFrame: first row = headers,
    * all-string schema, ingest `row_id` attached (file order).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = readRows(path)
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

  /** Raw cell grid of sheet1 (driver-side). */
  def readRows(path: String): Vector[Array[String]] = {
    val zip = new ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip.getInputStream(e)))
        .getOrElse(Vector.empty)
      val sheetEntry = Option(zip.getEntry("xl/worksheets/sheet1.xml"))
        .getOrElse(throw new IllegalArgumentException(s"no sheet1 in $path"))
      parseSheet(zip.getInputStream(sheetEntry), shared)
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
