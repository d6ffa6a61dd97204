package graft.sources

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec

/** Builds a minimal .xlsx by hand (zip of XML parts) and reads it back —
  * covers shared strings, inline strings, numeric cells, sparse rows.
  */
class XlsxSpec extends SparkSpec {

  private def writeXlsx(): String = {
    val f = Files.createTempFile("graft-test", ".xlsx").toFile
    val zip = new ZipOutputStream(new FileOutputStream(f))
    def put(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |</Types>""".stripMargin)
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheets><sheet name="Sheet1" sheetId="1"/></sheets></workbook>""".stripMargin)
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
        |<si><t>Nome da Entidade</t></si>
        |<si><t>Percentagem</t></si>
        |<si><t>Município de Águeda</t></si>
        |</sst>""".stripMargin)
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>80</v></c></row>
        |<row r="3"><c r="B3"><v>42.5</v></c></row>
        |<row r="4"><c r="A4" t="inlineStr"><is><t>Inline Lda</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zip.close()
    f.getAbsolutePath
  }

  test("colIndex decodes A1 references") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA12") == 26)
    assert(Xlsx.colIndex("BC3") == 54)
  }

  test("reads shared strings, numbers, inline strings, sparse rows") {
    val df = Xlsx.read(spark, writeXlsx())
    assert(df.columns.toSeq == Seq("Nome da Entidade", "Percentagem", "row_id"))
    val rows = df.orderBy("row_id").collect()
    assert(rows.length == 3)
    assert(rows(0).getString(0) == "Município de Águeda")
    assert(rows(0).getString(1) == "80")
    assert(rows(1).getString(0) == null) // sparse: A3 missing
    assert(rows(1).getString(1) == "42.5")
    assert(rows(2).getString(0) == "Inline Lda")
    assert(rows(2).getString(1) == null)
  }

  test("xlsx feeds the pipeline like csv") {
    val df = Xlsx.read(spark, writeXlsx())
    // all-string schema + row_id — same contract as Readers.csv
    assert(df.schema.fields.init.forall(_.dataType.typeName == "string"))
    assert(df.schema.fields.last.name == "row_id")
  }

  test("colName is the inverse of colIndex") {
    assert(Xlsx.colName(0) == "A")
    assert(Xlsx.colName(25) == "Z")
    assert(Xlsx.colName(26) == "AA")
    assert(Xlsx.colName(54) == "BC")
    (0 until 1000).foreach(i => assert(Xlsx.colIndex(Xlsx.colName(i) + "1") == i))
  }

  test("write/read round-trips values incl nulls, accents, XML specials") {
    import spark.implicits._
    val f = Files.createTempFile("graft-wr", ".xlsx").toString
    val df = Seq(
      ("Município de Águeda", "80", "a < b & c > \"d\""),
      (null, "42.5", ""),
      ("Inline Lda", null, "fim")).toDF("Nome da Entidade", "Percentagem", "Obs")
    Xlsx.write(df, f)
    val back = Xlsx.read(spark, f)
    assert(back.columns.toSeq == Seq("Nome da Entidade", "Percentagem", "Obs", "row_id"))
    val got = back.orderBy("row_id").drop("row_id")
      .collect().map(_.toSeq).toSeq
    assert(got == df.collect().map(_.toSeq).toSeq)
  }

  test("writeSheets emits a multi-tab workbook, each tab readable") {
    import spark.implicits._
    val f = Files.createTempFile("graft-multi", ".xlsx").toString
    val s1 = Seq(("x", "1")).toDF("k", "v")
    val s2 = Seq(("y", "2"), ("z", "3")).toDF("col a", "col b")
    Xlsx.writeSheets(Seq("dados" -> s1, "quarentena: inválidos/2026" -> s2), f)
    assert(Xlsx.sheetNames(f) == Vector("dados", "quarentena_ inválidos_2026"))
    assert(Xlsx.read(spark, f, sheet = 1).drop("row_id").collect().map(_.toSeq).toSeq
      == s1.collect().map(_.toSeq).toSeq)
    val b2 = Xlsx.read(spark, f, sheet = 2)
    assert(b2.columns.toSeq == Seq("col a", "col b", "row_id"))
    assert(b2.count() == 2)
  }
}
