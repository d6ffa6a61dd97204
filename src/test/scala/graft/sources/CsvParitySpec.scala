package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Pandas-parity CSV semantics: quoted embedded newlines, escaped
  * quotes, empty cells -> null.
  */
class CsvParitySpec extends SparkSpec {

  test("quoted newlines and doubled quotes parse as one row") {
    val f = Files.createTempFile("graft-csv", ".csv")
    Files.writeString(f,
      "nome,comentario\n" +
        "Porto,\"Muito útil.\nRepetir em 2027!\"\n" +
        "Braga,\"disse \"\"sim\"\" ontem\"\n" +
        "Lisboa,\n")
    val df = Readers.csv(spark, f.toString)
    assert(df.count() == 3)
    val rows = df.orderBy("row_id").collect()
    assert(rows(0).getString(1) == "Muito útil.\nRepetir em 2027!")
    assert(rows(1).getString(1) == "disse \"sim\" ontem")
    assert(rows(2).getString(1) == null)
  }
}
