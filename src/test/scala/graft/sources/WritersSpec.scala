package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.etl.{Fixtures, Pipeline, StarLoader}

class WritersSpec extends SparkSpec {

  private lazy val result = {
    val registry = spark.read.option("header", "true").csv(Fixtures.path("entidades.csv"))
    val survey = Readers.csv(spark, Fixtures.path("survey_2026.csv"))
    Pipeline.run(survey, registry, Fixtures.config, 2026)
  }

  test("writeStar round-trips partitioned-by-ano parquet") {
    val root = Files.createTempDirectory("graft-star").toString
    val star = StarLoader.load(result)
    Writers.writeStar(star, root)
    val back = spark.read.parquet(s"$root/fato_inquerito")
    assert(back.count() == 3)
    assert(back.columns.contains("ano"))
    // year partition exists on disk (partition pruning path)
    assert(new java.io.File(s"$root/fato_inquerito/ano=2026").exists())
    assert(spark.read.parquet(s"$root/dim_formacao").count() == 4)
    assert(spark.read.parquet(s"$root/comentario").count() == 2)
  }

  test("exportSheets writes one csv dir per sheet incl quarantines") {
    val root = Files.createTempDirectory("graft-sheets").toString
    Writers.exportSheets(result, root)
    val sheets = new java.io.File(root).list().toSet
    assert(Set("identificacao", "formacoes", "interesses", "disponibilidade",
      "tipo de ensino", "duplicados", "entidades_invalidas", "all_data")
      .subsetOf(sheets))
    val dup = spark.read.option("header", "true").csv(s"$root/duplicados")
    assert(dup.count() == 1)
  }

  test("exportSheetsXlsx writes ONE workbook with a tab per sheet") {
    val path = Files.createTempFile("graft-export", ".xlsx").toString
    Writers.exportSheetsXlsx(result, path)
    val names = Xlsx.sheetNames(path)
    assert(Set("identificacao", "formacoes", "interesses", "disponibilidade",
      "tipo de ensino", "duplicados", "entidades_invalidas", "all_data")
      .subsetOf(names.toSet))
    // the all_data tab round-trips the valid partition's row count
    val allIdx = names.indexOf("all_data") + 1
    assert(Xlsx.read(spark, path, sheet = allIdx).count() == result.valid.count())
    // quarantine tab holds the duplicate row
    val dupIdx = names.indexOf("duplicados") + 1
    assert(Xlsx.read(spark, path, sheet = dupIdx).count() == 1)
  }
}
