package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  test("accent_fold is callable from SQL via SparkSessionExtensions") {
    // the shared test session is built .withExtensions(new GraftExtensions)
    val got = spark.sql("SELECT accent_fold('Município de Águeda') AS f")
      .collect().head.getString(0)
    assert(got == "Municipio de Agueda")
  }

  test("accent_fold survives expression trees (codegen path)") {
    import spark.implicits._
    val got = Seq("ÁGUEDA x", "plain").toDF("s")
      .selectExpr("lower(accent_fold(s)) AS f").as[String].collect().toSeq
    assert(got == Seq("agueda x", "plain"))
  }

  test("wrong argument count fails analysis, not execution") {
    val e = intercept[Exception](spark.sql("SELECT accent_fold('a', 'b')").collect())
    assert(e.getMessage.contains("accent_fold"))
    val e0 = intercept[Exception](spark.sql("SELECT normalize_text()").collect())
    assert(e0.getMessage.contains("normalize_text"))
  }

  test("normalize_text and remove_prefixes are callable from SQL") {
    import spark.implicits._
    val norm = spark.sql("SELECT normalize_text('  Câmara  MUNICIPAL ') AS f")
      .collect().head.getString(0)
    assert(norm == graft.functions.TextNorm.normalize("  Câmara  MUNICIPAL "))
    val pref = Seq("Município de Águeda").toDF("s")
      .selectExpr("remove_prefixes(s) AS f").as[String].collect().head
    assert(pref == graft.functions.TextNorm.removePrefixes("Município de Águeda"))
  }
}

class SkewDedupSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("keepFirstSkewAware matches keepFirst.kept on a skewed frame") {
    // 90% of rows share one key — the shape that melts a window partition
    val rows = (0 until 2000).map(i =>
      (if (i % 10 == 0) (i % 37).toLong else 999L, i.toLong))
    val df = rows.toDF("key", "row_id")
    val viaWindow = graft.operators.Dedup
      .keepFirst(df, Seq(col("key")), col("row_id")).kept
      .as[(Long, Long)].collect().toSet
    val viaAgg = graft.operators.Dedup
      .keepFirstSkewAware(df, Seq("key"), "row_id")
      .as[(Long, Long)].collect().toSet
    assert(viaAgg == viaWindow)
  }
}
