package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Data-card contracts: driver-reference equality on real data, the
  * vocabulary axis actually discriminating, degenerate domains, and
  * layout invariance of the integer quality mass.
  */
class DataCardSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("counts and vocabulary match a driver reference on real data") {
    val got = TextAnalysis.dataCard(docs, "text", "lang")
      .select($"lang", $"n_docs", $"n_tokens", $"distinct_tokens")
      .as[(String, Long, Long, Long)].collect().toSet
    val rows = docs.select($"lang", $"text").as[(String, Option[String])].collect()
    val want = rows.groupBy(_._1).map { case (lang, rs) =>
      val toksPer = rs.map(_._2 match {
        case Some(t) if t.trim.nonEmpty => t.trim.toLowerCase.split("\\s+").toSeq
        case _                          => Seq.empty[String]
      })
      (lang, rs.size.toLong, toksPer.map(_.size.toLong).sum,
        toksPer.flatten.toSet.size.toLong)
    }.toSet
    assert(got == want)
  }

  test("ttr discriminates vocabulary at equal token counts") {
    // rich: 12 distinct tokens; poor: the same token 12 times — equal
    // n_tokens, vocabulary 12 vs 1
    val rich = (0 until 12).map(i => s"w$i").mkString(" ")
    val poor = Seq.fill(12)("w").mkString(" ")
    val card = TextAnalysis.dataCard(
        Seq(("rich", rich), ("poor", poor)).toDF("dom", "text"), "text", "dom")
      .select($"dom", $"n_tokens", $"distinct_tokens", $"ttr")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(card("rich") == (12L, 12L, 1.0))
    assert(card("poor") == (12L, 1L, math.rint(1.0 / 12 * 1e6) / 1e6))
  }

  test("degenerate domain: all-empty texts give zero counts and null ttr") {
    val card = TextAnalysis.dataCard(
        Seq(("e", ""), ("e", "   "), ("ok", "a b")).toDF("dom", "text"), "text", "dom")
      .select($"dom", $"n_tokens", $"distinct_tokens", $"ttr", $"quality_micro")
      .as[(String, Long, Long, Option[Double], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(card("e") == (0L, 0L, None, 0L))
    assert(card("ok")._1 == 2L && card("ok")._2 == 2L && card("ok")._3.contains(1.0))
  }

  test("quality mass is an exact integer fold: layout-invariant") {
    val a = TextAnalysis.dataCard(docs, "text", "lang")
      .select($"lang", $"quality_micro").as[(String, Long)].collect().toSet
    val b = TextAnalysis.dataCard(docs.repartition(13), "text", "lang")
      .select($"lang", $"quality_micro").as[(String, Long)].collect().toSet
    assert(a == b && a.forall(_._2 > 0))
  }
}
