package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The BM25 posting index's exactness contract: nothing in the
  * artifact is frozen or approximate, so every lifecycle path must
  * probe BIT-IDENTICALLY to [[TextAnalysis.bm25TopK]] over the same
  * corpus — including scores, which share one expression tree.
  */
class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")
  private def queries = docs.filter($"doc_id" < 3)

  private def collectTopK(df: org.apache.spark.sql.DataFrame) =
    df.select($"query_id", $"rank", $"doc_id", $"bm25")
      .as[(Long, Int, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))

  test("probe == bm25TopK bit-for-bit; append == build(union); merge == build(union)") {
    val direct = collectTopK(TextAnalysis.bm25TopK(
      docs, "doc_id", "text", queries, "doc_id", "text", k = 10))
    assert(direct.nonEmpty)

    val whole = Bm25Index.build(docs, "doc_id", "text")
    assert(collectTopK(Bm25Index.topKAgainst(whole, queries, "doc_id", "text", k = 10)) == direct)

    val evens = Bm25Index.build(docs.filter($"doc_id" % 2 === 0), "doc_id", "text")
    val appended = Bm25Index.append(evens, docs.filter($"doc_id" % 2 =!= 0), "doc_id", "text")
    assert(collectTopK(Bm25Index.topKAgainst(appended, queries, "doc_id", "text", k = 10)) == direct)
    assert(Bm25Index.readMeta(appended) == Bm25Index.readMeta(whole))

    val odds = Bm25Index.build(docs.filter($"doc_id" % 2 =!= 0), "doc_id", "text")
    val merged = Bm25Index.mergeMany(Seq(evens, odds), "doc_id")
    assert(collectTopK(Bm25Index.topKAgainst(merged, queries, "doc_id", "text", k = 10)) == direct)
    assert(Bm25Index.readMeta(merged) == Bm25Index.readMeta(whole))

    whole.unpersist(); evens.unpersist(); appended.unpersist(); odds.unpersist(); merged.unpersist()
  }

  test("parquet round-trip probes identically; tokenless docs ride in the artifact (N convention)") {
    val d = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple apple kiwi"),
      (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val q = Seq((9L, "apple")).toDF("doc_id", "text")
    val ix = Bm25Index.build(d, "doc_id", "text")
    assert(Bm25Index.readMeta(ix) == Bm25Index.Meta(nDocs = 4L, totTokens = 6L))
    // doc rows exist for ALL docs, dl 0 for tokenless — the stored N
    assert(ix.filter($"kind" === Bm25Index.DocKind).count() == 4L)
    assert(ix.filter($"kind" === Bm25Index.DocKind && $"dl" === 0L).count() == 2L)

    val dir = java.nio.file.Files.createTempDirectory("bm25ix").toString
    ix.write.parquet(s"$dir/ix")
    val reopened = spark.read.parquet(s"$dir/ix")
    val want = collectTopK(TextAnalysis.bm25TopK(d, "doc_id", "text", q, "doc_id", "text", k = 5))
    assert(collectTopK(Bm25Index.topKAgainst(reopened, q, "doc_id", "text", k = 5)) == want)
    assert(want.map(_._3) == Seq(2L, 1L)) // tf 2 at equal idf/shorter dl outranks
    ix.unpersist()
  }

  test("k1/b are probe arguments: retuning needs no rebuild and matches the direct operator") {
    val ix = Bm25Index.build(docs, "doc_id", "text")
    for ((k1, b) <- Seq((0.5, 0.0), (2.0, 1.0))) {
      val want = collectTopK(TextAnalysis.bm25TopK(
        docs, "doc_id", "text", queries, "doc_id", "text", k = 5, k1 = k1, b = b))
      val got = collectTopK(Bm25Index.topKAgainst(
        queries = queries, index = ix, queryIdCol = "doc_id", queryTextCol = "text",
        k = 5, k1 = k1, b = b))
      assert(got == want, s"k1=$k1 b=$b")
    }
    ix.unpersist()
  }

  test("topKAgainstMany == merged-artifact probe == direct operator, bit for bit") {
    val direct = collectTopK(TextAnalysis.bm25TopK(
      docs, "doc_id", "text", queries, "doc_id", "text", k = 10))
    val gens = Seq(0, 1, 2).map(m =>
      Bm25Index.build(docs.filter($"doc_id" % 3 === m), "doc_id", "text"))
    val many = collectTopK(Bm25Index.topKAgainstMany(
      gens, queries, "doc_id", "text", k = 10))
    assert(many == direct)
    val merged = Bm25Index.mergeMany(gens, "doc_id")
    assert(collectTopK(Bm25Index.topKAgainst(merged, queries, "doc_id", "text", k = 10)) == direct)
    gens.foreach(_.unpersist()); merged.unpersist()
  }

  test("static term pushdown is a semantic no-op: past the bound, the probe falls back identically") {
    val ix = Bm25Index.build(docs, "doc_id", "text")
    val static = collectTopK(Bm25Index.topKAgainst(ix, queries, "doc_id", "text", k = 10))
    // force the fallback path (every real query has > 0 terms)
    val fallback = collectTopK(Bm25Index.topKAgainst(ix, queries, "doc_id", "text",
      k = 10, maxStaticProbeTerms = 0))
    assert(static == fallback && static.nonEmpty)
    ix.unpersist()
  }

  test("postingSkewReport: boilerplate terms surface with honest skew; balanced corpora read low") {
    val balanced = Seq(
      (1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon zeta"))
      .toDF("doc_id", "text")
    val ixB = Bm25Index.build(balanced, "doc_id", "text")
    val quiet = Bm25Index.postingSkewReport(ixB)
    assert(quiet.nTerms == 6L && quiet.nPostings == 6L && quiet.skew == 1.0)

    // every doc carries the same boilerplate token: its posting list is
    // the whole corpus while content terms stay singleton
    val boiler = (0L until 20L).map(i => (i, s"subscribe tok$i"))
      .toDF("doc_id", "text")
    val ixS = Bm25Index.build(boiler, "doc_id", "text")
    val skewed = Bm25Index.postingSkewReport(ixS, topK = 3)
    assert(skewed.top.head == (("subscribe", 20L)))
    assert(skewed.maxPostings == 20L && skewed.skew > 10.0,
      s"20-of-40 postings in one list must read as heavy skew: $skewed")
    ixB.unpersist(); ixS.unpersist()
  }

  test("stopTerms: probing with a stop list == probing queries with those terms removed") {
    val ix = Bm25Index.build(docs, "doc_id", "text")
    // pick the hottest term from the monitor — the intended loop
    val offender = Bm25Index.postingSkewReport(ix, topK = 1).top.head._1
    val withStop = collectTopK(Bm25Index.topKAgainst(
      ix, queries, "doc_id", "text", k = 10, stopTerms = Seq(offender)))
    // reference: strip the term from the query text upstream
    val stripped = queries.select($"doc_id",
      array_join(filter(TextAnalysis.tokens($"text"), t => t =!= offender), " ").as("text"))
    val want = collectTopK(Bm25Index.topKAgainst(
      ix, stripped, "doc_id", "text", k = 10))
    assert(withStop == want && withStop.nonEmpty)
    // and stopping changes something, or the offender wasn't hot
    assert(withStop != collectTopK(Bm25Index.topKAgainst(ix, queries, "doc_id", "text", k = 10)))
    ix.unpersist()
  }

  test("stopTerms on the multi-generation path == single-artifact stop == stripped queries (r9 ADVICE)") {
    val gens = Seq(0, 1, 2).map(m =>
      Bm25Index.build(docs.filter($"doc_id" % 3 === m), "doc_id", "text"))
    val whole = Bm25Index.build(docs, "doc_id", "text")
    val offender = Bm25Index.postingSkewReport(whole, topK = 1).top.head._1
    val manyStopped = collectTopK(Bm25Index.topKAgainstMany(
      gens, queries, "doc_id", "text", k = 10, stopTerms = Seq(offender)))
    val singleStopped = collectTopK(Bm25Index.topKAgainst(
      whole, queries, "doc_id", "text", k = 10, stopTerms = Seq(offender)))
    assert(manyStopped == singleStopped && manyStopped.nonEmpty)
    // as-if-never-typed: strip upstream and probe the generations plain
    val stripped = queries.select($"doc_id",
      array_join(filter(TextAnalysis.tokens($"text"), t => t =!= offender), " ").as("text"))
    val want = collectTopK(Bm25Index.topKAgainstMany(
      gens, stripped, "doc_id", "text", k = 10))
    assert(manyStopped == want)
    gens.foreach(_.unpersist()); whole.unpersist()
  }

  test("not-an-index frames fail typed") {
    val junk = Seq((1L, 0)).toDF("doc_id", "kind")
    val e1 = intercept[IllegalArgumentException] { Bm25Index.readMeta(junk) }
    assert(e1.getMessage.contains("not a BM25 index"))
    val noMeta = Seq((1L, Bm25Index.PostKind, "a", 1L, null.asInstanceOf[java.lang.Long], null.asInstanceOf[String]))
      .toDF("doc_id", "kind", "term", "tf", "dl", "params")
    val e2 = intercept[IllegalArgumentException] { Bm25Index.readMeta(noMeta) }
    assert(e2.getMessage.contains("exactly one meta row"))
  }
}
