package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SpanFreqIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text")

  private def collectOut(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, String, Long, Long)].collect().toSet

  private def ents(ix: org.apache.spark.sql.DataFrame) =
    ix.filter($"kind" === SpanFreqIndex.EntryKind)
      .select($"win", $"cnt").as[(String, Long)].collect().toSet

  test("removeAgainst(build(kept), batch) == one-shot removeDuplicatedSpans over the union, batch slice") {
    val kept = docs.filter($"doc_id" % 3 === 0)
    val batch = docs.filter($"doc_id" % 3 =!= 0)
    val n = 5; val bar = 2L
    val index = SpanFreqIndex.build(kept, "doc_id", "text", n)
    val got = collectOut(
      SpanFreqIndex.removeAgainst(index, batch, "doc_id", "text", bar))
    val want = collectOut(
      LineDedup.removeDuplicatedSpans(docs, "doc_id", "text", n, bar)
        .join(batch.select("doc_id"), Seq("doc_id"), "left_semi"))
    assert(got == want && got.nonEmpty)
    // the stored counts actually bite: some batch doc must lose words
    assert(got.exists(r => r._4 > 0))
  }

  test("Parquet round trip + readMeta + a hand-checked removal") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps high"),   // "the quick brown fox" also in doc 3
      (1L, "one unique sentence here"),
      (2L, "totally different words again"),
      (3L, "see the quick brown fox run"),      // batch: pos 1..4 covered
      (4L, "fresh batch content only here")).toDF("doc_id", "text")
    val kept = corpus.filter($"doc_id" < 3)
    val batch = corpus.filter($"doc_id" >= 3)
    val dir = java.nio.file.Files.createTempDirectory("spanfreq").toString
    SpanFreqIndex.build(kept, "doc_id", "text", n = 4)
      .write.mode("overwrite").parquet(dir)
    val index = spark.read.parquet(dir)
    val m = SpanFreqIndex.readMeta(index)
    assert(m == SpanFreqIndex.Meta(4, 3L))
    val got = collectOut(
      SpanFreqIndex.removeAgainst(index, batch, "doc_id", "text", minDup = 2))
    // doc 3: window "the quick brown fox" (stored 1 + batch 1 = 2) covers
    // word positions 1..4 -> "see" and "run" survive
    assert(got == Set(
      (3L, "see run", 6L, 4L),
      (4L, "fresh batch content only here", 5L, 0L)))
    val want = collectOut(
      LineDedup.removeDuplicatedSpans(corpus, "doc_id", "text", n = 4, minDup = 2)
        .filter($"doc_id" >= 3))
    assert(got == want)
  }

  test("append(build(a), b) == build(a ∪ b): exact entries and meta") {
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 =!= 0)
    val appended = SpanFreqIndex.append(
      SpanFreqIndex.build(a, "doc_id", "text", n = 5), b, "doc_id", "text")
    val direct = SpanFreqIndex.build(docs, "doc_id", "text", n = 5)
    assert(ents(appended) == ents(direct))
    assert(SpanFreqIndex.readMeta(appended) == SpanFreqIndex.readMeta(direct))
  }

  test("within-doc repeats count: one doc alone can cross the bar") {
    // no kept occurrences; the batch doc repeats its own 2-gram
    val kept = Seq((0L, "nothing shared at all")).toDF("doc_id", "text")
    val batch = Seq((1L, "spam spam spam spam end")).toDF("doc_id", "text")
    val index = SpanFreqIndex.build(kept, "doc_id", "text", n = 2)
    val got = collectOut(
      SpanFreqIndex.removeAgainst(index, batch, "doc_id", "text", minDup = 2))
    // "spam spam" occurs 3x within doc 1 -> positions 0..3 covered
    assert(got == Set((1L, "end", 5L, 4L)))
  }

  test("mergeMany == build over the union; width mismatch fails typed") {
    val gens = Seq(0L, 1L, 2L).map(m =>
      SpanFreqIndex.build(docs.filter($"doc_id" % 3 === m), "doc_id", "text", n = 5))
    val merged = SpanFreqIndex.mergeMany(gens)
    val direct = SpanFreqIndex.build(docs, "doc_id", "text", n = 5)
    assert(ents(merged) == ents(direct))
    assert(SpanFreqIndex.readMeta(merged) == SpanFreqIndex.readMeta(direct))

    val other = SpanFreqIndex.build(docs.limit(5), "doc_id", "text", n = 7)
    val e = intercept[IllegalArgumentException] {
      SpanFreqIndex.mergeMany(Seq(gens.head, other))
    }
    assert(e.getMessage.contains("window width"))
    // a frame without the meta row fails typed too
    val e2 = intercept[IllegalArgumentException] {
      SpanFreqIndex.readMeta(merged.filter($"kind" === SpanFreqIndex.EntryKind))
    }
    assert(e2.getMessage.contains("not a window-frequency index"))
  }
}
