package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LineFreqIndexSpec extends SparkSpec {
  import spark.implicits._
  import LineDedup.{DelimSegments, WordChunkSegments}

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text")

  private def collectOut(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, String, Long, Long)].collect().toSet

  test("filterAgainst(build(kept), batch) == one-shot dedupLines over the union, batch slice") {
    val kept = docs.filter($"doc_id" % 3 === 0)
    val batch = docs.filter($"doc_id" % 3 =!= 0)
    val seg = WordChunkSegments(3); val bar = 4L
    val index = LineFreqIndex.build(kept, "doc_id", "text", seg)
    val got = collectOut(
      LineFreqIndex.filterAgainst(index, batch, "doc_id", "text", bar))
    val want = collectOut(
      LineDedup.dedupLines(docs, "doc_id", "text", seg, bar)
        .join(batch.select("doc_id"), Seq("doc_id"), "left_semi"))
    assert(got == want && got.nonEmpty)
    // the stored counts actually bite: some batch doc must lose a segment
    assert(got.exists(r => r._4 < r._3))
  }

  test("delim mode equivalence + Parquet round trip + readMeta") {
    val corpus = Seq(
      (0L, "keep me\nSUBSCRIBE NOW\nunique zero"),
      (1L, "SUBSCRIBE NOW\nonly one"),
      (2L, "SUBSCRIBE NOW\nanother two"),
      (3L, "batch novel line\nSUBSCRIBE NOW"),
      (4L, "fresh content here\nonly in batch")).toDF("doc_id", "text")
    val kept = corpus.filter($"doc_id" < 3)
    val batch = corpus.filter($"doc_id" >= 3)
    val seg = DelimSegments("\n"); val bar = 3L
    val dir = java.nio.file.Files.createTempDirectory("linefreq").toString
    LineFreqIndex.build(kept, "doc_id", "text", seg)
      .write.mode("overwrite").parquet(dir)
    val index = spark.read.parquet(dir)
    val m = LineFreqIndex.readMeta(index)
    assert(m.segmenter == seg && m.nDocs == 3L)
    val got = collectOut(
      LineFreqIndex.filterAgainst(index, batch, "doc_id", "text", bar))
    // "SUBSCRIBE NOW": stored df 3 + batch df 1 = 4 > 3 -> dropped from doc 3
    assert(got == Set(
      (3L, "batch novel line", 2L, 1L),
      (4L, "fresh content here\nonly in batch", 2L, 2L)))
    val want = collectOut(
      LineDedup.dedupLines(corpus, "doc_id", "text", seg, bar)
        .filter($"doc_id" >= 3))
    assert(got == want)
  }

  test("append(build(a), b) == build(a ∪ b): exact entries and meta") {
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 =!= 0)
    val seg = WordChunkSegments(2)
    val appended = LineFreqIndex.append(
      LineFreqIndex.build(a, "doc_id", "text", seg), b, "doc_id", "text")
    val direct = LineFreqIndex.build(docs, "doc_id", "text", seg)
    def ents(ix: org.apache.spark.sql.DataFrame) =
      ix.filter($"kind" === LineFreqIndex.EntryKind)
        .select($"seg", $"df").as[(String, Long)].collect().toSet
    assert(ents(appended) == ents(direct))
    assert(LineFreqIndex.readMeta(appended) == LineFreqIndex.readMeta(direct))
  }

  test("mergeMany == build over the union; recipe mismatch fails typed") {
    val gens = Seq(0L, 1L, 2L).map(m =>
      LineFreqIndex.build(docs.filter($"doc_id" % 3 === m), "doc_id", "text",
        WordChunkSegments(3)))
    val merged = LineFreqIndex.mergeMany(gens)
    val direct = LineFreqIndex.build(docs, "doc_id", "text", WordChunkSegments(3))
    def ents(ix: org.apache.spark.sql.DataFrame) =
      ix.filter($"kind" === LineFreqIndex.EntryKind)
        .select($"seg", $"df").as[(String, Long)].collect().toSet
    assert(ents(merged) == ents(direct))
    assert(LineFreqIndex.readMeta(merged) == LineFreqIndex.readMeta(direct))

    val other = LineFreqIndex.build(docs.limit(5), "doc_id", "text", WordChunkSegments(5))
    val e = intercept[IllegalArgumentException] {
      LineFreqIndex.mergeMany(Seq(gens.head, other))
    }
    assert(e.getMessage.contains("segmenter recipe"))
    // a frame without the meta row fails typed too
    val e2 = intercept[IllegalArgumentException] {
      LineFreqIndex.readMeta(merged.filter($"kind" === LineFreqIndex.EntryKind))
    }
    assert(e2.getMessage.contains("not a segment-frequency index"))
  }

  test("delimiter regex survives the meta round trip verbatim (hex encoding)") {
    val tricky = DelimSegments("[;=\\n]+") // recipe-syntax collisions
    val ix = LineFreqIndex.build(
      Seq((0L, "a;b=c")).toDF("doc_id", "text"), "doc_id", "text", tricky)
    assert(LineFreqIndex.readMeta(ix).segmenter == tricky)
  }
}
