package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The one-call release turn (T80): composition equals the hand-chained
  * stages bit-for-bit, the shipped artifact reopens VERIFIED in a fresh
  * session, a lost split partition fails typed, and the mix default is
  * the exact identity.
  */
class ReleaseSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private def train = docs.filter($"doc_id" % 97 =!= 0).select($"doc_id", $"lang", $"text")
  private def bench = docs.filter($"doc_id" % 97 === 0)

  private val params = Release.ReleaseParams(
    curation = Curation.CurationParams(
      minQuality = 0.0, maxRepetition = 1.0,
      lshThreshold = 0.6, maxContamination = 0.5,
      portableHash = true, minDocFreq = 0L),
    trainFrac = 0.8, valFrac = 0.1,
    leakageN = 13, maxOverlapNgrams = 100L, mixAlpha = 0.5)

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/rel"

  test("release turn == the hand-chained stages, bit for bit") {
    val path = tmp("rel_chain")
    val res = Release.build(train, bench, "doc_id", "text", "lang", path, params)

    // the same stages composed by hand from the public operators
    val core = Curation.curateCore(train, bench, "doc_id", "text", params.curation)
    val split = Sampling.assignSplit(core.docs, "doc_id", 0.8, 0.1)
    val deLeaked = Contamination.removeSplitLeakage(split, "doc_id", "text", "split",
        maxOverlapNgrams = 100L)
    val mixed = Sampling.temperatureMix(
        deLeaked.filter($"split" === "train"), "doc_id", "lang", 0.5)
      .unionByName(deLeaked.filter($"split" =!= "train"))
    val want = mixed.join(
      Packing.packSequences(mixed, "doc_id", "text",
        params.curation.packBudget, params.curation.packShards),
      Seq("doc_id"))
    assert(res.docs.count() > 0, "fixture must release something")
    assert(res.docs.unionByName(want, allowMissingColumns = false)
      .count() == 2 * want.count())
    assert(res.docs.exceptAll(want.select(res.docs.columns.map(col): _*)).isEmpty &&
      want.select(res.docs.columns.map(col): _*).exceptAll(res.docs).isEmpty)
    // all three splits are represented and the manifest covers them
    val splits = res.docs.select("split").distinct().as[String].collect().toSet
    assert(splits == Set("train", "val", "test"))
    assert(res.manifest.select("split").as[String].collect().toSet == splits)
    res.unpersist(); core.unpersist()
  }

  test("fresh-session reopen: the shipped artifact reads back VERIFIED and bit-equal") {
    val path = tmp("rel_reopen")
    val res = Release.build(train, bench, "doc_id", "text", "lang", path, params)
    val shipped = res.docs.select($"doc_id", $"text", $"split").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

    val s2 = spark.newSession()
    val got = Release.open(s2, path, "doc_id", "text")
    assert(got.count() == shipped.size)
    assert(got.select("doc_id", "text", "split").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet == shipped)
    // the data card shipped next to it and reopens with the release langs
    val card = Release.openCard(s2, path)
    assert(card.columns.toSet ==
      Set("lang", "n_docs", "n_tokens", "distinct_tokens", "ttr", "quality_micro"))
    assert(card.count() > 0)
    res.unpersist()
  }

  test("a lost split partition fails typed, naming exactly that split") {
    val path = tmp("rel_lost")
    val res = Release.build(train, bench, "doc_id", "text", "lang", path, params)
    res.unpersist()
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    rmTree(java.nio.file.Paths.get(s"$path/data/split=val"))
    val e = intercept[IllegalArgumentException] {
      Release.open(spark.newSession(), path, "doc_id", "text")
    }
    assert(e.getMessage.contains("val=missing") && e.getMessage.contains("re-pull"))
    assert(!e.getMessage.contains("train="), "intact splits must not be named")
  }

  test("mix default alpha=1.0 is the exact identity on the train slice") {
    val path = tmp("rel_nomix")
    val res = Release.build(train, bench, "doc_id", "text", "lang", path,
      params.copy(mixAlpha = 1.0))
    // identity mix: the release holds exactly the de-leaked corpus
    val core = Curation.curateCore(train, bench, "doc_id", "text", params.curation)
    val want = Contamination.removeSplitLeakage(
      Sampling.assignSplit(core.docs, "doc_id", 0.8, 0.1), "doc_id", "text", "split",
      maxOverlapNgrams = 100L)
    assert(res.docs.count() == want.count())
    assert(res.docs.select("doc_id").exceptAll(want.select("doc_id")).isEmpty)
    res.unpersist(); core.unpersist()
  }

  test("typed guard: input already carrying a split column") {
    val e = intercept[IllegalArgumentException] {
      Release.build(train.withColumn("split", lit("train")), bench,
        "doc_id", "text", "lang", tmp("rel_guard"), params)
    }
    assert(e.getMessage.contains("split"))
  }
}
