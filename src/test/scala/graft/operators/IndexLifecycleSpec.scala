package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The operational story none of the per-family round-trip specs
  * exercises (r8 VERDICT ask #5): a nightly job builds ALL FOUR index
  * artifacts — LSH, IVF, segment-frequency, window-frequency — writes
  * them to storage, the process ENDS, and tomorrow's job reopens every
  * artifact in a FRESH SparkSession (`newSession()`: fresh session
  * state, catalog, and conf over the shared test JVM's context — the
  * closest one JVM gets to a restart) and drives one composed curation
  * turn off them: span gate → boilerplate-line gate → incremental
  * curation against the LSH index → embedding near-dup against the IVF
  * index. Every stage's output must be bit-equal to the same turn run
  * in the original session against the never-persisted in-memory
  * indexes — artifacts are the WHOLE state, nothing rides on session
  * lifetime.
  */
class IndexLifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("all four artifacts reopen in a fresh session and drive one composed nightly turn") {
    val sfDir = "/root/testdata/sf0.001"
    def docsIn(s: SparkSession) = s.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    def embIn(s: SparkSession) = s.read.parquet(s"$sfDir/embeddings.parquet")
    val kept = docsIn(spark).filter($"doc_id" % 2 === 0)
    val keptVec = embIn(spark).filter($"vec_id" % 2 === 0)

    // night 0: build every artifact and persist it
    val root = java.nio.file.Files.createTempDirectory("lifecycle").toString
    val lsh = LshIndex.build(kept, "doc_id", "text", n = 3)
    lsh.write.parquet(s"$root/lsh")
    val span = SpanFreqIndex.build(kept, "doc_id", "text", n = 5)
    span.write.parquet(s"$root/span")
    val line = LineFreqIndex.build(kept, "doc_id", "text", LineDedup.WordChunkSegments(3))
    line.write.parquet(s"$root/line")
    val ivf = IvfIndex.build(keptVec, "vec_id", "embedding", IvfCentroids.centroids)
    ivf.write.partitionBy("cell").parquet(s"$root/ivf")

    // the composed turn, parameterized by session + index frames; all
    // inputs re-read through the session under test so no plan leaks
    // across sessions
    val params = Curation.CurationParams(minQuality = 0.0, maxRepetition = 1.0,
      maxContamination = 0.5)
    def turn(s: SparkSession, lshIx: DataFrame, spanIx: DataFrame,
        lineIx: DataFrame, ivfIx: DataFrame)
        : (Set[(Long, String)], Set[(Long, String)], Set[Long], Long, Set[Long]) = {
      val batch = docsIn(s).filter(col("doc_id") % 2 =!= 0)
      val bench = docsIn(s).filter(col("doc_id") % 97 === 0).select("doc_id", "text")
      // span gate: cut corpus-duplicated 5-word windows
      val afterSpan = SpanFreqIndex.removeAgainst(spanIx, batch, "doc_id", "text", minDup = 2)
        .select(col("doc_id"), col("text_kept").as("text"))
      // boilerplate gate: drop over-frequent 3-word chunks
      val afterLine = LineFreqIndex.filterAgainst(
          lineIx, afterSpan, "doc_id", "text", maxDocFreq = 8)
        .select(col("doc_id"), col("text_kept").as("text"))
      // incremental curation against the LSH artifact
      val curDocs = afterLine.join(batch.select(col("doc_id"), col("lang")), Seq("doc_id"))
      val r = Curation.curateIncremental(
        lshIx, curDocs, bench, "doc_id", "text", "lang", params)
      val curated = r.curated.select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val grownDocs = LshIndex.readMeta(r.kept)._1.nDocs
      r.unpersist()
      // embedding near-dup gate against the IVF artifact
      val vecSurvivors = IvfIndex.dedupAgainst(
          ivfIx, embIn(s).filter(col("vec_id") % 2 =!= 0),
          "vec_id", "embedding", threshold = 0.9, nProbe = 16)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      def rows(df: DataFrame) =
        df.collect().map(r0 => (r0.getLong(0), r0.getString(1))).toSet
      (rows(afterSpan), rows(afterLine), curated, grownDocs, vecSurvivors)
    }

    // reference: the turn in the ORIGINAL session on in-memory indexes
    val want = turn(spark, lsh, span, line, ivf)
    lsh.unpersist()

    // "tomorrow": a fresh session reopens the artifacts and runs the turn
    val s2 = spark.newSession()
    val got = turn(s2,
      s2.read.parquet(s"$root/lsh"),
      s2.read.parquet(s"$root/span"),
      s2.read.parquet(s"$root/line"),
      s2.read.parquet(s"$root/ivf"))
    assert(got == want)

    // the turn did real work, or this spec proves nothing
    assert(got._3.nonEmpty)                      // curated docs survived
    assert(got._1.exists(_._2.nonEmpty))         // span gate kept text
    assert(got._4 > LshIndex.readMeta(s2.read.parquet(s"$root/lsh"))._1.nDocs)
    assert(got._5.nonEmpty)                      // embedding survivors
  }

  test("the r9 artifacts (BM25 postings, IVF-SQ8) join the fresh-session lifecycle") {
    val sfDir = "/root/testdata/sf0.001"
    def docsIn(s: SparkSession) = s.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def embIn(s: SparkSession) = s.read.parquet(s"$sfDir/embeddings.parquet")
    val root = java.nio.file.Files.createTempDirectory("lifecycle9").toString

    // night 0: build + persist both artifacts (BM25 through its
    // term-sorted writer, IVF-SQ8 cell-partitioned)
    val bm25 = Bm25Index.build(docsIn(spark).filter($"doc_id" % 2 === 0), "doc_id", "text")
    Bm25Index.writeSorted(bm25, s"$root/bm25")
    val cal = Similarity.sq8Fit(embIn(spark), "embedding")
    val sq8 = IvfSq8Index.build(embIn(spark).filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", IvfCentroids.centroids, cal._1, cal._2)
    sq8.write.partitionBy("cell").parquet(s"$root/sq8")

    def turn(s: SparkSession, bm: DataFrame, sq: DataFrame)
        : (Seq[(Long, Int, Long, Double)], Seq[(Long, Int, Long, Double)]) = {
      val queries = docsIn(s).filter(col("doc_id") < 3)
      val retrieval = Bm25Index.topKAgainst(bm, queries, "doc_id", "text", k = 5)
        .select(col("query_id"), col("rank"), col("doc_id"), round(col("bm25"), 9))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sortBy(r => (r._1, r._2))
      val ann = IvfSq8Index.topKAgainst(sq,
          embIn(s).filter(col("vec_id") < 3), "vec_id", "embedding", k = 5, nProbe = 4)
        .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("adc_cos"), 9))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sortBy(r => (r._1, r._2))
      (retrieval, ann)
    }

    val want = turn(spark, bm25, sq8)
    bm25.unpersist(); sq8.unpersist()
    val s2 = spark.newSession()
    val got = turn(s2, s2.read.parquet(s"$root/bm25"), s2.read.parquet(s"$root/sq8"))
    assert(got == want)
    assert(got._1.nonEmpty && got._2.nonEmpty)

    // ... and the generic Hamming index: dHash fingerprints of the doc
    // ids' constructed images, built + persisted, probed tomorrow
    import graft.multimodal.Multimodal
    def hashed(s: SparkSession) = {
      val png = udf((i: Long) => Multimodal.ImageCodec.grayPng(
        Array.tabulate(8, 9)((y, x) => ((i * (x + 2) + y * 7) % 251).toInt)))
      Multimodal.imageDHash(
        docsIn(s).select(col("doc_id")).filter(col("doc_id") < 400)
          .withColumn("img", png(col("doc_id"))), "img")
        .select(col("doc_id"), col("dhash"))
    }
    val hix = HammingIndex.build(hashed(spark).filter(col("doc_id") % 2 === 0),
      "doc_id", "dhash")
    hix.write.parquet(s"$root/hamming")
    def probePairs(s: SparkSession, ix: DataFrame): Set[(Long, Long, Int)] = {
      val p = HammingIndex.pairsAgainst(ix,
        hashed(s).filter(col("doc_id") % 2 =!= 0), "doc_id", "dhash", maxDistance = 2)
      val out = p.pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      p.unpersist(); out
    }
    val wantPairs = probePairs(spark, hix)
    hix.unpersist()
    val gotPairs = probePairs(s2, s2.read.parquet(s"$root/hamming"))
    assert(gotPairs == wantPairs && gotPairs.nonEmpty)
  }

  test("the r10 artifacts join: classifier model drives a fresh-session learned-gate turn") {
    val sfDir = "/root/testdata/sf0.001"
    def docsIn(s: SparkSession) = s.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val root = java.nio.file.Files.createTempDirectory("lifecycle10").toString

    // night 0: train the quality model + build the LSH kept-corpus
    // index, persist BOTH artifacts
    def goodDoc(i: Int) =
      s"the quick brown fox number $i jumps over the lazy dog and runs to the stone bridge"
    def spamDoc(i: Int) =
      s"$$$$$$ ### @@@@ zx$i qq%% ||| ~~~ ++++ ::: buy now click here free $i$i$i win"
    val labeled = {
      import spark.implicits._
      ((0 until 60).map(i => (goodDoc(i), 1.0)) ++
        (0 until 60).map(i => (spamDoc(i), 0.0))).toDF("text", "label")
    }
    val model = QualityClassifier.train(labeled, "text", "label", numFeatures = 1 << 12)
    QualityClassifier.modelToDf(spark, model).write.parquet(s"$root/model")
    val kept = docsIn(spark).filter(col("doc_id") % 3 === 0)
    val lsh = LshIndex.build(kept, "doc_id", "text", n = 3)
    lsh.write.parquet(s"$root/lsh")

    // the turn: incremental curation with the LEARNED gate on, spam
    // planted in the batch
    def turn(s: SparkSession, ix: DataFrame, m: QualityClassifier.Model): Set[Long] = {
      import s.implicits._
      val spam = (0 until 10).map(i => (900000L + i, spamDoc(700 + i), "en"))
        .toDF("doc_id", "text", "lang")
      val batch = docsIn(s).filter(col("doc_id") % 3 === 1).unionByName(spam)
      val bench = docsIn(s).filter(col("doc_id") % 97 === 0).select("doc_id", "text")
      val r = Curation.curateIncremental(ix, batch, bench,
        "doc_id", "text", "lang",
        Curation.CurationParams(minQuality = 0.0, maxRepetition = 1.0,
          maxContamination = 0.5, qualityModel = Some(m), minModelScore = 0.3))
      val out = r.curated.select("doc_id").as[Long].collect().toSet
      r.unpersist(); out
    }

    val want = turn(spark, lsh, model)
    lsh.unpersist()
    val s2 = spark.newSession()
    val got = turn(s2,
      s2.read.parquet(s"$root/lsh"),
      QualityClassifier.modelFromDf(s2.read.parquet(s"$root/model")))
    assert(got == want && got.nonEmpty)
    assert(got.forall(_ < 900000L), "reopened model must still reject the planted spam")
  }
}
