package graft.streaming

import graft.SparkSpec
import graft.operators.Contamination
import org.apache.spark.sql.functions._

/** Pins the streaming decontamination gate: the per-row kernel over the
  * broadcast gram set produces EXACTLY the batch operator's triple for
  * every doc (including gram-less ones), and the same projection runs
  * under a file stream in append mode — no state, no watermark.
  */
class DecontaminationGateSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  test("withStats == batch ngramContamination on every doc") {
    val bench = docs.filter($"doc_id" % 97 === 0)
    val train = docs.filter($"doc_id" % 97 =!= 0)
    val grams = DecontaminationGate.benchGramSet(bench, "text", n = 13)
    val got = DecontaminationGate.withStats(train, "text", 13, grams)
      .select($"doc_id", $"total_ngrams", $"overlap_ngrams", round($"contamination", 9))
      .as[(Long, Long, Long, Double)].collect().toSet
    val want = Contamination.ngramContamination(train, bench, "doc_id", "text", n = 13)
      .select($"doc_id", $"total_ngrams", $"overlap_ngrams", round($"contamination", 9))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == want && got.nonEmpty)
    assert(got.exists(_._3 > 0)) // contamination actually occurs in the fixture
  }

  test("the same projection runs under a file stream (append mode, no state)") {
    val bench = docs.filter($"doc_id" % 97 === 0)
    val train = docs.filter($"doc_id" % 97 =!= 0)
    val grams = DecontaminationGate.benchGramSet(bench, "text", n = 13)

    val dir = java.nio.file.Files.createTempDirectory("decon_gate").toString
    (0 to 2).foreach { k =>
      train.filter($"doc_id" % 3 === k).coalesce(1)
        .write.parquet(s"$dir/in/b$k.parquet")
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*/")
    val q = DecontaminationGate.withStats(stream, "text", 13, grams)
      .writeStream.outputMode("append").format("memory").queryName("decon_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()

    val streamed = spark.table("decon_out")
      .select($"doc_id", $"total_ngrams", $"overlap_ngrams", round($"contamination", 9))
      .as[(Long, Long, Long, Double)].collect().toSet
    val batch = DecontaminationGate.withStats(train, "text", 13, grams)
      .select($"doc_id", $"total_ngrams", $"overlap_ngrams", round($"contamination", 9))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("decontaminate filters at the bar and preserves columns; gram-less docs pass") {
    val bench = Seq((0L, "the quick brown fox jumps over")).toDF("doc_id", "text")
    val grams = DecontaminationGate.benchGramSet(bench, "text", n = 5)
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // contaminated
      (2L, "completely different wording here with zero overlap"),
      (3L, "ab"), // shorter than n: 0 grams -> contamination 0.0
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val kept = DecontaminationGate.decontaminate(train, "text", 5, grams, maxContamination = 0.1)
    assert(kept.columns.toSeq == train.columns.toSeq)
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(2L, 3L, 4L))
  }

  test("semantic twin: withMaxCos == batch embeddingContamination per vector, under a file stream too") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bench = emb.filter($"vec_id" % 97 === 0)
    val train = emb.filter($"vec_id" % 97 =!= 0)
    val vecs = Contamination.benchEmbeddingSet(bench, "embedding")

    val batchGate = DecontaminationGate.withMaxCos(train, "embedding", vecs, threshold = 0.25)
      .select($"vec_id", round($"max_cos", 9), $"contaminated")
      .as[(Long, Double, Int)].collect().toSet
    val batchOp = Contamination
      .embeddingContamination(train, bench, "vec_id", "embedding", threshold = 0.25)
      .select($"vec_id", round($"max_cos", 9), $"contaminated")
      .as[(Long, Double, Int)].collect().toSet
    assert(batchGate == batchOp && batchGate.nonEmpty)
    assert(batchGate.exists(_._3 == 1) && batchGate.exists(_._3 == 0))

    val dir = java.nio.file.Files.createTempDirectory("decon_emb_gate").toString
    (0 to 1).foreach { k =>
      train.filter($"vec_id" % 2 === k).coalesce(1)
        .write.parquet(s"$dir/in/b$k.parquet")
    }
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*/")
    val q = DecontaminationGate.withMaxCos(stream, "embedding", vecs, threshold = 0.25)
      .writeStream.outputMode("append").format("memory").queryName("decon_emb_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()
    val streamed = spark.table("decon_emb_out")
      .select($"vec_id", round($"max_cos", 9), $"contaminated")
      .as[(Long, Double, Int)].collect().toSet
    assert(streamed == batchGate)

    // the filter form keeps clear vectors only, columns preserved
    val kept = DecontaminationGate.decontaminateEmbeddings(
      train, "embedding", vecs, threshold = 0.25)
    assert(kept.columns.toSeq == train.columns.toSeq)
    val clear = batchGate.filter(_._3 == 0).map(_._1)
    assert(kept.select("vec_id").as[Long].collect().toSet == clear)
  }
}
