package graft.streaming

import graft.SparkSpec
import graft.operators.{LineDedup, SpanFreqIndex}
import org.apache.spark.sql.DataFrame

import scala.collection.mutable

/** End-to-end pin of the streaming span gate: every micro-batch's output
  * is bit-equal to the ONE-SHOT [[LineDedup.removeDuplicatedSpans]] over
  * the corpus streamed so far (grow-as-you-go raw union), restricted to
  * that batch — the exactness the occurrence-count index buys (no frozen
  * state).
  */
class SpanGateSpec extends SparkSpec {
  import spark.implicits._

  test("stream through the gate == per-step one-shot removeDuplicatedSpans replay") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val initial = docs.filter($"doc_id" % 4 === 0)
    val n = 5; val bar = 2L

    val dir = java.nio.file.Files.createTempDirectory("span_gate").toString
    (1 to 3).foreach { k =>
      docs.filter($"doc_id" % 4 === k).coalesce(1)
        .write.parquet(s"$dir/in/b$k.parquet")
    }

    val gate = new SpanGate.Gate(
      SpanFreqIndex.build(initial, "doc_id", "text", n),
      "doc_id", "text", minDup = bar)
    val batches = mutable.ArrayBuffer.empty[Set[Long]]
    val outputs = mutable.ArrayBuffer.empty[Set[(Long, String, Long, Long)]]
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*/")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val b = batch.localCheckpoint()
          batches += b.select("doc_id").as[Long].collect().toSet
          outputs += gate.filterBatch(b)
            .as[(Long, String, Long, Long)].collect().toSet
        }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(180000) finally q.stop()

    assert(batches.size == 3, s"expected 3 micro-batches, saw ${batches.size}")

    // replay: one-shot operator over the raw corpus streamed so far,
    // restricted to the batch — the strongest equivalence available
    var corpus = initial
    val replay = batches.map { ids =>
      val batch = docs.filter($"doc_id".isin(ids.toSeq: _*))
      corpus = corpus.unionAll(batch).localCheckpoint()
      LineDedup.removeDuplicatedSpans(corpus, "doc_id", "text", n, bar)
        .join(batch.select("doc_id"), Seq("doc_id"), "left_semi")
        .as[(Long, String, Long, Long)].collect().toSet
    }
    assert(outputs.toSeq == replay.toSeq)
    // the gate actually cut something, or this spec proves nothing
    assert(outputs.flatten.exists(r => r._4 > 0))

    // the grown index agrees with the raw corpus (docs and counts)
    assert(SpanFreqIndex.readMeta(gate.currentIndex).nDocs == corpus.count())
    val direct = SpanFreqIndex.build(corpus, "doc_id", "text", n)
    def ents(ix: DataFrame) =
      ix.filter($"kind" === SpanFreqIndex.EntryKind)
        .select($"win", $"cnt").as[(String, Long)].collect().toSet
    assert(ents(gate.currentIndex) == ents(direct))
  }

  test("checkpoint hook writes a durable index every N batches; latest reopens (r8 ADVICE)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter($"doc_id" < 400)
    val n = 5
    val ckpt = java.nio.file.Files.createTempDirectory("span_ckpt").toString

    assert(SpanGate.latestCheckpoint(spark, ckpt).isEmpty)
    assert(SpanGate.latestCheckpoint(spark, s"$ckpt/absent").isEmpty)

    val initial = docs.filter($"doc_id" % 4 === 0)
    val gate = new SpanGate.Gate(
      SpanFreqIndex.build(initial, "doc_id", "text", n),
      "doc_id", "text", minDup = 2,
      checkpointPath = Some(ckpt), checkpointEvery = 2)
    (1 to 3).foreach { k =>
      gate.filterBatch(docs.filter($"doc_id" % 4 === k)).count()
    }
    // 3 batches, every=2 -> exactly one artifact, written after batch 2
    assert(gate.lastCheckpoint.exists(_.endsWith("span_index_2")))
    val reopened = SpanGate.latestCheckpoint(spark, ckpt).get
    val direct = SpanFreqIndex.build(
      initial.unionAll(docs.filter($"doc_id" % 4 === 1))
        .unionAll(docs.filter($"doc_id" % 4 === 2)),
      "doc_id", "text", n)
    assert(SpanFreqIndex.readMeta(reopened).nDocs == SpanFreqIndex.readMeta(direct).nDocs)
    def ents(ix: DataFrame) =
      ix.filter($"kind" === SpanFreqIndex.EntryKind)
        .select($"win", $"cnt").as[(String, Long)].collect().toSet
    assert(ents(reopened) == ents(direct))
  }
}
