package graft.streaming

import graft.SparkSpec
import graft.operators.{LshIndex, TextDedup}
import org.apache.spark.sql.DataFrame

import scala.collection.mutable

/** End-to-end pin of the streaming near-dup gate: a corpus streamed
  * through [[NearDupGate]] batch-by-batch keeps exactly the documents a
  * sequential batch replay of [[TextDedup.dedupAgainst]] keeps over the
  * same batch sequence.
  */
class NearDupGateSpec extends SparkSpec {
  import spark.implicits._

  test("stream through the gate == sequential batch dedupAgainst replay") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val initial = docs.filter($"doc_id" % 4 === 0)

    // three "crawl" files — the stream's micro-batches
    val dir = java.nio.file.Files.createTempDirectory("neardup_gate").toString
    (1 to 3).foreach { k =>
      docs.filter($"doc_id" % 4 === k).coalesce(1)
        .write.parquet(s"$dir/in/b$k.parquet")
    }

    val gate = new NearDupGate.Gate(
      LshIndex.build(initial, "doc_id", "text"), "doc_id", "text", threshold = 0.7)
    // record the ACTUAL batch partition the source produced, so the
    // batch replay below follows the same sequence whatever order the
    // file source picked
    val batches = mutable.ArrayBuffer.empty[Set[Long]]
    val survived = mutable.ArrayBuffer.empty[Set[Long]]
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*/")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val b = batch.localCheckpoint()
          batches += b.select("doc_id").as[Long].collect().toSet
          survived += gate.filterBatch(b).select("doc_id").as[Long].collect().toSet
        }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(180000) finally q.stop()

    assert(batches.size == 3, s"expected 3 micro-batches, saw ${batches.size}")

    // sequential replay with the one-shot batch operator over the SAME
    // batch sequence, growing the kept corpus as the gate does
    var kept = initial
    val replay = batches.map { ids =>
      val batch = docs.filter($"doc_id".isin(ids.toSeq: _*))
      val surv = TextDedup.dedupAgainst(kept, batch, "doc_id", "text", threshold = 0.7)
        .localCheckpoint()
      kept = kept.unionAll(surv)
      surv.select("doc_id").as[Long].collect().toSet
    }
    assert(survived.toSeq == replay.toSeq)
    assert(survived.exists(_.nonEmpty))
    // the gate dropped something, or this spec proves nothing
    assert((batches.flatten.toSet -- survived.flatten.toSet).nonEmpty)

    // the grown index agrees with the grown corpus
    val (meta, _) = LshIndex.readMeta(gate.currentIndex)
    assert(meta.nDocs == kept.count())
  }
}
