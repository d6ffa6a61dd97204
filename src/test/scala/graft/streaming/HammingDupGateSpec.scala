package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.operators.SimHashIndex

/** The Hamming gate's batch-equivalence contract (the family invariant
  * every gate pins): streaming micro-batches through the gate produces
  * exactly the survivors of a sequential grow-as-you-go replay with the
  * batch operator — here [[SimHashIndex.dedupAgainst]] over an index
  * REBUILT from the kept corpus at every step, so the equivalence also
  * pins the gate's append path against fresh builds (the
  * EmbeddingDupGateSpec discipline).
  */
class HammingDupGateSpec extends SparkSpec {
  import spark.implicits._

  test("stream through the gate == sequential rebuild-and-dedupAgainst replay") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val initial = docs.filter($"doc_id" % 4 === 0)

    val dir = java.nio.file.Files.createTempDirectory("hamming_gate").toString
    (1 to 3).foreach { k =>
      docs.filter($"doc_id" % 4 === k).coalesce(1)
        .write.parquet(s"$dir/in/b$k.parquet")
    }

    val gate = new HammingDupGate.Gate(
      SimHashIndex.build(initial, "doc_id", "text"), "doc_id", "text",
      maxDistance = 3,
      checkpointPath = Some(s"$dir/ckpt"), checkpointEvery = 2)
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

    // sequential replay: REBUILD the index from the kept corpus before
    // every batch (append == build under the default empty drop set),
    // dedup the batch against it, grow
    var kept = initial
    val replay = batches.map { ids =>
      val batch = docs.filter($"doc_id".isin(ids.toSeq: _*))
      val ix = SimHashIndex.build(kept, "doc_id", "text")
      val surv = SimHashIndex.dedupAgainst(ix, batch, "doc_id", "text", maxDistance = 3)
        .localCheckpoint()
      ix.unpersist()
      kept = kept.unionAll(surv)
      surv.select("doc_id").as[Long].collect().toSet
    }
    assert(survived.toSeq == replay.toSeq)
    assert(survived.exists(_.nonEmpty))
    // the gate dropped something, or this spec proves nothing
    assert((batches.flatten.toSet -- survived.flatten.toSet).nonEmpty)

    // the grown index agrees with the grown corpus
    assert(SimHashIndex.readMeta(gate.currentIndex).nDocs == kept.count())

    // the durable-checkpoint hook follows the family contract: batch 2's
    // artifact exists, reopens, and equals the live index at that point
    // (batches=3, every=2 -> exactly one artifact, seq 2)
    assert(gate.lastCheckpoint.exists(_.endsWith("simhash_index_2")))
    val reopened = HammingDupGate.latestCheckpoint(spark, s"$dir/ckpt")
    assert(reopened.isDefined)
    val ckptDocs = reopened.get.filter($"seg" === SimHashIndex.DocSeg)
      .select("doc_id").as[Long].collect().toSet
    val replayKeptAt2 = (initial.select("doc_id").as[Long].collect().toSet
      ++ replay.take(2).flatten)
    assert(ckptDocs == replayKeptAt2,
      "checkpoint artifact must hold exactly the corpus kept after batch 2")
  }
}
