package graft.streaming

import graft.SparkSpec
import graft.operators.{IvfCentroids, IvfIndex, LineDedup, LineFreqIndex, LshIndex}
import org.apache.spark.sql.DataFrame

/** The durable-checkpoint hook as a FAMILY contract (r9, extracted from
  * SpanGate into [[GateCheckpoints]]): every frequency-append gate
  * writes a complete self-contained index artifact every N batches and
  * reopens the newest via its `latestCheckpoint`. SpanGateSpec covers
  * the span gate; this covers the other three — and, for each, that the
  * reopened artifact IS the gate's live index (row-for-row), so a
  * restart seeded from it continues the exact corpus-so-far state.
  */
class GateCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")
  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("BoilerplateGate checkpoint artifact == live index; latest reopens") {
    val seg = LineDedup.WordChunkSegments(3)
    val ckpt = java.nio.file.Files.createTempDirectory("line_ckpt").toString
    assert(BoilerplateGate.latestCheckpoint(spark, ckpt).isEmpty)
    val gate = new BoilerplateGate.Gate(
      LineFreqIndex.build(docs.filter($"doc_id" % 4 === 0), "doc_id", "text", seg),
      "doc_id", "text", maxDocFreq = 8,
      checkpointPath = Some(ckpt), checkpointEvery = 2)
    (1 to 3).foreach(k => gate.filterBatch(docs.filter($"doc_id" % 4 === k)).count())
    assert(gate.lastCheckpoint.exists(_.endsWith("line_index_2")))
    val reopened = BoilerplateGate.latestCheckpoint(spark, ckpt).get
    // the artifact is the index as of batch 2 — compare against a direct
    // build over initial + batches 1..2 (append == build is spec-pinned
    // for this family, so entry parity is the whole-state check)
    val direct = LineFreqIndex.build(
      docs.filter($"doc_id" % 4 === 0 || $"doc_id" % 4 === 1 || $"doc_id" % 4 === 2),
      "doc_id", "text", seg)
    def ents(ix: DataFrame) = ix.filter($"kind" === LineFreqIndex.EntryKind)
      .select($"seg", $"df").as[(String, Long)].collect().toSet
    assert(LineFreqIndex.readMeta(reopened).nDocs == LineFreqIndex.readMeta(direct).nDocs)
    assert(ents(reopened) == ents(direct))
  }

  test("NearDupGate checkpoint artifact == live index at the checkpointed batch") {
    val ckpt = java.nio.file.Files.createTempDirectory("lsh_ckpt").toString
    assert(NearDupGate.latestCheckpoint(spark, ckpt).isEmpty)
    var indexAt2: Set[(Option[Long], Int, Option[String])] = null
    val gate = new NearDupGate.Gate(
      LshIndex.build(docs.filter($"doc_id" % 4 === 0), "doc_id", "text"),
      "doc_id", "text", threshold = 0.8,
      checkpointPath = Some(ckpt), checkpointEvery = 2)
    (1 to 3).foreach { k =>
      gate.filterBatch(docs.filter($"doc_id" % 4 === k)).count()
      if (k == 2) indexAt2 = rowsOf(gate.currentIndex)
    }
    assert(gate.lastCheckpoint.exists(_.endsWith("lsh_index_2")))
    val reopened = NearDupGate.latestCheckpoint(spark, ckpt).get
    assert(rowsOf(reopened) == indexAt2) // bit-for-bit the live state when written
  }

  test("EmbeddingDupGate checkpoint artifact == live index at the checkpointed batch") {
    val ckpt = java.nio.file.Files.createTempDirectory("ivf_ckpt").toString
    assert(EmbeddingDupGate.latestCheckpoint(spark, ckpt).isEmpty)
    var indexAt2: Set[(Option[Long], Int, Option[Int])] = null
    val gate = new EmbeddingDupGate.Gate(
      IvfIndex.build(emb.filter($"vec_id" % 4 === 0), "vec_id", "embedding",
        IvfCentroids.centroids),
      "vec_id", "embedding", threshold = 0.98,
      checkpointPath = Some(ckpt), checkpointEvery = 2)
    (1 to 3).foreach { k =>
      gate.filterBatch(emb.filter($"vec_id" % 4 === k)).count()
      if (k == 2) indexAt2 = ivfRowsOf(gate.currentIndex)
    }
    assert(gate.lastCheckpoint.exists(_.endsWith("ivf_index_2")))
    val reopened = EmbeddingDupGate.latestCheckpoint(spark, ckpt).get
    assert(ivfRowsOf(reopened) == indexAt2)
  }

  private def rowsOf(ix: DataFrame): Set[(Option[Long], Int, Option[String])] =
    ix.select($"doc_id", $"band", $"bucket")
      .as[(Option[Long], Int, Option[String])].collect().toSet

  private def ivfRowsOf(ix: DataFrame): Set[(Option[Long], Int, Option[Int])] =
    ix.select($"vec_id", $"cell",
        org.apache.spark.sql.functions.size($"vec").as("x"))
      .as[(Option[Long], Int, Option[Int])].collect().toSet
}
