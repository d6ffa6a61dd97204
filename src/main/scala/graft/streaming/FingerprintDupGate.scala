package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.HammingIndex

/** Streaming near-duplicate ingest gate over CALLER-SUPPLIED 64-bit
  * fingerprints — [[graft.operators.HammingIndex]] wired into
  * Structured Streaming, the generic member of the gate set (r9): where
  * [[HammingDupGate]] fingerprints TEXT internally (SimHash), this
  * gates any precomputed hash column — the streaming path for image
  * ingest (`Multimodal.imageDHash` upstream in the same micro-batch),
  * audio fingerprints, or externally computed signatures.
  *
  * Per micro-batch: probe the index with the batch's hashes (only
  * segment extraction per row — the cheapest probe in the family),
  * drop rows within `maxDistance` bits of ANY indexed fingerprint,
  * append the survivors. Null-hash rows pass through unprobed and are
  * NOT appended (no fingerprint, no identity — the family null rule).
  * State is the index, local-checkpointed per batch;
  * [[GateCheckpoints]] provides the durable hook.
  *
  * Wiring (image ingest):
  * {{{
  * val gate = new FingerprintDupGate.Gate(
  *   HammingIndex.build(keptHashes, "id", "dhash"), "id", "dhash", maxDistance = 3)
  * stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
  *   gate.filterBatch(Multimodal.imageDHash(batch, "content"))
  *     .write.mode("append").parquet(out)
  * }.start()
  * }}}
  *
  * Semantics pinned by FingerprintDupGateSpec: streaming batch-by-batch
  * equals replaying [[HammingIndex.dedupAgainst]] grow-as-you-go over
  * the same batch sequence.
  */
object FingerprintDupGate {

  /** Mutable gate state: call [[filterBatch]] from `foreachBatch`. */
  final class Gate(
      initialIndex: DataFrame,
      idCol: String,
      hashCol: String,
      maxDistance: Int = 3,
      checkpointPath: Option[String] = None,
      checkpointEvery: Int = 0) {

    private var index: DataFrame = initialIndex
    private var owned = false // never unpersist the caller's initial index
    private var batches = 0L
    private var lastCkpt: Option[String] = None

    /** The live index (initial corpus + all survivors so far). */
    def currentIndex: DataFrame = synchronized(index)

    /** Path of the newest durable checkpoint written, if any. */
    def lastCheckpoint: Option[String] = synchronized(lastCkpt)

    /** Returns the batch rows that survive the gate (batch columns and
      * order preserved) and appends the hashed survivors to the index.
      */
    def filterBatch(batch: DataFrame): DataFrame = synchronized {
      val survivors = HammingIndex
        .dedupAgainst(index, batch, idCol, hashCol, maxDistance)
        .localCheckpoint() // materialize BEFORE the index moves on
      val appended = HammingIndex.append(index, survivors, idCol, hashCol)
      val next = appended.localCheckpoint() // sever lineage: state stays flat
      appended.unpersist()
      if (owned) index.unpersist()
      index = next
      owned = true
      batches += 1
      GateCheckpoints.maybeWrite(index, checkpointPath, checkpointEvery,
        "hamming_index_", batches).foreach(p => lastCkpt = Some(p))
      survivors
    }
  }

  /** Newest `hamming_index_<seq>` artifact under `path`, or None. */
  def latestCheckpoint(
      spark: org.apache.spark.sql.SparkSession, path: String): Option[DataFrame] =
    GateCheckpoints.latest(spark, path, "hamming_index_")
}
