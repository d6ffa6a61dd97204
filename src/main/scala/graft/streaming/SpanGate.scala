package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.SpanFreqIndex

/** Streaming repeated-span-removal gate —
  * [[graft.operators.SpanFreqIndex]] wired into Structured Streaming,
  * the span-level member of the gate set ([[EventOps.dedupStream]]
  * exact-doc, [[NearDupGate]] near-dup doc, [[EmbeddingDupGate]]
  * embedding, [[BoilerplateGate]] line): each micro-batch's documents
  * are rebuilt without the word spans the corpus-so-far has already
  * seen `minDup` times.
  *
  * Per micro-batch: window the batch (only the batch pays text CPU),
  * decide every window with `stored cnt + batch cnt` — EXACTLY the
  * corpus-so-far-wide occurrence count, because disjoint-doc totals
  * add — then append the RAW batch's counts to the index (pre-removal:
  * occurrence frequency is a property of what was CRAWLED, not of what
  * survived; growing the index with cut text would let a boilerplate
  * span re-enter once its early copies were removed). No frozen state,
  * no rebuild cadence: every step is bit-equal to the one-shot
  * [[graft.operators.LineDedup.removeDuplicatedSpans]] over the corpus
  * streamed so far, restricted to the batch (spec-pinned).
  *
  * Wiring:
  * {{{
  * val gate = new SpanGate.Gate(
  *   SpanFreqIndex.build(kept, "id", "text", n = 50),
  *   "id", "text", minDup = 2)
  * stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
  *   gate.filterBatch(batch).write.mode("append").parquet(out)
  * }.start()
  * }}}
  */
object SpanGate {

  /** Mutable gate state: call [[filterBatch]] from `foreachBatch` (Spark
    * invokes it serially per stream; the lock also makes sharing one
    * gate across streams safe).
    */
  final class Gate(
      initialIndex: DataFrame,
      idCol: String,
      textCol: String,
      minDup: Long) {

    private var index: DataFrame = initialIndex
    private var owned = false // never unpersist the caller's initial index

    /** The live index (initial corpus + every raw batch so far). */
    def currentIndex: DataFrame = synchronized(index)

    /** Returns the batch rebuilt without corpus-duplicated spans
      * (`(idCol, text_kept, n_words, n_removed)`, one row per batch doc)
      * and appends the raw batch's counts to the index.
      */
    def filterBatch(batch: DataFrame): DataFrame = synchronized {
      val out = SpanFreqIndex
        .removeAgainst(index, batch, idCol, textCol, minDup)
        .localCheckpoint() // materialize BEFORE the index moves on
      val next = SpanFreqIndex.append(index, batch, idCol, textCol)
        .localCheckpoint() // sever lineage: state stays flat
      if (owned) index.unpersist()
      index = next
      owned = true
      out
    }
  }
}
