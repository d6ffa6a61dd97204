package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Release

/** Retroactive-leakage cadence monitor (r13, VERDICT r12 #5) — the T89
  * monitor wired onto the gate cadence, so a long-running ingest stream
  * (one [[graft.operators.Release.appendTurn]] per micro-batch inside
  * `foreachBatch`) runs [[graft.operators.Release.retroLeakageReport]]
  * every `every` batches and surfaces the report WITHOUT a manual
  * nightly job. The gap it watches is structural: the incremental
  * release never revisits shipped train docs, so an eval doc arriving
  * in a later batch can make yesterday's train doc retroactively leaky
  * and no per-turn gate will ever notice.
  *
  * Like every accounting gate this is an OBSERVER, never a filter:
  * [[Gate.accountBatch]] returns the batch untouched, so it drops into
  * the `foreachBatch` chain AFTER the turn ships the batch (account
  * after appending — the cadence report then covers the batch's own
  * eval docs against everything shipped, including this turn). The
  * report is the REMEDY INPUT, not the remedy:
  * [[graft.operators.Release.rebuildIfLeaky]] is a whole-corpus
  * compaction the stream owner schedules deliberately, not something a
  * micro-batch should fire mid-flight — `onReport` is the surfacing
  * hook (alerting, queueing the rebuild), [[Gate.lastReport]] the
  * pull-side twin.
  *
  * Cost per cadence point is the monitor's documented price — one
  * shipped-corpus verification scan + the artifact-sized gram join
  * (the same shape as one turn's gate pointed backward) — which is
  * exactly why it runs every N batches instead of inline in every
  * turn. The report is eagerly pinned (`localCheckpoint`): `path/data`
  * keeps growing under the stream, and a lazy plan re-read at consumer
  * time would describe a different corpus than the cadence point
  * observed.
  *
  * The monitor itself holds no artifact state — the report recomputes
  * from the release's durable artifacts — so restart recovery is
  * trivial: a fresh gate resumes the cadence from zero, and the first
  * cadence point covers everything shipped so far by construction.
  */
object RetroLeakMonitor {

  /** Mutable cadence state: call [[accountBatch]] from `foreachBatch`
    * (serial per stream; the lock also makes sharing safe), AFTER the
    * batch's `appendTurn`.
    */
  final class Gate(
      spark: SparkSession,
      path: String,
      idCol: String,
      textCol: String,
      every: Int,
      maxOverlapNgrams: Long = 0L,
      broadcastIndex: Boolean = false,
      onReport: DataFrame => Unit = _ => ()) {

    require(every >= 1, s"cadence must be >= 1 batches: $every")

    private var batches = 0L
    private var last: Option[DataFrame] = None

    /** The newest cadence report, if a cadence point has passed: one
      * row per retroactively-leaky SHIPPED train doc (idCol,
      * `overlap_ngrams`), content pinned at the cadence point. A
      * SUPERSEDED report's checkpoint blocks are freed when the next
      * cadence point replaces it (ADVICE r13 #5 — on a long-running
      * stream the stale pins would otherwise accumulate in executor
      * storage until GC): consume each report before the next cadence
      * point, or copy it (`collect`/write) if it must outlive one.
      */
    def lastReport: Option[DataFrame] = synchronized(last)

    /** Counts the batch; at every `every`-th batch runs the monitor
      * over the release at `path` and surfaces the report. Returns the
      * batch UNTOUCHED (accounting observes, never filters).
      */
    def accountBatch(batch: DataFrame): DataFrame = synchronized {
      batches += 1
      if (batches % every == 0) {
        val report = Release.retroLeakageReport(
          spark, path, idCol, textCol, maxOverlapNgrams, broadcastIndex)
          .localCheckpoint()
        // free the superseded report's pinned blocks (see lastReport doc)
        last.foreach(_.unpersist())
        last = Some(report)
        onReport(report)
      }
      batch
    }
  }
}
