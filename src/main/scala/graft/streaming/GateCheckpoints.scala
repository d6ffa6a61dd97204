package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared durable-checkpoint plumbing for the frequency-append gates
  * ([[SpanGate]], [[BoilerplateGate]], [[NearDupGate]],
  * [[EmbeddingDupGate]]) — r9, extracting the hook SpanGate introduced
  * so the whole family shares one contract instead of four copies.
  *
  * The gates' grown indexes live as `localCheckpoint` blocks (executor
  * memory-disk, NOT reliable storage): an executor loss fails later
  * batches and a stream restart silently resets the gate to the
  * caller's initial index. The recovery contract is per-family (every
  * index is a pure fold of `append` over batches, so it can always be
  * rebuilt from durable inputs — RestartRecoverySpec pins that path),
  * and this hook is the shortcut for long streams where a full rebuild
  * is too slow: every N batches the CURRENT index is written to
  * `<path>/<prefix><seq>` — a complete, self-contained Parquet artifact
  * (each family's write contract) in a FRESH directory (never an
  * overwrite a reader might hold open). On restart, reopen the newest
  * artifact via the gate's `latestCheckpoint`, rebuild-and-merge only
  * the batches that arrived after it, and seed a new Gate.
  */
private[streaming] object GateCheckpoints {

  /** The accounting gates' driver-local state discipline (r13,
    * VERDICT r12 #4 — one helper instead of a per-gate copy the next
    * family member would triple): COLLECT the merged artifact under a
    * typed row cap and rebuild it as a driver-local frame.
    * `limit(cap + 1)` means the guard never pulls more than one row
    * past the contract — a mis-scoped stream fails fast instead of
    * materializing an unbounded frame on the way to the error — and
    * the local rebuild severs lineage exactly like a `localCheckpoint`
    * would while releasing the previous state deterministically with
    * the reference (checkpoint RDD blocks are invisible to the
    * CacheManager, so superseded artifacts used to linger in executor
    * storage until GC on a long stream — r10 ADVICE); nothing
    * executor-resident exists to leak. `what` names the artifact in
    * the error; `remedy` states the gate-specific contract and fix.
    */
  def localizeBounded(
      merged: DataFrame,
      maxRows: Int,
      what: String,
      remedy: String): DataFrame = {
    val rows = merged.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"merged $what exceeds $maxRows rows — the gate's driver-local state $remedy")
    merged.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), merged.schema)
  }

  /** Write `index` to `<path>/<prefix><seq>` when the cadence says so;
    * returns the artifact path if one was written.
    */
  def maybeWrite(
      index: DataFrame,
      path: Option[String],
      every: Int,
      prefix: String,
      seq: Long): Option[String] =
    if (every >= 1 && path.exists(_.nonEmpty) && seq % every == 0) {
      val p = s"${path.get}/$prefix$seq"
      index.write.parquet(p)
      Some(p)
    } else None

  /** Newest `<prefix><seq>` artifact under `path`, or None. */
  def latest(spark: SparkSession, path: String, prefix: String): Option[DataFrame] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(dir)) None
    else {
      val seqs = fs.listStatus(dir).toSeq
        .map(_.getPath.getName)
        .filter(_.startsWith(prefix))
        .flatMap(n => scala.util.Try(n.stripPrefix(prefix).toLong).toOption.map(n -> _))
      if (seqs.isEmpty) None
      else Some(spark.read.parquet(s"$path/${seqs.maxBy(_._2)._1}"))
    }
  }
}
