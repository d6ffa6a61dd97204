package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persistable Hamming index over a CALLER-SUPPLIED 64-bit fingerprint
  * column — [[SimHashIndex]]'s pigeonhole machinery with the signing
  * step factored out, so ANY fingerprint family gets the
  * build-once/probe-many lifecycle: perceptual image hashes
  * ([[graft.multimodal.Multimodal.imageDHash]] — the reason this
  * exists: image near-dup at corpus scale needs a nightly artifact,
  * not a per-run self-join), audio fingerprints, or externally
  * computed simhashes. The index stores `(id, h)` doc rows plus one
  * entry row per (segment, segment-value); a probe blocks the incoming
  * batch on equal segments (two hashes within Hamming distance
  * `maxDistance < segments` MUST agree on >= 1 of `segments` equal
  * bit-ranges), joins candidates, and verifies with the exact
  * `bit_count(xor)` — EXACT vs brute force modulo capped buckets, the
  * [[SimHashIndex]] contract.
  *
  * Append stores batch-local bucket counts (the family's documented
  * under-suppression — probes only ever verify MORE, never miss);
  * [[compact]] recounts exactly; [[mergeMany]] = union + compact.
  * Null-hash rows are DROPPED at build/append (no fingerprint, no
  * identity — the family null rule). Ids must be unique.
  */
object HammingIndex {

  /** `seg` value of the single metadata row. */
  val MetaSeg: Int = -1
  /** `seg` value of per-document `(id, h)` rows. */
  val DocSeg: Int = -2

  /** `builtDroppedBuckets` follows the [[SimHashIndex]] precedent: the
    * number of over-cap buckets DELETED from the stored entry rows by
    * the most recent [[compact]]/[[mergeMany]] (build/append never
    * delete — they retain over-cap buckets and let the probe suppress
    * them, reporting `droppedBuckets` per probe). Without this field a
    * compact would silently erase the missing-pair signal: the same
    * pairs stay unverified while every later probe reads
    * `droppedBuckets == 0`.
    */
  final case class Meta(
      segments: Int, maxBucketSize: Int,
      builtDroppedBuckets: Long, nDocs: Long)

  private def metaString(m: Meta): String =
    s"v1;segments=${m.segments};cap=${m.maxBucketSize};" +
      s"builtDropped=${m.builtDroppedBuckets};nDocs=${m.nDocs}"

  def readMeta(index: DataFrame): Meta = {
    require(index.columns.contains("seg") && index.columns.contains("params"),
      "not a Hamming index: expected columns (id, seg, value, cnt, h, params)")
    val rows = index.filter(col("seg") === MetaSeg).select(col("params")).collect()
    require(rows.length == 1,
      s"not a Hamming index: expected exactly one meta row (seg = $MetaSeg), found ${rows.length}")
    val s = rows(0).getString(0)
    require(s != null && s.startsWith("v1;"), s"unknown Hamming index version: $s")
    val kv = s.split(";").drop(1)
      .map { p => val i = p.indexOf('='); p.substring(0, i) -> p.substring(i + 1) }
      .toMap
    Meta(kv("segments").toInt, kv("cap").toInt,
      kv.getOrElse("builtDropped", "0").toLong, kv("nDocs").toLong)
  }

  /** One row per (doc, segment): segment s holds bits
    * `[s*64/segments, (s+1)*64/segments)`, extracted with an unsigned
    * shift so the sign bit never smears.
    */
  private def segRows(docs: DataFrame, idCol: String, segments: Int): DataFrame = {
    val width = 64 / segments
    val mask = if (width == 64) -1L else (1L << width) - 1
    docs.select(col(idCol),
      explode(array((0 until segments).map(s =>
        struct(lit(s).as("seg"),
          shiftrightunsigned(col("h"), s * width).bitwiseAND(lit(mask)).as("value"))): _*)).as("sv"))
      .select(col(idCol), col("sv.seg"), col("sv.value"))
  }

  private def indexRows(
      template: DataFrame, idCol: String, m: Meta,
      docs: DataFrame, entries: DataFrame): DataFrame = {
    val idType = template.schema(idCol).dataType
    val metaRow = template.sparkSession.range(1).select(
      lit(null).cast(idType).as(idCol),
      lit(MetaSeg).as("seg"),
      lit(null).cast("long").as("value"),
      lit(null).cast("long").as("cnt"),
      lit(null).cast("long").as("h"),
      lit(metaString(m)).as("params"))
    metaRow
      .unionAll(docs.select(
        col(idCol), lit(DocSeg).as("seg"),
        lit(null).cast("long").as("value"), lit(null).cast("long").as("cnt"),
        col("h"), lit(null).cast("string").as("params")))
      .unionAll(entries.select(
        col(idCol), col("seg"), col("value"), col("cnt"),
        lit(null).cast("long").as("h"), lit(null).cast("string").as("params")))
  }

  def build(
      df: DataFrame,
      idCol: String,
      hashCol: String,
      segments: Int = 4,
      maxBucketSize: Int = 10000): DataFrame = {
    require(segments >= 1 && 64 % segments == 0,
      s"segments must divide 64, got $segments")
    require(maxBucketSize >= 1, s"maxBucketSize must be >= 1, got $maxBucketSize")
    val docs = df.select(col(idCol), col(hashCol).cast("long").as("h"))
      .filter(col("h").isNotNull).persist()
    val nDocs = docs.count()
    val entriesRaw = segRows(docs, idCol, segments)
    val entries = entriesRaw.join(
      entriesRaw.groupBy("seg", "value").agg(count(lit(1)).as("cnt")),
      Seq("seg", "value"))
    val index = indexRows(df, idCol,
      Meta(segments, maxBucketSize, builtDroppedBuckets = 0L, nDocs),
      docs, entries).persist()
    index.count()
    docs.unpersist()
    index
  }

  final case class Probe(pairs: DataFrame, droppedBuckets: Long) {
    def unpersist(): Unit = pairs.unpersist()
  }

  /** Cross-corpus near-dup pairs `(id_existing, id_incoming, hamming)`:
    * only the incoming batch is segmented; the stored side is a
    * columnar entry scan. A bucket is suppressed when its COMBINED
    * (stored cnt + incoming) size exceeds the frozen cap.
    */
  def pairsAgainst(
      index: DataFrame,
      incoming: DataFrame,
      idCol: String,
      hashCol: String,
      maxDistance: Int): Probe = {
    val m = readMeta(index)
    require(maxDistance >= 0 && maxDistance < m.segments,
      s"pigeonhole blocking on ${m.segments} segments covers maxDistance <= ${m.segments - 1}")
    val inDocs = incoming.select(col(idCol).as("id_incoming"),
        col(hashCol).cast("long").as("h"))
      .filter(col("h").isNotNull).persist()
    inDocs.count()
    val inSeg = segRows(inDocs.withColumnRenamed("id_incoming", idCol), idCol, m.segments)
      .withColumnRenamed(idCol, "id_incoming")
    val inCnt = inSeg.groupBy("seg", "value").agg(count(lit(1)).as("cnt_i"))
    val stored = index.filter(col("seg") >= 0)
      .select(col(idCol).as("id_existing"), col("seg"), col("value"), col("cnt"))
    val touched = stored.join(broadcast(inCnt), Seq("seg", "value"))
    val dropped = touched.select(col("seg"), col("value"),
        col("cnt"), col("cnt_i")).distinct()
      .filter(col("cnt") + col("cnt_i") > m.maxBucketSize)
      .select("seg", "value").distinct().count()
    val cands = touched
      .filter(col("cnt") + col("cnt_i") <= m.maxBucketSize)
      .join(inSeg, Seq("seg", "value"))
      .select("id_existing", "id_incoming").distinct()
    val docsH = index.filter(col("seg") === DocSeg)
      .select(col(idCol).as("id_existing"), col("h").as("__ha"))
    val pairs = cands
      .join(docsH, "id_existing")
      .join(inDocs.withColumnRenamed("h", "__hb"), "id_incoming")
      .withColumn("hamming",
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("int"))
      .filter(col("hamming") <= maxDistance)
      .select(col("id_existing"), col("id_incoming"), col("hamming"))
      .persist()
    pairs.count()
    inDocs.unpersist()
    Probe(pairs, dropped)
  }

  /** `incoming` minus rows within `maxDistance` of ANY indexed
    * fingerprint, columns and order preserved. Null-hash incoming rows
    * pass through (they cannot match — same as the one-shot operators).
    */
  def dedupAgainst(
      index: DataFrame,
      incoming: DataFrame,
      idCol: String,
      hashCol: String,
      maxDistance: Int): DataFrame = {
    val probe = pairsAgainst(index, incoming, idCol, hashCol, maxDistance)
    val dupIds = probe.pairs.select(col("id_incoming").as(idCol))
      .distinct().localCheckpoint()
    probe.unpersist()
    incoming.join(dupIds, Seq(idCol), "left_anti")
      .select(incoming.columns.map(col): _*)
  }

  /** Append survivors with batch-local bucket counts (run [[compact]]
    * to restore exact counts). Ids must stay unique.
    */
  def append(
      index: DataFrame,
      newDocs: DataFrame,
      idCol: String,
      hashCol: String): DataFrame = {
    val m = readMeta(index)
    val docs = newDocs.select(col(idCol), col(hashCol).cast("long").as("h"))
      .filter(col("h").isNotNull).persist()
    val nNew = docs.count()
    val entriesRaw = segRows(docs, idCol, m.segments)
    val entries = entriesRaw.join(
      entriesRaw.groupBy("seg", "value").agg(count(lit(1)).as("cnt")),
      Seq("seg", "value"))
    val appended = index.filter(col("seg") =!= MetaSeg)
      .unionAll(indexRows(newDocs, idCol, m.copy(nDocs = m.nDocs + nNew), docs, entries))
      .persist()
    appended.count()
    docs.unpersist()
    appended
  }

  /** Exact-count repair from stored rows — no fingerprints recomputed;
    * buckets grown past the frozen cap by appends are dropped, the
    * family's compact contract (probes can no longer be dragged
    * quadratic by them; their docs' OTHER segments still block). The
    * number of deleted buckets is recorded as
    * `Meta.builtDroppedBuckets` (r10, the [[SimHashIndex]] precedent)
    * so the suppression stays visible after the rows are gone —
    * otherwise probe-time `droppedBuckets` would read 0 while the same
    * pairs remain unverified.
    */
  def compact(index: DataFrame, idCol: String): DataFrame = {
    val m = readMeta(index)
    val docs = index.filter(col("seg") === DocSeg)
      .select(col(idCol), col("h")).persist()
    val nDocs = docs.count()
    val entries = index.filter(col("seg") >= 0)
      .select(col(idCol), col("seg"), col("value"))
    val counts = entries.groupBy("seg", "value").agg(count(lit(1)).as("cnt"))
      .persist()
    val dropped = counts.filter(col("cnt") > m.maxBucketSize).count()
    val entryRows = entries.join(
      counts.filter(col("cnt") <= m.maxBucketSize), Seq("seg", "value"))
    val compacted = indexRows(index, idCol,
      m.copy(nDocs = nDocs,
        builtDroppedBuckets = m.builtDroppedBuckets + dropped),
      docs, entryRows)
      .persist()
    compacted.count()
    counts.unpersist()
    docs.unpersist()
    compacted
  }

  /** Merge same-recipe generations: stored-row union + [[compact]].
    * Ids must be unique across generations. The merged meta row's
    * `builtDroppedBuckets` carries the SUM of the generations' records
    * before compact adds its own newly-deleted buckets — per-
    * generation suppression history survives the merge (r10).
    */
  def mergeMany(indexes: Seq[DataFrame], idCol: String): DataFrame = {
    require(indexes.nonEmpty, "need at least one index generation")
    val metas = indexes.map(readMeta)
    require(metas.forall(m => m.segments == metas.head.segments &&
      m.maxBucketSize == metas.head.maxBucketSize),
      "index generations disagree on build parameters (segments/cap) — " +
        "rebuild with one recipe")
    val head = indexes.head
    val carried = metas.head.copy(
      builtDroppedBuckets = metas.map(_.builtDroppedBuckets).sum)
    val metaRow = head.sparkSession.range(1).select(
      lit(null).cast(head.schema(idCol).dataType).as(idCol),
      lit(MetaSeg).as("seg"),
      lit(null).cast("long").as("value"),
      lit(null).cast("long").as("cnt"),
      lit(null).cast("long").as("h"),
      lit(metaString(carried)).as("params"))
    compact(metaRow.select(head.columns.map(col): _*)
      .unionAll(indexes.map(_.filter(col("seg") =!= MetaSeg)).reduce(_ unionAll _)), idCol)
  }

  /** Cap-drift monitor (r10 — the [[SimHashIndex.capDriftReport]] twin
    * for the generic family, whose report type it reuses): [[append]]
    * stores batch-local bucket counts, so a bucket grown past the
    * frozen cap ACROSS appends still claims under-cap per row and the
    * probe keeps verifying it in full — the one statistic of this
    * artifact that drifts. One read-only groupBy over stored entry
    * rows (no fingerprints recomputed); lists buckets whose TRUE size
    * exceeds the cap while every stored row claims under-cap — exactly
    * what [[compact]] repairs (recount, then drop past-cap buckets
    * into `builtDroppedBuckets`).
    */
  def capDriftReport(
      index: DataFrame, maxBuckets: Int = 100): SimHashIndex.CapDriftReport = {
    require(maxBuckets >= 1, s"maxBuckets must be >= 1, got $maxBuckets")
    val m = readMeta(index)
    val drifted = index.filter(col("seg") >= 0)
      .groupBy("seg", "value")
      .agg(count(lit(1)).as("__true"), max(col("cnt")).as("__stored"))
      .filter(col("__true") > m.maxBucketSize && col("__stored") <= m.maxBucketSize)
      .orderBy(col("__true").desc, col("seg"), col("value"))
      .limit(maxBuckets)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    SimHashIndex.CapDriftReport(m.nDocs, m.maxBucketSize, drifted.nonEmpty, drifted)
  }

  /** The monitor-then-repair loop as one call ([[SimHashIndex
    * .compactIfDrifted]] shape): runs [[capDriftReport]], compacts iff
    * it fires, returns the index untouched otherwise. The report is
    * the evidence either way — log it.
    */
  def compactIfDrifted(
      index: DataFrame, idCol: String): (DataFrame, SimHashIndex.CapDriftReport) = {
    val report = capDriftReport(index)
    if (!report.crossed) (index, report)
    else (compact(index, idCol), report)
  }

  /** [[capDriftReport]] over SEVERAL generations WITHOUT materializing
    * [[mergeMany]] — the monthly-artifact monitor ([[SimHashIndex
    * .capDriftReportMany]] twin): one read-only groupBy over the
    * unioned entry rows, surfacing buckets whose union-wide true size
    * exceeds the shared frozen cap while every stored row still claims
    * under-cap. Remedy when it fires: [[mergeMany]] (one artifact,
    * recounted, past-cap buckets dropped into the carried
    * `builtDroppedBuckets`).
    */
  def capDriftReportMany(
      indexes: Seq[DataFrame], maxBuckets: Int = 100): SimHashIndex.CapDriftReport = {
    require(indexes.nonEmpty, "need at least one index generation")
    require(maxBuckets >= 1, s"maxBuckets must be >= 1, got $maxBuckets")
    val metas = indexes.map(readMeta)
    require(metas.forall(m => m.segments == metas.head.segments &&
      m.maxBucketSize == metas.head.maxBucketSize),
      "index generations disagree on build parameters (segments/cap) — " +
        "rebuild with one recipe")
    val m = metas.head
    val drifted = indexes.map(_.filter(col("seg") >= 0)
        .select(col("seg"), col("value"), col("cnt")))
      .reduce(_ unionAll _)
      .groupBy("seg", "value")
      .agg(count(lit(1)).as("__true"), max(col("cnt")).as("__stored"))
      .filter(col("__true") > m.maxBucketSize && col("__stored") <= m.maxBucketSize)
      .orderBy(col("__true").desc, col("seg"), col("value"))
      .limit(maxBuckets)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    SimHashIndex.CapDriftReport(metas.map(_.nDocs).sum, m.maxBucketSize,
      drifted.nonEmpty, drifted)
  }
}
