package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Persistable MinHash-LSH index: build once over the kept corpus, probe
  * many times with incoming batches — the incremental-ingest form of
  * [[TextDedup.minHashLshPairsAgainst]].
  *
  * The one-shot operator unions existing+incoming and re-runs the full
  * shingle/sign/band pipeline over BOTH sides on every call — O(corpus)
  * CPU per ingest. At a 100-TB kept corpus with daily crawls that
  * re-payment dominates; this index pays the corpus-side cost ONCE:
  * [[build]] shingles, signs and bands the kept corpus into a plain
  * DataFrame the caller persists to Parquet, and [[pairsAgainst]] signs
  * only the incoming batch and probes the stored buckets. The kept side
  * is then a columnar SCAN (band/bucket filter pushdown, no text
  * processing, and — when the incoming batch is broadcast-sized, the
  * normal case — no shuffle of the stored entries at all).
  *
  * Index layout: ONE DataFrame (so one Parquet artifact), row kind
  * discriminated by `band`:
  *   - `band == -1` (one row): metadata — `bucket` holds the frozen
  *     build parameters as a `v1;k=v;...` string, `sh` holds the frozen
  *     document-frequency stop set.
  *   - `band == -2` (one row per doc): `sh` = DF-pruned shingle hashes
  *     (what pair verification compares), `sig` = the MinHash signature
  *     (kept so the index can be re-banded without re-shingling),
  *     `text_md5` = digest for the exact-text dedup rail.
  *   - `band in [0, bands)` (one row per doc per band): `bucket` = the
  *     band's bucket key, `cnt` = that bucket's size at build time.
  *     Buckets larger than `maxBucketSize` are dropped HERE — under the
  *     one-shot operator's union cap they could never survive any probe
  *     (kept-side count alone already exceeds the cap), so dropping them
  *     at build loses nothing and keeps every future probe's join
  *     bounded.
  *
  * FROZEN STOP SET — the deliberate staleness trade-off: the one-shot
  * operator recomputes document frequencies over existing+incoming on
  * every call; the index freezes the stop set computed over the kept
  * corpus at build time. Probes prune incoming shingles with that frozen
  * set, so a boilerplate template that only becomes frequent in LATER
  * crawls is not pruned until the index is rebuilt. The index IS the
  * corpus, so freezing is the semantically honest choice (a stop set
  * must describe the corpus it prunes — SCALE.md's own rule); rebuild
  * the index (nightly compaction) to refresh it. With pruning disabled
  * (`maxDocFreqRatio = 1.0`) or when kept-side and union stop sets agree
  * (they are both empty below the [[TextDedup.DefaultMinDocFreq]] floor),
  * probe results are IDENTICAL to the one-shot operator — pinned by
  * LshIndexSpec.
  *
  * Bucket keys are stored as strings in both hash modes (casting the
  * production int key is injective, so bucket groups are unchanged);
  * one schema means one Parquet artifact regardless of mode.
  */
object LshIndex {

  /** `band` value of the single metadata row. */
  val MetaBand: Int = -1
  /** `band` value of per-document shingle/signature rows. */
  val DocBand: Int = -2

  /** Frozen build parameters, parsed back from the index's meta row. */
  final case class Meta(
      n: Int, numPerm: Int, bands: Int, seed: Long, portableHash: Boolean,
      maxBucketSize: Int, builtDroppedBuckets: Long, nDocs: Long)

  private def metaString(m: Meta): String =
    s"v1;n=${m.n};numPerm=${m.numPerm};bands=${m.bands};seed=${m.seed};" +
      s"portable=${m.portableHash};cap=${m.maxBucketSize};" +
      s"builtDropped=${m.builtDroppedBuckets};nDocs=${m.nDocs}"

  /** Meta row + frozen stop set of `index`. Fails typed on a frame that
    * is not a v1 LSH index (no meta row / unknown version).
    */
  def readMeta(index: DataFrame): (Meta, Array[Long]) = {
    val rows = index.filter(col("band") === MetaBand)
      .select(col("bucket"), col("sh")).collect()
    require(rows.length == 1,
      s"not an LSH index: expected exactly one meta row (band = $MetaBand), found ${rows.length}")
    val s = rows(0).getString(0)
    require(s != null && s.startsWith("v1;"), s"unknown LSH index version: $s")
    val kv = s.split(";").drop(1)
      .map { p => val i = p.indexOf('='); p.substring(0, i) -> p.substring(i + 1) }
      .toMap
    val meta = Meta(
      n = kv("n").toInt, numPerm = kv("numPerm").toInt,
      bands = kv("bands").toInt, seed = kv("seed").toLong,
      portableHash = kv("portable").toBoolean,
      maxBucketSize = kv("cap").toInt,
      builtDroppedBuckets = kv("builtDropped").toLong,
      nDocs = kv("nDocs").toLong)
    val stop = Option(rows(0).getSeq[Long](1)).map(_.toArray).getOrElse(Array.empty[Long])
    (meta, stop)
  }

  private def shingleCol(textCol: String, n: Int, portable: Boolean): Column =
    if (portable) TextDedup.shingleHashesPortable(col(textCol), n)
    else TextDedup.shingleHashes(col(textCol), n)

  private def pruneUdf(stop: Array[Long]) = {
    val stopSet = stop.toSet
    udf((hs: Seq[Long]) => if (hs == null) null else hs.filterNot(stopSet.contains).toArray)
  }

  /** Band-bucket key over a signature column, as a string — identical
    * group structure to [[TextDedup]]'s lshCore keys in both modes.
    */
  private def bucketOf(sig: Column, rows: Int, portable: Boolean): Column => Column =
    if (portable) b => concat_ws(",", transform(slice(sig, b * rows + 1, lit(rows)), _.cast("string")))
    else b => hash(slice(sig, b * rows + 1, lit(rows)), b).cast("string")

  /** Build the index over the kept corpus. Returned frame is persisted
    * (call `.unpersist()` once written); write it with
    * `index.write.parquet(path)` and read it back with
    * `spark.read.parquet` — the probe needs nothing else.
    *
    * Parameters mirror [[TextDedup.minHashLshDedup]]; `maxDocFreqRatio` /
    * `minDocFreq` shape the FROZEN stop set (see object doc), and
    * `maxBucketSize` is frozen as the cap every future probe enforces
    * (a probe cannot resurrect a bucket dropped at build, so the cap is
    * an index property, not a probe argument).
    */
  def build(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numPerm: Int = 64,
      bands: Int = 16,
      seed: Long = 42L,
      maxBucketSize: Int = 2000,
      maxDocFreqRatio: Double = 0.5,
      portableHash: Boolean = false,
      minDocFreq: Long = TextDedup.DefaultMinDocFreq): DataFrame = {
    require(numPerm % bands == 0, "numPerm must divide into bands")
    require(maxDocFreqRatio > 0.0, "maxDocFreqRatio must be positive")
    require(minDocFreq >= 0, "minDocFreq must be non-negative")
    val rows = numPerm / bands

    // nDocs from a column-pruned scan of the input — the former
    // shCached.count() materialized md5 + the shingle kernel into a
    // cache just to count rows, paying a full kernel pass before any
    // consumer needed it (r15; guide §5: don't cache corpus-sized
    // intermediates the plan doesn't re-read)
    val nDocs = df.count()
    val shRaw = df
      .select(col(idCol), md5(col(textCol)).as("text_md5"),
        shingleCol(textCol, n, portableHash).as("sh"))
    // same two-bar policy as lshCore: ratio with an absolute floor,
    // both recomputed from THIS corpus; the result is then frozen.
    // The shingle frame is persisted ONLY when a stop pass will read it
    // before the doc-row persist does (ratio < 1): with pruning
    // disabled the docs persist below is the sole consumer and an
    // extra cache layer is pure memory pressure.
    val shCached = if (maxDocFreqRatio >= 1.0) shRaw else shRaw.persist()
    val stop: Array[Long] =
      if (maxDocFreqRatio >= 1.0) Array.empty
      else {
        val cutoff = math.max((nDocs * maxDocFreqRatio).toLong, minDocFreq)
        shCached.select(explode(col("sh")).as("__h"))
          .groupBy("__h").count()
          .filter(col("count") > cutoff)
          .select("__h").collect().map(_.getLong(0))
      }
    val pruned =
      if (stop.isEmpty) shCached
      else shCached.withColumn("sh", pruneUdf(stop)(col("sh")))
    val docs = pruned
      .withColumn("sig",
        udf(TextDedup.sigFromHashesKernel(numPerm, seed)).apply(col("sh")))
      .persist()
    // no eager docs.count(): the builtDropped count below is the first
    // action over this subtree and fills the persist in the same pass
    // (an explicit count was one extra scheduled job per build — the
    // r11 lshCore rule applied here, r14). The pruned layer is no
    // longer separately persisted/counted either (r15): the docs
    // persist holds the pruned shingles column itself, so the former
    // intermediate cache duplicated the biggest column one layer down.

    val entriesRaw = docs.select(
      col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        bucketOf(col("sig"), rows, portableHash))).as(Seq("band", "bucket")))
    // persisted: consumed by the dropped-bucket count here AND by the
    // entry-row cap join inside the final index materialization — left
    // lazy, the final count re-ran the whole bucket aggregate (r14)
    val counts = entriesRaw.groupBy("band", "bucket").agg(count(lit(1)).as("cnt"))
      .persist()
    val builtDropped = counts.filter(col("cnt") > maxBucketSize).count()
    val entries = entriesRaw
      .join(counts.filter(col("cnt") <= maxBucketSize), Seq("band", "bucket"))

    val idType = df.schema(idCol).dataType
    val meta = Meta(n, numPerm, bands, seed, portableHash, maxBucketSize, builtDropped, nDocs)
    val metaRow = df.sparkSession.range(1).select(
      lit(null).cast(idType).as(idCol),
      lit(MetaBand).as("band"),
      lit(metaString(meta)).as("bucket"),
      lit(null).cast("long").as("cnt"),
      typedLit(stop.toSeq).as("sh"),
      lit(null).cast("array<bigint>").as("sig"),
      lit(null).cast("string").as("text_md5"))
    val docRows = docs.select(
      col(idCol), lit(DocBand).as("band"),
      lit(null).cast("string").as("bucket"), lit(null).cast("long").as("cnt"),
      col("sh"), col("sig"), col("text_md5"))
    val entryRows = entries.select(
      col(idCol), col("band"), col("bucket"), col("cnt"),
      lit(null).cast("array<bigint>").as("sh"),
      lit(null).cast("array<bigint>").as("sig"),
      lit(null).cast("string").as("text_md5"))

    val index = metaRow.unionAll(docRows).unionAll(entryRows).persist()
    index.count()
    counts.unpersist()
    docs.unpersist()
    shCached.unpersist() // no-op when the stop pass never persisted it
    index
  }

  /** Cross-corpus near-dup pairs against the stored index: identical
    * output contract to [[TextDedup.minHashLshPairsAgainst]]
    * (`id_existing`, `id_incoming`, `jaccard`) — with the kept side read
    * from the index instead of re-shingled/re-signed. Only the incoming
    * batch pays CPU; the stored side is a scan.
    *
    * Cap semantics match the one-shot operator exactly: a bucket is
    * suppressed when its COMBINED size (stored `cnt` + incoming count)
    * exceeds the frozen `maxBucketSize` — the union bucket size, since
    * ids are unique across both corpora (same precondition as the
    * one-shot form). `droppedBuckets` on the result counts buckets
    * suppressed at probe time; build-time drops are in the meta row.
    */
  /** Shingle, prune (frozen stop set), sign and band the incoming batch —
    * the probe-side CPU. Returns (`inSh` = id_incoming/sh_b,
    * `inBanded` = id_incoming/band/bucket), both persisted; callers
    * unpersist.
    */
  private def signIncoming(
      m: Meta, stop: Array[Long], incoming: DataFrame,
      idCol: String, textCol: String): (DataFrame, DataFrame) = {
    val rows = m.numPerm / m.bands
    val inShRaw = incoming.select(
      col(idCol).as("id_incoming"),
      shingleCol(textCol, m.n, m.portableHash).as("sh_b"))
    val inSh =
      (if (stop.isEmpty) inShRaw
       else inShRaw.withColumn("sh_b", pruneUdf(stop)(col("sh_b")))).persist()
    val inBanded = inSh
      .select(col("id_incoming"),
        udf(TextDedup.sigFromHashesKernel(m.numPerm, m.seed)).apply(col("sh_b")).as("sig"))
      .select(col("id_incoming"),
        posexplode(transform(sequence(lit(0), lit(m.bands - 1)),
          bucketOf(col("sig"), rows, m.portableHash))).as(Seq("band", "bucket")))
      .persist()
    // No eager counts: the caller's first action over inBanded fills
    // BOTH persists in one pass (inSh is inBanded's parent), and every
    // caller materializes its result before unpersisting these — two
    // explicit counts here were two extra scheduled jobs per probe (r11).
    (inSh, inBanded)
  }

  def pairsAgainst(
      index: DataFrame,
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5): TextDedup.LshPairs = {
    val (m, stop) = readMeta(index)
    val (inSh, inBanded) = signIncoming(m, stop, incoming, idCol, textCol)

    // Distinct incoming buckets are bounded by bands * |incoming| — the
    // incremental-ingest case broadcasts this side, so stored entries
    // are scanned (band >= 0 pushes to Parquet) but never shuffled.
    val inCnt = inBanded.groupBy("band", "bucket").agg(count(lit(1)).as("cnt_i"))
    val entries = index.filter(col("band") >= 0)
      .select(col(idCol).as("id_existing"), col("band"), col("bucket"), col("cnt"))
    // Entries per bucket are capped at build, incoming counts ride the
    // join row, so this frame is bounded by cap * |touched buckets|.
    val joined = entries.join(inCnt, Seq("band", "bucket")).persist()
    val droppedBuckets = joined.filter(col("cnt") + col("cnt_i") > m.maxBucketSize)
      .select("band", "bucket").distinct().count()
    val cands = joined.filter(col("cnt") + col("cnt_i") <= m.maxBucketSize)
      .join(inBanded, Seq("band", "bucket"))
      .select("id_existing", "id_incoming").distinct()

    val docsSh = index.filter(col("band") === DocBand)
      .select(col(idCol).as("id_existing"), col("sh").as("sh_a"))
    val result = cands
      .join(docsSh, "id_existing")
      .join(inSh, "id_incoming")
      .withColumn("jaccard", TextDedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_existing"), col("id_incoming"), col("jaccard"))
      .persist()
    result.count()
    joined.unpersist()
    inBanded.unpersist()
    inSh.unpersist()
    TextDedup.LshPairs(result, droppedBuckets, stop.length)
  }

  /** Index-backed twin of [[TextDedup.dedupAgainst]]: `incoming` minus
    * near-dups of the indexed corpus (LSH pairs at `threshold`) minus
    * exact-text matches (md5 rail — catches sub-`n`-length texts that
    * shingle to the empty set), preserving `incoming`'s columns and
    * order. The md5 digests come from the index's doc rows, so the
    * kept corpus's raw text is never needed at probe time.
    */
  def dedupAgainst(
      index: DataFrame,
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8): DataFrame = {
    val pairs = pairsAgainst(index, incoming, idCol, textCol, threshold)
    // materialize the drop set before releasing the pair cache (same
    // rationale as the one-shot operator)
    val dupIds = pairs.pairs.select(col("id_incoming").as(idCol))
      .distinct().localCheckpoint()
    pairs.unpersist()
    val th = Iterator.from(0).map(i => s"__th$i")
      .find(c => !incoming.columns.contains(c)).get
    val exTextHashes = index.filter(col("band") === DocBand)
      .select(col("text_md5").as(th)).na.drop().distinct()
    incoming.join(dupIds, Seq(idCol), "left_anti")
      .withColumn(th, md5(col(textCol)))
      .join(exTextHashes, Seq(th), "left_anti")
      .select(incoming.columns.map(col): _*)
  }

  /** Append new documents (already deduped — the caller's survivors) to
    * the index, signing ONLY the new docs with the frozen parameters and
    * stop set. Ids must stay unique across the whole index.
    *
    * Appended entry rows carry BATCH-LOCAL bucket counts (recomputing
    * exact corpus-wide counts would rewrite every touched bucket's
    * stored rows — the compaction job's business, not the ingest path's).
    * Understated counts only UNDER-suppress: a probe may verify a few
    * pairs the one-shot cap would have skipped, never miss one. Rebuild
    * with [[build]] periodically to restore exact counts and refresh the
    * stop set — the nightly-compaction pattern.
    */
  def append(
      index: DataFrame,
      newDocs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val (m, stop) = readMeta(index)
    val rows = m.numPerm / m.bands

    val sh = newDocs.select(
      col(idCol), md5(col(textCol)).as("text_md5"),
      shingleCol(textCol, m.n, m.portableHash).as("sh"))
    val shPruned = if (stop.isEmpty) sh else sh.withColumn("sh", pruneUdf(stop)(col("sh")))
    val docs = shPruned
      .withColumn("sig",
        udf(TextDedup.sigFromHashesKernel(m.numPerm, m.seed)).apply(col("sh")))
      .persist()
    val nNew = docs.count()

    val entriesRaw = docs.select(
      col(idCol),
      posexplode(transform(sequence(lit(0), lit(m.bands - 1)),
        bucketOf(col("sig"), rows, m.portableHash))).as(Seq("band", "bucket")))
    val counts = entriesRaw.groupBy("band", "bucket").agg(count(lit(1)).as("cnt"))

    val idType = newDocs.schema(idCol).dataType
    val newMetaRow = newDocs.sparkSession.range(1).select(
      lit(null).cast(idType).as(idCol),
      lit(MetaBand).as("band"),
      lit(metaString(m.copy(nDocs = m.nDocs + nNew))).as("bucket"),
      lit(null).cast("long").as("cnt"),
      typedLit(stop.toSeq).as("sh"),
      lit(null).cast("array<bigint>").as("sig"),
      lit(null).cast("string").as("text_md5"))
    val docRows = docs.select(
      col(idCol), lit(DocBand).as("band"),
      lit(null).cast("string").as("bucket"), lit(null).cast("long").as("cnt"),
      col("sh"), col("sig"), col("text_md5"))
    val entryRows = entriesRaw.join(counts, Seq("band", "bucket")).select(
      col(idCol), col("band"), col("bucket"), col("cnt"),
      lit(null).cast("array<bigint>").as("sh"),
      lit(null).cast("array<bigint>").as("sig"),
      lit(null).cast("string").as("text_md5"))

    val appended = index.filter(col("band") =!= MetaBand)
      .unionAll(newMetaRow).unionAll(docRows).unionAll(entryRows)
      .persist()
    appended.count()
    docs.unpersist()
    appended
  }

  /** The staleness monitor (r9, closing the SCALE.md `staleness`
    * record's loop): reports whether any shingle ABSENT from the frozen
    * stop set has grown past the stop-set bar in the CURRENT corpus —
    * the exact condition under which the measured staleness defects
    * switch on (4-5x probe cost, several-fold spurious pairs, silently
    * missed diluted dups; see SCALE.md). Every gram in stored doc rows
    * is outside the frozen stop set by construction (build and append
    * both prune before storing), so one explode + groupBy over the
    * stored `sh` arrays IS the union-wide DF of candidate offenders —
    * no text access, no re-shingling, no signing. Deliberately a
    * corpus-sized doc-row scan (the price of a build's stop-set pass
    * minus all its text CPU): run it on the nightly cadence and rebuild
    * WHEN IT FIRES instead of on a timer.
    *
    * `maxDocFreqRatio`/`minDocFreq` are parameters (the build-time
    * policy is not stored in the meta row): pass the same values the
    * index was built with, or a stricter bar to get early warning.
    */
  final case class StalenessReport(
      nDocs: Long,
      cutoff: Long,
      crossed: Boolean,
      offenders: Seq[(Long, Long)]) // (shingle hash, union-wide doc freq), df desc

  def stalenessReport(
      index: DataFrame,
      maxDocFreqRatio: Double = 0.5,
      minDocFreq: Long = TextDedup.DefaultMinDocFreq,
      maxOffenders: Int = 100): StalenessReport = {
    require(maxDocFreqRatio > 0.0 && maxDocFreqRatio < 1.0,
      s"maxDocFreqRatio must be in (0,1) for a meaningful bar, got $maxDocFreqRatio")
    require(maxOffenders >= 1, s"maxOffenders must be >= 1, got $maxOffenders")
    val (m, _) = readMeta(index)
    val cutoff = math.max((m.nDocs * maxDocFreqRatio).toLong, minDocFreq)
    val offenders = index.filter(col("band") === DocBand)
      .select(explode(col("sh")).as("__h"))
      .groupBy("__h").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > cutoff)
      .orderBy(col("__df").desc, col("__h"))
      .limit(maxOffenders)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    StalenessReport(m.nDocs, cutoff, offenders.nonEmpty, offenders)
  }

  /** The monitor-then-rebuild nightly loop as one call: run
    * [[stalenessReport]]; if it fires, [[build]] a fresh index over
    * `corpus` (the kept corpus's raw text — the one input the index
    * cannot reconstruct) reusing the EXACT frozen recipe from the meta
    * row (n / numPerm / bands / seed / hash mode / bucket cap), so the
    * rebuild is the same index with a fresh stop set and exact counts —
    * never an accidental recipe change; if it stays silent, return the
    * index untouched (the SCALE.md `staleness` record's finding 1:
    * below the bar a rebuild buys nothing). The returned report is the
    * evidence either way — log it.
    *
    * The caller owns consistency between `index` and `corpus`: pass the
    * same kept corpus the index covers (nDocs mismatch fails typed as a
    * cheap guard against probing last week's corpus frame).
    */
  def rebuildIfStale(
      index: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      maxDocFreqRatio: Double = 0.5,
      minDocFreq: Long = TextDedup.DefaultMinDocFreq): (DataFrame, StalenessReport) = {
    val (m, _) = readMeta(index)
    val report = stalenessReport(index, maxDocFreqRatio, minDocFreq)
    if (!report.crossed) (index, report)
    else {
      val n = corpus.count()
      require(n == m.nDocs,
        s"corpus has $n docs but the index covers ${m.nDocs} — rebuildIfStale " +
          "needs the exact kept corpus the index was grown over")
      (build(corpus, idCol, textCol, m.n, m.numPerm, m.bands, m.seed,
        m.maxBucketSize, maxDocFreqRatio, m.portableHash, minDocFreq), report)
    }
  }

  /** [[stalenessReport]] over SEVERAL generations — the monthly-index
    * layout's monitor, WITHOUT materializing [[mergeMany]] first (the
    * merge unions doc AND entry rows and recounts every bucket; the
    * monitor needs only the doc rows' pruned shingle sets, so running
    * it through a merge would pay a full compact for a read-only
    * question). Union-wide document frequency per un-stopped shingle,
    * one columnar scan over each generation's doc rows, zero text CPU;
    * the bar is `max(totalDocs * maxDocFreqRatio, minDocFreq)` over the
    * COMBINED doc count — exactly what [[stalenessReport]] on the
    * merged artifact would compute (pinned by LshStalenessSpec).
    *
    * Compatibility bar: same shingle space only — `n` / hash mode and
    * one frozen stop set (stored shingles pruned by different stop sets
    * are not comparable). Deliberately NOT the full probe bar
    * (numPerm/bands/seed/cap don't enter a document-frequency count);
    * generations probeable together are always monitorable together,
    * but not vice versa.
    */
  def stalenessReportMany(
      indexes: Seq[DataFrame],
      maxDocFreqRatio: Double = 0.5,
      minDocFreq: Long = TextDedup.DefaultMinDocFreq,
      maxOffenders: Int = 100): StalenessReport = {
    require(indexes.nonEmpty, "need at least one index generation")
    require(maxDocFreqRatio > 0.0 && maxDocFreqRatio < 1.0,
      s"maxDocFreqRatio must be in (0,1) for a meaningful bar, got $maxDocFreqRatio")
    require(maxOffenders >= 1, s"maxOffenders must be >= 1, got $maxOffenders")
    val metasStops = indexes.map(readMeta)
    val metas = metasStops.map(_._1)
    require(metas.forall(m => m.n == metas.head.n &&
      m.portableHash == metas.head.portableHash),
      "index generations disagree on the shingle recipe (n / hash mode) — " +
        "their stored shingle hashes share no comparable space")
    val stops = metasStops.map(_._2.sorted.toSeq)
    require(stops.forall(_ == stops.head),
      "index generations disagree on the frozen stop set — stored " +
        "shingles were pruned differently and share no comparable space; " +
        "rebuild the generations from raw text with one recipe")
    val nDocs = metas.map(_.nDocs).sum
    val cutoff = math.max((nDocs * maxDocFreqRatio).toLong, minDocFreq)
    val offenders = indexes
      .map(_.filter(col("band") === DocBand).select(col("sh")))
      .reduce(_ unionAll _)
      .select(explode(col("sh")).as("__h"))
      .groupBy("__h").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > cutoff)
      .orderBy(col("__df").desc, col("__h"))
      .limit(maxOffenders)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    StalenessReport(nDocs, cutoff, offenders.nonEmpty, offenders)
  }

  /** Probe SEVERAL index generations with one incoming batch — the
    * production layout for a kept corpus too large to rebuild as one
    * artifact (e.g. one index per monthly crawl, each built and
    * compacted once, never touched again). The incoming batch is
    * shingled once per generation (each generation's frozen stop set
    * prunes differently — per-batch CPU, still O(incoming)); pairs are
    * the union of per-generation probes. Generations must share build
    * parameters (n / numPerm / bands / seed / hash mode — enforced
    * typed); ids must be unique across ALL generations and the batch.
    *
    * Bucket-cap semantics are selectable, and OPT-IN strictness is the
    * family default — the r9 decision closing r8 VERDICT ask #3:
    * `globalCap = false` everywhere ([[pairsAgainstMany]] /
    * [[dedupAgainstMany]] here, both `SimHashIndex.*AgainstMany`
    * fan-outs), because default-on would (a) bolt the cross-generation
    * count pass onto every probe that never asked for union-cap parity,
    * and (b) silently impose the stricter compatibility bar (shared cap
    * AND shared frozen stop set), breaking the "generations are fully
    * independent artifacts" operational story that makes monthly index
    * layouts tractable. Callers who need exact one-shot-union cap
    * semantics across generations opt in; the cost model (one groupBy
    * over the TOUCHED buckets' entry rows — still O(incoming)-shaped)
    * is recorded in SCALE.md. `IvfIndex.topKAgainstMany` needs no such
    * knob at all: its probe has no bucket caps and is exact via the
    * union-top-k identity — the strictness question only exists where a
    * cap policy exists.
    *
    * Default (`globalCap = false`):
    * caps apply PER GENERATION — a near-dup cluster sharded across
    * generations is capped by each generation's combined count, not the
    * global one; generations stay fully independent artifacts and may
    * even disagree on frozen stop sets (the incoming batch is re-pruned
    * per generation). With `globalCap = true` the probe runs ONE
    * cross-generation count pass — union of the touched buckets' entry
    * rows, grouped by (band, bucket) — and suppresses buckets whose
    * GLOBAL size (all generations + incoming) exceeds the shared cap:
    * exactly the one-shot operator's union cap, without rebuilding
    * anything. That pass recomputes sizes from the stored entry rows, so
    * it is exact even over generations grown by [[append]] (whose stored
    * `cnt`s are batch-local); the price is a stricter compatibility bar —
    * all generations must share the cap AND the frozen stop set (one
    * shingle space; typed error otherwise), and the count pass costs one
    * groupBy over the touched buckets' entries (still O(incoming)-probe:
    * untouched buckets are never read).
    */
  def pairsAgainstMany(
      indexes: Seq[DataFrame],
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5,
      globalCap: Boolean = false): TextDedup.LshPairs = {
    require(indexes.nonEmpty, "need at least one index generation")
    val metasStops = indexes.map(readMeta)
    val metas = metasStops.map(_._1)
    val base = metas.head
    require(metas.forall(m => m.n == base.n && m.numPerm == base.numPerm &&
      m.bands == base.bands && m.seed == base.seed &&
      m.portableHash == base.portableHash),
      "index generations disagree on build parameters " +
        "(n/numPerm/bands/seed/hash mode) — rebuild with one recipe")
    if (!globalCap) {
      val probes = indexes.map(ix => pairsAgainst(ix, incoming, idCol, textCol, threshold))
      val pairs = probes.map(_.pairs).reduce(_ unionAll _)
        .localCheckpoint() // materialize before releasing per-probe caches
      probes.foreach(_.unpersist())
      TextDedup.LshPairs(pairs,
        probes.map(_.droppedBuckets).sum, probes.map(_.prunedShingles).max)
    } else {
      requireOneShingleSpace(metas, metasStops.map(_._2))
      val stop = metasStops.head._2
      val (inSh, inBanded) = signIncoming(base, stop, incoming, idCol, textCol)
      val inCnt = inBanded.groupBy("band", "bucket").agg(count(lit(1)).as("cnt_i"))
      // stored entries of TOUCHED buckets only, all generations — the
      // cross-generation count pass never reads an unprobed bucket
      val touched = indexes.map(_.filter(col("band") >= 0)
          .select(col(idCol).as("id_existing"), col("band"), col("bucket")))
        .reduce(_ unionAll _)
        .join(inCnt, Seq("band", "bucket"))
        .persist()
      // exact global size per touched bucket, recomputed from entry rows
      // (the compact counting rule — stored cnts are never trusted here)
      val counts = touched.groupBy("band", "bucket")
        .agg(count(lit(1)).as("cnt_g"), first("cnt_i").as("cnt_i"))
      val droppedBuckets = counts
        .filter(col("cnt_g") + col("cnt_i") > base.maxBucketSize).count()
      val cands = touched
        .join(counts.filter(col("cnt_g") + col("cnt_i") <= base.maxBucketSize)
          .select("band", "bucket"), Seq("band", "bucket"))
        .join(inBanded, Seq("band", "bucket"))
        .select("id_existing", "id_incoming").distinct()
      val docsSh = indexes.map(_.filter(col("band") === DocBand)
          .select(col(idCol).as("id_existing"), col("sh").as("sh_a")))
        .reduce(_ unionAll _)
      val result = cands
        .join(docsSh, "id_existing")
        .join(inSh, "id_incoming")
        .withColumn("jaccard", TextDedup.jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= threshold)
        .select(col("id_existing"), col("id_incoming"), col("jaccard"))
        .persist()
      result.count()
      touched.unpersist()
      inBanded.unpersist()
      inSh.unpersist()
      TextDedup.LshPairs(result, droppedBuckets, stop.length)
    }
  }

  /** [[dedupAgainst]] over several index generations: `incoming` minus
    * near-dups (and exact-text md5 matches) of ANY generation,
    * preserving `incoming`'s columns and order. `globalCap` selects the
    * cross-generation exact cap (see [[pairsAgainstMany]]); the md5
    * exact-text rail is cap-independent and always spans all
    * generations.
    */
  def dedupAgainstMany(
      indexes: Seq[DataFrame],
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      globalCap: Boolean = false): DataFrame =
    if (!globalCap)
      indexes.foldLeft(incoming)((acc, ix) =>
        dedupAgainst(ix, acc, idCol, textCol, threshold))
    else {
      val pairs = pairsAgainstMany(indexes, incoming, idCol, textCol, threshold,
        globalCap = true)
      val dupIds = pairs.pairs.select(col("id_incoming").as(idCol))
        .distinct().localCheckpoint()
      pairs.unpersist()
      val th = Iterator.from(0).map(i => s"__th$i")
        .find(c => !incoming.columns.contains(c)).get
      val exTextHashes = indexes.map(_.filter(col("band") === DocBand)
          .select(col("text_md5").as(th))).reduce(_ unionAll _)
        .na.drop().distinct()
      incoming.join(dupIds, Seq(idCol), "left_anti")
        .withColumn(th, md5(col(textCol)))
        .join(exTextHashes, Seq(th), "left_anti")
        .select(incoming.columns.map(col): _*)
    }

  /** The global-cap / merge compatibility bar: one cap and one frozen
    * stop set across generations (stored shingles pruned by DIFFERENT
    * stop sets live in different spaces — comparing or counting them
    * together would be silently wrong).
    */
  private def requireOneShingleSpace(
      metas: Seq[Meta], stops: Seq[Array[Long]]): Unit = {
    require(metas.forall(_.maxBucketSize == metas.head.maxBucketSize),
      "index generations disagree on maxBucketSize — a global cap needs one cap")
    val sets = stops.map(_.sorted.toSeq)
    require(sets.forall(_ == sets.head),
      "index generations disagree on the frozen stop set — stored " +
        "shingles were pruned differently and share no comparable space; " +
        "rebuild the generations from raw text with one recipe")
  }

  /** Merge several compatible generations into ONE index artifact —
    * the consolidation step of the monthly-artifact lifecycle (probe
    * many small generations daily, merge to a single artifact monthly)
    * — WITHOUT touching any raw text: stored doc/entry rows are
    * unioned and [[compact]] recomputes exact corpus-wide bucket
    * counts, re-applies the shared cap, and rewrites the meta row's
    * doc count. Generations must agree on build parameters, cap and
    * frozen stop set (typed error otherwise — see the shingle-space
    * rule on [[pairsAgainstMany]]); ids must be unique across all
    * generations. With stop sets empty (the common case under the DF
    * floor), `mergeMany(Seq(build(a), build(b)))` probes identically
    * to `build(a union b)` — pinned by LshIndexSpec — modulo the
    * documented [[compact]] edge for buckets already dropped at a
    * generation's own build.
    */
  def mergeMany(indexes: Seq[DataFrame], idCol: String): DataFrame = {
    require(indexes.nonEmpty, "need at least one index generation")
    val metasStops = indexes.map(readMeta)
    val metas = metasStops.map(_._1)
    val base = metas.head
    require(metas.forall(m => m.n == base.n && m.numPerm == base.numPerm &&
      m.bands == base.bands && m.seed == base.seed &&
      m.portableHash == base.portableHash),
      "index generations disagree on build parameters " +
        "(n/numPerm/bands/seed/hash mode) — rebuild with one recipe")
    requireOneShingleSpace(metas, metasStops.map(_._2))
    // head's meta row carries the shared recipe + stop set; compact
    // recomputes nDocs, exact counts and the dropped-bucket tally from
    // the unioned stored rows
    val combined = indexes.head.filter(col("band") === MetaBand)
      .unionAll(indexes.map(_.filter(col("band") =!= MetaBand)).reduce(_ unionAll _))
    compact(combined, idCol)
  }

  /** Compaction: repair what [[append]] leaves approximate — WITHOUT
    * touching any text. Appended entry rows carry batch-local bucket
    * counts, so probes against an appended index can under-suppress
    * (verify a few pairs the exact cap would skip — never miss one);
    * compact recomputes exact corpus-wide counts from the stored entry
    * rows alone, re-applies the frozen cap (a bucket grown past it by
    * appends is dropped, exactly as [[build]] would), and rewrites the
    * meta row's doc count. Pure metadata surgery over stored rows — no
    * shingling, no signing, no raw text, so the nightly compaction job
    * costs one groupBy over entry rows instead of a corpus re-read.
    *
    * What it deliberately does NOT refresh: the frozen stop set. Stored
    * shingle hashes are already pruned by it, so the information needed
    * to recompute document frequencies honestly is gone from the index
    * by design; a stop-set refresh is a [[build]] over the raw corpus.
    * With the stop set empty (the common small-corpus case under the DF
    * floor), `compact(append(build(a), b))` probes IDENTICALLY to
    * `build(a union b)` — pinned by LshIndexSpec.
    *
    * Edge: entries of buckets dropped AT BUILD are gone from the index,
    * so compact's exact counts cover surviving entries only. Appended
    * docs landing in such a bucket can keep it alive below the cap —
    * their mutual pairs are real, but a fresh [[build]] over the union
    * would suppress the whole bucket (its true size exceeds the cap).
    * Harmless (bounded by the cap, pairs still verified), and the
    * nightly [[build]] restores strict parity.
    */
  def compact(index: DataFrame, idCol: String): DataFrame = {
    val (m, stop) = readMeta(index)
    val docs = index.filter(col("band") === DocBand)
      .select(col(idCol), col("sh"), col("sig"), col("text_md5"))
      .persist()
    val nDocs = docs.count()

    val entries = index.filter(col("band") >= 0)
      .select(col(idCol), col("band"), col("bucket"))
    // persisted: read by the dropped count AND the entry-row cap join in
    // the final materialization (the build()-side rule, r14)
    val counts = entries.groupBy("band", "bucket").agg(count(lit(1)).as("cnt"))
      .persist()
    val dropped = counts.filter(col("cnt") > m.maxBucketSize).count()
    val entryRows = entries
      .join(counts.filter(col("cnt") <= m.maxBucketSize), Seq("band", "bucket"))
      .select(
        col(idCol), col("band"), col("bucket"), col("cnt"),
        lit(null).cast("array<bigint>").as("sh"),
        lit(null).cast("array<bigint>").as("sig"),
        lit(null).cast("string").as("text_md5"))

    val idType = index.schema(idCol).dataType
    val metaRow = index.sparkSession.range(1).select(
      lit(null).cast(idType).as(idCol),
      lit(MetaBand).as("band"),
      lit(metaString(m.copy(nDocs = nDocs, builtDroppedBuckets = dropped))).as("bucket"),
      lit(null).cast("long").as("cnt"),
      typedLit(stop.toSeq).as("sh"),
      lit(null).cast("array<bigint>").as("sig"),
      lit(null).cast("string").as("text_md5"))
    val docRows = docs.select(
      col(idCol), lit(DocBand).as("band"),
      lit(null).cast("string").as("bucket"), lit(null).cast("long").as("cnt"),
      col("sh"), col("sig"), col("text_md5"))

    val compacted = metaRow.select(index.columns.map(col): _*)
      .unionAll(docRows.select(index.columns.map(col): _*))
      .unionAll(entryRows.select(index.columns.map(col): _*))
      .persist()
    compacted.count()
    counts.unpersist()
    docs.unpersist()
    compacted
  }
}
