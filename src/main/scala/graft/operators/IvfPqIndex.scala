package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persistable IVF-PQ index — the production ANN serving layout
  * (Jégou et al.'s IVFADC, Spark-first): the corpus is stored as
  * `(id, cell, pq_code)` — coarse cell from the frozen [[IvfCentroids]]
  * quantizer for PARTITION PRUNING, one packed PQ Int per vector for
  * 32x less IO — and probes pay table lookups inside `nProbe` cells,
  * never touching a corpus vector. The composition of [[IvfIndex]]
  * (where to look) and [[Similarity.pqTopKAgainst]] (how to score),
  * sharing each side's exact machinery.
  *
  * At 100 TB of float32 embeddings the [[IvfIndex]] probe still scans
  * `N * nProbe / nCentroids` full vectors (~25 TB at nProbe=4/16); this
  * index's probe scans the same fraction of PACKED CODES — ~0.8 TB —
  * plus one meta row. That 32x is the difference between an
  * interactive probe batch and an overnight one at the top end.
  *
  * Index layout: ONE DataFrame, row kind discriminated by `cell`
  * (the [[IvfIndex]] scheme):
  *   - `cell == -2` (one row): metadata — `params` a `v1;...` string,
  *     `ctrs` the frozen coarse centroids, `cbs` the frozen PQ codebook
  *     tensor. Both models ride IN the artifact: a probe needs nothing
  *     but the index.
  *   - `cell == -1`: null vectors (never probed; `pq_code` is NULL).
  *   - `cell >= 0`: one row per document — `(id, cell, pq_code)`.
  * Write with `index.write.partitionBy("cell").parquet(path)` so
  * probes prune statically to their cells (the [[IvfIndex]] plan pin
  * applies unchanged — the probe reuses its cell-restriction).
  *
  * Both quantizers are frozen, so [[append]] is EXACT: probes against
  * `append(build(a), b)` are identical to `build(a union b)`
  * (spec-pinned). Approximation lives ONLY in scoring (`adc_cos`
  * against the reconstruction) and cell pruning — probing ALL cells
  * recovers [[Similarity.pqTopKAgainst]] bit-for-bit (spec-pinned).
  */
object IvfPqIndex {

  /** `cell` value of the single metadata row. */
  val MetaCell: Int = IvfIndex.MetaCell
  /** `cell` assigned to null vectors (never probed; probes are >= 0). */
  val NullCell: Int = IvfIndex.NullCell

  final case class Meta(dim: Int, nCentroids: Int, nSub: Int, kCb: Int, nDocs: Long)

  private def metaString(m: Meta): String =
    s"v1;dim=${m.dim};nCentroids=${m.nCentroids};nSub=${m.nSub};kCb=${m.kCb};nDocs=${m.nDocs}"

  /** Meta row of `index`: frozen params + both model tensors. Fails
    * typed on a frame that is not a v1 IVF-PQ index.
    */
  def readMeta(index: DataFrame): (Meta, Array[Array[Double]], Array[Array[Array[Double]]]) = {
    require(Seq("cell", "pq_code", "ctrs", "cbs", "params").forall(index.columns.contains),
      "not an IVF-PQ index: expected columns (id, cell, pq_code, ctrs, cbs, params)")
    val rows = index.filter(col("cell") === MetaCell)
      .select(col("params"), col("ctrs"), col("cbs")).collect()
    require(rows.length == 1,
      s"not an IVF-PQ index: expected exactly one meta row (cell = $MetaCell), found ${rows.length}")
    val s = rows(0).getString(0)
    require(s != null && s.startsWith("v1;"), s"unknown IVF-PQ index version: $s")
    val kv = s.split(";").drop(1)
      .map { p => val i = p.indexOf('='); p.substring(0, i) -> p.substring(i + 1) }
      .toMap
    val meta = Meta(kv("dim").toInt, kv("nCentroids").toInt,
      kv("nSub").toInt, kv("kCb").toInt, kv("nDocs").toLong)
    val ctrs = rows(0).getSeq[scala.collection.Seq[Double]](1).map(_.toArray).toArray
    val cbs = rows(0).getSeq[scala.collection.Seq[scala.collection.Seq[Double]]](2)
      .map(_.map(_.toArray).toArray).toArray
    require(ctrs.length == meta.nCentroids, "corrupt IVF-PQ index: centroid count mismatch")
    require(cbs.length == meta.nSub && cbs.forall(_.length == meta.kCb),
      "corrupt IVF-PQ index: codebook shape mismatch")
    (meta, ctrs, cbs)
  }

  private def docRows(
      corpus: DataFrame, idCol: String, vecCol: String,
      ctrs: Array[Array[Double]], cbs: Array[Array[Array[Double]]]): DataFrame = {
    val assignUdf = udf((v: Array[Double]) =>
      if (v == null) NullCell else Similarity.nearestCells(ctrs, v, 1)(0))
    val encUdf = udf((v: Array[Double]) =>
      if (v == null) null
      else java.lang.Integer.valueOf(Similarity.pqEncodeKernel(cbs, v)))
    corpus
      .select(col(idCol), Similarity.asDouble(col(vecCol)).as("__v"))
      .select(col(idCol),
        assignUdf(col("__v")).as("cell"),
        encUdf(col("__v")).as("pq_code"),
        lit(null).cast("array<array<double>>").as("ctrs"),
        lit(null).cast("array<array<array<double>>>").as("cbs"),
        lit(null).cast("string").as("params"))
  }

  private def metaRow(
      spark: org.apache.spark.sql.SparkSession, idCol: String,
      idType: org.apache.spark.sql.types.DataType, m: Meta,
      centroids: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]]): DataFrame =
    spark.range(1).select(
      lit(null).cast(idType).as(idCol),
      lit(MetaCell).as("cell"),
      lit(null).cast("int").as("pq_code"),
      typedLit(centroids.map(_.toSeq)).as("ctrs"),
      typedLit(codebooks.map(_.map(_.toSeq).toSeq)).as("cbs"),
      lit(metaString(m)).as("params"))

  /** Build the index: one coarse-cell assignment + one PQ encode per
    * vector, both pure per-row kernels of the frozen models. Returned
    * frame is persisted (call `.unpersist()` once written).
    */
  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[Seq[Double]] = IvfCentroids.centroids,
      codebooks: Seq[Seq[Seq[Double]]] = PqCodebooks.codebooks): DataFrame = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    val dim = centroids.head.length
    require(centroids.forall(_.length == dim), "centroids must share one dimensionality")
    val ctrs = centroids.map(_.toArray).toArray
    val cbs = codebooks.map(_.map(_.toArray).toArray).toArray
    Similarity.requirePqShape(cbs)
    val docs = docRows(corpus, idCol, vecCol, ctrs, cbs).persist()
    val nDocs = docs.count()
    val m = Meta(dim, centroids.length, cbs.length, cbs(0).length, nDocs)
    val index = metaRow(corpus.sparkSession, idCol, corpus.schema(idCol).dataType,
        m, centroids, codebooks)
      .unionAll(docs).persist()
    index.count()
    docs.unpersist()
    index
  }

  /** ADC top-k against the stored index: same output contract as
    * [[Similarity.pqTopKAgainst]] (`query_id`, `rank`, `neighbor_id`,
    * `adc_cos`), restricted to each query's `nProbe` nearest cells.
    * Only the query batch pays assignment + table CPU; the corpus side
    * is a pruned scan of packed codes ([[IvfIndex.cellRestricted]] —
    * static partition pruning up to 64k probed cells, broadcast semi
    * join past that). With `nProbe = nCentroids` the output equals the
    * unpruned [[Similarity.pqTopKAgainst]] exactly (spec-pinned: cell
    * pruning and ADC scoring are independent approximations).
    */
  def topKAgainst(
      index: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 2,
      maxStaticProbeCells: Int = IvfIndex.DefaultMaxStaticProbeCells): DataFrame = {
    val (m, ctrs, cbs) = readMeta(index)
    require(nProbe > 0 && nProbe <= m.nCentroids,
      s"nProbe must be in [1, ${m.nCentroids}]")
    val probeUdf = udf((v: Array[Double]) =>
      if (v == null) Array.empty[Int] else Similarity.nearestCells(ctrs, v, nProbe))
    val q0 = queries.select(
      col(idCol).as("query_id"), Similarity.asDouble(col(vecCol)).as("__qv"))
    // Deliberately NOT persisted (r8 ADVICE — a persist here leaked one
    // cached frame per probe call into executor storage for the life of
    // the session): q is batch-sized, used twice (cell collect + the
    // broadcast), and the cells-only sub-plan prunes the ADC-table UDF,
    // so recomputation costs one pass over the query batch.
    val q = Similarity.pqQuerySide(q0, "query_id", "__qv", cbs)
      .join(q0.select(col("query_id"), explode(probeUdf(col("__qv"))).as("__cell")),
        "query_id")
    val cand = IvfIndex.cellRestricted(index, q, maxStaticProbeCells)
      .filter(col("pq_code").isNotNull)
      .select(col(idCol).as("neighbor_id"), col("cell").as("__cell"), col("pq_code"))
    val scored = cand.join(broadcast(q), "__cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc_cos",
        Similarity.pqAdcCosUdf(cbs)(col("__tab"), col("__qn"), col("pq_code")))
    // one cell per doc, so no pair dups — the distinct is the same cheap
    // safety as IvfIndex's scoreProbedCells tail
    Similarity.pqRankTopK(
      scored.select("query_id", "neighbor_id", "adc_cos").distinct(), k)
  }

  /** Append new vectors, assigning and encoding ONLY the new rows with
    * the frozen models from the meta row. Exact — both models are pure
    * per-row functions, no cross-corpus statistic exists, so probes
    * against `append(build(a), b)` equal probes against
    * `build(a union b)` (spec-pinned). Ids must stay unique.
    */
  def append(
      index: DataFrame,
      newVecs: DataFrame,
      idCol: String,
      vecCol: String): DataFrame = {
    val (m, ctrs, cbs) = readMeta(index)
    val newDocs = docRows(newVecs, idCol, vecCol, ctrs, cbs).persist()
    val nNew = newDocs.count()
    val appended = index.filter(col("cell") =!= MetaCell)
      .unionAll(metaRow(newVecs.sparkSession, idCol, newVecs.schema(idCol).dataType,
          m.copy(nDocs = m.nDocs + nNew),
          ctrs.map(_.toSeq).toSeq, cbs.map(_.map(_.toSeq).toSeq).toSeq)
        .select(index.columns.map(col): _*))
      .unionAll(newDocs.select(index.columns.map(col): _*))
      .persist()
    appended.count()
    newDocs.unpersist()
    appended
  }

  /** Cell-balance report over this index's doc rows — the same
    * statistic and remedy trigger as [[IvfIndex.cellOccupancyReport]]
    * (the layouts share the cell-discriminated scheme, not the meta
    * schema — the [[IvfSq8Index.occupancyReport]] thin-twin pattern).
    * The coarse quantizer here skews exactly like IvfIndex's: appends
    * drift the corpus away from the frozen centroids, over-full cells
    * make probes scan their fraction in full, and this one stored-row
    * groupBy is the measured trigger for [[rebuildIfSkewed]] (r10 —
    * this was the only persistable index family without a monitor).
    */
  def occupancyReport(index: DataFrame, topK: Int = 16): IvfIndex.CellOccupancy = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val (m, _, _) = readMeta(index)
    val occ = index.filter(col("cell") >= 0)
      .groupBy("cell").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("cell"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val nDocs = occ.map(_._2).sum
    val maxCell = occ.headOption.map(_._2).getOrElse(0L)
    val mean = if (m.nCentroids > 0) nDocs.toDouble / m.nCentroids else 0.0
    IvfIndex.CellOccupancy(nDocs, m.nCentroids, occ.size, maxCell, mean,
      if (mean > 0) maxCell / mean else 0.0, occ.take(topK))
  }

  /** The monitor-then-remedy loop for the IVF-PQ family. Unlike
    * [[IvfIndex.refitIfSkewed]] the artifact CANNOT heal from itself —
    * it stores lossy PQ residuals, not vectors, so re-fitting a
    * quantizer from reconstructions would chase quantization noise.
    * The remedy is therefore the [[LshIndex.rebuildIfStale]] shape: a
    * typed rebuild-from-corpus recipe — the caller supplies the exact
    * corpus the index covers (guarded by doc count), a fresh seeded
    * k-means is fitted over the REAL vectors (same centroid count),
    * and the index rebuilds under the frozen PQ codebooks from the
    * meta row (scoring fidelity is not the drifting statistic; only
    * the coarse partitioner is). Below `maxSkew` the index comes back
    * untouched; the returned report is the evidence either way.
    */
  def rebuildIfSkewed(
      index: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      maxSkew: Double = 8.0,
      seed: Long = 42L): (DataFrame, IvfIndex.CellOccupancy) = {
    require(maxSkew >= 1.0, s"maxSkew below 1 would always fire; got $maxSkew")
    val report = occupancyReport(index)
    if (report.skew <= maxSkew) (index, report)
    else {
      val (m, _, cbs) = readMeta(index)
      val n = corpus.count()
      require(n == m.nDocs,
        s"corpus has $n docs but the index covers ${m.nDocs} — rebuildIfSkewed " +
          "needs the exact corpus the index was built over (PQ codes are lossy; " +
          "the artifact cannot re-fit from itself)")
      (build(corpus, idCol, vecCol,
        IvfIndex.fitCentroids(corpus, vecCol, m.nCentroids, seed),
        cbs.map(_.map(_.toSeq).toSeq).toSeq), report)
    }
  }
}
