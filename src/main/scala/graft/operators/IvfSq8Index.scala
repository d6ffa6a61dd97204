package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persistable IVF-SQ8 index — the middle rung of the ANN serving
  * ladder, completing it: [[IvfIndex]] stores raw vectors (exact
  * scoring, 1x), [[IvfPqIndex]] packed nibbles (centroid-residual
  * scoring, 32x); this stores one byte per dimension
  * ([[Similarity.sq8Encode]] codes — ±half-step reconstruction, 4x) —
  * the right default when rank fidelity matters more than the last 8x
  * of IO. Same composition discipline as IVF-PQ: [[IvfIndex]]'s cell
  * machinery decides WHERE to look (shared `cellRestricted`, same
  * static-pruning plan pin), [[Similarity.sq8TopKAgainst]]'s ADC
  * kernel decides HOW to score — probing ALL cells recovers the
  * unpruned operator bit-for-bit (spec-pinned).
  *
  * Index layout: ONE DataFrame, row kind discriminated by `cell`
  * (the [[IvfIndex]] scheme): the meta row (`cell == -2`) carries the
  * frozen coarse centroids AND the frozen `(lo, hi)` calibration — a
  * probe needs nothing but the index; `cell == -1` holds null vectors
  * (never probed); `cell >= 0` one `(id, cell, sq_code)` row per doc.
  * Write with `index.write.partitionBy("cell").parquet(path)`.
  *
  * Both frozen models are pure per-row functions, so [[append]] is
  * EXACT: probes against `append(build(a), b)` equal probes against
  * `build(a union b)` (spec-pinned). Calibration drift (a later epoch
  * outside the frozen `(lo, hi)` range) degrades gracefully — encode
  * clamps at the range edge ([[Similarity.sq8EncodeKernel]]) — and the
  * monitor for wholesale distribution drift is the cell-balance report
  * ([[IvfIndex.cellOccupancyReport]] works on any cell-discriminated
  * frame of this shape... this one included, via [[occupancyReport]]).
  */
object IvfSq8Index {

  /** `cell` value of the single metadata row. */
  val MetaCell: Int = IvfIndex.MetaCell
  /** `cell` assigned to null vectors (never probed; probes are >= 0). */
  val NullCell: Int = IvfIndex.NullCell

  final case class Meta(dim: Int, nCentroids: Int, nDocs: Long)

  private def metaString(m: Meta): String =
    s"v1;dim=${m.dim};nCentroids=${m.nCentroids};nDocs=${m.nDocs}"

  /** Meta row of `index`: frozen params, coarse centroids, calibration.
    * Fails typed on a frame that is not a v1 IVF-SQ8 index.
    */
  def readMeta(index: DataFrame)
      : (Meta, Array[Array[Double]], Array[Double], Array[Double]) = {
    require(Seq("cell", "sq_code", "ctrs", "los", "his", "params").forall(index.columns.contains),
      "not an IVF-SQ8 index: expected columns (id, cell, sq_code, ctrs, los, his, params)")
    val rows = index.filter(col("cell") === MetaCell)
      .select(col("params"), col("ctrs"), col("los"), col("his")).collect()
    require(rows.length == 1,
      s"not an IVF-SQ8 index: expected exactly one meta row (cell = $MetaCell), found ${rows.length}")
    val s = rows(0).getString(0)
    require(s != null && s.startsWith("v1;"), s"unknown IVF-SQ8 index version: $s")
    val kv = s.split(";").drop(1)
      .map { p => val i = p.indexOf('='); p.substring(0, i) -> p.substring(i + 1) }
      .toMap
    val meta = Meta(kv("dim").toInt, kv("nCentroids").toInt, kv("nDocs").toLong)
    val ctrs = rows(0).getSeq[scala.collection.Seq[Double]](1).map(_.toArray).toArray
    val lo = rows(0).getSeq[Double](2).toArray
    val hi = rows(0).getSeq[Double](3).toArray
    require(ctrs.length == meta.nCentroids, "corrupt IVF-SQ8 index: centroid count mismatch")
    require(lo.length == meta.dim && hi.length == meta.dim,
      "corrupt IVF-SQ8 index: calibration length mismatch")
    (meta, ctrs, lo, hi)
  }

  private def docRows(
      corpus: DataFrame, idCol: String, vecCol: String,
      ctrs: Array[Array[Double]], lo: Array[Double], hi: Array[Double]): DataFrame = {
    val assignUdf = udf((v: Array[Double]) =>
      if (v == null) NullCell else Similarity.nearestCells(ctrs, v, 1)(0))
    val encUdf = udf((v: Array[Double]) =>
      if (v == null) null else Similarity.sq8EncodeKernel(lo, hi, v))
    corpus
      .select(col(idCol), Similarity.asDouble(col(vecCol)).as("__v"))
      .select(col(idCol),
        assignUdf(col("__v")).as("cell"),
        encUdf(col("__v")).as("sq_code"),
        lit(null).cast("array<array<double>>").as("ctrs"),
        lit(null).cast("array<double>").as("los"),
        lit(null).cast("array<double>").as("his"),
        lit(null).cast("string").as("params"))
  }

  private def metaRow(
      spark: org.apache.spark.sql.SparkSession, idCol: String,
      idType: org.apache.spark.sql.types.DataType, m: Meta,
      centroids: Seq[Seq[Double]], lo: Seq[Double], hi: Seq[Double]): DataFrame =
    spark.range(1).select(
      lit(null).cast(idType).as(idCol),
      lit(MetaCell).as("cell"),
      lit(null).cast("binary").as("sq_code"),
      typedLit(centroids.map(_.toSeq)).as("ctrs"),
      typedLit(lo).as("los"),
      typedLit(hi).as("his"),
      lit(metaString(m)).as("params"))

  /** Build the index: one coarse-cell assignment + one SQ8 encode per
    * vector, both pure per-row kernels of the frozen models. Returned
    * frame is persisted (call `.unpersist()` once written).
    */
  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[Seq[Double]],
      lo: Seq[Double],
      hi: Seq[Double]): DataFrame = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    val dim = centroids.head.length
    require(centroids.forall(_.length == dim), "centroids must share one dimensionality")
    require(lo.length == dim && hi.length == dim,
      s"calibration must match the centroid dimensionality $dim, got ${lo.length}/${hi.length}")
    val ctrs = centroids.map(_.toArray).toArray
    val docs = docRows(corpus, idCol, vecCol, ctrs, lo.toArray, hi.toArray).persist()
    val nDocs = docs.count()
    val m = Meta(dim, centroids.length, nDocs)
    val index = metaRow(corpus.sparkSession, idCol, corpus.schema(idCol).dataType,
        m, centroids, lo, hi)
      .unionAll(docs).persist()
    index.count()
    docs.unpersist()
    index
  }

  /** ADC top-k against the stored index: same output contract as
    * [[Similarity.sq8TopKAgainst]] (`query_id`, `rank`, `neighbor_id`,
    * `adc_cos`), restricted to each query's `nProbe` nearest cells
    * (shared [[IvfIndex.cellRestricted]] — static partition pruning up
    * to 64k probed cells, broadcast semi join past that). With
    * `nProbe = nCentroids` the output equals the unpruned operator
    * exactly (spec-pinned: cell pruning and byte quantization are
    * independent approximations).
    */
  def topKAgainst(
      index: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 2,
      maxStaticProbeCells: Int = IvfIndex.DefaultMaxStaticProbeCells): DataFrame = {
    val (m, ctrs, lo, hi) = readMeta(index)
    require(nProbe > 0 && nProbe <= m.nCentroids,
      s"nProbe must be in [1, ${m.nCentroids}]")
    val probeUdf = udf((v: Array[Double]) =>
      if (v == null) Array.empty[Int] else Similarity.nearestCells(ctrs, v, nProbe))
    val qnUdf = udf((v: Array[Double]) =>
      if (v == null) 0.0
      else {
        var t = 0.0
        var i = 0
        while (i < v.length) { t += v(i) * v(i); i += 1 }
        math.sqrt(t)
      })
    // batch-sized, used twice (cell collect + broadcast) — the IvfPq
    // no-persist rationale applies verbatim
    val q = queries.select(
      col(idCol).as("query_id"),
      Similarity.asDouble(col(vecCol)).as("__qv"))
      .filter(col("__qv").isNotNull)
      .withColumn("__qn", qnUdf(col("__qv")))
      .withColumn("__cell", explode(probeUdf(col("__qv"))))
    val cand = IvfIndex.cellRestricted(index, q, maxStaticProbeCells)
      .filter(col("sq_code").isNotNull)
      .select(col(idCol).as("neighbor_id"), col("cell").as("__cell"), col("sq_code"))
    val scored = cand.join(broadcast(q), "__cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc_cos",
        Similarity.sq8AdcCosUdf(lo, hi)(col("__qv"), col("__qn"), col("sq_code")))
    Similarity.pqRankTopK(
      scored.select("query_id", "neighbor_id", "adc_cos").distinct(), k)
  }

  /** Append new vectors, assigning and encoding ONLY the new rows with
    * the frozen models from the meta row — EXACT (both models are pure
    * per-row functions; spec-pinned append == build-union). Ids must
    * stay unique.
    */
  def append(
      index: DataFrame,
      newVecs: DataFrame,
      idCol: String,
      vecCol: String): DataFrame = {
    val (m, ctrs, lo, hi) = readMeta(index)
    val newDocs = docRows(newVecs, idCol, vecCol, ctrs, lo, hi).persist()
    val nNew = newDocs.count()
    val appended = index.filter(col("cell") =!= MetaCell)
      .unionAll(metaRow(newVecs.sparkSession, idCol, newVecs.schema(idCol).dataType,
          m.copy(nDocs = m.nDocs + nNew),
          ctrs.map(_.toSeq).toSeq, lo.toSeq, hi.toSeq)
        .select(index.columns.map(col): _*))
      .unionAll(newDocs.select(index.columns.map(col): _*))
      .persist()
    appended.count()
    newDocs.unpersist()
    appended
  }

  /** Cell-balance report over this index's doc rows — the same
    * statistic and remedy trigger as [[IvfIndex.cellOccupancyReport]]
    * (the layouts share the cell-discriminated scheme, but not the
    * meta-row schema, hence the thin twin).
    */
  def occupancyReport(index: DataFrame, topK: Int = 16): IvfIndex.CellOccupancy = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val (m, _, _, _) = readMeta(index)
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

  /** The monitor-then-remedy loop for the IVF-SQ8 family (r10 —
    * completing the remedy symmetry: IVF refits from stored vectors,
    * IVF-PQ takes a typed rebuild-from-corpus recipe, this one sits in
    * between). Unlike PQ residuals, SQ8 codes RECONSTRUCT their vector
    * within `(hi - lo) / 255` per dimension, so the artifact heals
    * from ITSELF: reconstruct every stored code, fit a fresh seeded
    * k-means over the reconstructions, and REASSIGN cells. The codes
    * never change — quantization fidelity is not the drifting
    * statistic, only the coarse partitioner is — so every ADC score
    * is bit-identical before and after; the refit moves only the
    * pruning geometry. Null-cell rows and `nDocs` are preserved.
    * Below `maxSkew` the index comes back untouched; the returned
    * report is the evidence either way.
    */
  def refitIfSkewed(
      index: DataFrame,
      maxSkew: Double = 8.0,
      seed: Long = 42L): (DataFrame, IvfIndex.CellOccupancy) = {
    require(maxSkew >= 1.0, s"maxSkew below 1 would always fire; got $maxSkew")
    val report = occupancyReport(index)
    if (report.skew <= maxSkew) (index, report)
    else {
      val (m, _, lo, hi) = readMeta(index)
      val idCol = index.columns.head
      val reconUdf = udf((code: Array[Byte]) => {
        val v = new Array[Double](lo.length)
        var i = 0
        while (i < lo.length) {
          v(i) = lo(i) + (code(i) & 0xff) * (hi(i) - lo(i)) / 255.0
          i += 1
        }
        v
      })
      val recon = index.filter(col("cell") >= 0)
        .select(col(idCol), reconUdf(col("sq_code")).as("__v"), col("sq_code"))
        .persist()
      val ctrs = IvfIndex.fitCentroids(recon, "__v", m.nCentroids, seed)
        .map(_.toArray).toArray
      val assignUdf = udf((v: Array[Double]) => Similarity.nearestCells(ctrs, v, 1)(0))
      val docs = recon.select(col(idCol),
        assignUdf(col("__v")).as("cell"),
        col("sq_code"),
        lit(null).cast("array<array<double>>").as("ctrs"),
        lit(null).cast("array<double>").as("los"),
        lit(null).cast("array<double>").as("his"),
        lit(null).cast("string").as("params"))
      val rebuilt = metaRow(index.sparkSession, idCol, index.schema(idCol).dataType,
          m, ctrs.map(_.toSeq).toSeq, lo.toSeq, hi.toSeq)
        .unionAll(docs.select(index.columns.map(col): _*))
        .unionAll(index.filter(col("cell") === NullCell))
        .persist()
      rebuilt.count()
      recon.unpersist()
      (rebuilt, report)
    }
  }
}
