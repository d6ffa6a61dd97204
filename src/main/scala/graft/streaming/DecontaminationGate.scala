package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextDedup

/** Streaming decontamination —
  * [[graft.operators.Contamination.ngramContamination]] as a STATELESS
  * per-row transform, completing the gate set ([[EventOps.dedupStream]],
  * [[NearDupGate]], [[EmbeddingDupGate]], [[BoilerplateGate]],
  * [[SpanGate]]): benchmark n-grams are a fixed, model-sized artifact
  * (MBs of eval sets vs TBs of crawl — the batch operator already
  * broadcasts them by contract), so the streaming form needs no
  * foreachBatch, no state store and no watermark. [[withStats]] is a
  * plain projection that runs identically under `readStream` (append
  * mode) and batch — one kernel evaluation per row against the
  * broadcast gram set, the same per-row function the batch operator's
  * explode/join/re-aggregate computes (spec-pinned equal, including
  * gram-less docs).
  *
  * Unlike the frequency gates there is nothing to append per batch:
  * benchmarks change by RELEASE, not by micro-batch, and growing the
  * filter from stream contents would be contamination feedback, not
  * decontamination. Rebuild the gram set when the benchmark suite
  * changes.
  */
object DecontaminationGate {

  /** Distinct benchmark n-grams, collected driver-side for broadcast.
    * Benchmarks are model-sized by the same contract as the batch
    * operator's `broadcast(benchGrams)`; this is the gate's one
    * `.collect()`, bounded by that contract.
    */
  def benchGramSet(bench: DataFrame, textCol: String, n: Int): Set[String] =
    bench.select(explode(TextDedup.shinglesKernel(col(textCol), n)).as("g"))
      .distinct().collect().map(_.getString(0)).toSet

  /** Contamination stats columns for one text value against the gram
    * set — `(total_ngrams, overlap_ngrams, contamination)`, the batch
    * operator's exact output triple.
    */
  private def statsCol(textCol: Column, n: Int, grams: Set[String]): Column = {
    val f = udf((text: String) => {
      val gs = TextDedup.shingleSet(text, n)
      var overlap = 0L
      var i = 0
      while (i < gs.length) { if (grams.contains(gs(i))) overlap += 1; i += 1 }
      val total = gs.length.toLong
      val ratio = if (total > 0) overlap.toDouble / total.toDouble else 0.0
      (total, overlap, ratio)
    })
    f(textCol)
  }

  /** All input columns plus `total_ngrams`, `overlap_ngrams`,
    * `contamination` — batch- and stream-safe (pure projection).
    */
  def withStats(
      df: DataFrame,
      textCol: String,
      n: Int,
      benchGrams: Set[String]): DataFrame = {
    val s = statsCol(col(textCol), n, benchGrams)
    df.withColumn("__s", s)
      .withColumn("total_ngrams", col("__s._1"))
      .withColumn("overlap_ngrams", col("__s._2"))
      .withColumn("contamination", col("__s._3"))
      .drop("__s")
  }

  /** Rows whose contamination stays at or below `maxContamination`,
    * original columns preserved.
    */
  def decontaminate(
      df: DataFrame,
      textCol: String,
      n: Int,
      benchGrams: Set[String],
      maxContamination: Double): DataFrame =
    withStats(df, textCol, n, benchGrams)
      .filter(col("contamination") <= maxContamination)
      .select(df.columns.map(col): _*)

  // ---- Semantic (embedding-space) twin (r10) -------------------------
  // [[graft.operators.Contamination.embeddingContamination]] is already
  // a stateless per-row max-fold over closure-broadcast bench vectors,
  // so the streaming form is the same projection — no foreachBatch, no
  // state store, no watermark; the benchmark embedding artifact changes
  // by release, never by micro-batch. Collect it once with
  // [[graft.operators.Contamination.benchEmbeddingSet]].

  /** All input columns plus `max_cos` and `contaminated` — the batch
    * operator's exact output pair, batch- and stream-safe.
    */
  def withMaxCos(
      df: DataFrame,
      vecCol: String,
      benchVecs: Array[Array[Double]],
      threshold: Double): DataFrame = {
    require(threshold >= -1.0 && threshold <= 1.0,
      s"threshold must be a cosine in [-1,1]: $threshold")
    val fold = graft.operators.Contamination.maxCosUdf(benchVecs)
    df.withColumn("max_cos",
        fold(graft.operators.Similarity.asDouble(col(vecCol))))
      .withColumn("contaminated",
        when(col("max_cos").isNotNull && col("max_cos") >= threshold, lit(1))
          .otherwise(lit(0)))
  }

  /** Rows whose embedding stays semantically clear of the benchmark
    * set (`max_cos < threshold`; null embeddings cannot match and
    * pass), original columns preserved.
    */
  def decontaminateEmbeddings(
      df: DataFrame,
      vecCol: String,
      benchVecs: Array[Array[Double]],
      threshold: Double): DataFrame =
    withMaxCos(df, vecCol, benchVecs, threshold)
      .filter(col("contaminated") === 0)
      .select(df.columns.map(col): _*)
}
