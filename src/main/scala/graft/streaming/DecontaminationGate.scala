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
}
