package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/eval contamination detection: how many of a training document's
  * character n-grams appear anywhere in a held-out benchmark corpus.
  * This is the decontamination filter every LLM data pipeline runs before
  * training (GPT-3 appendix C / PaLM style: 13-gram overlap), expressed
  * as one broadcast join.
  *
  * Scale shape: benchmarks are tiny next to the corpus (MBs vs 100 TB),
  * so the benchmark's distinct n-gram set is collected into a broadcast
  * hash relation and the training side streams through it map-side —
  * no shuffle of the big side. Set `broadcastBench = false` only if the
  * benchmark side genuinely exceeds broadcast size; the join then
  * becomes a regular shuffled hash join on the n-gram key.
  */
object Contamination {

  /** Per-training-doc overlap stats against `bench`.
    *
    * @return one row per `train` doc: idCol, `total_ngrams` (distinct
    *         n-grams in the doc), `overlap_ngrams` (of those, how many
    *         occur in any benchmark doc), `contamination` (ratio, 0.0
    *         for gram-less docs).
    */
  def ngramContamination(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      broadcastBench: Boolean = true): DataFrame = {
    // Kernel form: this runs once per row over the full 100-TB corpus,
    // where the interpreted-HOF expression form is a linear CPU tax.
    val grams = TextDedup.shinglesKernel(col(textCol), n)
    val benchGramsRaw = bench.select(explode(grams).as("__g")).distinct()
    val benchGrams =
      if (broadcastBench) broadcast(benchGramsRaw) else benchGramsRaw
    // One scan AND one kernel evaluation per training row: explode the
    // gram set (explode_outer keeps gram-less docs as a null row), mark
    // benchmark hits with a left join, and recover BOTH counts in the
    // fold-back aggregate — count(__g) skips the null row, so it equals
    // the doc's distinct-gram total without a second size(grams)
    // evaluation (Project and Generate don't share subexpressions, so
    // the earlier size+explode shape shingled every doc twice).
    train
      .select(col(idCol), explode_outer(grams).as("__g"))
      .join(benchGrams.withColumn("__hit", lit(1L)), Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("__g")).as("total_ngrams"),
        sum(coalesce(col("__hit"), lit(0L))).as("overlap_ngrams"))
      .select(
        col(idCol),
        col("total_ngrams"),
        col("overlap_ngrams"),
        when(col("total_ngrams") > 0,
          col("overlap_ngrams").cast("double") / col("total_ngrams").cast("double"))
          .otherwise(lit(0.0)).as("contamination"))
  }
}
