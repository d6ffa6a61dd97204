package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed order statistics (T87, r11) — the per-domain
  * length/score percentile row every data card and curation threshold
  * decision reads (CCNet's head/middle/tail cuts, the q100 bucket
  * boundaries, "p99 document length" capacity planning). Spark's own
  * `percentile` aggregate buffers every group value in executor
  * memory (OOM at corpus-sized groups) and `percentile_approx` is a
  * sketch no other engine replays bit-for-bit — this operator computes
  * EXACT discrete quantiles (`percentile_disc` semantics: the smallest
  * value whose cumulative count reaches `ceil(q * n)`) with nothing
  * but a sort-based window, so it scales to groups of any size and
  * replays exactly in any engine.
  *
  * Rank arithmetic is INTEGER end-to-end: `q` is frozen to micro-units
  * (`round(q * 1e6)` — quantiles with more than six decimals are
  * nobody's release report), and the target rank is
  * `(q_micro * n + 999999) DIV 1000000` = `ceil(q * n)` computed
  * without ever touching a double — the cross-engine discipline every
  * exact fold in this family follows (a double `ceil(0.9 * n)` can
  * land one row off the integer answer depending on rounding).
  *
  * Plan shape: ONE exchange (hash by key for the window sort), then a
  * codegen'd explode×filter that keeps exactly |qs| rows per key — the
  * row amplification lives inside a filter that never materializes.
  * At 100 TB the per-key sort is the honest price of an exact
  * quantile; keys are domains (thousands), so parallelism is bounded
  * by key count — for few-key corpora pre-salt into subgroups and
  * merge, or accept the approx twin below.
  *
  * Nulls in the value column are excluded (the `percentile_disc`
  * convention); a key whose values are all null produces no rows.
  *
  * Output: `keyCol`, `quantile` (double, the micro-unit value divided
  * back — bit-identical cross-engine), `n` (group count), `value`
  * (the input column's own type).
  */
object Quantiles {

  def exactQuantiles(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    require(qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1]: ${qs.mkString(", ")}")
    val qMicro = qs.map(q => math.round(q * 1e6))
    require(qMicro.distinct.size == qMicro.size,
      s"quantiles collide at micro-unit precision: ${qs.mkString(", ")}")
    val byKey = Window.partitionBy(col(keyCol))
    val ordered = byKey.orderBy(col(valueCol))
    df.select(col(keyCol), col(valueCol))
      .where(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(ordered))
      .withColumn("__n", count(lit(1)).over(byKey))
      .withColumn("__qm", explode(typedLit(qMicro)))
      // integral DIV: ceil(q * n) with no double in the loop
      .where(col("__rn") === expr("(__qm * __n + 999999) DIV 1000000"))
      .select(
        col(keyCol),
        (col("__qm") / lit(1000000.0)).as("quantile"),
        col("__n").as("n"),
        col(valueCol).as("value"))
  }

  /** The sketch twin for few-key / latency-bound paths:
    * `percentile_approx` under the hood, same output surface. NOT
    * cross-engine replayable (sketch internals differ by engine) —
    * QuantilesSpec pins it within `accuracy` of [[exactQuantiles]]
    * instead.
    */
  def approxQuantiles(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      qs: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    require(qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1]: ${qs.mkString(", ")}")
    val filtered = df.select(col(keyCol), col(valueCol))
      .where(col(valueCol).isNotNull)
    filtered
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        percentile_approx(
          col(valueCol),
          typedLit(qs),
          lit(accuracy)).as("__vals"))
      .select(
        col(keyCol), col("n"),
        posexplode(col("__vals")).as(Seq("__i", "value")))
      .select(
        col(keyCol),
        element_at(typedLit(qs), col("__i") + 1).as("quantile"),
        col("n"),
        col("value"))
  }
}
