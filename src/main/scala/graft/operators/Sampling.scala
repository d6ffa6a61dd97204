package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data curation —
  * uniform rates and per-stratum rates (the "training mix" knob: 50% of
  * the English slice, 10% of everything else, ...).
  *
  * Why hash-based and not `rand()`: `rand()` re-draws on task retry and
  * stage re-execution, so a 100-TB sampling job that loses an executor
  * emits a DIFFERENT sample for the re-run partitions — non-reproducible
  * corpora and broken incremental reruns. Keying the keep/drop decision
  * on a hash of the row id makes sampling a pure per-row function:
  * idempotent under retries, stable across cluster layouts, and the
  * same rows survive when the job is re-run tomorrow on more machines.
  * The hash is [[TextDedup.md5TokenHash]] (first 8 md5 hex digits), so
  * any SQL engine replays the exact sample membership.
  */
object Sampling {

  /** Sampling resolution: rates are quantized to 1/10000. */
  val Buckets = 10000

  /** Deterministic bucket in [0, Buckets) from the row id. */
  def hashBucket(id: Column): Column =
    TextDedup.md5TokenHash(id.cast("string")) % Buckets

  /** Keep ~`rate` of rows, chosen by id hash — reproducible across
    * runs, retries, and engines.
    */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1]: $rate")
    df.filter(hashBucket(col(idCol)) < math.round(rate * Buckets))
  }

  /** Per-stratum rates (stratum -> fraction kept); strata absent from
    * `rates` fall back to `defaultRate`. Evaluates as one codegen'd
    * CASE chain over the hash bucket — no join, no shuffle, and the
    * filter sits directly on the scan.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0 && r <= 1, s"rate must be in [0,1]: $r"))
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(null: Column) {
      case (acc, (stratum, rate)) =>
        val branch = math.round(rate * Buckets)
        if (acc == null) when(col(strataCol) === stratum, lit(branch))
        else acc.when(col(strataCol) === stratum, lit(branch))
    } match {
      case null => lit(math.round(defaultRate * Buckets))
      case c    => c.otherwise(lit(math.round(defaultRate * Buckets)))
    }
    df.filter(hashBucket(col(idCol)) < threshold)
  }
}
