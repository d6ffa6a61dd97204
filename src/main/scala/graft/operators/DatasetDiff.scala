package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff between two dataset versions — the audit step of a
  * curation pipeline's release cadence ("what did last night's run
  * add, drop, or rewrite?"): per id, `added` (only in `b`), `removed`
  * (only in `a`), `changed` (both, content hash differs), `unchanged`.
  * Content identity is `md5(concat_ws(\u0001, cols))` over the chosen
  * columns cast to string — engine-portable (the q24 portable-hash
  * discipline), so the same diff replays anywhere.
  *
  * Contract: ids non-null and unique per side (a null id can never
  * join to itself and would surface as an added+removed pair — the
  * sampling family's null rule, applied to identity). `concat_ws`
  * skips NULL columns on both engines identically; a NULL text and a
  * missing text therefore hash alike, which is the tolerant behavior a
  * release diff wants (schema-presence changes are not content
  * changes).
  *
  * Plan shape at 100 TB: hashes are computed SCAN-SIDE, so only
  * `(id, 16-byte hash)` ever shuffles into the full-outer join — the
  * one unavoidable exchange; the heavy content columns never move.
  * [[summary]] is a dimension-sized groupBy over the statuses.
  */
object DatasetDiff {

  def diff(
      a: DataFrame,
      b: DataFrame,
      idCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "need at least one content column to hash")
    def hashed(df: DataFrame, hc: String) = df.select(
      col(idCol),
      md5(concat_ws("\u0001", contentCols.map(c => col(c).cast("string")): _*)).as(hc))
    hashed(a, "__ha").join(hashed(b, "__hb"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__ha").isNull, lit("added"))
          .when(col("__hb").isNull, lit("removed"))
          .when(col("__ha") === col("__hb"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Status counts of a [[diff]] frame (all four statuses present,
    * zero-filled) — the release-report row.
    */
  def summary(d: DataFrame): DataFrame = {
    val spark = d.sparkSession
    import spark.implicits._
    val statuses = Seq("added", "changed", "removed", "unchanged").toDF("status")
    statuses.join(d.groupBy("status").agg(count(lit(1)).as("n")), Seq("status"), "left")
      .select(col("status"), coalesce(col("n"), lit(0L)).as("n"))
  }
}
