package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The review/repair loop (SURVEY.md §3.3; etl_ui.py:1938-2193) as a pure
  * engine API — set algebra over the pipeline's three frames (U1/U2/F5).
  * These act on quarantine-sized data; each op is a filter + union, no
  * shuffle beyond what the frames already carry.
  */
object Review {

  /** Substitute a duplicate for the currently-kept row of the same entity
    * (etl_ui.py:2042-2061): the chosen row (identified by `rowId`) moves
    * from `duplicates` to `valid`; the previously-valid row for that
    * entity moves to `duplicates`.
    */
  def promoteDuplicate(
      result: Pipeline.EtlResult,
      rowId: Long): Pipeline.EtlResult = {
    val chosen = result.duplicates.filter(col("row_id") === rowId)
    val entity = chosen.select("id_entidade")
    val displaced = result.valid.join(entity, Seq("id_entidade"), "left_semi")
    val newValid = result.valid
      .join(entity, Seq("id_entidade"), "left_anti")
      .unionByName(chosen)
    val newDups = result.duplicates
      .filter(col("row_id") =!= rowId)
      .unionByName(displaced)
    result.copy(valid = newValid, duplicates = newDups)
  }

  /** Manually resolve an unmatched row to a registry entity
    * (etl_ui.py:2113-2126): assign `idEntidade` and promote the row from
    * `unmatched` to `valid`.
    */
  def correctEntity(
      result: Pipeline.EtlResult,
      rowId: Long,
      idEntidade: Long): Pipeline.EtlResult = {
    val fixed = result.unmatched
      .filter(col("row_id") === rowId)
      .withColumn("id_entidade", lit(idEntidade))
    result.copy(
      valid = result.valid.unionByName(fixed),
      unmatched = result.unmatched.filter(col("row_id") =!= rowId))
  }

  /** Reconciliation counts shown to the operator (etl_ui.py:1983-1991). */
  final case class Summary(valid: Long, duplicates: Long, unmatched: Long, badName: Long) {
    def total: Long = valid + duplicates + unmatched + badName
  }

  def summary(result: Pipeline.EtlResult): Summary =
    Summary(
      result.valid.count(), result.duplicates.count(),
      result.unmatched.count(), result.badName.count())
}
