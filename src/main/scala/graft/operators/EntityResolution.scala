package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Cols

/** The reference's semantic heart: resolve survey rows against the entity
  * registry and partition into valid / duplicate / unmatched / bad-name
  * frames (SURVEY.md §3.1; etl_ui.py:79-129).
  *
  * Spark shape: one broadcast hash join (registry is dimension-sized — the
  * Portuguese entity universe is ~3.5k rows) + one window for the dedup —
  * the only shuffle in the whole identification phase is the dedup's
  * hash-partition on `id_entidade`. The invariant
  * `valid + duplicates + unmatched + badName == input` is preserved and
  * property-tested.
  */
object EntityResolution {

  final case class Result(
      valid: DataFrame,
      duplicates: DataFrame,
      unmatched: DataFrame,
      badName: DataFrame)

  /** @param survey    rows carrying `nameCol`, `tipoCol`, and `rowIdCol`
    *                  (ingest order — Spark has no row order of its own)
    * @param registry  (idCol, registry name, registry tipo) — broadcast
    * @param tipoMap   entity-type translation with identity fallback (X18)
    */
  def resolve(
      survey: DataFrame,
      registry: DataFrame,
      nameCol: String,
      tipoCol: String,
      rowIdCol: String,
      regIdCol: String,
      regNameCol: String,
      regTipoCol: String,
      tipoMap: Map[String, String] = Map.empty,
      defaultTipo: String = "Municípios"): Result = {

    // X16/X18: default the type, translate via the config map (identity
    // fallback), then build the name||type match key on both sides (X17).
    val tipoExpr = {
      val base = coalesce(col(tipoCol), lit(defaultTipo))
      val mapped =
        if (tipoMap.isEmpty) base
        else {
          val kv = tipoMap.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }
          coalesce(element_at(map(kv: _*), Cols.normalizeText(base)), base)
        }
      mapped
    }

    val keyed = survey
      .withColumn("__tipo_final", tipoExpr)
      .withColumn("entity_key", Cols.entityKey(col(nameCol), col("__tipo_final")))

    val badNameP = Cols.isInvalidName(col(nameCol)) || col(nameCol).isNull
    val badName = keyed.filter(badNameP)
    val candidates = keyed.filter(!badNameP)

    val reg = registry.select(
      col(regIdCol).as("id_entidade"),
      Cols.entityKey(col(regNameCol), col(regTipoCol)).as("entity_key"))

    // J1: left-outer broadcast hash join — misses keep null id_entidade.
    val joined = candidates.join(broadcast(reg), Seq("entity_key"), "left_outer")

    // F2: unmatched quarantine; W1: keep-first dedup on the matched side.
    val unmatched = joined.filter(col("id_entidade").isNull)
    val matched = joined.filter(col("id_entidade").isNotNull)
    val dd = Dedup.keepFirst(matched, Seq(col("id_entidade")), col(rowIdCol))

    def clean(df: DataFrame) = df.drop("__tipo_final")
    Result(clean(dd.kept), clean(dd.duplicates), clean(unmatched), clean(badName))
  }
}
