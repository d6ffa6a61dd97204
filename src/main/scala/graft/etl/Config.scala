package graft.etl

/** Engine configuration — the Scala counterpart of the reference's MongoDB
  * collections (etl_ui.py:130-145). Config is KB-scale and drives
  * driver-side label logic, so it is plain case classes; load from JSON
  * files with [[Config.fromJson]] (Jackson ships with Spark) or construct
  * directly.
  */
final case class ColumnRename(
    originalName: String,
    newName: String,
    critical: Boolean = false)

/** 1-based inclusive column positions of one vertical group
  * (`ConfigColMap.groups`, etl_ui.py:133,139).
  */
final case class GroupRange(start: Int, end: Int)

/** Entity-type translation row (`ConfigMapEnt`, etl_ui.py:134). */
final case class EntityTypeMap(tipoInq: String, tipoNorm: String)

/** Keyword classifiers for the interests group (`ConfigAdvanced.keys`,
  * etl_ui.py:131,140-144): a column label containing a comment key is a
  * comment column, a formando key a trainee-count column, else an
  * interest column.
  */
final case class Keywords(
    commentKeys: Seq[String] = Seq("comentario"),
    formandoKeys: Seq[String] = Seq("formandos"))

final case class EtlConfig(
    renames: Seq[ColumnRename] = Seq.empty,
    groups: Map[String, GroupRange] = Map.empty,
    entityTypes: Seq[EntityTypeMap] = Seq.empty,
    keywords: Keywords = Keywords(),
    defaultTipo: String = "Municípios",
    /** Columns whose normalized label contains any of these are dropped
      * before grouping (P2, etl_ui.py:1047-1054).
      */
    dropKeywords: Seq[String] = Seq.empty) {

  lazy val renameMap: Map[String, String] =
    renames.map(r => graft.functions.TextNorm.normalize(r.originalName) -> r.newName).toMap

  lazy val tipoMap: Map[String, String] =
    entityTypes.map(m => graft.functions.TextNorm.normalize(m.tipoInq) -> m.tipoNorm).toMap
}

object Config {

  /** Parse an EtlConfig from the JSON layout documented in FIXTURES.md §3
    * (one object bundling the four collections). Uses Jackson (bundled
    * with Spark) — no extra dependency.
    */
  def fromJson(json: String): EtlConfig = {
    import com.fasterxml.jackson.databind.ObjectMapper
    val m = new ObjectMapper()
    val root = m.readTree(json)
    def arr(n: com.fasterxml.jackson.databind.JsonNode): Seq[com.fasterxml.jackson.databind.JsonNode] =
      if (n == null || !n.isArray) Seq.empty
      else (0 until n.size()).map(n.get)
    def txt(n: com.fasterxml.jackson.databind.JsonNode, f: String, d: String = ""): String = {
      val v = if (n == null) null else n.get(f)
      if (v == null) d else v.asText()
    }
    val renames = arr(root.get("config_ren_col")).map { n =>
      ColumnRename(txt(n, "original_name"), txt(n, "new_name"),
        n.has("critical") && n.get("critical").asBoolean(false))
    }
    val groups: Map[String, GroupRange] = {
      val g = if (root.has("config_col_map")) root.get("config_col_map").get("groups") else null
      if (g == null) Map.empty
      else {
        val it = g.properties().iterator()
        val b = Map.newBuilder[String, GroupRange]
        while (it.hasNext) {
          val e = it.next()
          b += e.getKey -> GroupRange(e.getValue.get("start").asInt(), e.getValue.get("end").asInt())
        }
        b.result()
      }
    }
    val ents = arr(root.get("config_map_ent")).map { n =>
      EntityTypeMap(txt(n, "tipo_entidade_inq"), txt(n, "tipo_entidade_norm"))
    }
    val adv = root.get("config_advanced")
    val keys = if (adv != null && adv.has("keys")) adv.get("keys") else null
    val kw = Keywords(
      commentKeys = arr(if (keys == null) null else keys.get("comment_keys")).map(_.asText())
        match { case s if s.nonEmpty => s; case _ => Seq("comentario") },
      formandoKeys = arr(if (keys == null) null else keys.get("formando_keys")).map(_.asText())
        match { case s if s.nonEmpty => s; case _ => Seq("formandos") })
    EtlConfig(renames, groups, ents, kw,
      defaultTipo = if (adv != null && adv.has("default_entity_type"))
        adv.get("default_entity_type").asText() else "Municípios",
      dropKeywords = arr(if (adv == null) null else adv.get("drop_keywords")).map(_.asText()))
  }

  def fromJsonFile(path: String): EtlConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
}
