package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Cols, TextNorm}
import graft.operators.SurrogateKeys
import graft.sources.Readers

/** Star-schema load (SURVEY.md §3.2; etl_ui.py:394-664, dw_creation.sql).
  *
  * The reference loads row-at-a-time with `INSERT ... RETURNING id` —
  * O(rows x questions) database round-trips. Here every fact is one
  * unpivot (narrow, stays in codegen) + one broadcast dim join, and every
  * dimension is a get-or-create (distinct + anti-join + dimension-sized
  * window). Write the resulting frames with `df.write.jdbc` (batched) or
  * parquet partitioned by `ano`.
  *
  * Surrogate ids: the fact-side `inquerito`/`resposta` ids are chosen by
  * [[IdStrategy]]. [[DenseIds]] (default) matches the serial reference —
  * deterministic, contiguous `row_number` over ingest order — but plans a
  * single-partition window: fine at survey scale (thousands of rows/year),
  * a one-task serialization point at 100×. [[ScalableIds]] swaps in
  * [[SurrogateKeys.scalable]] (unique, non-contiguous, shuffle-free,
  * stays in codegen) — nothing downstream depends on contiguity, so this
  * is the setting for web-scale facts; `Bench.pipeline_1m` and
  * `tools.ScalePipeline` run it. Dimension get-or-create windows stay
  * dense regardless: they run over driver-local label relations
  * (dimension-sized by construction), pinned by PlanSpec.
  */
object StarLoader {

  /** Fact-table surrogate-id assignment strategy (see object scaladoc). */
  sealed trait IdStrategy
  /** Contiguous reference-parity ids; single-partition window. */
  case object DenseIds extends IdStrategy
  /** Unique non-contiguous ids; fully parallel, no window, no shuffle. */
  case object ScalableIds extends IdStrategy

  final case class TipoDisp(id: Long, descricao: String)

  final case class Star(
      fatoInquerito: DataFrame,
      dimFormacao: DataFrame,
      fatoFormacao: DataFrame,
      dimAreaTematica: DataFrame,
      fatoInteresse: DataFrame,
      comentario: DataFrame,
      dimPreferencia: DataFrame,
      fatoPreferencia: DataFrame,
      dimHorario: DataFrame,
      fatoDisponibilidade: DataFrame,
      private val caches: Seq[DataFrame] = Seq.empty) {
    /** Release every cache [[load]] created (valid input, inquerito ids,
      * dims, fused interests) once the star frames are written — same
      * lifecycle contract as [[Dedup.Split]]/[[Pipeline.EtlResult]].
      */
    def unpersist(): Unit = caches.foreach(_.unpersist())
  }

  private def emptyDf(spark: SparkSession, fields: (String, DataType)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(fields.map { case (n, t) => StructField(n, t) }))

  /** Melt the given plans' physical columns into
    * (row_id, pos, label, value) — `pos` is the column position inside the
    * group, preserving the reference's (row, column) insertion order for
    * id assignment.
    */
  private def long(
      df: DataFrame,
      plans: Seq[LabelOps.ColPlan],
      valueType: String,
      labelOf: LabelOps.ColPlan => String = _.label): DataFrame = {
    val cols = plans.zipWithIndex.map { case (p, i) =>
      struct(lit(labelOf(p)).as("label"), lit(i).as("pos"),
        col(s"`${p.uniqueName}`").cast(valueType).as("value"))
    }
    df.select(col(Readers.RowId), explode(array(cols: _*)).as("m"))
      .select(col(Readers.RowId), col("m.pos").as("pos"),
        col("m.label").as("label"), col("m.value").as("value"))
  }

  /** Dimension get-or-create keyed by `keyFn(nome)`: existing rows keep
    * their (id, nome); unseen keys get dense ids continuing after
    * max(existing). Replaces `INSERT ... ON CONFLICT DO NOTHING RETURNING`
    * (etl_ui.py:446-456,508-520,571-587) without serial round-trips.
    */
  private def dimGetOrCreate(
      existing: Option[DataFrame], // (idCol, nomeCol)
      incomingNames: DataFrame,    // one column: nomeCol
      idCol: String,
      nomeCol: String,
      keyFn: Column => Column): DataFrame = {
    val spark = incomingNames.sparkSession
    val ex = existing
      .getOrElse(emptyDf(spark, idCol -> LongType, nomeCol -> StringType))
      .select(col(idCol).cast("long").as(idCol), col(nomeCol))
    val exKeyed = ex.withColumn("__key", keyFn(col(nomeCol)))
    val fresh = incomingNames.select(col(nomeCol)).na.drop().distinct()
      .withColumn("__key", keyFn(col(nomeCol)))
      .join(exKeyed.select("__key"), Seq("__key"), "left_anti")
      .drop("__key")
    val maxId = ex.agg(coalesce(max(col(idCol)), lit(0L)).as("__m"))
    val created = SurrogateKeys.dense(fresh, idCol, Seq(col(nomeCol).asc))
      .crossJoin(broadcast(maxId))
      .select((col(idCol) + col("__m")).cast("long").as(idCol), col(nomeCol))
    ex.unionByName(created)
  }

  /** @param result           pipeline output; facts load from `result.valid`
    * @param existingFormacao optional (id_formacao, nome_formacao) dim state
    * @param existingHorario  optional (id_horario, descricao_horario, id_tipo_disp)
    * @param tiposDisp        availability types (config-scale, driver-side,
    *                         mirroring the `tipos_disponibilidades` scan)
    * @param idOffset         starting id_inquerito offset (max existing)
    * @param commentKeys      comment-column keywords (ConfigAdvanced)
    * @param idStrategy       fact surrogate-id strategy: [[DenseIds]] for
    *                         reference-parity contiguous ids (survey
    *                         scale), [[ScalableIds]] for shuffle-free
    *                         unique ids (web scale)
    */
  def load(
      result: Pipeline.EtlResult,
      existingFormacao: Option[DataFrame] = None,
      existingHorario: Option[DataFrame] = None,
      tiposDisp: Seq[TipoDisp] = Seq(TipoDisp(1, "Presencial"), TipoDisp(2, "Online")),
      idOffset: Long = 0L,
      commentKeys: Seq[String] = Seq("comentario"),
      idStrategy: IdStrategy = DenseIds): Star = {

    val spark = result.valid.sparkSession
    import spark.implicits._
    val caches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def cached(df: DataFrame): DataFrame = { caches += df.persist(); df }
    // Materialize eagerly: the inquerito surrogate-id window is a
    // single-partition exchange, and without a built cache AQE chains the
    // whole upstream dedup into that one task (measured 50s vs 2s at 1M
    // input rows).
    val valid = cached(result.valid)
    valid.count()

    // ---- FatoInquerito (X7, X23) -------------------------------------
    val hasResp = result.plans.exists(_.uniqueName == "existe_responsavel")
    val withInqId = idStrategy match {
      case DenseIds => SurrogateKeys.dense(valid, "id_inquerito",
        Seq(col(Readers.RowId).asc), offset = idOffset)
      case ScalableIds => SurrogateKeys.scalable(valid, "id_inquerito",
        offset = idOffset)
    }
    val inq = withInqId
      .select(
        col("id_inquerito"),
        col(Readers.RowId),
        col("id_entidade"),
        col("ano"),
        to_date(col("data_submissao")).as("data_submissao"),
        (if (hasResp) Cols.simNaoStrict(col("existe_responsavel"))
         else lit(null).cast("int")).as("existe_responsavel"),
        col("nome_responsavel"),
        col("percentagem_preenchido"),
        col("tempo_realizacao"))
    caches += inq.persist()
    val rid2inq = inq.select(col(Readers.RowId), col("id_inquerito"))

    // ---- M1 formations ----------------------------------------------
    val fPlans = result.colsOfGroup("formacoes")
    // dim rows come from the column labels (the reference inserts every
    // formation column, etl_ui.py:446-456), keyed by normalized name
    val dimFormacao = cached(dimGetOrCreate(
      existingFormacao,
      fPlans.map(_.label).distinct.toDF("nome_formacao"),
      "id_formacao", "nome_formacao", Cols.normalizeText))
    val fatoFormacao =
      if (fPlans.isEmpty)
        emptyDf(spark, "id_inquerito" -> LongType, "id_formacao" -> LongType,
          "n_formandos" -> IntegerType)
      else long(valid, fPlans, "int")
        .filter(col("value").isNotNull && col("value") >= 0)
        .join(rid2inq, Readers.RowId)
        .join(broadcast(dimFormacao
            .select(col("id_formacao"), Cols.normalizeText(col("nome_formacao")).as("__k"))),
          Cols.normalizeText(col("label")) === col("__k"))
        .select(col("id_inquerito"), col("id_formacao"), col("value").as("n_formandos"))

    // ---- M2 interests + comment fusion (X8/X9, J9) -------------------
    val iPlans = result.colsOfGroup("interesses").filter(_.role == LabelOps.Interest)
    val cPlans = result.colsOfGroup("interesses").filter(_.role == LabelOps.InterestComment)

    val dimArea = cached(dimGetOrCreate(
      None, iPlans.map(_.label).distinct.toDF("nome_area"),
      "id_area_tematica", "nome_area", c => c))

    val (fatoInteresse, comentario) =
      if (iPlans.isEmpty)
        (emptyDf(spark, "id_resposta" -> LongType, "id_inquerito" -> LongType,
          "id_area_tematica" -> LongType, "tem_interesse" -> IntegerType,
          "n_formandos" -> IntegerType, "comentario" -> StringType),
         emptyDf(spark, "id_resposta" -> LongType, "texto_comentario" -> StringType))
      else {
        val iLong = long(valid, iPlans, "double")
          .filter(col("value").isNotNull && col("value") > 0)
        val cLong =
          if (cPlans.isEmpty)
            emptyDf(spark, Readers.RowId -> LongType, "label" -> StringType,
              "texto_raw" -> StringType)
          else long(valid, cPlans, "string",
              labelOf = p => LabelOps.interestLabelOfComment(p.label, commentKeys))
            .filter(col("value").isNotNull && trim(col("value")) =!= "")
            .select(col(Readers.RowId), col("label"), trim(col("value")).as("texto_raw"))

        val fused = iLong
          .join(cLong, Seq(Readers.RowId, "label"), "left_outer")
          .join(rid2inq, Readers.RowId)
          .join(broadcast(dimArea), col("label") === col("nome_area"))
          .withColumn("n_formandos",
            when(col("texto_raw").isNotNull && Cols.isNumericString(col("texto_raw")),
              col("texto_raw").try_cast("double").cast("int"))
              .otherwise(col("value").cast("int")))
          .withColumn("comentario_texto",
            when(col("texto_raw").isNotNull && !Cols.isNumericString(col("texto_raw")),
              col("texto_raw")))

        // DenseIds: resposta ids follow the reference's (row, column)
        // insert order — single-partition window, survey-scale only.
        // ScalableIds: unique ids, no window (see object scaladoc).
        val interesse = cached(idStrategy match {
          case DenseIds => fused.withColumn("id_resposta",
            // constant partition key: declared single-task window, same
            // execution as bare orderBy (see SurrogateKeys.dense)
            row_number().over(Window.partitionBy(lit(0))
                .orderBy(col(Readers.RowId).asc, col("pos").asc))
              .cast("long"))
          case ScalableIds => SurrogateKeys.scalable(fused, "id_resposta")
        })

        (interesse.select(
            col("id_resposta"), col("id_inquerito"), col("id_area_tematica"),
            lit(1).as("tem_interesse"), col("n_formandos"),
            col("comentario_texto").as("comentario")),
         interesse
           .filter(col("comentario_texto").isNotNull)
           .select(col("id_resposta"),
             explode(Cols.splitSentences(col("comentario_texto"))).as("texto_comentario")))
      }

    // ---- M3 preferences ---------------------------------------------
    val pPlans = result.colsOfGroup("tipo de ensino")
    val dimPreferencia = cached(dimGetOrCreate(
      None, pPlans.map(_.label).distinct.toDF("descricao_preferencia"),
      "id_preferencia", "descricao_preferencia", c => c))
    val fatoPreferencia =
      if (pPlans.isEmpty)
        emptyDf(spark, "id_inquerito" -> LongType, "id_preferencia" -> LongType,
          "valor_preferencia" -> IntegerType)
      else long(valid, pPlans, "int").filter(col("value").isNotNull)
        .join(rid2inq, Readers.RowId)
        .join(broadcast(dimPreferencia), col("label") === col("descricao_preferencia"))
        .select(col("id_inquerito"), col("id_preferencia"),
          col("value").as("valor_preferencia"))

    // ---- M4 availability (J6/J7, P6) ---------------------------------
    val dPlans = result.colsOfGroup("disponibilidade")
    // label -> (descricao from brackets, tipo from prefix match) is pure
    // label logic, driver-side like the reference (etl_ui.py:613-623)
    val horarioOfLabel: Map[String, (String, Option[Long])] = dPlans.map { p =>
      val tipo = tiposDisp.find(td =>
        p.label.startsWith(TextNorm.normalize(s"${td.descricao} -"))).map(_.id)
      p.label -> ((TextNorm.extractBrackets(p.label), tipo))
    }.toMap

    val exHor = existingHorario
      .getOrElse(emptyDf(spark, "id_horario" -> LongType,
        "descricao_horario" -> StringType, "id_tipo_disp" -> LongType))
      .select(col("id_horario").cast("long").as("id_horario"),
        col("descricao_horario"), col("id_tipo_disp").cast("long").as("id_tipo_disp"))
    val horarioNeeded = dPlans
      .map(p => horarioOfLabel(p.label))
      .map { case (d, t) => (d, t.map(java.lang.Long.valueOf).orNull) }
      .distinct
      .toDF("descricao_horario", "id_tipo_disp")
      .select(col("descricao_horario"), col("id_tipo_disp").cast("long").as("id_tipo_disp"))
    // null-safe keys throughout: a label with no matching type prefix
    // yields id_tipo_disp = NULL, which must still match its dim row
    val exHorK = exHor.select(col("descricao_horario").as("__eh_desc"),
      col("id_tipo_disp").as("__eh_tipo"))
    val freshHor = horarioNeeded.join(exHorK,
      col("descricao_horario") <=> col("__eh_desc") &&
        col("id_tipo_disp") <=> col("__eh_tipo"), "left_anti")
    val maxHor = exHor.agg(coalesce(max(col("id_horario")), lit(0L)).as("__m"))
    val dimHorario = cached(exHor.unionByName(
      SurrogateKeys.dense(freshHor, "id_horario",
          Seq(col("descricao_horario").asc, col("id_tipo_disp").asc_nulls_last))
        .crossJoin(broadcast(maxHor))
        .select((col("id_horario") + col("__m")).cast("long").as("id_horario"),
          col("descricao_horario"), col("id_tipo_disp"))))

    val fatoDisponibilidade =
      if (dPlans.isEmpty)
        emptyDf(spark, "id_inquerito" -> LongType, "id_horario" -> LongType,
          "tem_disponibilidade" -> IntegerType)
      else {
        val descEntries = dPlans.flatMap(p => Seq(lit(p.label), lit(horarioOfLabel(p.label)._1)))
        val tipoEntries = dPlans.flatMap(p => Seq(lit(p.label),
          lit(horarioOfLabel(p.label)._2.map(java.lang.Long.valueOf).orNull).cast("long")))
        val dh = dimHorario.select(col("id_horario"),
          col("descricao_horario").as("__dh_desc"), col("id_tipo_disp").as("__dh_tipo"))
        long(valid, dPlans, "int").filter(col("value").isNotNull)
          .withColumn("descricao_horario", element_at(map(descEntries: _*), col("label")))
          .withColumn("id_tipo_disp", element_at(map(tipoEntries: _*), col("label")))
          .join(rid2inq, Readers.RowId)
          .join(broadcast(dh),
            col("descricao_horario") <=> col("__dh_desc") &&
              col("id_tipo_disp") <=> col("__dh_tipo"))
          .select(col("id_inquerito"), col("id_horario"),
            col("value").as("tem_disponibilidade"))
      }

    Star(
      fatoInquerito = inq.drop(Readers.RowId),
      dimFormacao = dimFormacao,
      fatoFormacao = fatoFormacao,
      dimAreaTematica = dimArea,
      fatoInteresse = fatoInteresse,
      comentario = comentario,
      dimPreferencia = dimPreferencia,
      fatoPreferencia = fatoPreferencia,
      dimHorario = dimHorario,
      fatoDisponibilidade = fatoDisponibilidade,
      caches = caches.toSeq)
  }
}
