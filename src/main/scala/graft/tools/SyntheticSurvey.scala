package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared synthetic wide-survey generator for the scale harnesses. */
object SyntheticSurvey {
  val nEntities = 50000L

  def registry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.range(nEntities).select(
      ($"id" + 1).as("id_entidades"),
      concat(lit("Entidade "), $"id").as("ent_nome"),
      when($"id" % 2 === 0, "municipios").otherwise("freguesias").as("ent_tipo"))
  }

  def survey(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).select(
      (when($"id" % 100 === 7, lit(null))
        .when($"id" % 100 === 8, concat(lit("Fantasma "), $"id"))
        .otherwise(concat(lit("Município de Entidade "), ($"id" % (nEntities * 11 / 10)) * 2)))
        .cast("string").as("Nome da Entidade"),
      lit("Câmara Municipal").as("Tipo de Entidade"),
      concat(lit("Resp "), $"id").as("Nome do Responsável"),
      when($"id" % 3 === 0, "Sim").otherwise("Não").as("Existe Responsável"),
      ($"id" % 101).cast("string").as("Percentagem Preenchido"),
      date_format(timestamp_seconds(lit(1700000000L) + $"id" % 3600), "yyyy-MM-dd HH:mm:ss").as("Hora de início"),
      date_format(timestamp_seconds(lit(1700000000L) + $"id" % 3600 + 600), "yyyy-MM-dd HH:mm:ss").as("Hora de conclusão"),
      date_format(timestamp_seconds(lit(1700100000L)), "yyyy-MM-dd HH:mm:ss").as("Data de submissão"),
      ($"id" % 30).cast("string").as("Quantos formandos [Excel Avançado]"),
      ($"id" % 7).cast("string").as("Quantos formandos [SIG Municipal]"),
      when($"id" % 5 === 0, "garbage").otherwise(($"id" % 9).cast("string")).as("Quantos formandos [Gestão]"),
      ($"id" % 4).cast("string").as("Quantos formandos [Atendimento]"),
      when($"id" % 2 === 0, "Sim").otherwise("Não").as("Liderança"),
      when($"id" % 11 === 0, ($"id" % 40).cast("string"))
        .when($"id" % 7 === 0, lit("Muito útil. Repetir!")).as("Liderança [comentario]"),
      ($"id" % 25).cast("string").as("Nº de formandos previstos Liderança"),
      when($"id" % 3 === 0, "Sim").otherwise("Não").as("Inovação"),
      lit(null).cast("string").as("Inovação [comentario]"),
      ($"id" % 12).cast("string").as("Nº de formandos previstos Inovação"),
      when($"id" % 2 === 0, "Sim").otherwise("Não").as("Presencial - [Dias úteis - manhã]"),
      when($"id" % 3 === 0, "Sim").otherwise("Não").as("Presencial - [Sábado]"),
      when($"id" % 5 === 0, "talvez").otherwise("Sim").as("Online - [Dias úteis - manhã]"),
      when($"id" % 7 === 0, "Não").otherwise("Sim").as("Online - [Sábado]"),
      ($"id" % 5 + 1).cast("string").as("Preferência: Presencial"),
      ($"id" % 5 + 1).cast("string").as("Preferência: E-learning"),
      ($"id" % 5 + 1).cast("string").as("Preferência: B-learning"))
  }

  def config: graft.etl.EtlConfig =
    graft.etl.Fixtures.config.copy(groups = Map(
      "identificacao" -> graft.etl.GroupRange(1, 8),
      "formacoes" -> graft.etl.GroupRange(9, 12),
      "interesses" -> graft.etl.GroupRange(13, 18),
      "disponibilidade" -> graft.etl.GroupRange(19, 22),
      "tipo de ensino" -> graft.etl.GroupRange(23, 25)))
}
