package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Cols

/** Bisects the pipeline's expression stack on the synthetic survey. */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val n = 1000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules", graft.Sessions.ExcludedOptimizerRules)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pp] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val survey = SyntheticSurvey.survey(spark, n)
    time("gen only")(survey.count())
    val withId = graft.sources.Readers.withRowId(survey)
    time("+ withRowId")(withId.count())

    val plans = graft.etl.LabelOps.plan(
      withId.columns.filterNot(_ == "row_id").toSeq, SyntheticSurvey.config)
    val exprs = plans.map { p =>
      val c = col(s"`${p.originalName}`")
      val e = p.role match {
        case graft.etl.LabelOps.Identification => c
        case graft.etl.LabelOps.Measure if p.group == "formacoes" => Cols.validateNumeric(c)
        case graft.etl.LabelOps.Measure => c.cast("string").try_cast("double").try_cast("int")
        case graft.etl.LabelOps.Interest => Cols.simNao(c)
        case graft.etl.LabelOps.InterestComment => c
        case graft.etl.LabelOps.InterestFormandos => c
        case graft.etl.LabelOps.Availability => Cols.mapDisp(c)
      }
      e.as(p.uniqueName)
    }
    val selected = withId.select(col("row_id") +: exprs: _*)
    time("+ per-column transforms")(selected.count())

    val keyed = selected
      .withColumn("nome_entidade_norm", Cols.removePrefixes(col("nome_entidade")))
      .withColumn("entity_key", concat_ws("||",
        col("nome_entidade_norm"), Cols.normalizeText(lit("Câmara Municipal"))))
    time("+ keys")(keyed.count())

    val ts = keyed
      .withColumn("data_inicio", try_to_timestamp(col("data_inicio")))
      .withColumn("data_fim", try_to_timestamp(col("data_fim")))
      .withColumn("tempo", Cols.durationSeconds(col("data_inicio"), col("data_fim")))
      .withColumn("data_submissao", try_to_timestamp(col("data_submissao")))
    time("+ timestamps")(ts.count())

    time("persist keyed")( { val p = ts.persist(); p.count() } )
    spark.stop()
  }
}
