package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}

import graft.etl.{Pipeline, StarLoader}

/** Sinks (SURVEY.md §2.1 S6/S7).
  *
  * The reference's load is row-at-a-time `INSERT ... RETURNING` over
  * psycopg2 (etl_ui.py:394-664) and a multi-sheet Excel export
  * (etl_ui.py:2144-2159). Here:
  *  - the star schema writes as parquet partitioned by `ano` — the batch
  *    year is the natural partition key, so per-year reprocessing
  *    overwrites one partition and dynamic partition pruning keeps
  *    year-scoped queries off the rest;
  *  - the same frames go to any JDBC database via `df.write.jdbc`
  *    (batched inserts, `batchsize` tuned, no per-row round trips);
  *  - the "multi-sheet" export becomes one directory per logical sheet
  *    (csv or parquet), which is what a spreadsheet tab is at scale.
  */
object Writers {

  /** Write every star-schema table under `root/<table>`, facts
    * partitioned by `ano` when present.
    */
  def writeStar(star: StarLoader.Star, root: String, format: String = "parquet"): Unit = {
    def w(df: DataFrame, name: String): Unit = {
      val base = df.write.mode(SaveMode.Overwrite).format(format)
      val withPart =
        if (df.columns.contains("ano")) base.partitionBy("ano") else base
      withPart.save(s"$root/$name")
    }
    w(star.fatoInquerito, "fato_inquerito")
    w(star.dimFormacao, "dim_formacao")
    w(star.fatoFormacao, "fato_formacao_inquerito")
    w(star.dimAreaTematica, "dim_area_tematica")
    w(star.fatoInteresse, "fato_interesse_area")
    w(star.comentario, "comentario")
    w(star.dimPreferencia, "dim_preferencia_ensino")
    w(star.fatoPreferencia, "fato_preferencia_ensino")
    w(star.dimHorario, "dim_horario")
    w(star.fatoDisponibilidade, "fato_disponibilidade_horaria")
  }

  /** S7 multi-sheet export: one csv directory per logical sheet —
    * the per-group frames plus `duplicados` / `entidades_invalidas` /
    * `all_data` (etl_ui.py:2144-2159).
    */
  def exportSheets(result: Pipeline.EtlResult, root: String): Unit = {
    def w(df: DataFrame, sheet: String): Unit =
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("header", "true").csv(s"$root/$sheet")
    result.plans.map(_.group).distinct.foreach { g =>
      val cols = "row_id" +: result.colsOfGroup(g).map(_.uniqueName)
      val present = cols.filter(result.valid.columns.contains)
      w(result.valid.selectExpr(present.map(c => s"`$c`"): _*), g)
    }
    w(result.duplicates, "duplicados")
    w(result.unmatched, "entidades_invalidas")
    w(result.valid, "all_data")
  }

  /** S7 export in the reference's actual artifact shape: ONE .xlsx
    * workbook with a tab per logical sheet (`pd.ExcelWriter`,
    * etl_ui.py:2144-2159) — the per-group frames plus `duplicados` /
    * `entidades_invalidas` / `all_data`.
    */
  def exportSheetsXlsx(result: Pipeline.EtlResult, path: String): Unit = {
    val groupSheets = result.plans.map(_.group).distinct.map { g =>
      val cols = "row_id" +: result.colsOfGroup(g).map(_.uniqueName)
      val present = cols.filter(result.valid.columns.contains)
      g -> result.valid.selectExpr(present.map(c => s"`$c`"): _*)
    }
    Xlsx.writeSheets(
      groupSheets ++ Seq(
        "duplicados" -> result.duplicates,
        "entidades_invalidas" -> result.unmatched,
        "all_data" -> result.valid),
      path)
  }

  /** S6 JDBC sink: batched writes, no RETURNING round-trips (surrogate
    * keys are pre-assigned by [[graft.operators.SurrogateKeys]]).
    *
    * Upsert strategy vs the reference: etl_ui.py:508-520 does row-at-a-
    * time `INSERT ... ON CONFLICT DO NOTHING RETURNING id` — one server
    * round-trip per row, the reference's de-facto bottleneck and a
    * PostgreSQL-only SQL form Spark's JDBC sink cannot emit. The port
    * inverts it: conflicts are resolved BEFORE the write
    * ([[graft.operators.SurrogateKeys.getOrCreate]] anti-joins incoming
    * keys against the scanned dimension state and assigns fresh ids
    * after the existing max), so the sink only ever appends
    * known-novel rows in `batchsize` batches. Same end state, no
    * per-row conflict arbitration on the server, and it works on any
    * dialect — verified end-to-end in JdbcSpec ("dim get-or-create
    * continues from database state"). The trade: the read-modify-write
    * must be the only writer of the dimension during a load (the
    * reference's Streamlit app holds the same assumption — single
    * operator, single session).
    *
    * PostgreSQL type fidelity: Spark's PostgresDialect writes StringType
    * as TEXT (not the reference DDL's VARCHAR(512) — semantically
    * identical in PostgreSQL); pass
    * `.option("createTableColumnTypes", "nome VARCHAR(512)")` for
    * byte-for-byte DDL parity. Mappings pinned in JdbcSpec.
    */
  def writeJdbc(
      df: DataFrame, url: String, table: String,
      props: Properties = new Properties(),
      batchSize: Int = 10000,
      mode: SaveMode = SaveMode.Append): Unit = {
    props.setProperty("batchsize", batchSize.toString)
    df.write.mode(mode).jdbc(url, table, props)
  }

  /** S3/S4 JDBC scan (the registry / dimension state reads). */
  def readJdbc(
      spark: org.apache.spark.sql.SparkSession,
      url: String, table: String,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Bucketed catalog table: pre-shuffles once at write time so that
    * repeated fact<->fact joins and aggregations on the bucket key plan
    * with NO exchange (the 100 TB answer to "this join shuffles every
    * run"). Both sides must be bucketed by the same key and count.
    */
  def writeBucketedTable(
      df: DataFrame, table: String, bucketCol: String, buckets: Int,
      sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(s => w.sortBy(s)).saveAsTable(table)
  }

  /** Re-run a year: overwrite ONLY that `ano` partition (dynamic
    * partition overwrite), leaving other years untouched — the
    * reprocessing story for the yearly survey batches.
    */
  def overwriteYearPartition(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ano")
      .parquet(path)
}
