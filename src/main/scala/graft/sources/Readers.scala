package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StructType}

/** Sources (SURVEY.md §2.1). The reference reads one spreadsheet at a time
  * (etl_ui.py:858-862) and depends on row order for dedup ("keep first")
  * and for pairing facts to rows. Spark has no intrinsic row order, so the
  * readers here attach an explicit `row_id` in file order at ingest — the
  * one place order still exists — and everything downstream keys on it.
  */
object Readers {

  val RowId = "row_id"

  /** CSV survey source (S2): header row, every column ingested as string
    * (survey cells are heterogeneous; coercion happens per-column later,
    * mirroring the reference's pandas `object` frames). `multiLine` +
    * `escape="` match pandas' default quoting behavior — survey comment
    * cells legitimately contain newlines and quotes. multiLine makes a
    * single file non-splittable, which is irrelevant at spreadsheet
    * scale (and per-file parallelism still applies to directories).
    */
  def csv(spark: SparkSession, path: String): DataFrame =
    withRowId(
      spark.read
        .option("header", "true")
        .option("inferSchema", "false")
        .option("multiLine", "true")
        .option("escape", "\"")
        .csv(path))

  /** Parquet source (testdata / star-schema interchange). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Attach a dense 0-based ingest `row_id` preserving current row order.
    * `zipWithIndex` is order-stable per partition and across partitions
    * (unlike `monotonically_increasing_id`, whose values are not dense and
    * not join-stable across recomputes when partitioning changes).
    * One extra pass to count partitions, plus a full Tungsten exit —
    * acceptable at spreadsheet-ingest scale, the priciest line in the
    * pipeline at 100 TB. For file-backed bulk ingest use
    * [[parquetWithRowId]], which stays columnar (see SCALE.md §row_id).
    */
  def withRowId(df: DataFrame, idCol: String = RowId): DataFrame = {
    val rdd = df.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(
      rdd, df.schema.add(idCol, LongType, nullable = false))
  }

  /** Dense 0-based `row_id` for a parquet directory WITHOUT leaving
    * Tungsten: `row_id = base(file) + _metadata.row_index`, where the
    * per-file base offsets come from one column-pruned counting pass
    * (reads no data columns) and join back as a broadcast (one row per
    * file). Row order is (file_path ASC, position in file) — strictly
    * more deterministic than `zipWithIndex`, whose global order follows
    * Spark's partition packing (files sorted by SIZE, not name, so it
    * can change when a file grows). The tiny single-partition window
    * runs over #files rows, not data.
    */
  def parquetWithRowId(spark: SparkSession, path: String, idCol: String = RowId): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(path)
      .select(col("*"),
        col("_metadata.file_path").as("__file"),
        col("_metadata.row_index").as("__idx"))
    val offsets = df.groupBy(col("__file")).agg(count(lit(1)).as("__n"))
      .withColumn("__base",
        coalesce(sum(col("__n")).over(
          // constant partition key = declared single-task window over
          // #files rows (see SurrogateKeys.dense for the rationale)
          Window.partitionBy(lit(0)).orderBy("__file")
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__file"), col("__base"))
    df.join(broadcast(offsets), "__file")
      .withColumn(idCol, col("__base") + col("__idx"))
      .drop("__file", "__idx", "__base")
  }
}
