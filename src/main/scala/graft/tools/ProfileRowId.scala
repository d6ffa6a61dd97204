package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ingest row_id cost harness: times zipWithIndex-based
  * [[graft.sources.Readers.withRowId]] vs the columnar
  * [[graft.sources.Readers.parquetWithRowId]] on an nRows-row,
  * multi-file parquet directory.
  * Usage: runMain graft.tools.ProfileRowId [nRows] [files] [extraCols]
  * (extraCols widens the frame — the Tungsten-exit cost of zipWithIndex
  * scales with row width, the metadata path's does not.)
  */
object ProfileRowId {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    val files = args.lift(1).map(_.toInt).getOrElse(16)
    val extraCols = args.lift(2).map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules", graft.Sessions.ExcludedOptimizerRules)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-rowid").toString
    val base = Seq(
      $"id".as("k"),
      concat(lit("value for row "), $"id").as("v"),
      ($"id" % 997).cast("double").as("x"))
    val wide = (0 until extraCols).map(i =>
      concat(lit(s"survey answer column $i for respondent "), $"id").as(s"c$i"))
    spark.range(n).select(base ++ wide: _*)
      .repartition(files).write.mode("overwrite").parquet(dir)

    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val c = f
        println(f"[rowid] $label%-22s run$i ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$c")
      }
    }
    time("zipWithIndex") {
      graft.sources.Readers.withRowId(spark.read.parquet(dir))
        .agg(count(lit(1)), max("row_id")).collect()(0).getLong(0)
    }
    time("file-offset (metadata)") {
      graft.sources.Readers.parquetWithRowId(spark, dir)
        .agg(count(lit(1)), max("row_id")).collect()(0).getLong(0)
    }
    spark.stop()
  }
}
