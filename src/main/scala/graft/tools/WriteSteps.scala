package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** Throwaway r14 experiment: writeWithManifest decomposition. */
object WriteSteps {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules", graft.Sessions.ExcludedOptimizerRules)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = spark.read.parquet(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1") + "/documents.parquet")
      .select($"doc_id", $"lang", $"text")
    val packed = Sampling.assignSplit(docs, "doc_id", 0.8, 0.1, "split").persist()
    packed.count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[wsteps] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    (1 to 2).foreach { round =>
      println(s"[wsteps] === round $round ===")
      val path = java.nio.file.Files.createTempDirectory("graft_wsteps").toString
      time("data write partitionBy")(
        packed.write.mode("overwrite").partitionBy("split").parquet(s"$path/data"))
      time("manifest build+write")(
        Manifest.build(packed, "split", Seq("doc_id", "text"), length($"text"))
          .write.mode("overwrite").parquet(s"$path/manifest"))
      time("readVerified")(
        Manifest.readVerified(spark, path, "split", Seq("doc_id", "text"),
          length($"text")).count())
      time("plain write (no partitionBy)")(
        packed.write.mode("overwrite").parquet(s"$path/plain"))
    }
    spark.stop()
  }
}
