package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Times Curation.curate end-to-end: runMain graft.tools.BenchCurate [sfDir] */
object BenchCurate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules", graft.Sessions.ExcludedOptimizerRules)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val secs = (info.completionTime.getOrElse(0L) - info.submissionTime.getOrElse(0L)) / 1000.0
        if (secs > 0.8)
          println(f"[stage] ${info.stageId}%4d ${secs}%7.1f s  tasks=${info.numTasks}  ${info.name.take(90)}")
      }
    })
    // The SF test table is one small parquet file -> a 1-partition
    // scan, which serializes the per-row kernel stages; a real corpus
    // scan yields one partition per maxPartitionBytes split. Repartition
    // to restore the parallelism the operator sees at scale.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    val t0 = System.nanoTime()
    val res = graft.operators.Curation.curate(
      train, bench, "doc_id", "text", "lang",
      graft.operators.Curation.CurationParams(
        minQuality = 0.0, maxRepetition = 1.0, maxContamination = 0.5))
    val n = res.docs.count()
    println(f"[curate] rows=$n  ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
