package graft.tools

import org.apache.spark.sql.SparkSession

/** Times a single SparkEntry query: runMain graft.tools.BenchOne <name> [sfDir] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules", graft.Sessions.ExcludedOptimizerRules)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"[bench1] $name rows=$n  ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
