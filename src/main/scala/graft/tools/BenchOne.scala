package graft.tools

import org.apache.spark.sql.SparkSession

/** Times SparkEntry queries in one JVM: runMain graft.tools.BenchOne
  * <name> [<name> ...] — pass the same name twice for cold + warm.
  *
  * Between runs every cache is dropped (context-level DataFrame caches
  * AND persistent RDDs), matching graft.Bench's hygiene. Without this,
  * a repeated query's analyzed plan matches the previous run's still-
  * live operator-internal persists and the context CacheManager
  * substitutes them wholesale — the "warm re-run" then skips the
  * actual compute and reports a cache READ (measured on q45: 1.8 s
  * with stale caches vs 4.2 s honest warm vs 13.5 s cold). That
  * phantom made BENCH_r06's honest warm numbers look inflated next to
  * BenchOne re-timings (r6 verdict "What's wrong" #1).
  */
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
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    spark.stop()
  }
}
