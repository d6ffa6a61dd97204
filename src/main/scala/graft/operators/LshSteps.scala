package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._


/** Throwaway r14 experiment: lshCore (q24 parameters) stage by stage,
  * with row counts, to locate the verify-stage task time. Lives in the
  * operators package (not graft.tools) because it drives
  * private[operators] kernels directly; the file moved under
  * src/.../operators/ to match (ADVICE r14).
  */
object LshSteps {
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
      .select($"doc_id", $"text")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lshsteps] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    (1 to 2).foreach { round =>
      println(s"[lshsteps] === round $round ===")
      val sh = docs.select($"doc_id",
        TextDedup.shingleHashesPortable($"text", 3).as("__sh")).persist()
      time("shingle hashes")(println(s"[lshsteps]   docs=${sh.count()}"))
      // stop set (ratio 0.5, minDocFreq 1000 => 2500 bar at 5000 docs)
      val stop = time("stop set")(
        sh.select(explode($"__sh").as("__h")).groupBy("__h").count()
          .filter($"count" > 2500).select("__h").collect().map(_.getLong(0)))
      println(s"[lshsteps]   stop=${stop.length}")
      val stopSet = stop.toSet
      val pruneF = udf((hs: Seq[Long]) =>
        if (hs == null) null else hs.filterNot(stopSet.contains).toArray)
      val shP = sh.withColumn("__sh", pruneF($"__sh")).persist()
      time("prune")(shP.count())
      sh.unpersist()
      val banded = shP.select($"doc_id",
        udf(TextDedup.sigFromHashesKernel(64, 42L)).apply($"__sh").as("__sig"))
        .select($"doc_id",
          posexplode(transform(sequence(lit(0), lit(15)),
            b => concat_ws(",", transform(slice($"__sig", b * 4 + 1, lit(4)), _.cast("string")))))
            .as(Seq("__band", "__bucket")))
        .persist()
      val bucketSizes = banded.groupBy("__band", "__bucket").count().persist()
      time("band+bucket sizes")(println(s"[lshsteps]   buckets=${bucketSizes.count()}"))
      val small = bucketSizes.filter($"count" <= 2000).select("__band", "__bucket")
      val pruned = banded.join(small, Seq("__band", "__bucket"))
      val raw = SelfJoin.pairsWithinGroups(pruned, Seq("__band", "__bucket"), "doc_id", Seq.empty, 500)
      val cands = raw.select($"id_a", $"id_b").distinct().persist()
      time("candidates")(println(s"[lshsteps]   cands=${cands.count()}"))
      val joined = cands
        .join(shP.select($"doc_id".as("id_a"), $"__sh".as("__sh_a")), "id_a")
        .join(shP.select($"doc_id".as("id_b"), $"__sh".as("__sh_b")), "id_b")
        .persist()
      time("verify joins only")(println(s"[lshsteps]   joined=${joined.count()}"))
      val result = joined
        .withColumn("jaccard", TextDedup.jaccard($"__sh_a", $"__sh_b"))
        .filter($"jaccard" >= 0.7)
      time("jaccard+filter")(println(s"[lshsteps]   pairs=${result.count()}"))
      Seq(shP, banded, bucketSizes, cands, joined).foreach(_.unpersist(true))
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
