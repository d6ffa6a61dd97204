package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** Throwaway r14 experiment: Release.build (q108 parameters) stage by
  * stage with forced materialization between stages, to locate the
  * release turn's wall. Forcing each boundary adds some wall vs the
  * fused single-action plan — read the per-stage numbers, not the sum.
  */
object ReleaseSteps {
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
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[relsteps] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    (1 to 2).foreach { round =>
      println(s"[relsteps] === round $round ===")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val bench = docs.filter($"doc_id" % 97 === 0)
      val train = docs.filter($"doc_id" % 97 =!= 0).select($"doc_id", $"lang", $"text")
      val cp = Curation.CurationParams(
        minQuality = 0.0, maxRepetition = 1.0,
        lshThreshold = 0.6, maxContamination = 0.5,
        portableHash = true, minDocFreq = 0L)
      val core = time("curateCore")(
        Curation.curateCore(train, bench, "doc_id", "text", cp))
      time("  (materialize core)")(core.docs.count())
      val split = Sampling.assignSplit(core.docs, "doc_id", 0.8, 0.1, "split")
      val deLeaked = Contamination.removeSplitLeakage(
        split, "doc_id", "text", "split", n = 13, maxOverlapNgrams = 100L)
        .persist()
      time("de-leak")(deLeaked.count())
      val corpus = Sampling.temperatureMix(
          deLeaked.filter($"split" === "train"), "doc_id", "lang", 1.0)
        .unionByName(deLeaked.filter($"split" =!= "train"))
        .persist()
      time("mix")(corpus.count())
      val packed = corpus.join(
        Packing.packSequences(corpus, "doc_id", "text", 512, 8), Seq("doc_id"))
        .persist()
      time("pack")(packed.count())
      val path = java.nio.file.Files.createTempDirectory("graft_relsteps").toString + "/rel"
      time("writeWithManifest")(
        Manifest.writeWithManifest(packed, path, "split", Seq("doc_id", "text"),
          length($"text")))
      time("dataCard write")(
        TextAnalysis.dataCard(corpus, "text", "lang")
          .write.mode("overwrite").parquet(s"$path/card"))
      time("readVerified")(
        Release.open(spark, path, "doc_id", "text").count())
      core.unpersist(); deLeaked.unpersist(); corpus.unpersist(); packed.unpersist()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    spark.stop()
  }
}
