package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** One-off stage timing of the q68 incremental-curation turn (sf0.1
  * slice, bench CPU count) — locates the composite's wall inside the
  * stage chain.
  */
object ProfileQ68 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules", graft.Sessions.ExcludedOptimizerRules)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    (1 to 2).foreach { rnd =>
      println(s"[prof] === round $rnd ===")
      val docs = spark.read.parquet(s"$dir/documents.parquet").filter($"doc_id" < 2000)
      val bench = docs.filter($"doc_id" % 97 === 0)
      val params = Curation.CurationParams(
        minQuality = 0.0, maxRepetition = 1.0, maxContamination = 0.5,
        lshThreshold = 0.6)
      val index = time("index build")(LshIndex.build(
        docs.filter($"doc_id" % 97 =!= 0 && $"doc_id" % 3 === 0),
        "doc_id", "text", n = 3))
      val incoming = docs.filter($"doc_id" % 97 =!= 0 && $"doc_id" % 3 =!= 0)

      val annotated = incoming
        .withColumn("quality", TextAnalysis.qualityScore($"text"))
        .withColumn("repetition", TextAnalysis.repetitionScore($"text", 3))
        .filter($"quality" >= 0.0 && $"repetition" <= 1.0)
      val exact = Dedup.exactByColumns(annotated, Seq("text"), "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("exact dedup")(exact.count())
      val pairs = TextDedup.minHashLshPairs(
        exact, "doc_id", "text", n = 3, threshold = 0.6,
        portableHash = false, minDocFreq = TextDedup.DefaultMinDocFreq)
      time("lsh pairs")(pairs.count())
      val clustered = ConnectedComponents.canonicalize(exact, pairs, "doc_id")
      val canon = clustered.filter($"is_canonical" === 1)
        .drop("cluster_id", "cluster_size", "is_canonical")
      time("cc canonicalize")(canon.count())
      val novel = LshIndex.dedupAgainst(index, canon, "doc_id", "text", threshold = 0.6)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("dedupAgainst probe")(novel.count())
      val contam = Contamination.ngramContamination(novel, bench, "doc_id", "text", 13)
      val clean = novel.join(
          contam.filter($"contamination" <= 0.5).select($"doc_id"),
          Seq("doc_id"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("decontaminate")(clean.count())
      val sampled = Sampling.stratifiedSample(clean, "doc_id", "lang", Map.empty, 1.0)
      time("sample")(sampled.count())
      time("final select")(
        sampled.select($"doc_id", round($"quality", 6), round($"repetition", 6))
          .orderBy("doc_id").count())
      val grown = time("append")(LshIndex.append(index, clean, "doc_id", "text"))
      grown.unpersist()
      val params2 = Curation.CurationParams(
        minQuality = 0.0, maxRepetition = 1.0, maxContamination = 0.5,
        lshThreshold = 0.6)
      time("curateIncremental(built)") {
        val r = Curation.curateIncremental(
          index, incoming, bench, "doc_id", "text", "lang", params2)
        r.curated.count(); r.unpersist()
      }
      val ixp = java.nio.file.Files.createTempDirectory("profq68").toString + "/ix"
      index.write.parquet(ixp)
      val reopened = spark.read.parquet(ixp)
      time("curateIncremental(reopen)") {
        val r = Curation.curateIncremental(
          reopened, incoming, bench, "doc_id", "text", "lang", params2)
        r.curated.count(); r.unpersist()
      }
      val s2 = spark.newSession()
      time("full Q fn")(
        graft.SparkEntry.queries("q68_incremental_curate")(s2, dir).count())
      Seq(exact, novel, clean).foreach(_.unpersist())
      index.unpersist()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
