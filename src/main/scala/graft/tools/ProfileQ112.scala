package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** One-off stage timing of the q112 incremental-release lifecycle
  * (sf0.01 documents, bench CPU count) — locates the composite's wall
  * inside init / append / verified-reopen, and inside init's own
  * stages. Run twice to separate cold JIT/IO from the steady floor.
  */
object ProfileQ112 {
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

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    (1 to 2).foreach { rnd =>
      println(s"[prof] === round $rnd ===")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val path = java.nio.file.Files.createTempDirectory("graft_prof112")
        .toString + "/rel"
      val p = Release.ReleaseParams(
        curation = Curation.CurationParams(
          minQuality = 0.0, maxRepetition = 1.0,
          lshThreshold = 0.6, maxContamination = 0.5,
          portableHash = true, minDocFreq = 0L),
        trainFrac = 0.8, valFrac = 0.1,
        leakageN = 13, maxOverlapNgrams = 100L)
      val bench = docs.filter($"doc_id" % 97 === 0)
      def half(even: Boolean) = docs
        .filter($"doc_id" % 97 =!= 0 && ($"doc_id" % 2 === 0) === even)
        .select($"doc_id", $"lang", $"text")

      val st1 = time("initIncremental")(Release.initIncremental(
        half(even = true), bench, "doc_id", "text", "lang", path, p))
      val (st2, _) = time("appendTurn")(Release.appendTurn(
        st1, half(even = false), bench, "doc_id", "text", "lang", p))
      st1.unpersist(); st2.unpersist()
      val reopened = time("open(readVerified)")(
        Release.open(spark, path, "doc_id", "text")
          .select($"doc_id", $"lang", $"split")
          .orderBy("doc_id"))
      time("collect")(reopened.collect())
    }
    spark.stop()
  }
}
