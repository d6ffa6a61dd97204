package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling curve for the two operators whose cost is driven by the full
  * corpus size rather than a bounded candidate set: q51 contamination
  * (gram explode + broadcast join) and q56 cross-corpus MinHash dedup
  * (shingle -> sign -> band -> verify over the union). Both are linear
  * on paper; this measures it past sf0.1 (VERDICT r5 ask #7).
  *
  * The corpus is sf0.1 `documents` unioned with id-shifted copies. Each
  * copy's text is passed through `translate` with a per-copy rotation of
  * the vowel+consonant alphabet, so copies are NOT near-duplicates of
  * each other: cross-copy Jaccard collapses while length, token shape
  * and the within-copy duplicate structure are preserved. That keeps the
  * per-row match density constant across factors — the scaling being
  * measured is the machinery (shuffles, explodes, bucket joins), not an
  * artificial quadratic pile-up of replica pairs.
  *
  * Usage: runMain graft.tools.ProfileScale [factors…]   (default 1 4 10)
  * Prints one line per (query, factor): rows, cold secs, warm secs.
  */
object ProfileScale {

  private val Alpha = "aeioubcdfglmnprst" // 17 chars -> 17 distinct rotations

  /** sf0.1 documents, `factor`-way replicated with disjoint ids and
    * per-copy de-correlated text.
    */
  def scaled(spark: SparkSession, sfDir: String, factor: Int): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val span = docs.agg(max("doc_id")).head.getLong(0) + 1
    (0 until factor).map { k =>
      val rot = Alpha.drop(k % Alpha.length) + Alpha.take(k % Alpha.length)
      docs.select(
        (col("doc_id") + lit(k * span)).as("doc_id"),
        (if (k == 0) col("text") else translate(col("text"), Alpha, rot)).as("text"),
        col("lang"))
    }.reduce(_ union _)
  }

  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 4, 10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val root = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules", graft.Sessions.ExcludedOptimizerRules)
      .getOrCreate()
    root.sparkContext.setLogLevel("ERROR")

    def timed(fn: SparkSession => DataFrame): (Long, Double, Double) = {
      def once(): (Long, Double) = {
        val s = root.newSession()
        val t0 = System.nanoTime()
        val n = fn(s).count()
        val secs = (System.nanoTime() - t0) / 1e9
        s.catalog.clearCache(); System.gc()
        (n, secs)
      }
      val (n, cold) = once()
      val (_, warm) = once()
      (n, cold, warm)
    }

    factors.foreach { f =>
      val (n51, cold51, warm51) = timed { s =>
        val docs = scaled(s, sfDir, f)
        graft.operators.Contamination.ngramContamination(
          docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0),
          idCol = "doc_id", textCol = "text", n = 13)
      }
      println(f"PROFILE q51_contamination factor=$f rows=$n51 cold=$cold51%.1f warm=$warm51%.1f")
      val (n56, cold56, warm56) = timed { s =>
        val docs = scaled(s, sfDir, f)
        graft.operators.TextDedup.minHashLshPairsAgainst(
          docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 =!= 0),
          idCol = "doc_id", textCol = "text",
          n = 3, numPerm = 64, bands = 16, threshold = 0.7,
          portableHash = true)
      }
      println(f"PROFILE q56_dedup_against factor=$f rows=$n56 cold=$cold56%.1f warm=$warm56%.1f")
    }
    root.stop()
  }
}
