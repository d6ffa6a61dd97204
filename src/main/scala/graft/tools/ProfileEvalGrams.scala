package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Contamination, TextDedup}

/** Size record for the hashed eval-gram artifact (r12, VERDICT r11 #2):
  * builds the artifact over the held-out split of `documents` at the
  * given sfDir and prints its on-disk parquet size next to the size the
  * pre-r12 RAW-GRAM layout would have occupied (distinct 13-char gram
  * strings — rebuilt here inline for the comparison; the operator no
  * longer ships that form). Usage:
  * `runMain graft.tools.ProfileEvalGrams [sfDir]`
  */
object ProfileEvalGrams {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .appName("profile-evalgrams")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val eval = graft.operators.Sampling.assignSplit(
        docs.select($"doc_id", $"text"), "doc_id", trainFrac = 0.8, valFrac = 0.1)
      .filter($"split" =!= "train")

    def dirBytes(p: String): Long = {
      val d = new java.io.File(p)
      Option(d.listFiles()).map(_.filter(_.isFile).map(_.length()).sum).getOrElse(0L)
    }
    val tmp = java.nio.file.Files.createTempDirectory("evalgrams_size").toString

    val hashed = Contamination.evalGramIndex(eval, "text")
    hashed.write.parquet(s"$tmp/hashed")
    val nHashed = spark.read.parquet(s"$tmp/hashed")
      .filter($"kind" === Contamination.EvalGramKind).count()

    // the pre-r12 layout: one raw 13-char gram string per row
    eval.select(explode(TextDedup.shinglesKernel($"text", 13)).as("gram"))
      .distinct()
      .select(lit(Contamination.EvalGramKind).as("kind"), $"gram",
        lit(null).cast("int").as("n"))
      .write.parquet(s"$tmp/raw")

    val hb = dirBytes(s"$tmp/hashed")
    val rb = dirBytes(s"$tmp/raw")
    println(f"[evalgrams] sf=$sfDir grams=$nHashed%,d " +
      f"hashed=${hb / 1024.0 / 1024.0}%.2f MB raw=${rb / 1024.0 / 1024.0}%.2f MB " +
      f"ratio=${rb.toDouble / hb}%.2fx")
    spark.stop()
  }
}
