package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextDedup

/** One-off stage timing for the MinHash LSH pipeline (sf0.1 documents). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules", graft.Sessions.ExcludedOptimizerRules)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    println(s"[prof] docs = ${docs.count()}")

    val sig = docs.select($"doc_id",
      TextDedup.minHashSignature($"text", 3, 64).as("sig")).persist()
    time("signatures")(sig.count())

    val banded = sig.select($"doc_id",
      posexplode(transform(sequence(lit(0), lit(15)),
        b => hash(slice($"sig", b * 4 + 1, lit(4)), b))).as(Seq("band", "bucket")))
    val l = banded.select($"doc_id".as("a"), $"band", $"bucket")
    val r = banded.select($"doc_id".as("b"), $"band", $"bucket")
    val candD = l.join(r, Seq("band", "bucket")).filter($"a" < $"b")
      .select("a", "b").distinct().persist()
    time("candidates distinct")(println(s"[prof]   n_cand = ${candD.count()}"))

    // verify directly on hashed-int shingles
    val shI = docs.select($"doc_id",
      array_sort(array_distinct(transform(TextDedup.shingles($"text", 3), s => hash(s))))
        .as("sh")).persist()
    time("int shingles")(shI.count())
    val verI = candD
      .join(shI.select($"doc_id".as("a"), $"sh".as("sha")), "a")
      .join(shI.select($"doc_id".as("b"), $"sh".as("shb")), "b")
      .withColumn("j", TextDedup.jaccard($"sha", $"shb"))
      .filter($"j" >= 0.7)
    time("verify int-shingle")(println(s"[prof]   n_pairs = ${verI.count()}"))
    spark.stop()
  }
}
