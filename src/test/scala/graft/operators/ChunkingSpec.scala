package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Token-window chunking contracts: exact window geometry, the
  * partition/overlap/gap regimes, reconstruction at stride == size,
  * coverage at stride < size, the empty-text drop, and typed guards.
  */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq((1L, text)).toDF("doc_id", "text")

  private def chunks(text: String, size: Int, stride: Int): Seq[(Int, String, Int)] =
    TextAnalysis.chunkByTokens(one(text), "doc_id", "text", size, stride)
      .select($"chunk_idx", $"chunk_text", $"chunk_tokens")
      .as[(Int, String, Int)].collect().sortBy(_._1).toSeq

  test("window geometry: starts every stride, short tail, exact token counts") {
    // 10 tokens, size 4, stride 3 -> starts 0,3,6,9; tail lengths 4,4,4,1
    val got = chunks("a b c d e f g h i j", size = 4, stride = 3)
    assert(got == Seq(
      (0, "a b c d", 4), (1, "d e f g", 4), (2, "g h i j", 4), (3, "j", 1)))
  }

  test("stride == size partitions the stream: concat of chunks reconstructs the text") {
    val text = (1 to 23).map(i => s"t$i").mkString(" ")
    val got = chunks(text, size = 5, stride = 5)
    assert(got.map(_._3).sum == 23)
    assert(got.map(_._2).mkString(" ") == text)
    // chunk_idx contiguous from 0
    assert(got.map(_._1) == got.indices.map(identity))
  }

  test("stride < size: every token is covered; overlap is size - stride") {
    val n = 17
    val text = (0 until n).map(i => s"w$i").mkString(" ")
    val got = chunks(text, size = 6, stride = 2)
    // coverage: each token index in [start, start+6) for some start
    val covered = got.flatMap { case (idx, _, k) => (idx * 2) until (idx * 2 + k) }.toSet
    assert(covered == (0 until n).toSet)
    // consecutive full windows share exactly size - stride tokens
    val full = got.filter(_._3 == 6).map(_._2.split(" ").toSeq)
    full.sliding(2).foreach {
      case Seq(a, b) => assert(a.drop(2) == b.take(4))
      case _         =>
    }
  }

  test("stride > size leaves deliberate gaps (window sampling)") {
    val got = chunks("a b c d e f g h i j", size = 2, stride = 4)
    assert(got == Seq((0, "a b", 2), (1, "e f", 2), (2, "i j", 2)))
  }

  test("null / empty / whitespace-only texts produce no rows; whitespace normalizes") {
    val df = Seq(
      (1L, Option("  a\tb \n c  ")), (2L, Option("")), (3L, Option("   ")),
      (4L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkByTokens(df, "doc_id", "text", 16, 8)
      .select($"doc_id", $"chunk_text").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a b c")))
  }

  test("one window per ceil(n/stride): row counts on real data, no shuffle in the plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextAnalysis.chunkByTokens(docs, "doc_id", "text", 16, 8)
    val expect = docs.filter($"text".isNotNull)
      .select(ceil(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.filter(
          split($"text", "\\s+"), t => t =!= "")) / 8.0).cast("long").as("k"))
      .agg(sum($"k")).as[Long].head()
    assert(out.count() == expect)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("the same projection runs under a file stream (stateless, append mode)") {
    // chunking is a per-row projection + bounded explode — no state,
    // no watermark — so the identical call runs under readStream and
    // yields exactly the batch answer (the DecontaminationGate
    // discipline for stateless ops)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("chunk_stream").toString
    (0 to 2).foreach { k =>
      docs.filter($"doc_id" % 3 === k).coalesce(1)
        .write.parquet(s"$dir/in/b$k.parquet")
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*/")
    val q = TextAnalysis.chunkByTokens(stream, "doc_id", "text", 16, 8)
      .writeStream.outputMode("append").format("memory").queryName("chunk_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()
    val streamed = spark.table("chunk_out")
      .as[(Long, Int, String, Int)].collect().toSet
    val batch = TextAnalysis.chunkByTokens(docs, "doc_id", "text", 16, 8)
      .as[(Long, Int, String, Int)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("typed guards: size and stride must be positive") {
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.chunkByTokens(one("a"), "doc_id", "text", 0, 1)
    }.getMessage.contains("size"))
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.chunkByTokens(one("a"), "doc_id", "text", 4, 0)
    }.getMessage.contains("stride"))
  }
}
