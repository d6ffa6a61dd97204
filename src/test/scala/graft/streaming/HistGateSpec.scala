package graft.streaming

import graft.SparkSpec
import graft.operators.Quantiles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The percentile-accounting gate's contract (T93): after every batch
  * the live artifact equals a from-scratch histIndex over everything
  * ingested so far; exact quantiles read off it at any moment; batches
  * pass through untouched; the durable checkpoint reopens to the live
  * artifact; the discrete-value cap fails typed; and the gate composes
  * under a real file stream.
  */
class HistGateSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"lang", length($"text").cast("long").as("len"))

  private def hist(df: DataFrame) = Quantiles.histIndex(df, "lang", "len")

  private def same(a: DataFrame, b: DataFrame): Boolean =
    a.collect().map(_.toSeq).toSet == b.collect().map(_.toSeq).toSet

  test("every batch: live artifact == histIndex over corpus-so-far; quantiles exact; batch untouched") {
    val kept = docs.filter($"doc_id" % 4 === 0)
    val gate = new HistGate.Gate(hist(kept), "lang", "len")
    var soFar = kept
    for (k <- Seq(1, 2, 3)) {
      val batch = docs.filter($"doc_id" % 4 === k)
      val out = gate.accountBatch(batch)
      assert(out.exceptAll(batch).isEmpty && batch.exceptAll(out).isEmpty,
        "accounting must observe, never filter")
      soFar = soFar.unionByName(batch)
      assert(same(hist(soFar), gate.currentHist),
        "live artifact must equal a from-scratch build over everything ingested")
    }
    // exact quantiles off the live artifact == the direct operator
    val qs = Seq(0.25, 0.5, 0.9, 0.99)
    assert(same(gate.quantiles(qs), Quantiles.exactQuantiles(soFar, "lang", "len", qs)))
  }

  test("checkpoint artifact reopens in a fresh session and seeds a recovered gate") {
    val dir = java.nio.file.Files.createTempDirectory("histgate").toString
    val b1 = docs.filter($"doc_id" % 3 === 1)
    val b2 = docs.filter($"doc_id" % 3 === 2)
    val g1 = new HistGate.Gate(hist(docs.filter($"doc_id" % 3 === 0)),
      "lang", "len", checkpointPath = Some(dir), checkpointEvery = 1)
    g1.accountBatch(b1)
    assert(g1.lastCheckpoint.isDefined)
    // "crash" before b2; recover in a fresh session and replay it
    val s2 = spark.newSession()
    val recovered = new HistGate.Gate(
      HistGate.latestCheckpoint(s2, dir).get, "lang", "len")
    recovered.accountBatch {
      import s2.implicits._
      s2.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select($"doc_id", $"lang", length($"text").cast("long").as("len"))
        .filter($"doc_id" % 3 === 2)
    }
    val want = hist(docs).collect().map(_.toSeq).toSet
    assert(recovered.currentHist.collect().map(_.toSeq).toSet == want,
      "recovery must be bit-equal to the never-crashed fold")
  }

  test("discrete-value contract is ENFORCED: a continuous value column fails typed at the cap") {
    val fine = new HistGate.Gate(hist(docs), "lang", "len", maxRows = 5000)
    fine.accountBatch(docs.limit(1))
    val tight = new HistGate.Gate(
      Quantiles.histIndex(docs.select($"lang", $"doc_id".as("len")), "lang", "len"),
      "lang", "len", maxRows = 100)
    val e = intercept[IllegalArgumentException] {
      tight.accountBatch(docs.limit(1))
    }
    assert(e.getMessage.contains("DISCRETE"))
  }

  test("continuous values compose (T95): pre-bin, gate on bins under a cap the raw column blows, interval read off the gate") {
    val width = 0.25
    val cont = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"lang",
        (length($"text").cast("double") /
          size(split($"text", " ")).cast("double")).as("cpt"))
    def binned(d: DataFrame) =
      d.select($"doc_id", $"lang", floor($"cpt" / width).cast("long").as("bin"))
    // the motivation, demonstrated: the RAW continuous column fails the
    // same cap typed (distinct (lang, cpt) is corpus-sized)...
    val rawGate = new HistGate.Gate(
      Quantiles.histIndex(cont.filter($"doc_id" % 2 === 0), "lang", "cpt"),
      "lang", "cpt", maxRows = 100)
    assert(intercept[IllegalArgumentException] {
      rawGate.accountBatch(cont.filter($"doc_id" % 2 =!= 0))
    }.getMessage.contains("DISCRETE"))
    // ...while the pre-binned stream fits with room (occupied cells,
    // not value cardinality) and folds exactly
    val gate = new HistGate.Gate(
      Quantiles.histIndex(binned(cont.filter($"doc_id" % 2 === 0)), "lang", "bin"),
      "lang", "bin", maxRows = 100)
    gate.accountBatch(binned(cont.filter($"doc_id" % 2 =!= 0)))
    // the gate artifact IS a T95 binned artifact once the frozen grid
    // is attached: the interval read off the gate equals the one-shot
    // binnedIndex over everything ingested
    val qs = Seq(0.25, 0.5, 0.9, 0.99)
    assert(same(
      Quantiles.quantilesOfBinned(
        gate.currentHist.withColumn("bin_width", lit(width)), "lang", qs),
      Quantiles.quantilesOfBinned(
        Quantiles.binnedIndex(cont, "lang", "cpt", width), "lang", qs)))
  }

  test("under a real file stream: final artifact == histIndex over initial + all streamed batches") {
    val kept = docs.filter($"doc_id" % 3 === 0)
    val dir = java.nio.file.Files.createTempDirectory("histgate_stream").toString
    (1 to 2).foreach { k =>
      docs.filter($"doc_id" % 3 === k).coalesce(1)
        .write.parquet(s"$dir/in/b$k.parquet")
    }
    val gate = new HistGate.Gate(hist(kept), "lang", "len")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*/")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        gate.accountBatch(batch).write.mode("append").parquet(s"$dir/out")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()
    assert(same(hist(docs), gate.currentHist))
    val sunk = spark.read.parquet(s"$dir/out")
    val streamedSide = docs.filter($"doc_id" % 3 =!= 0)
    assert(sunk.exceptAll(streamedSide).isEmpty && streamedSide.exceptAll(sunk).isEmpty)
  }
}
