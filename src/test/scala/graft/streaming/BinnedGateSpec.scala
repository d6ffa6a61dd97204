package graft.streaming

import graft.SparkSpec
import graft.operators.Quantiles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The in-gate binning gate's contract (T98): after every batch the
  * live artifact equals a from-scratch binnedIndex over everything
  * ingested; interval quantiles read off the gate; a drifted restart
  * width fails typed at construction; the continuous stream that blows
  * HistGate's cap fits here; an empty seed freezes the grid at the
  * gate's width; and the gate composes under a real file stream with a
  * durable checkpoint.
  */
class BinnedGateSpec extends SparkSpec {
  import spark.implicits._

  private val width = 0.25

  private def cont = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"lang",
      (length($"text").cast("double") /
        size(split($"text", " ")).cast("double")).as("cpt"))

  private def binned(d: DataFrame) = Quantiles.binnedIndex(d, "lang", "cpt", width)

  private def same(a: DataFrame, b: DataFrame): Boolean =
    a.collect().map(_.toSeq).toSet == b.collect().map(_.toSeq).toSet

  test("every batch: live artifact == binnedIndex over corpus-so-far; interval quantiles; batch untouched") {
    val kept = cont.filter($"doc_id" % 4 === 0)
    val gate = new BinnedGate.Gate(binned(kept), "lang", "cpt", width)
    var soFar = kept
    for (k <- Seq(1, 2, 3)) {
      val batch = cont.filter($"doc_id" % 4 === k)
      val out = gate.accountBatch(batch)
      assert(out.exceptAll(batch).isEmpty && batch.exceptAll(out).isEmpty,
        "accounting must observe, never filter")
      soFar = soFar.unionByName(batch)
      assert(same(binned(soFar), gate.currentBinned),
        "live artifact must equal a from-scratch binnedIndex over everything ingested")
    }
    val qs = Seq(0.25, 0.5, 0.9, 0.99)
    assert(same(gate.quantiles(qs),
      Quantiles.quantilesOfBinned(binned(soFar), "lang", qs)))
  }

  test("grid discipline: drifted restart width and mixed-grid seed fail typed BEFORE any batch") {
    val seed = binned(cont.filter($"doc_id" % 2 === 0))
    val drift = intercept[IllegalArgumentException] {
      new BinnedGate.Gate(seed, "lang", "cpt", width = 0.5)
    }
    assert(drift.getMessage.contains("mismatch") && drift.getMessage.contains("0.25"))
    val mixedSeed = seed.unionByName(
      Quantiles.binnedIndex(cont.filter($"doc_id" % 2 =!= 0), "lang", "cpt", 0.5))
    assert(intercept[IllegalArgumentException] {
      new BinnedGate.Gate(mixedSeed, "lang", "cpt", width)
    }.getMessage.contains("mixed bin grids"))
  }

  test("the continuous stream that blows HistGate's 100-row cap fits the binned gate") {
    // HistGateSpec pins the raw side of this pair: the same cpt column
    // through HistGate at maxRows = 100 fails typed (distinct
    // (lang, cpt) is corpus-sized). In-gate binning makes the cap a
    // real bound: occupied cells, not value cardinality.
    val gate = new BinnedGate.Gate(
      binned(cont.filter($"doc_id" % 2 === 0)), "lang", "cpt", width, maxRows = 100)
    gate.accountBatch(cont.filter($"doc_id" % 2 =!= 0))
    assert(same(gate.currentBinned, binned(cont)))
  }

  test("from-scratch: empty seed freezes the grid at the gate width; all-excluded first batch is a no-op") {
    val gate = new BinnedGate.Gate(
      BinnedGate.emptyArtifact(spark, "lang", org.apache.spark.sql.types.StringType),
      "lang", "cpt", width)
    // all-null values onto the empty seed: a no-op, not a typed
    // empty-artifact crash
    gate.accountBatch(cont.withColumn("cpt", lit(null).cast("double")).limit(3))
    assert(gate.currentBinned.isEmpty)
    gate.accountBatch(cont.filter($"doc_id" % 2 === 0))
    gate.accountBatch(cont.filter($"doc_id" % 2 =!= 0))
    assert(same(gate.currentBinned, binned(cont)))
  }

  test("under a real file stream: final artifact == binnedIndex over initial + all batches; checkpoint reopens") {
    val dir = java.nio.file.Files.createTempDirectory("binnedgate_stream").toString
    val kept = cont.filter($"doc_id" % 3 === 0)
    (1 to 2).foreach { k =>
      cont.filter($"doc_id" % 3 === k).coalesce(1)
        .write.parquet(s"$dir/in/b$k.parquet")
    }
    val gate = new BinnedGate.Gate(binned(kept), "lang", "cpt", width,
      checkpointPath = Some(s"$dir/ckpt"), checkpointEvery = 1)
    val stream = spark.readStream.schema(cont.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*/")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        gate.accountBatch(batch); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()
    assert(same(gate.currentBinned, binned(cont)))
    assert(gate.lastCheckpoint.isDefined)
    // the durable artifact reopens in a fresh session and seeds a
    // recovered gate — whose constructor re-validates the frozen grid
    val s2 = spark.newSession()
    val recovered = new BinnedGate.Gate(
      BinnedGate.latestCheckpoint(s2, s"$dir/ckpt").get, "lang", "cpt", width)
    assert(recovered.currentBinned.collect().map(_.toSeq).toSet ==
      gate.currentBinned.collect().map(_.toSeq).toSet)
  }
}
