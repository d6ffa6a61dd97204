package graft.streaming

import graft.SparkSpec
import graft.operators.Manifest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The accounting gate's contract: after every batch, the live
  * manifest is bit-equal to a from-scratch build over everything
  * ingested so far; batches pass through untouched; the durable
  * checkpoint reopens to the same artifact; and the gate composes
  * under a real file stream.
  */
class ManifestGateSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text", $"lang")

  private def mf(df: DataFrame) =
    Manifest.build(df, "lang", Seq("doc_id", "text"), length($"text"))

  private def assertSame(a: DataFrame, b: DataFrame): Unit =
    assert(Manifest.diff(a, b, "lang").filter($"status" =!= "match").isEmpty)

  test("every batch: live manifest == build over corpus-so-far; batch passes untouched") {
    val kept = docs.filter($"doc_id" % 4 === 0)
    val gate = new ManifestGate.Gate(mf(kept), "lang",
      Seq("doc_id", "text"), length($"text"))
    var soFar = kept
    for (k <- Seq(1, 2, 3)) {
      val batch = docs.filter($"doc_id" % 4 === k)
      val out = gate.accountBatch(batch)
      assert(out.exceptAll(batch).isEmpty && batch.exceptAll(out).isEmpty,
        "accounting must observe, never filter")
      soFar = soFar.unionByName(batch)
      assertSame(mf(soFar), gate.currentManifest)
    }
  }

  test("gate state is driver-local: severed lineage, zero executor-resident blocks") {
    // the r10 ADVICE leak: localCheckpoint blocks are invisible to
    // CacheManager, so superseded manifests were freed only by GC on a
    // long stream. State is now a collected LocalRelation — nothing
    // lives in the executor block store at all, and the plan carries
    // no lineage back to prior batches.
    val gate = new ManifestGate.Gate(mf(docs.filter($"doc_id" % 2 === 0)),
      "lang", Seq("doc_id", "text"), length($"text"))
    gate.accountBatch(docs.filter($"doc_id" % 2 =!= 0))
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    assert(gate.currentManifest.queryExecution.analyzed.isInstanceOf[LocalRelation],
      "standing manifest must be a localized frame, not a lineage chain")
  }

  test("checkpoint artifact reopens to the live manifest in a fresh session") {
    val dir = java.nio.file.Files.createTempDirectory("mgate").toString
    val gate = new ManifestGate.Gate(
      mf(docs.filter($"doc_id" % 2 === 0)), "lang",
      Seq("doc_id", "text"), length($"text"),
      checkpointPath = Some(dir), checkpointEvery = 1)
    gate.accountBatch(docs.filter($"doc_id" % 2 =!= 0))
    assert(gate.lastCheckpoint.isDefined)
    val s2 = spark.newSession()
    val reopened = ManifestGate.latestCheckpoint(s2, dir)
    assert(reopened.isDefined)
    assertSame(mf(docs), reopened.get)
  }

  test("restart recovery: reopen the checkpoint, replay the missed batch, equal to never-crashed") {
    val dir = java.nio.file.Files.createTempDirectory("mgate_restart").toString
    val kept = docs.filter($"doc_id" % 3 === 0)
    val b1 = docs.filter($"doc_id" % 3 === 1)
    val b2 = docs.filter($"doc_id" % 3 === 2)
    // session 1: account b1, checkpoint, then "crash" before b2
    val g1 = new ManifestGate.Gate(mf(kept), "lang",
      Seq("doc_id", "text"), length($"text"),
      checkpointPath = Some(dir), checkpointEvery = 1)
    g1.accountBatch(b1)
    // session 2: recover from the durable artifact and account b2
    val s2 = spark.newSession()
    val recovered = new ManifestGate.Gate(
      ManifestGate.latestCheckpoint(s2, dir).get, "lang",
      Seq("doc_id", "text"), org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
    recovered.accountBatch {
      import s2.implicits._
      s2.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select($"doc_id", $"text", $"lang").filter($"doc_id" % 3 === 2)
    }
    // merge is exact, so recovery is bit-equal to the never-crashed run
    // (collect-compare: the reference frame lives in the crashed
    // session, the recovered one in s2 — cross-session joins are not
    // a thing)
    val want = mf(kept.unionByName(b1).unionByName(b2))
      .collect().map(_.toSeq).toSet
    val got = recovered.currentManifest.collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("dimension-size contract is ENFORCED: a high-cardinality group fails typed at the cap") {
    // the gate's state is driver-heap by design; a per-file-grain group
    // column on a long stream would grow it unboundedly (r11 ADVICE) —
    // crossing maxRows must fail typed, naming the contract, instead of
    // inching toward a driver OOM
    val fine = new ManifestGate.Gate(mf(docs), "lang",
      Seq("doc_id", "text"), length($"text"), maxRows = 100)
    fine.accountBatch(docs.limit(1)) // 5 langs << 100: passes
    val tight = new ManifestGate.Gate(
      Manifest.build(docs, "doc_id", Seq("doc_id", "text"), length($"text")),
      "doc_id", Seq("doc_id", "text"), length($"text"), maxRows = 100)
    val e = intercept[IllegalArgumentException] {
      tight.accountBatch(docs.limit(1))
    }
    assert(e.getMessage.contains("DIMENSION-grain"))
    assert(e.getMessage.contains("100"))
  }

  test("under a real file stream: final manifest == build over initial + all streamed batches") {
    val kept = docs.filter($"doc_id" % 3 === 0)
    val streamedSide = docs.filter($"doc_id" % 3 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("mgate_stream").toString
    (1 to 2).foreach { k =>
      docs.filter($"doc_id" % 3 === k).coalesce(1)
        .write.parquet(s"$dir/in/b$k.parquet")
    }
    val gate = new ManifestGate.Gate(mf(kept), "lang",
      Seq("doc_id", "text"), length($"text"))
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*/")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        gate.accountBatch(batch).write.mode("append").parquet(s"$dir/out")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()
    assertSame(mf(kept.unionByName(streamedSide)), gate.currentManifest)
    // the pass-through sink holds exactly the streamed rows
    val sunk = spark.read.parquet(s"$dir/out")
    assert(sunk.exceptAll(streamedSide).isEmpty && streamedSide.exceptAll(sunk).isEmpty)
  }
}
