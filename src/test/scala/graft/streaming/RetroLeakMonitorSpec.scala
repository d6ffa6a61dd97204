package graft.streaming

import graft.SparkSpec
import graft.operators.{Curation, Release, Sampling}
import org.apache.spark.sql.DataFrame

/** The retro-leakage cadence monitor's contract (r13, VERDICT r12 #5):
  * under a real file stream running one `appendTurn` per micro-batch,
  * a late eval doc planted mid-stream fires the report at the NEXT
  * cadence point — naming exactly the already-shipped train doc — and
  * off-cadence batches surface nothing; the batch passes through
  * untouched. The report math itself is q122's oracle / ReleaseSpec's
  * T89 fixture; this spec pins the streaming composition.
  */
class RetroLeakMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val params = Release.ReleaseParams(
    curation = Curation.CurationParams(
      minQuality = 0.0, maxRepetition = 1.0,
      lshThreshold = 0.6, maxContamination = 0.5,
      portableHash = true, minDocFreq = 0L),
    trainFrac = 0.8, valFrac = 0.1,
    leakageN = 13, maxOverlapNgrams = 0L, mixAlpha = 1.0)

  test("a late eval doc mid-stream fires the report at the next cadence point, silent before") {
    val dir = java.nio.file.Files.createTempDirectory("retroleak_stream").toString
    val path = s"$dir/rel"

    // the ReleaseSpec T89 plant: the secret ships as a TRAIN doc in the
    // init turn; an EVAL doc quoting it (embedded in a long unrelated
    // body, so near-dup dedup stays silent) arrives only mid-stream
    val fates = Sampling.assignSplit(
        spark.range(0L, 400L).toDF("doc_id"), "doc_id", 0.8, 0.1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val trainId1 = (0L until 200L).find(fates(_) == "train").get
    val evalId2 = (300L until 400L).find(fates(_) != "train").get
    val secret = "the secret passage shipped to training before evaluation existed"
    val evalQuote = "an evaluation item later quotes " + secret +
      " inside a much longer surrounding prompt with plenty of additional " +
      "words keeping the shingle jaccard low so near dup dedup stays silent"
    def bulk(i: Long) = s"${i}z" * 12
    def turnDocs(from: Long, until: Long, plants: Map[Long, String]) =
      (from until until).map(i => (i, plants.getOrElse(i, bulk(i)), "en"))
        .toDF("doc_id", "text", "lang")
    val bench = Seq((9999L, "benchmark body unrelated to all corpora", "en"))
      .toDF("doc_id", "text", "lang")

    var st = Release.initIncremental(
      turnDocs(0L, 200L, Map(trainId1 -> secret)), bench,
      "doc_id", "text", "lang", path, params)

    // two micro-batches on disk: the clean one and the planted one
    turnDocs(200L, 300L, Map.empty).coalesce(1).write.parquet(s"$dir/in/b1.parquet")
    turnDocs(300L, 400L, Map(evalId2 -> evalQuote)).coalesce(1)
      .write.parquet(s"$dir/in/b2.parquet")

    val surfaced = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val monitor = new RetroLeakMonitor.Gate(
      spark, path, "doc_id", "text", every = 2,
      onReport = r => surfaced +=
        r.select("doc_id").collect().map(_.getLong(0)).toSet)

    val stream = spark.readStream
      .schema(turnDocs(0L, 0L, Map.empty).schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*/")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // ship first, then account: the cadence report covers this
        // batch's own eval docs against everything shipped so far
        val (next, _) = Release.appendTurn(
          st, batch, bench, "doc_id", "text", "lang", params)
        st = next
        val out = monitor.accountBatch(batch)
        assert(out eq batch, "accounting must observe, never rewrite")
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(180000) finally q.stop()

    // cadence 2 over 2 batches: exactly ONE report fired (after the
    // second turn, never after the first), naming exactly the shipped
    // train doc the late eval doc made retroactively leaky
    assert(surfaced.toSeq == Seq(Set(trainId1)), s"got $surfaced")
    val last = monitor.lastReport.get
    assert(last.select("doc_id").collect().map(_.getLong(0)).toSet == Set(trainId1))
    assert(last.filter($"overlap_ngrams" <= 0).isEmpty,
      "every reported doc is over the bar by construction")

    // the report is pinned: shipping MORE docs after the cadence point
    // must not change what it says (path/data grows under the stream)
    val (st3, _) = Release.appendTurn(
      st, turnDocs(400L, 420L, Map.empty), bench, "doc_id", "text", "lang", params)
    assert(monitor.lastReport.get.select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(trainId1))

    // and the remedy loop the report feeds stays ReleaseSpec's: the
    // rebuild silences a FRESH cadence report
    val (st4, dropped) = Release.rebuildIfLeaky(
      spark, path, "doc_id", "text", "lang", params)
    assert(dropped == 1L)
    val fresh = new RetroLeakMonitor.Gate(spark, path, "doc_id", "text", every = 1)
    fresh.accountBatch(spark.range(1).toDF("x"))
    assert(fresh.lastReport.get.isEmpty, "post-rebuild cadence report must be clean")

    st.unpersist(); st3.unpersist(); st4.unpersist()
  }

  test("guards: a zero/negative cadence fails typed") {
    intercept[IllegalArgumentException] {
      new RetroLeakMonitor.Gate(spark, "/nowhere", "id", "text", every = 0)
    }
  }
}
