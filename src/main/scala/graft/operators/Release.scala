package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The one-call release turn (T80) — the delivery composition every
  * training-corpus build ends with, chaining the operators that already
  * exist into the order production runs them:
  *
  *  1. curate ([[Curation.curateCore]]): annotate -> quality gate ->
  *     exact dedup -> near-dup canonicalize -> benchmark
  *     decontamination;
  *  2. split ([[Sampling.assignSplit]]): deterministic md5
  *     train/val/test membership, pinned BEFORE any mixing — split
  *     fate must never depend on what was sampled;
  *  3. de-leak ([[Contamination.removeSplitLeakage]]): drop train docs
  *     sharing character n-grams with the held-out splits (the
  *     cross-split leakage direction dedup cannot see);
  *  4. mix ([[Sampling.temperatureMix]] over the TRAIN split only —
  *     val/test are metrics sets and must not be resampled; alpha 1.0
  *     is the exact identity, so the natural mix is the default);
  *  5. pack ([[Packing.packSequences]] over the final corpus — spans
  *     are computed AFTER the mix, so chunk geometry reflects exactly
  *     the documents shipped);
  *  6. ship ([[Manifest.writeWithManifest]] partitioned by split, plus
  *     the [[TextAnalysis.dataCard]] release report under
  *     `path/card`) — a release never leaves without its integrity
  *     record and its data card.
  *
  * Epoch-repeat up-sampling ([[Sampling.epochRepeats]]) is
  * deliberately NOT a release stage: it duplicates rows, and shipping
  * N byte-identical copies inflates exactly the bytes the manifest
  * accounts for — the loader replays epochs from the published weights
  * at read time instead (the q101 schedule is the loader-side artifact).
  *
  * Scale shape: nothing here is new machinery — every stage is the
  * already-audited operator (shuffle inventory per stage in SCALE.md),
  * and the only additions are the two stage-boundary persists (the
  * corpus fans out to the leak join's two sides and to pack+write) and
  * the final partitioned write. The write is the release's natural
  * storage boundary; on a 100-TB run each stage boundary persist
  * becomes a storage checkpoint the same way.
  */
object Release {

  /** The split column the release pins, partitions by, and verifies on. */
  val SplitCol = "split"

  final case class ReleaseParams(
      curation: Curation.CurationParams = Curation.CurationParams(),
      trainFrac: Double = 0.8,
      valFrac: Double = 0.1,
      leakageN: Int = 13,
      maxOverlapNgrams: Long = 0L,
      // the leak-gram join default stays SHUFFLED (the eval side is a
      // corpus fraction — [[Contamination.removeSplitLeakage]] doc)
      broadcastLeakGrams: Boolean = false,
      // 1.0 = natural mix (exact identity); lower flattens toward
      // uniform over the domain column
      mixAlpha: Double = 1.0)

  /** The shipped release: `docs` (what was written — curated,
    * split-assigned, de-leaked, mixed, packed), `manifest` and `card`
    * as reopened from the written artifacts, and the stage caches.
    */
  final case class ReleaseResult(
      docs: DataFrame,
      manifest: DataFrame,
      card: DataFrame,
      path: String,
      cached: Seq[DataFrame]) {
    def unpersist(): Unit = cached.foreach(_.unpersist())
  }

  def build(
      docs: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      path: String,
      params: ReleaseParams = ReleaseParams()): ReleaseResult = {
    import org.apache.spark.storage.StorageLevel
    require(!docs.columns.contains(SplitCol),
      s"input already has a '$SplitCol' column — the release assigns its own")
    val spark = docs.sparkSession

    // 1: curation core (annotate/gate/dedup/canonicalize/decontaminate)
    val core = Curation.curateCore(docs, bench, idCol, textCol, params.curation)

    // 2: pin split membership
    val split = Sampling.assignSplit(
      core.docs, idCol, params.trainFrac, params.valFrac, SplitCol)

    // 3: cross-split leakage removal
    val deLeaked = Contamination.removeSplitLeakage(
      split, idCol, textCol, SplitCol,
      n = params.leakageN, maxOverlapNgrams = params.maxOverlapNgrams,
      broadcastBench = params.broadcastLeakGrams)

    // 4: training mix on the train slice only; held-out splits ride
    // through untouched (they are the reference, not the mix)
    val mixedTrain = Sampling.temperatureMix(
      deLeaked.filter(col(SplitCol) === "train"), idCol, langCol, params.mixAlpha)
    val corpus = mixedTrain
      .unionByName(deLeaked.filter(col(SplitCol) =!= "train"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 5: pack the corpus that actually ships
    val packed = corpus.join(
      Packing.packSequences(corpus, idCol, textCol,
        params.curation.packBudget, params.curation.packShards),
      Seq(idCol))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 6: ship — data + manifest in one call, data card next to them
    Manifest.writeWithManifest(
      packed, path, SplitCol, Seq(idCol, textCol), length(col(textCol)))
    TextAnalysis.dataCard(corpus, textCol, langCol)
      .write.mode("overwrite").parquet(s"$path/card")

    ReleaseResult(
      packed,
      spark.read.parquet(s"$path/manifest"),
      spark.read.parquet(s"$path/card"),
      path,
      core.cached ++ Seq(corpus, packed))
  }

  /** Consumer-side reopen: [[Manifest.readVerified]] under the
    * release's hash recipe — one verification scan at ingest, failing
    * typed and naming exactly the split partitions to re-pull.
    */
  def open(
      spark: SparkSession, path: String, idCol: String, textCol: String): DataFrame =
    Manifest.readVerified(
      spark, path, SplitCol, Seq(idCol, textCol), length(col(textCol)))

  /** The published release report, reopened. */
  def openCard(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/card")
}
