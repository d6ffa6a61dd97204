package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation pipeline — the composition the
  * individual T-operators exist for, in the order a production corpus
  * build runs them:
  *
  *  1. annotate: language-ID + quality + repetition scores (per-row
  *     kernels, no shuffle);
  *  2. gate: drop low-quality / repetition-heavy docs (filter on the
  *     scan);
  *  3. exact dedup: first occurrence per normalized text survives;
  *  4. near-dup canonicalize: MinHash+LSH pairs -> connected components
  *     -> keep the least-id doc per duplicate cluster;
  *  5. decontaminate: drop docs overlapping the benchmark set;
  *  6. sample: deterministic per-language training mix;
  *  7. pack: concat-and-chunk token spans for the loader.
  *
  * Everything stays one lazy DataFrame program except the two points
  * that are semantically iterative (connected components) or
  * pair-generating (LSH), which are internally bounded and checkpointed.
  * Shuffle inventory: exact-dedup groupBy, LSH band bucket join, CC
  * rounds (decaying), contamination fold-back, packing shard window —
  * each justified in SCALE.md; nothing quadratic, nothing driver-side.
  */
object Curation {

  final case class CurationParams(
      minQuality: Double = 0.3,
      maxRepetition: Double = 0.6,
      shingleN: Int = 3,
      lshThreshold: Double = 0.6,
      contaminationN: Int = 13,
      maxContamination: Double = 0.2,
      // absolute floor under the LSH DF-prune ratio bar (see
      // [[TextDedup.minHashLshDedup]]); the replay oracles pin 0
      minDocFreq: Long = TextDedup.DefaultMinDocFreq,
      sampleRates: Map[String, Double] = Map.empty,
      defaultSampleRate: Double = 1.0,
      packBudget: Int = 512,
      packShards: Int = 8,
      // portable md5 LSH mode so an external SQL engine can replay the
      // whole pipeline (q57); production default stays murmur3
      portableHash: Boolean = false,
      // near-dup survivor election: least id (the q57-replayed default)
      // or keep-best-by-quality ([[ConnectedComponents.canonicalizeBy]]
      // on the stage-1 quality score)
      keepBestQuality: Boolean = false,
      // apply the C4/Gopher heuristic rule battery
      // ([[CorpusFilters.heuristicSignals]] composite keep) as part of
      // the stage-2 gate — one more kernel on the same scan, no extra
      // pass. Off by default: the q57 replay oracle predates it.
      useHeuristicGate: Boolean = false)

  /** Curated corpus (`docs`: one row per surviving doc with annotations
    * and packed span) plus the stage caches backing it — call
    * [[CurationResult.unpersist]] once consumed.
    */
  final case class CurationResult(docs: DataFrame, cached: Seq[DataFrame]) {
    def unpersist(): Unit = cached.foreach(_.unpersist())
  }

  /** Stage outputs that fan out to more than one consumer (the exact-
    * dedup survivors feed both LSH and canonicalize; the canonical set
    * feeds both contamination and the survivor join; the sample feeds
    * its own packing join) are persisted MEMORY_AND_DISK — without
    * this, every fan-out re-runs the whole upstream including the LSH
    * pipeline (measured 5x end-to-end at sf0.1). On a real 100-TB run
    * these are the natural stage boundaries to write to storage
    * instead; the persists mark exactly those points.
    */
  def curate(
      docs: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      params: CurationParams = CurationParams()): CurationResult = {
    import org.apache.spark.storage.StorageLevel
    val id = col(idCol)

    // 1-2: annotate + quality gate (single scan, all per-row kernels)
    val annotated = docs
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("repetition", TextAnalysis.repetitionScore(col(textCol), 3))
      .filter(col("quality") >= params.minQuality &&
        col("repetition") <= params.maxRepetition)
      .transform { d =>
        if (params.useHeuristicGate)
          d.filter(CorpusFilters.heuristicSignals(col(textCol))("_12") === 1)
        else d
      }

    // 3: exact dedup on the text, deterministic least-id survivor
    val exact = Dedup.exactByColumns(annotated, Seq(textCol), idCol)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 4: near-dup clusters -> canonical survivor per cluster
    val pairs = TextDedup.minHashLshPairs(
      exact, idCol, textCol, n = params.shingleN,
      threshold = params.lshThreshold, portableHash = params.portableHash,
      minDocFreq = params.minDocFreq)
    val clustered =
      if (params.keepBestQuality)
        ConnectedComponents.canonicalizeBy(exact, pairs, idCol, "quality")
      else ConnectedComponents.canonicalize(exact, pairs, idCol)
    val canon = clustered
      .filter(col("is_canonical") === 1)
      .drop("cluster_id", "cluster_size", "is_canonical")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 5: decontaminate against the benchmark corpus
    val contam = Contamination.ngramContamination(
      canon, bench, idCol, textCol, params.contaminationN)
    val cleanDocs = canon
      .join(contam.filter(col("contamination") <= params.maxContamination)
        .select(id), Seq(idCol), "left_semi")

    // 6: deterministic training mix
    val sampled = Sampling.stratifiedSample(
      cleanDocs, idCol, langCol, params.sampleRates, params.defaultSampleRate)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 7: packed spans for the loader
    val packed = sampled.join(
      Packing.packSequences(sampled, idCol, textCol,
        params.packBudget, params.packShards)
        .drop("n_tokens"),
      Seq(idCol))
    CurationResult(packed, Seq(exact, canon, sampled, pairs))
  }
}
