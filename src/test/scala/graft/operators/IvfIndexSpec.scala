package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[IvfIndex]]'s contract: probing the built index is EXACTLY
  * equivalent to the one-shot [[Similarity.ivfTopKFrozen]] (assignment
  * is a pure function of the frozen quantizer — no stop set, no counts,
  * so unlike [[LshIndex]] there is no documented divergence at all),
  * [[IvfIndex.append]] is exact, and a cell-partitioned Parquet index
  * prunes the probe scan to the probed cells at planning time.
  */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private def queries = emb.filter($"vec_id" < 5)

  private def topkSet(df: DataFrame): Set[(Long, Int, Long, Double)] =
    df.select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sim"), 9).as("s"))
      .as[(Long, Int, Long, Double)].collect().toSet

  test("topKAgainst == one-shot ivfTopKFrozen (same quantizer, k, nProbe)") {
    val index = IvfIndex.build(emb, "vec_id", "embedding", IvfCentroids.centroids)
    val got = IvfIndex.topKAgainst(index, queries, "vec_id", "embedding", k = 5, nProbe = 4)
    val want = Similarity.ivfTopKFrozen(
      emb, queries, "vec_id", "embedding", k = 5,
      centroids = IvfCentroids.centroids, nProbe = 4)
    assert(topkSet(got) == topkSet(want))
    assert(topkSet(got).nonEmpty)
    index.unpersist()
  }

  test("index round-trips through cell-partitioned Parquet and the probe scan prunes") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    val index = IvfIndex.build(emb, "vec_id", "embedding", IvfCentroids.centroids)
    val direct = IvfIndex.topKAgainst(index, queries, "vec_id", "embedding", k = 5, nProbe = 2)
    index.write.partitionBy("cell").mode("overwrite").parquet(s"$dir/index")
    index.unpersist()
    val reloaded = spark.read.parquet(s"$dir/index")
    val (meta, ctrs) = IvfIndex.readMeta(reloaded)
    assert(meta.dim == 64 && meta.nCentroids == 16 && meta.nDocs == emb.count())
    assert(ctrs.map(_.toSeq).toSeq == IvfCentroids.centroids)
    val probed = IvfIndex.topKAgainst(reloaded, queries, "vec_id", "embedding", k = 5, nProbe = 2)
    assert(topkSet(probed) == topkSet(direct))
    // the scale claim: the probe reads ONLY probed cell partitions —
    // the isin filter must land in the INDEX scan's PartitionFilters
    // (the query-side embeddings scan is unpartitioned and legitimately
    // prints an empty filter list, so assert on the index scan alone)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val idxScans = scans(probed.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("ivfidx")))
    assert(idxScans.nonEmpty, "no parquet scan over the index directory found")
    assert(idxScans.forall(_.partitionFilters.nonEmpty),
      s"index scan not partition-pruned:\n${idxScans.map(_.toString).mkString}")
  }

  test("append is exact: probes equal a fresh build over the union") {
    val a = emb.filter($"vec_id" % 2 === 0)
    val b = emb.filter($"vec_id" % 2 === 1)
    val incremental = IvfIndex.append(
      IvfIndex.build(a, "vec_id", "embedding", IvfCentroids.centroids),
      b, "vec_id", "embedding")
    val rebuilt = IvfIndex.build(emb, "vec_id", "embedding", IvfCentroids.centroids)
    val got = IvfIndex.topKAgainst(incremental, queries, "vec_id", "embedding", k = 5, nProbe = 4)
    val want = IvfIndex.topKAgainst(rebuilt, queries, "vec_id", "embedding", k = 5, nProbe = 4)
    assert(topkSet(got) == topkSet(want))
    val (m, _) = IvfIndex.readMeta(incremental)
    assert(m.nDocs == emb.count()) // meta doc count tracks appends
    incremental.unpersist(); rebuilt.unpersist()
  }

  test("null vectors land in the null cell and are never served as neighbors") {
    val withNull = emb.select($"vec_id", $"embedding")
      .unionAll(Seq((9999L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val index = IvfIndex.build(withNull, "vec_id", "embedding", IvfCentroids.centroids)
    assert(index.filter(col("cell") === IvfIndex.NullCell).count() == 1)
    val out = IvfIndex.topKAgainst(index, queries, "vec_id", "embedding", k = 5, nProbe = 16)
    assert(out.filter(col("neighbor_id") === 9999L).isEmpty)
    index.unpersist()
  }

  test("dedupAgainst drops exact and near copies, keeps novel vectors, preserves columns") {
    val corpus = emb.filter($"vec_id" < 100)
    val index = IvfIndex.build(corpus, "vec_id", "embedding", IvfCentroids.centroids)
    // incoming: exact copies of indexed vectors under new ids (cosine 1,
    // same cell — must drop even at nProbe=1) + fresh vectors from
    // outside the indexed slice (novel unless near-dup by chance at a
    // 0.999 bar — they are not, by construction of the fixture)
    val copies = corpus.filter($"vec_id" < 10)
      .select(($"vec_id" + 10000L).as("vec_id"), $"embedding")
    val novel = emb.filter($"vec_id" >= 100 && $"vec_id" < 110)
      .select($"vec_id", $"embedding")
    val incoming = copies.unionAll(novel)
    val out = IvfIndex.dedupAgainst(
      index, incoming, "vec_id", "embedding", threshold = 0.999, nProbe = 1)
    val kept = out.select("vec_id").as[Long].collect().toSet
    assert(kept == novel.select("vec_id").as[Long].collect().toSet)
    assert(out.columns.toSeq == incoming.columns.toSeq)
    index.unpersist()
  }

  test("dedupAgainst matches a direct probed-cell cosine filter on the real corpus") {
    val a = emb.filter($"vec_id" % 2 === 0)
    val b = emb.filter($"vec_id" % 2 === 1)
    val index = IvfIndex.build(a, "vec_id", "embedding", IvfCentroids.centroids)
    val got = IvfIndex.dedupAgainst(
        index, b, "vec_id", "embedding", threshold = 0.35, nProbe = 4)
      .select("vec_id").as[Long].collect().toSet
    // independent reference: per-incoming probe cells via the same frozen
    // quantizer, exact cosine inside them, survivors = below-threshold
    val ctrs = IvfCentroids.centroids
    val probeCells = b.select($"vec_id", Similarity.asDouble($"embedding").as("v"))
      .as[(Long, Array[Double])].collect()
      .map { case (id, v) => id -> IvfCentroids.centroids.indices
        .sortBy(i => (ctrs(i).zip(v).map { case (c, x) => (x - c) * (x - c) }.sum, i))
        .take(4).toSet }
      .toMap
    val corpus = a.select($"vec_id", Similarity.asDouble($"embedding").as("v"))
      .as[(Long, Array[Double])].collect()
    val corpusCell = corpus.map { case (id, v) => id -> IvfCentroids.centroids.indices
      .minBy(i => (ctrs(i).zip(v).map { case (c, x) => (x - c) * (x - c) }.sum, i)) }.toMap
    def cos(x: Array[Double], y: Array[Double]): Double = {
      val d = x.zip(y).map { case (p, q) => p * q }.sum
      val den = math.sqrt(x.map(p => p * p).sum) * math.sqrt(y.map(q => q * q).sum)
      if (den > 0) d / den else 0.0
    }
    val wantDropped = b.select($"vec_id", Similarity.asDouble($"embedding").as("v"))
      .as[(Long, Array[Double])].collect()
      .filter { case (id, v) =>
        corpus.exists { case (nid, nv) =>
          nid != id && probeCells(id).contains(corpusCell(nid)) && cos(nv, v) >= 0.35 } }
      .map(_._1).toSet
    val want = b.select("vec_id").as[Long].collect().toSet -- wantDropped
    assert(got == want)
    assert(wantDropped.nonEmpty) // the gate dropped something real
    index.unpersist()
  }

  test("topKAgainstMany over split generations == one index over the union") {
    val gen1 = IvfIndex.build(emb.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", IvfCentroids.centroids)
    val gen2 = IvfIndex.build(emb.filter($"vec_id" % 2 === 1),
      "vec_id", "embedding", IvfCentroids.centroids)
    val whole = IvfIndex.build(emb, "vec_id", "embedding", IvfCentroids.centroids)
    val got = IvfIndex.topKAgainstMany(Seq(gen1, gen2), queries,
      "vec_id", "embedding", k = 5, nProbe = 4)
    val want = IvfIndex.topKAgainst(whole, queries,
      "vec_id", "embedding", k = 5, nProbe = 4)
    assert(topkSet(got) == topkSet(want))
    assert(topkSet(got).nonEmpty)

    // the dedup form drops near-dups of ANY generation
    val incoming = emb.filter($"vec_id" >= 100 && $"vec_id" < 150)
      .select(($"vec_id" + 10000L).as("vec_id"), $"embedding")
    val gotSurv = IvfIndex.dedupAgainstMany(Seq(gen1, gen2), incoming,
        "vec_id", "embedding", threshold = 0.999, nProbe = 4)
      .select("vec_id").as[Long].collect().toSet
    val wantSurv = IvfIndex.dedupAgainst(whole, incoming,
        "vec_id", "embedding", threshold = 0.999, nProbe = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(gotSurv == wantSurv)
    assert(gotSurv.size < 50) // the exact copies were dropped
    gen1.unpersist(); gen2.unpersist(); whole.unpersist()
  }

  test("semi-join probe path (past maxStaticProbeCells) matches the static path") {
    val dir = java.nio.file.Files.createTempDirectory("ivfsemi").toString
    val index = IvfIndex.build(emb, "vec_id", "embedding", IvfCentroids.centroids)
    index.write.partitionBy("cell").mode("overwrite").parquet(s"$dir/index")
    index.unpersist()
    val reloaded = spark.read.parquet(s"$dir/index")
    // force the huge-quantizer fallback: every probe exceeds the bound
    val joined = IvfIndex.topKAgainst(reloaded, queries, "vec_id", "embedding",
      k = 5, nProbe = 4, maxStaticProbeCells = 0)
    val static = IvfIndex.topKAgainst(reloaded, queries, "vec_id", "embedding",
      k = 5, nProbe = 4)
    assert(topkSet(joined) == topkSet(static))
    assert(topkSet(joined).nonEmpty)
    // the broadcast side's `__cell >= 0` filter must propagate into the
    // index scan's partition filters (the null-cell partition is always
    // skipped; full dynamic pruning is documented as best-effort)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    joined.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val idxScans = scans(joined.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("ivfsemi")))
    assert(idxScans.nonEmpty, "no parquet scan over the index directory found")
    assert(idxScans.forall(_.partitionFilters.exists(_.toString.contains(">= 0"))),
      s"cell >= 0 not propagated to partition filters:\n${idxScans.mkString}")

    // and the dedup twin agrees across both paths
    val incoming = emb.filter($"vec_id" % 2 === 1)
    val viaJoin = IvfIndex.dedupAgainst(reloaded, incoming, "vec_id", "embedding",
        threshold = 0.35, nProbe = 4, maxStaticProbeCells = 0)
      .select("vec_id").as[Long].collect().toSet
    val viaStatic = IvfIndex.dedupAgainst(reloaded, incoming, "vec_id", "embedding",
        threshold = 0.35, nProbe = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(viaJoin == viaStatic)
  }

  test("mergeMany over split generations probes identically to build over the union") {
    val a = emb.filter($"vec_id" % 2 === 0)
    val b = emb.filter($"vec_id" % 2 === 1)
    val gen1 = IvfIndex.build(a, "vec_id", "embedding", IvfCentroids.centroids)
    val gen2 = IvfIndex.build(b, "vec_id", "embedding", IvfCentroids.centroids)
    val merged = IvfIndex.mergeMany(Seq(gen1, gen2), "vec_id")
    val rebuilt = IvfIndex.build(emb, "vec_id", "embedding", IvfCentroids.centroids)
    val got = IvfIndex.topKAgainst(merged, queries, "vec_id", "embedding", k = 5, nProbe = 4)
    val want = IvfIndex.topKAgainst(rebuilt, queries, "vec_id", "embedding", k = 5, nProbe = 4)
    assert(topkSet(got) == topkSet(want))
    assert(topkSet(got).nonEmpty)
    val (mm, mc) = IvfIndex.readMeta(merged)
    assert(mm.nDocs == emb.count())
    assert(mc.map(_.toSeq).toSeq == IvfCentroids.centroids)
    // merge refuses mixed quantizers, like every cross-generation op
    val alien = IvfIndex.build(b, "vec_id", "embedding",
      IvfCentroids.centroids.map(_.map(_ * 2.0)))
    val e = intercept[IllegalArgumentException] {
      IvfIndex.mergeMany(Seq(gen1, alien), "vec_id")
    }
    assert(e.getMessage.contains("disagree on the frozen quantizer"))
    gen1.unpersist(); gen2.unpersist(); merged.unpersist()
    rebuilt.unpersist(); alien.unpersist()
  }

  test("topKAgainstMany refuses mixed quantizers, typed") {
    val gen1 = IvfIndex.build(emb.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", IvfCentroids.centroids)
    val gen2 = IvfIndex.build(emb.filter($"vec_id" % 2 === 1),
      "vec_id", "embedding", IvfCentroids.centroids.map(_.map(_ * 2.0)))
    val e = intercept[IllegalArgumentException] {
      IvfIndex.topKAgainstMany(Seq(gen1, gen2), queries, "vec_id", "embedding", k = 5)
    }
    assert(e.getMessage.contains("disagree on the frozen quantizer"))
    gen1.unpersist(); gen2.unpersist()
  }

  test("readMeta fails typed on non-index frames") {
    val notIndex = Seq((1L, "x")).toDF("id", "text")
    val e1 = intercept[IllegalArgumentException](IvfIndex.readMeta(notIndex))
    assert(e1.getMessage.contains("not an IVF index"))
    val noMeta = IvfIndex.build(emb, "vec_id", "embedding", IvfCentroids.centroids)
      .filter(col("cell") =!= IvfIndex.MetaCell)
    val e2 = intercept[IllegalArgumentException](IvfIndex.readMeta(noMeta))
    assert(e2.getMessage.contains("exactly one meta row"))
  }

  test("cellOccupancyReport: balanced on the fitted corpus, degenerate skew on a drifted one") {
    // the quantizer was fitted on this corpus: occupancy must be spread
    // (every cell populated, skew far from the one-cell degenerate)
    val fitted = IvfIndex.build(emb, "vec_id", "embedding", IvfCentroids.centroids)
    val ok = IvfIndex.cellOccupancyReport(fitted)
    assert(ok.nCentroids == 16 && ok.nonEmptyCells >= 12) // 13/16 on this fit
    assert(ok.nDocs == emb.count())
    assert(ok.skew >= 1.0 && ok.skew < 8.0, s"fitted corpus should be spread: $ok")
    assert(ok.top.size == ok.nonEmptyCells && ok.top.head._2 == ok.maxCell)

    // drifted distribution: every vector identical -> one cell holds
    // everything, the exact condition the report exists to surface
    val one = emb.filter($"vec_id" === 0L).select($"embedding")
    val drifted = spark.range(200).select($"id".as("vec_id")).crossJoin(one)
    val degen = IvfIndex.build(drifted, "vec_id", "embedding", IvfCentroids.centroids)
    val bad = IvfIndex.cellOccupancyReport(degen, topK = 4)
    assert(bad.nonEmptyCells == 1 && bad.maxCell == 200L)
    assert(bad.skew == 16.0, s"one-cell pileup must read skew == nCentroids: $bad")
    assert(bad.top == Seq(bad.top.head) || bad.top.size == 1)
    fitted.unpersist(); degen.unpersist()
  }
}
