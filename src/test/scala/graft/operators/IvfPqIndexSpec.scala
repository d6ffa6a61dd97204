package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[IvfPqIndex]]'s contract: the two approximations are
  * independent — probing ALL cells recovers the unpruned
  * [[Similarity.pqTopKAgainst]] bit-for-bit; cell pruning behaves like
  * [[IvfIndex]] (same cell restriction, same partition-prune plan
  * shape); both frozen models make [[IvfPqIndex.append]] exact.
  */
class IvfPqIndexSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private def queries = emb.filter($"vec_id" < 5)

  private def topkSet(df: DataFrame): Set[(Long, Int, Long, Double)] =
    df.select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("adc_cos"), 9).as("s"))
      .as[(Long, Int, Long, Double)].collect().toSet

  test("probing all cells == unpruned pqTopKAgainst, bit for bit") {
    val index = IvfPqIndex.build(emb, "vec_id", "embedding")
    val got = IvfPqIndex.topKAgainst(index, queries, "vec_id", "embedding",
      k = 5, nProbe = 16)
    val want = Similarity.pqTopKAgainst(
      Similarity.pqEncode(emb, "vec_id", "embedding"),
      queries, "vec_id", "embedding", k = 5)
    assert(topkSet(got) == topkSet(want))
    assert(topkSet(got).nonEmpty)
    index.unpersist()
  }

  test("cell pruning restricts candidates to the probed cells") {
    val index = IvfPqIndex.build(emb, "vec_id", "embedding")
    val got = IvfPqIndex.topKAgainst(index, queries, "vec_id", "embedding",
      k = 5, nProbe = 2)
    // independent candidate-set reference: same frozen quantizer on the
    // driver — every returned neighbor must live in a probed cell
    val ctrs = IvfCentroids.centroids.map(_.toArray).toArray
    val vecs = emb.select($"vec_id", Similarity.asDouble($"embedding"))
      .as[(Long, Array[Double])].collect().toMap
    val probed = vecs.filter(_._1 < 5).map { case (qid, v) =>
      qid -> Similarity.nearestCells(ctrs, v, 2).toSet
    }
    val pairs = got.select("query_id", "neighbor_id").as[(Long, Long)].collect()
    pairs.foreach { case (qid, nid) =>
      val nCell = Similarity.nearestCells(ctrs, vecs(nid), 1)(0)
      assert(probed(qid).contains(nCell), s"neighbor $nid of query $qid outside probed cells")
    }
    index.unpersist()
  }

  test("index round-trips through cell-partitioned Parquet and the probe scan prunes") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpqidx").toString
    val index = IvfPqIndex.build(emb, "vec_id", "embedding")
    val direct = IvfPqIndex.topKAgainst(index, queries, "vec_id", "embedding", k = 5, nProbe = 2)
    index.write.partitionBy("cell").mode("overwrite").parquet(s"$dir/index")
    index.unpersist()
    val reloaded = spark.read.parquet(s"$dir/index")
    val (meta, ctrs, cbs) = IvfPqIndex.readMeta(reloaded)
    assert(meta == IvfPqIndex.Meta(64, 16, 8, 16, emb.count()))
    assert(ctrs.map(_.toSeq).toSeq == IvfCentroids.centroids)
    assert(cbs.map(_.map(_.toSeq).toSeq).toSeq == PqCodebooks.codebooks)
    val probed = IvfPqIndex.topKAgainst(reloaded, queries, "vec_id", "embedding", k = 5, nProbe = 2)
    assert(topkSet(probed) == topkSet(direct))
    // the scale claim: the probe reads ONLY probed cell partitions
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val idxScans = scans(probed.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("ivfpqidx")))
    assert(idxScans.nonEmpty, "no parquet scan over the index directory found")
    assert(idxScans.forall(_.partitionFilters.nonEmpty),
      s"index scan not partition-pruned:\n${idxScans.map(_.toString).mkString}")
  }

  test("append is exact: probes equal a fresh build over the union") {
    val a = emb.filter($"vec_id" % 2 === 0)
    val b = emb.filter($"vec_id" % 2 === 1)
    val incremental = IvfPqIndex.append(
      IvfPqIndex.build(a, "vec_id", "embedding"), b, "vec_id", "embedding")
    val rebuilt = IvfPqIndex.build(emb, "vec_id", "embedding")
    val got = IvfPqIndex.topKAgainst(incremental, queries, "vec_id", "embedding", k = 5, nProbe = 4)
    val want = IvfPqIndex.topKAgainst(rebuilt, queries, "vec_id", "embedding", k = 5, nProbe = 4)
    assert(topkSet(got) == topkSet(want))
    val (m, _, _) = IvfPqIndex.readMeta(incremental)
    assert(m.nDocs == emb.count())
    incremental.unpersist(); rebuilt.unpersist()
  }

  test("null vectors land in the null cell with NULL codes and are never served") {
    val withNull = emb.select($"vec_id", $"embedding")
      .unionAll(Seq((9999L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val index = IvfPqIndex.build(withNull, "vec_id", "embedding")
    val nullRows = index.filter(col("cell") === IvfPqIndex.NullCell)
    assert(nullRows.count() == 1 && nullRows.filter(col("pq_code").isNull).count() == 1)
    val out = IvfPqIndex.topKAgainst(index, queries, "vec_id", "embedding", k = 5, nProbe = 16)
    assert(out.filter(col("neighbor_id") === 9999L).isEmpty)
    index.unpersist()
  }

  test("off-shape PQ codebooks fail typed at every entry point (r8 ADVICE)") {
    // Nibble packing silently corrupts codes past 8 subspaces or with a
    // non-power-of-two centroid count (code 6 & 9 == 0); the guard turns
    // that into a typed error before any row is encoded.
    def cb(nSub: Int, kCb: Int): Seq[Seq[Seq[Double]]] =
      Seq.tabulate(nSub, kCb, 2)((j, c, i) => (j + c + i).toDouble)
    for (bad <- Seq(cb(9, 16), cb(8, 10), cb(8, 32), cb(0, 16))) {
      assert(intercept[IllegalArgumentException] {
        Similarity.pqEncode(emb, "vec_id", "embedding", bad)
      }.getMessage.contains("PQ"))
      assert(intercept[IllegalArgumentException] {
        Similarity.pqTopKAgainst(
          Similarity.pqEncode(emb, "vec_id", "embedding"),
          queries, "vec_id", "embedding", k = 3, codebooks = bad)
      }.getMessage.contains("PQ"))
      assert(intercept[IllegalArgumentException] {
        IvfPqIndex.build(emb, "vec_id", "embedding", codebooks = bad)
      }.getMessage.contains("PQ"))
    }
    // ragged subvector dims also fail typed
    val ragged = Seq(Seq(Seq(1.0, 2.0), Seq(3.0)), Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
    assert(intercept[IllegalArgumentException] {
      Similarity.pqEncode(emb, "vec_id", "embedding", ragged)
    }.getMessage.contains("PQ"))
  }

  test("a frame that is not an IVF-PQ index fails typed") {
    val e1 = intercept[IllegalArgumentException] {
      IvfPqIndex.readMeta(emb)
    }
    assert(e1.getMessage.contains("not an IVF-PQ index"))
    val index = IvfPqIndex.build(emb.limit(10), "vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      IvfPqIndex.readMeta(index.filter(col("cell") =!= IvfPqIndex.MetaCell))
    }
    assert(e2.getMessage.contains("exactly one meta row"))
    index.unpersist()
  }

  test("rebuildIfSkewed: no-op when balanced; typed rebuild-from-corpus when drifted (r9 VERDICT #4)") {
    val rnd = new scala.util.Random(11)
    def around(cx: Double, cy: Double, s: Double) =
      Array(cx + rnd.nextGaussian() * s, cy + rnd.nextGaussian() * s)
    val ctrs = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(-1.0, 0.0), Seq(0.0, -1.0))
    // dim 2 -> 2 subspaces of 1 dim, 4 centroids each (valid PQ shape)
    val cbs = Seq(
      Seq(Seq(-1.0), Seq(0.0), Seq(1.0), Seq(10.0)),
      Seq(Seq(-1.0), Seq(0.0), Seq(1.0), Seq(10.0)))

    val balanced = (0 until 60).map { i =>
      val c = ctrs(i % 4)
      (i.toLong, around(c.head, c(1), 0.05))
    }.toDF("vec_id", "embedding")
    val ok = IvfPqIndex.build(balanced, "vec_id", "embedding", ctrs, cbs)
    val (same, quiet) = IvfPqIndex.rebuildIfSkewed(ok, balanced, "vec_id", "embedding",
      maxSkew = 3.0)
    assert((same eq ok) && quiet.skew <= 3.0)

    // the embedding distribution moved wholesale to a region the frozen
    // quantizer never saw — everything piles into one cell
    val drifted = (100 until 160)
      .map(i => (i.toLong, around(10.0, 0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val bad = IvfPqIndex.build(drifted, "vec_id", "embedding", ctrs, cbs)
    assert(IvfPqIndex.occupancyReport(bad).nonEmptyCells == 1)
    // PQ codes are lossy, so the remedy demands the REAL corpus — and
    // guards it: a wrong corpus fails typed instead of rebuilding junk
    assert(intercept[IllegalArgumentException] {
      IvfPqIndex.rebuildIfSkewed(bad, drifted.limit(10), "vec_id", "embedding",
        maxSkew = 3.0)
    }.getMessage.contains("exact corpus"))
    val (fresh, fired) = IvfPqIndex.rebuildIfSkewed(bad, drifted, "vec_id", "embedding",
      maxSkew = 3.0)
    assert(fired.skew > 3.0 && fired.nonEmptyCells == 1,
      s"drifted corpus must degenerate to one cell: $fired")
    val healed = IvfPqIndex.occupancyReport(fresh)
    assert(healed.skew <= 3.0 && healed.nonEmptyCells > 1, s"rebuild must rebalance: $healed")
    // codebooks survive the rebuild frozen; doc count preserved; probes work
    val (m2, _, cbs2) = IvfPqIndex.readMeta(fresh)
    assert(m2.nDocs == 60L)
    assert(cbs2.map(_.map(_.toSeq).toSeq).toSeq == cbs)
    val probed = IvfPqIndex.topKAgainst(fresh,
      drifted.filter($"vec_id" === 100L), "vec_id", "embedding", k = 3,
      nProbe = m2.nCentroids)
    assert(probed.count() == 3L)
    ok.unpersist(); bad.unpersist(); fresh.unpersist()
  }
}
