package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[IvfSq8Index]]'s contract, mirroring IvfPqIndexSpec: the two
  * approximations are independent (all cells == unpruned
  * [[Similarity.sq8TopKAgainst]] bit-for-bit), pruning behaves like
  * [[IvfIndex]] (shared cell restriction, partition-pruned scans), and
  * both frozen models make [[IvfSq8Index.append]] exact.
  */
class IvfSq8IndexSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private def queries = emb.filter($"vec_id" < 5)
  private lazy val cal = Similarity.sq8Fit(
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"), "embedding")

  private def topkSet(df: DataFrame): Set[(Long, Int, Long, Double)] =
    df.select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("adc_cos"), 9).as("s"))
      .as[(Long, Int, Long, Double)].collect().toSet

  test("probing all cells == unpruned sq8TopKAgainst, bit for bit") {
    val index = IvfSq8Index.build(emb, "vec_id", "embedding",
      IvfCentroids.centroids, cal._1, cal._2)
    val got = IvfSq8Index.topKAgainst(index, queries, "vec_id", "embedding",
      k = 5, nProbe = 16)
    val want = Similarity.sq8TopKAgainst(
      Similarity.sq8Encode(emb, "vec_id", "embedding", cal._1, cal._2),
      queries, "vec_id", "embedding", k = 5, cal._1, cal._2)
    assert(topkSet(got) == topkSet(want))
    assert(topkSet(got).nonEmpty)
    index.unpersist()
  }

  test("round-trips through cell-partitioned Parquet; probe scan partition-prunes; append is exact") {
    val dir = java.nio.file.Files.createTempDirectory("ivfsq8idx").toString
    val index = IvfSq8Index.build(emb, "vec_id", "embedding",
      IvfCentroids.centroids, cal._1, cal._2)
    val direct = IvfSq8Index.topKAgainst(index, queries, "vec_id", "embedding", k = 5, nProbe = 2)
    index.write.partitionBy("cell").mode("overwrite").parquet(s"$dir/index")
    index.unpersist()
    val reloaded = spark.read.parquet(s"$dir/index")
    val (meta, ctrs, lo, hi) = IvfSq8Index.readMeta(reloaded)
    assert(meta == IvfSq8Index.Meta(64, 16, emb.count()))
    assert(ctrs.map(_.toSeq).toSeq == IvfCentroids.centroids)
    assert(lo.toSeq == cal._1.toSeq && hi.toSeq == cal._2.toSeq)
    val probed = IvfSq8Index.topKAgainst(reloaded, queries, "vec_id", "embedding", k = 5, nProbe = 2)
    assert(topkSet(probed) == topkSet(direct))
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val idxScans = scans(probed.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("ivfsq8idx")))
    assert(idxScans.nonEmpty, "no parquet scan over the index directory found")
    assert(idxScans.forall(_.partitionFilters.nonEmpty),
      s"index scan not partition-pruned:\n${idxScans.map(_.toString).mkString}")

    // append == build(union), probed identically
    val a = emb.filter($"vec_id" % 2 === 0)
    val b = emb.filter($"vec_id" % 2 === 1)
    val incremental = IvfSq8Index.append(
      IvfSq8Index.build(a, "vec_id", "embedding", IvfCentroids.centroids, cal._1, cal._2),
      b, "vec_id", "embedding")
    val got = IvfSq8Index.topKAgainst(incremental, queries, "vec_id", "embedding", k = 5, nProbe = 4)
    val rebuilt = IvfSq8Index.build(emb, "vec_id", "embedding",
      IvfCentroids.centroids, cal._1, cal._2)
    val want = IvfSq8Index.topKAgainst(rebuilt, queries, "vec_id", "embedding", k = 5, nProbe = 4)
    assert(topkSet(got) == topkSet(want))
    assert(IvfSq8Index.readMeta(incremental)._1.nDocs == emb.count())
    incremental.unpersist(); rebuilt.unpersist()
  }

  test("null vectors land in the null cell with NULL codes and are never served; typed errors") {
    val withNull = emb.select($"vec_id", $"embedding")
      .unionAll(Seq((9999L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val index = IvfSq8Index.build(withNull, "vec_id", "embedding",
      IvfCentroids.centroids, cal._1, cal._2)
    val nullRows = index.filter(col("cell") === IvfSq8Index.NullCell)
    assert(nullRows.count() == 1 && nullRows.filter(col("sq_code").isNull).count() == 1)
    val out = IvfSq8Index.topKAgainst(index, queries, "vec_id", "embedding", k = 5, nProbe = 16)
    assert(out.filter(col("neighbor_id") === 9999L).isEmpty)
    // occupancy monitor works on this layout too
    val occ = IvfSq8Index.occupancyReport(index)
    assert(occ.nDocs == emb.count() && occ.nCentroids == 16)

    assert(intercept[IllegalArgumentException] { IvfSq8Index.readMeta(emb) }
      .getMessage.contains("not an IVF-SQ8 index"))
    assert(intercept[IllegalArgumentException] {
      IvfSq8Index.build(emb, "vec_id", "embedding", IvfCentroids.centroids,
        cal._1.take(3), cal._2.take(3))
    }.getMessage.contains("calibration"))
    index.unpersist()
  }

  test("refitIfSkewed: no-op when balanced; self-heals from reconstructions when drifted; scores untouched") {
    val rnd = new scala.util.Random(17)
    def around(cx: Double, cy: Double, s: Double) =
      Array(cx + rnd.nextGaussian() * s, cy + rnd.nextGaussian() * s)
    val ctrs = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(-1.0, 0.0), Seq(0.0, -1.0))
    // calibration wide enough for both the balanced ring and the drift
    val (lo, hi) = (Seq(-2.0, -2.0), Seq(12.0, 12.0))

    val balanced = (0 until 60).map { i =>
      val c = ctrs(i % 4)
      (i.toLong, around(c.head, c(1), 0.05))
    }.toDF("vec_id", "embedding")
    val ok = IvfSq8Index.build(balanced, "vec_id", "embedding", ctrs, lo, hi)
    val (same, quiet) = IvfSq8Index.refitIfSkewed(ok, maxSkew = 3.0)
    assert((same eq ok) && quiet.skew <= 3.0)

    // a later epoch living far from every frozen centroid: everything
    // piles into one cell
    val drifted = (100 until 160).map(i =>
      (i.toLong, around(10.0, 3.0, 0.3))).toDF("vec_id", "embedding")
    val bad = IvfSq8Index.append(ok, drifted, "vec_id", "embedding")
    val before = IvfSq8Index.occupancyReport(bad)
    assert(before.skew > 2.0)
    val (fresh, fired) = IvfSq8Index.refitIfSkewed(bad, maxSkew = 2.0)
    assert(fired.skew == before.skew)
    val healed = IvfSq8Index.occupancyReport(fresh)
    assert(healed.skew <= 2.0 && healed.nonEmptyCells > 1, s"refit must rebalance: $healed")
    // self-healed: same calibration, same doc count, fresh centroids
    val (m2, ctrs2, lo2, hi2) = IvfSq8Index.readMeta(fresh)
    assert(m2.nDocs == 120L && lo2.toSeq == lo && hi2.toSeq == hi)
    assert(ctrs2.length == 4)
    // codes never changed: full-probe ADC ranks are bit-identical
    val qs = balanced.filter($"vec_id" < 3)
      .unionByName(drifted.filter($"vec_id" < 103))
    val beforeTop = topkSet(IvfSq8Index.topKAgainst(bad, qs, "vec_id", "embedding",
      k = 5, nProbe = 4))
    val afterTop = topkSet(IvfSq8Index.topKAgainst(fresh, qs, "vec_id", "embedding",
      k = 5, nProbe = 4))
    assert(beforeTop == afterTop && beforeTop.nonEmpty)
    ok.unpersist(); bad.unpersist(); fresh.unpersist()
  }
}
