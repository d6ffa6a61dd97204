package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the ProfileScale measurement methodology: the scaling corpus
  * must scale the WORK linearly without inventing cross-copy duplicate
  * structure, or the q51/q56 curve in SCALE.md measures an artifact
  * (the r6 first attempt did exactly that — see ProfileScale scaladoc).
  */
class ProfileScaleSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("scaled() replicates rows with disjoint ids, constant length profile") {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val f3 = ProfileScale.scaled(spark, sfDir, 3)
    assert(f3.count() == base.count() * 3)
    assert(f3.select("doc_id").distinct().count() == base.count() * 3)
    // translate is 1:1 on characters: per-copy length distribution is
    // identical, so the shingle/signature work per row is unchanged
    val baseLen = base.agg(sum(length(col("text")))).head.getLong(0)
    assert(f3.agg(sum(length(col("text")))).head.getLong(0) == 3 * baseLen)
  }

  test("copies are de-correlated: all near-dup pairs are within-copy, count linear") {
    val span = spark.read.parquet(s"$sfDir/documents.parquet")
      .agg(max("doc_id")).head.getLong(0) + 1
    def pairs(factor: Int) = {
      val docs = ProfileScale.scaled(spark, sfDir, factor)
      graft.operators.TextDedup.minHashLshPairsAgainst(
        docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 =!= 0),
        idCol = "doc_id", textCol = "text",
        n = 3, numPerm = 64, bands = 16, threshold = 0.7,
        maxDocFreqRatio = 1.0, portableHash = true)
    }
    val p1 = pairs(1).count()
    val p3 = pairs(3)
    val crossCopy = p3.filter(
      floor(col("id_existing") / span) =!= floor(col("id_incoming") / span)).count()
    assert(crossCopy == 0, "rotation must kill cross-copy similarity")
    assert(p3.count() == 3 * p1, "within-copy dup structure replicates linearly")
  }

  test("factors past the rotation's period are refused") {
    // the digit alphabet has period 10: copies k and k+10 share the digit
    // mapping, so factor 11 would silently reintroduce the cross-copy
    // pair artifact — scaled() must refuse rather than measure it
    val e = intercept[IllegalArgumentException] {
      ProfileScale.scaled(spark, sfDir, 11)
    }
    assert(e.getMessage.contains("period"))
    assert(intercept[IllegalArgumentException] {
      ProfileScale.scaled(spark, sfDir, 0)
    }.getMessage.contains("factor"))
  }
}
