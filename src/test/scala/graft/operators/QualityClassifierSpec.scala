package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def good(i: Int) =
    s"the quick brown fox number $i jumps over the lazy dog and runs to the old stone bridge with great speed"
  private def bad(i: Int) =
    s"$$$$$$ ### @@@@ zx$i qq%% ^^&& ||| ~~~ ++++ ::: ;;; buy now click here free $i$i$i win"

  test("learns to separate planted good/bad docs; scores are probabilities") {
    val train = ((0 until 80).map(i => (good(i), 1.0)) ++
      (0 until 80).map(i => (bad(i), 0.0))).toDF("text", "label")
    val model = QualityClassifier.train(train, "text", "label", numFeatures = 1 << 12)

    val holdout = ((1000 until 1020).map(i => (i.toLong, good(i), 1.0)) ++
      (1000 until 1020).map(i => (-i.toLong, bad(i), 0.0))).toDF("id", "text", "label")
    val scored = QualityClassifier.score(model, holdout, "text", "q")
      .select($"id", $"label", $"q").as[(Long, Double, Double)].collect()
    assert(scored.forall { case (_, _, q) => q >= 0.0 && q <= 1.0 })
    val correct = scored.count { case (_, l, q) => (q >= 0.5) == (l == 1.0) }
    assert(correct >= 38, s"holdout accuracy too low: $correct/40")
    // ...and decisively: the mean margin separates
    val gm = scored.filter(_._2 == 1.0).map(_._3).sum / 20
    val bm = scored.filter(_._2 == 0.0).map(_._3).sum / 20
    assert(gm > 0.8 && bm < 0.2, s"margins too soft: good=$gm bad=$bm")
  }

  test("artifact round-trips bit-exactly and scores identically from a fresh reload") {
    val train = ((0 until 60).map(i => (good(i), 1.0)) ++
      (0 until 60).map(i => (bad(i), 0.0))).toDF("text", "label")
    val model = QualityClassifier.train(train, "text", "label", numFeatures = 1 << 12)

    val dir = java.nio.file.Files.createTempDirectory("qclf").toString
    QualityClassifier.modelToDf(spark, model).write.parquet(s"$dir/model")
    val reloaded = QualityClassifier.modelFromDf(spark.read.parquet(s"$dir/model"))
    assert(reloaded.intercept == model.intercept)
    assert(reloaded.weights.toSeq == model.weights.toSeq)

    val docs = (0 until 10).map(i => (i.toLong, if (i % 2 == 0) good(i) else bad(i)))
      .toDF("id", "text")
    val a = QualityClassifier.score(model, docs, "text", "q")
      .select($"id", $"q").as[(Long, Double)].collect().toMap
    val b = QualityClassifier.score(reloaded, docs, "text", "q")
      .select($"id", $"q").as[(Long, Double)].collect().toMap
    assert(a == b, "reloaded model must score bit-identically")
  }

  test("corrupt artifacts fail typed") {
    val junk = Seq((0, 1.0, null.asInstanceOf[String])).toDF("idx", "w", "meta")
    val e1 = intercept[IllegalArgumentException] { QualityClassifier.modelFromDf(junk) }
    assert(e1.getMessage.contains("quality-classifier artifact"))
    val oob = Seq((-1, 0.5, "v1;numFeatures=4"), (7, 1.0, null.asInstanceOf[String]))
      .toDF("idx", "w", "meta")
    val e2 = intercept[IllegalArgumentException] { QualityClassifier.modelFromDf(oob) }
    assert(e2.getMessage.contains("outside numFeatures"))
  }
}
