package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trainable document-quality classifier — the fastText-style learned
  * filter of the GPT-3/LLaMA curation stacks (train on a small labeled
  * set: reference corpus = positive, raw crawl = negative; score the
  * whole corpus; keep above a threshold), completing the quality
  * toolchain next to the heuristic gates ([[CorpusFilters]]), the LM
  * signal ([[TextAnalysis.lmScore]]) and contamination
  * ([[Contamination]]).
  *
  * Features are hashed token counts ([[TextAnalysis.tokens]] family
  * tokenizer → `org.apache.spark.ml.feature.HashingTF`, `numFeatures`
  * buckets); the model is binomial logistic regression
  * (`spark.ml` LBFGS). THE ARTIFACT IS NOT the opaque ML writer
  * output: [[Model]] extracts the dense weight vector + intercept, and
  * [[modelToDf]] / [[modelFromDf]] persist it under the index-family
  * contract (one discriminated frame, write once, reopen anywhere,
  * typed error on corrupt shape) — so SCORING needs no ML pipeline
  * state, just HashingTF (a stateless transform — the same class that
  * built the training features, so the hash space matches by
  * construction) and one dot-product kernel over the broadcast
  * weights.
  *
  * Scale shape at 100 TB: training runs on the LABELED set (small by
  * definition — fastText quality models train on ~10^5 docs);
  * scoring is a per-row map — tokenize, hash, dot — with the weight
  * vector (`numFeatures` doubles, ~2 MB at the 2^18 default) broadcast
  * once via the task closure. No shuffle, no join, no explode on the
  * corpus side.
  */
object QualityClassifier {

  /** Driver-resident scoring artifact: `weights(i)` pairs with
    * HashingTF bucket `i`; score = sigmoid(w·counts + intercept).
    */
  final case class Model(weights: Array[Double], intercept: Double) {
    def numFeatures: Int = weights.length
  }

  private def featurize(
      df: DataFrame, textCol: String, numFeatures: Int): DataFrame = {
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("__toks").setOutputCol("__features").setNumFeatures(numFeatures)
    tf.transform(df.withColumn("__toks", TextAnalysis.tokens(col(textCol))))
  }

  /** Train on `(textCol, labelCol)` where the label is 0.0 (drop) or
    * 1.0 (keep). `regParam` is L2; the labeled set is assumed
    * small-to-medium (the fastText regime) — the corpus-sized step is
    * [[score]], never this.
    */
  def train(
      labeled: DataFrame,
      textCol: String,
      labelCol: String,
      numFeatures: Int = 1 << 18,
      maxIter: Int = 50,
      regParam: Double = 1e-4): Model = {
    require(numFeatures >= 2, s"numFeatures must be >= 2, got $numFeatures")
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setFeaturesCol("__features").setLabelCol("__label")
      .setMaxIter(maxIter).setRegParam(regParam).setStandardization(false)
    val fitted = lr.fit(
      featurize(labeled.withColumn("__label", col(labelCol).cast("double")),
        textCol, numFeatures))
    Model(fitted.coefficients.toArray, fitted.intercept)
  }

  /** Keep-probability in [0,1] per document: tokenize with the family
    * tokenizer, hash with the SAME HashingTF space the model trained
    * in, sigmoid the dot product. One compiled pass per row; the
    * weights broadcast with the task closure.
    */
  def score(model: Model, df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val scored = featurize(df, textCol, model.numFeatures)
    val w = model.weights
    val b = model.intercept
    val dotUdf = udf((v: org.apache.spark.ml.linalg.Vector) => {
      var z = b
      v match {
        case s: org.apache.spark.ml.linalg.SparseVector =>
          var k = 0
          while (k < s.indices.length) { z += w(s.indices(k)) * s.values(k); k += 1 }
        case d: org.apache.spark.ml.linalg.DenseVector =>
          var i = 0
          while (i < d.values.length) { z += w(i) * d.values(i); i += 1 }
      }
      1.0 / (1.0 + math.exp(-z))
    })
    scored.withColumn(outCol, dotUdf(col("__features")))
      .drop("__toks", "__features")
  }

  /** Persistable artifact: one meta row (`idx` -1, intercept +
    * feature count in `meta`) plus one row per NON-ZERO weight — L2
    * logistic weights are dense in principle but the unseen-bucket
    * weights are exactly 0.0, so the artifact stores only what
    * matters. Round-trips bit-exactly ([[modelFromDf]]).
    */
  def modelToDf(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    val metaRow = (-1, model.intercept, s"v1;numFeatures=${model.numFeatures}")
    val rows = model.weights.iterator.zipWithIndex
      .filter(_._1 != 0.0)
      .map { case (wv, i) => (i, wv, null.asInstanceOf[String]) }
      .toSeq
    (metaRow +: rows).toDF("idx", "w", "meta")
  }

  /** Reopen a [[modelToDf]] artifact; typed errors on shape drift. */
  def modelFromDf(df: DataFrame): Model = {
    val metas = df.filter(col("idx") === -1).select(col("w"), col("meta")).collect()
    require(metas.length == 1,
      s"not a quality-classifier artifact: expected one meta row, found ${metas.length}")
    val m = metas(0).getString(1)
    require(m != null && m.startsWith("v1;"), s"unknown artifact version: $m")
    val n = m.split(";")(1).split("=")(1).toInt
    val weights = new Array[Double](n)
    df.filter(col("idx") >= 0).select(col("idx"), col("w")).collect().foreach { r =>
      val i = r.getInt(0)
      require(i < n, s"corrupt artifact: weight index $i outside numFeatures $n")
      weights(i) = r.getDouble(1)
    }
    Model(weights, metas(0).getDouble(0))
  }
}
