package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a random-
  * hyperplane LSH-bucketed variant as the scale path.
  *
  * Scale design: queries are broadcast (top-k is per-query, the corpus
  * never shuffles for the brute-force path); the LSH path prunes the
  * corpus to matching buckets before any distance math, turning a full
  * scan into a bucket-join — the difference between O(Q*N) and
  * O(Q*N/2^bits) dot products at 100 TB.
  *
  * All math is a left-fold over doubles — deterministic, identical in the
  * SQL oracle.
  */
object Similarity {

  /** Element-wise cast to double (float math is neither associative nor
    * engine-portable; do everything in double).
    */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity; 0 where either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n > 0, d / n).otherwise(lit(0.0))
  }

  /** Exact top-k neighbors for each query vector: broadcast the (small)
    * query set over the corpus, one window per query id. Self-matches
    * excluded when ids collide.
    */
  def bruteForceTopK(
      corpus: DataFrame,   // (idCol, vecCol)
      queries: DataFrame,  // (idCol, vecCol)
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("__qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("__cv"), col("__qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Fixed-seed random hyperplanes for sign-LSH. */
  private def hyperplanes(dim: Int, bits: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: bit i = sign(v . h_i). */
  def lshBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (h, i) =>
      val hCol = array(h.map(lit): _*)
      when(dot(v, hCol) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: candidates share the query's LSH bucket (plus all
    * buckets at Hamming distance 1 — standard multi-probe), then exact
    * cosine + window inside the candidate set.
    */
  def annTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      bits: Int = 8,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, bits, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("__cv"))
      .withColumn("__bucket", lshBucket(col("__cv"), planes))
    // multi-probe: each query probes its bucket and the `bits` neighbors
    val probes = (0 until bits).map(i => lit(1L << i))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("__qv"))
      .withColumn("__qbucket", lshBucket(col("__qv"), planes))
      .withColumn("__bucket",
        explode(array_union(array(col("__qbucket")),
          array(probes.map(p => col("__qbucket").bitwiseXOR(p)): _*))))
    val scored = c.join(broadcast(q), "__bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("__cv"), col("__qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored
      .select("query_id", "neighbor_id", "sim").distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    * partitions the corpus into `nCentroids` cells; each query probes its
    * `nProbe` nearest cells and runs exact cosine only inside them —
    * O(Q * N * nProbe / nCentroids) distance evaluations instead of
    * O(Q * N). Centroids are model-sized (driver/broadcast); the corpus
    * shuffles once at assignment time and can be written bucketed by
    * cell for repeated query workloads.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 2,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("__cv"))
      .withColumn("__features", array_to_vector(col("__cv")))
    val model = new KMeans()
      .setK(nCentroids).setSeed(seed).setFeaturesCol("__features")
      .fit(c)
    val assigned = model.transform(c)
      .withColumnRenamed(model.getPredictionCol, "__cell")
      .drop("__features")

    // centroids are tiny: rank a query's probe cells via a literal array
    // of centroid vectors, by the same metric KMeans assigns with (L2)
    val centroids = model.clusterCenters.map(_.toArray.toSeq)
    def l2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)
    val centroidCols = centroids.zipWithIndex.map { case (ctr, i) =>
      struct(lit(i).as("cell"), l2(col("__qv"), array(ctr.map(lit): _*)).as("d"))
    }
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("__qv"))
      .withColumn("__cells",
        slice(
          transform(
            array_sort(
              array(centroidCols: _*),
              (a, b) => when(a("d") < b("d"), -1).when(a("d") > b("d"), 1).otherwise(0)),
            s => s("cell")),
          1, nProbe))
      .withColumn("__cell", explode(col("__cells")))
      .drop("__cells")

    val scored = assigned.join(broadcast(q), "__cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("__cv"), col("__qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored
      .select("query_id", "neighbor_id", "sim").distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Embedding near-duplicate pairs: cosine >= threshold within blocks
    * (block on an LSH bucket or a provided key to bound the quadratic
    * term).
    */
  def embeddingDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      blockCols: Seq[String]): DataFrame = {
    val v = df.select(
      (idCol +: blockCols).map(col) :+ asDouble(col(vecCol)).as("__v"): _*)
    val a = v.select(col(idCol).as("id_a") +: col("__v").as("__va") +: blockCols.map(col): _*)
    val b = v.select(col(idCol).as("id_b") +: col("__v").as("__vb") +: blockCols.map(col): _*)
    a.join(b, blockCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("__va"), col("__vb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Self-blocked embedding dedup: sign-LSH buckets (with Hamming-1
    * multi-probe so near-identical vectors straddling one hyperplane
    * still meet) replace an external blocking key — the fully automatic
    * scale path. High-cosine pairs share most hyperplane signs, so few
    * probes recover them; exact cosine verifies.
    */
  def embeddingDupPairsLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      dim: Int,
      bits: Int = 8,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, bits, seed)
    val v = df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .withColumn("__b", lshBucket(col("__v"), planes))
    val probes = (0 until bits).map(i => lit(1L << i))
    // each vector lands in its bucket plus all Hamming-1 buckets; a pair
    // within Hamming distance 1 of each other is guaranteed to co-occur
    val expanded = v.withColumn("__bucket",
      explode(array_union(array(col("__b")),
        array(probes.map(p => col("__b").bitwiseXOR(p)): _*))))
    val a = expanded.select(col(idCol).as("id_a"), col("__v").as("__va"), col("__bucket"))
    val b = expanded.select(col(idCol).as("id_b"), col("__v").as("__vb"), col("__bucket"))
    a.join(b, Seq("__bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "__va", "__vb").dropDuplicates("id_a", "id_b")
      .withColumn("sim", cosine(col("__va"), col("__vb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
