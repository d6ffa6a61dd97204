package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction runs as a codegen-friendly column UDF with codec state
  * initialized once per executor, not per row.
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * environment): [[StubCodec]] produces deterministic pseudo-features
  * derived from the raw bytes. The Spark-side contract — schema, binary
  * transport, per-partition batching, feature vector shape — is real and
  * tested; swapping [[StubCodec.decode]] for a real codec changes no
  * plumbing.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Wrap a binary column as a media asset with metadata. Width/height
    * here come from the stub "header parse" — deterministic functions of
    * the byte length, mirroring what a real header sniff would fill.
    */
  def withAssetMetadata(df: DataFrame, contentCol: String, mediaType: String): DataFrame =
    df.withColumn("asset_meta", struct(
      lit(mediaType).as("media_type"),
      octet_length(col(contentCol)).cast("long").as("n_bytes"),
      (octet_length(col(contentCol)) % 640 + 1).cast("int").as("width"),
      (octet_length(col(contentCol)) % 480 + 1).cast("int").as("height")))

  /** STUB media codec. A real deployment would decode pixels/samples
    * here; this produces a deterministic 8-bin byte histogram (normalized
    * to [0,1]) so tests can pin exact outputs.
    */
  object StubCodec {
    val featureDim = 8
    def decode(bytes: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](featureDim)
      if (bytes == null || bytes.isEmpty) return hist
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xFF) / 32) += 1f
        i += 1
      }
      var j = 0
      while (j < featureDim) { hist(j) /= bytes.length; j += 1 }
      hist
    }
  }

  /** STUB resize: a real codec would decode, scale, re-encode; the stub
    * rewrites the metadata struct (the cluster-side contract: resize is
    * a per-row map, never a shuffle) and truncates payload bytes
    * proportionally so downstream size accounting stays consistent.
    */
  def resize(df: DataFrame, contentCol: String, w: Int, h: Int): DataFrame =
    df
      .withColumn(contentCol,
        expr(s"substring($contentCol, 1, greatest(int(octet_length($contentCol) / 4), 1))"))
      .withColumn("asset_meta", struct(
        col("asset_meta.media_type").as("media_type"),
        octet_length(col(contentCol)).cast("long").as("n_bytes"),
        lit(w).as("width"),
        lit(h).as("height")))

  /** STUB frame sampling: treat the payload as `nFrames` equal slices
    * ("video frames") and explode every k-th as its own asset row —
    * the generator-shaped op of a video pipeline (row -> frames fan-out
    * is a narrow explode, no shuffle).
    */
  def sampleFrames(df: DataFrame, contentCol: String, nFrames: Int, everyK: Int): DataFrame = {
    val frameIdx = explode(sequence(lit(0), lit(nFrames - 1), lit(everyK)))
    df.withColumn("frame_idx", frameIdx)
      .withColumn("frame_bytes",
        expr(s"substring($contentCol, int(frame_idx * octet_length($contentCol) / $nFrames) + 1, " +
          s"greatest(int(octet_length($contentCol) / $nFrames), 1))"))
  }

  /** Feature extraction over the binary content column: appends
    * `features: array<float>`. A Scala UDF (`Array[Byte] => Array[Float]`)
    * keeps the frame inside Tungsten/whole-stage codegen — only the one
    * binary column is deserialized per row, not the whole Row (the
    * previous `df.rdd.mapPartitions` exited Tungsten for every column of
    * every row). Codec init amortizes through the executor-lifetime
    * closure (a real codec would sit in a `lazy val` here, initialized
    * once per executor — strictly better than once per partition);
    * `mapPartitions` is only warranted for a codec with true
    * per-partition mutable state, which the stub does not have.
    */
  def extractFeatures(df: DataFrame, contentCol: String): DataFrame = {
    // lazy so a real codec swap initializes on first executor use
    lazy val codec = StubCodec
    val decodeUdf = udf((bytes: Array[Byte]) => codec.decode(bytes))
      .asNonNullable()
    df.withColumn("features", decodeUdf(col(contentCol).cast("binary")))
  }
}
