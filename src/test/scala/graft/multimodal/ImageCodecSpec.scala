package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal.ImageCodec
import org.apache.spark.sql.functions._

/** Real-codec (javax.imageio) contract: PNG decode is pixel-exact, JPEG
  * header reads are real, undecodable bytes degrade to null — never a
  * task failure — and the column surfaces keep the stub paths' shapes.
  */
class ImageCodecSpec extends SparkSpec {
  import spark.implicits._

  private def jpegBytes(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, Array.fill(w * h)((gray << 16) | (gray << 8) | gray), 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("PNG encode→decode round-trips dimensions and solid color exactly") {
    val bytes = ImageCodec.solidPng(13, 7, 200, 17, 99)
    assert(ImageCodec.sniffMime(bytes).contains("image/png"))
    assert(ImageCodec.dimensions(bytes).contains((13, 7)))
    val s = ImageCodec.stats(bytes).get
    assert(s == ImageCodec.Stats(13, 7, 200.0, 17.0, 99.0))
  }

  test("JPEG: mime sniff, header dimensions, lossy-but-close decode") {
    val bytes = jpegBytes(24, 16, 128)
    assert(ImageCodec.sniffMime(bytes).contains("image/jpeg"))
    assert(ImageCodec.dimensions(bytes).contains((24, 16)))
    val s = ImageCodec.stats(bytes).get
    assert(s.width == 24 && s.height == 16)
    // JPEG is lossy: a uniform gray field survives within a few counts
    assert(math.abs(s.mean_r - 128.0) < 4 &&
      math.abs(s.mean_g - 128.0) < 4 && math.abs(s.mean_b - 128.0) < 4)
  }

  test("corrupt / non-image / truncated bytes degrade to None, never throw") {
    assert(ImageCodec.sniffMime(null).isEmpty)
    assert(ImageCodec.sniffMime("not an image".getBytes).isEmpty)
    assert(ImageCodec.dimensions("junk junk junk".getBytes).isEmpty)
    assert(ImageCodec.stats(Array[Byte](0x89.toByte, 'P', 'N', 'G')).isEmpty)
    // valid magic, garbage body
    val corrupt = ImageCodec.solidPng(4, 4, 1, 2, 3).take(20) ++ Array.fill(40)(0x5A.toByte)
    assert(ImageCodec.stats(corrupt).isEmpty)
  }

  test("bounded decode: declared-gigapixel headers are refused before any pixel allocation") {
    // hand-assembled PNG signature + IHDR declaring 50000x50000 (2.5 GP)
    // in a few dozen bytes — the decompression-bomb shape. The header
    // parses (dimensions is header-only and unbounded) but stats must
    // refuse under the default bound without attempting the decode.
    val ihdrData = java.nio.ByteBuffer.allocate(13)
      .putInt(50000).putInt(50000)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    val crc = new java.util.zip.CRC32()
    crc.update("IHDR".getBytes("US-ASCII")); crc.update(ihdrData)
    val bomb = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      java.nio.ByteBuffer.allocate(8).putInt(13).put("IHDR".getBytes("US-ASCII")).array() ++
      ihdrData ++
      java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array()
    assert(ImageCodec.dimensions(bomb).contains((50000, 50000)))
    assert(ImageCodec.stats(bomb).isEmpty)
    // the bound is causal, not a side effect of the truncated body: a
    // perfectly decodable image above an explicit bound is refused too,
    // and accepted under the default
    val small = ImageCodec.solidPng(2, 2, 9, 9, 9)
    assert(ImageCodec.stats(small, maxPixels = 3L).isEmpty)
    assert(ImageCodec.stats(small).exists(_.width == 2))
  }

  test("withImageMetadata: real sniff + header dims; non-images keep null dims") {
    val rows = Seq(
      (1L, ImageCodec.solidPng(5, 9, 10, 20, 30)),
      (2L, jpegBytes(8, 4, 64)),
      (3L, "plain text payload".getBytes)
    ).toDF("id", "content")
    val got = Multimodal.withImageMetadata(rows, "content")
      .select($"id", $"asset_meta.media_type", $"asset_meta.width", $"asset_meta.height")
      .as[(Long, String, Option[Int], Option[Int])].collect().sortBy(_._1)
    assert(got(0) == ((1L, "image/png", Some(5), Some(9))))
    assert(got(1) == ((2L, "image/jpeg", Some(8), Some(4))))
    assert(got(2) == ((3L, "application/octet-stream", None, None)))
    // asset_meta shape matches the stub path's schema contract
    val stub = Multimodal.withAssetMetadata(rows, "content", "image/stub")
    assert(Multimodal.withImageMetadata(rows, "content").schema("asset_meta").dataType ==
      stub.schema("asset_meta").dataType)
  }

  test("imageStats column surface: exact PNG stats, null for undecodable rows") {
    val rows = Seq(
      (1L, ImageCodec.solidPng(3, 2, 255, 0, 128)),
      (2L, "payload".getBytes)
    ).toDF("id", "content")
    val got = Multimodal.imageStats(rows, "content")
      .select($"id", $"image_stats.width", $"image_stats.mean_r", $"image_stats.mean_b",
        $"image_stats".isNull.as("is_null"))
      .as[(Long, Option[Int], Option[Double], Option[Double], Boolean)]
      .collect().sortBy(_._1)
    assert(got(0) == ((1L, Some(3), Some(255.0), Some(128.0), false)))
    assert(got(1)._5) // undecodable -> null struct
  }

  test("dHash: exact 9x8 path, gradient geometry, block-average scale invariance") {
    def img9x8(f: (Int, Int) => Int) =
      ImageCodec.grayPng(Array.tabulate(8, 9)((y, x) => f(x, y)))
    // monotone-increasing rows: every gradient bit fires -> all-ones hash
    val rising = img9x8((x, _) => x * 20)
    assert(ImageCodec.dHash(rising).contains(-1L))
    // flat image: no gradient anywhere -> zero hash
    assert(ImageCodec.dHash(img9x8((_, _) => 100)).contains(0L))
    // one perturbed pixel flips exactly the bits its two gradients touch
    val nearly = img9x8((x, y) => if (x == 4 && y == 2) 150 else x * 20)
    val d = java.lang.Long.bitCount(
      ImageCodec.dHash(nearly).get ^ ImageCodec.dHash(rising).get)
    assert(d >= 1 && d <= 2, s"one-pixel edit must move 1-2 bits, moved $d")

    // a 2x upscale block-averages back to the SAME grid -> identical hash
    val big = ImageCodec.grayPng(Array.tabulate(16, 18)((y, x) => (x / 2) * 20))
    assert(ImageCodec.dHash(big) == ImageCodec.dHash(rising))

    // sub-grid images and non-images degrade to None
    assert(ImageCodec.dHash(ImageCodec.solidPng(4, 4, 9, 9, 9)).isEmpty)
    assert(ImageCodec.dHash("not an image".getBytes).isEmpty)
  }

  test("imageDupPairs: near-dups pair with exact Hamming, far images and corrupt rows never pair") {
    def img9x8(f: (Int, Int) => Int) =
      ImageCodec.grayPng(Array.tabulate(8, 9)((y, x) => f(x, y)))
    val rows = Seq(
      (1L, img9x8((x, _) => x * 20)),
      (2L, img9x8((x, y) => if (x == 4 && y == 2) 150 else x * 20)), // ~1-2 bits off 1
      (3L, img9x8((x, _) => x * 20)),                               // exact dup of 1
      (4L, img9x8((_, _) => 100)),                                  // far (64 bits off)
      (5L, "corrupt".getBytes)
    ).toDF("id", "content")
    val pairs = Multimodal.imageDupPairs(rows, "id", "content", maxDistance = 3)
      .as[(Long, Long, Int)].collect().toSet
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(byPair((1L, 3L)) == 0)
    assert(byPair((1L, 2L)) >= 1 && byPair((1L, 2L)) <= 2)

    // cross-modality composition: the TEXT dedup machinery canonicalizes
    // image clusters unchanged — {1,2,3} collapse to canonical 1, the
    // flat image and the corrupt row stay their own singletons
    val canon = graft.operators.ConnectedComponents.canonicalize(
        rows.select($"id"), Multimodal.imageDupPairs(rows, "id", "content", 3), "id")
      .select($"id", $"cluster_id", $"is_canonical")
      .as[(Long, Long, Int)].collect().toSet
    assert(canon == Set((1L, 1L, 1), (2L, 1L, 0), (3L, 1L, 0),
      (4L, 4L, 1), (5L, 5L, 1)))
  }
}
