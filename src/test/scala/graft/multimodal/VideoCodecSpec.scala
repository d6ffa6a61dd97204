package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal.VideoCodec
import org.apache.spark.sql.functions._

/** Header-only MP4 metadata contract — the ImageCodec/AudioCodec
  * discipline applied to the last stubbed modality: box arithmetic is
  * exact (construct-then-parse round-trips every field with `==`),
  * malformed containers degrade to None at EVERY truncation point
  * (never a task failure), and the column surface yields null structs
  * for junk rows. Frame decode stays honestly stubbed (no JDK codec);
  * this spec covers only what the bytes actually carry.
  */
class VideoCodecSpec extends SparkSpec {
  import spark.implicits._

  test("minimalMp4 parse round-trips dims, timescale, duration, track count exactly") {
    val b = VideoCodec.minimalMp4(width = 640, height = 360, timescale = 1000, duration = 7500)
    assert(VideoCodec.sniffMime(b).contains("video/mp4"))
    val m = VideoCodec.meta(b).get
    assert(m == VideoCodec.Meta(640, 360, 1000L, 7500L, 7.5, 1))
    // a second geometry, non-dyadic duration ratio: same IEEE division
    val m2 = VideoCodec.meta(VideoCodec.minimalMp4(1920, 1080, 600, 601)).get
    assert(m2.width == 1920 && m2.height == 1080 &&
      m2.duration_s == 601.0 / 600.0 && m2.n_tracks == 1)
  }

  test("corrupt / truncated / non-mp4 bytes degrade to None at every cut point, never throw") {
    val good = VideoCodec.minimalMp4(320, 240, 1000, 4000)
    // every prefix truncation inside the header walk must be safe; only
    // prefixes still containing the full moov may parse
    (0 until good.length by 7).foreach { n =>
      val cut = good.take(n)
      val got = VideoCodec.meta(cut)
      assert(got.isEmpty || n >= good.length,
        s"truncated at $n must not parse: $got")
    }
    assert(VideoCodec.meta(null) == None)
    assert(VideoCodec.meta(Array.emptyByteArray) == None)
    assert(VideoCodec.meta("not an mp4 at all, just text".getBytes) == None)
    assert(VideoCodec.sniffMime("RIFFxxxxWAVE".getBytes) == None)
    // a box whose declared size overruns the buffer ends the walk: here
    // the moov size field is corrupted to run past EOF -> no moov -> None
    val corrupt = good.clone()
    corrupt(16) = 0x7F.toByte // moov starts at offset 16; smash its size
    assert(VideoCodec.meta(corrupt) == None)
    // zero timescale must not divide
    val zeroTs = good.clone()
    // mvhd payload: moov@16 header 8 -> mvhd@24 header 8 -> version 4
    // -> creation 4 mod 4 -> timescale at 24+8+4+8 = 44
    java.util.Arrays.fill(zeroTs, 44, 48, 0.toByte)
    assert(VideoCodec.meta(zeroTs) == None)
  }

  test("withVideoMetadata column surface: parsed struct for mp4 rows, null fields for junk") {
    val rows = Seq(
      (1L, VideoCodec.minimalMp4(640, 480, 1000, 2000)),
      (2L, "junk bytes".getBytes),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "content")
    val got = Multimodal.withVideoMetadata(rows, "content")
      .select($"id", $"video_meta.media_type", $"video_meta.width",
        $"video_meta.duration_s", $"video_meta.n_tracks")
      .as[(Long, String, Option[Int], Option[Double], Option[Int])]
      .collect().sortBy(_._1)
    assert(got(0) == ((1L, "video/mp4", Some(640), Some(2.0), Some(1))))
    assert(got(1) == ((2L, "application/octet-stream", None, None, None)))
    assert(got(2)._3.isEmpty && got(2)._4.isEmpty)
  }
}
