package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal.AudioCodec
import org.apache.spark.sql.functions._

/** Real-codec (javax.sound.sampled) contract — the ImageCodecSpec
  * discipline for audio: WAV PCM decode is sample-exact (the square
  * wave's rms/peak are dyadic rationals, so equality is `==`, not
  * tolerance), header reads touch no samples, the declared-size bomb
  * guard runs before decode, and undecodable bytes degrade to null —
  * never a task failure.
  */
class AudioCodecSpec extends SparkSpec {
  import spark.implicits._

  test("WAV encode→decode round-trips format and square-wave stats exactly") {
    val bytes = AudioCodec.squareWav(sampleRate = 8000, nFrames = 800, amplitude = 12288)
    assert(AudioCodec.sniffMime(bytes).contains("audio/wav"))
    assert(AudioCodec.format(bytes).contains((8000, 1, 800L)))
    val s = AudioCodec.stats(bytes).get
    // amplitude/32768 is dyadic: rms and peak are EXACT
    assert(s == AudioCodec.Stats(8000, 1, 800L, 0.1, 12288.0 / 32768.0, 12288.0 / 32768.0))
  }

  test("declared-size guard refuses before decoding; silence and zero-amp edge cases") {
    val bytes = AudioCodec.squareWav(16000, 1600, 0)
    val s = AudioCodec.stats(bytes).get
    assert(s.rms == 0.0 && s.peak == 0.0 && s.n_frames == 1600L && s.duration_s == 0.1)
    // the same payload under a tiny sample budget: refused via the
    // HEADER's declared length, not an OOM inside the decoder
    assert(AudioCodec.stats(bytes, maxSamples = 100).isEmpty)
  }

  test("corrupt / non-audio / truncated bytes degrade to None, never throw") {
    assert(AudioCodec.sniffMime(null).isEmpty)
    assert(AudioCodec.sniffMime("not audio at all".getBytes).isEmpty)
    assert(AudioCodec.format("RIFFxxxxJUNK".getBytes).isEmpty)
    assert(AudioCodec.stats("RIFF????WAVEgarbage-body".getBytes).isEmpty)
    val truncated = AudioCodec.squareWav(8000, 100, 1000).take(30)
    assert(AudioCodec.stats(truncated).isEmpty)
  }

  test("eHash: exact block geometry, gain invariance, near/far distances, contracts") {
    def wav(amps: Seq[Int]) = AudioCodec.blockWav(8000, framesPerBlock = 4, amps)
    // strictly rising envelope: every gradient bit fires
    val rising = wav((0 until 65).map(b => 100 + b * 50))
    assert(AudioCodec.eHash(rising).contains(-1L))
    // flat envelope: zero hash
    assert(AudioCodec.eHash(wav(Seq.fill(65)(500))).contains(0L))

    // uniform gain does not move the hash (every window energy scales
    // alike — the re-normalized-copy robustness a byte hash lacks)
    val doubled = wav((0 until 65).map(b => (100 + b * 50) * 2))
    assert(AudioCodec.eHash(doubled) == AudioCodec.eHash(rising))

    // one flattened block flips only its two adjacent comparisons
    val amps = (0 until 65).map(b => 100 + b * 50)
    val dent = amps.updated(30, amps(32) + 100)
    val d = java.lang.Long.bitCount(
      AudioCodec.eHash(wav(dent)).get ^ AudioCodec.eHash(rising).get)
    assert(d >= 1 && d <= 2, s"one-block edit must move 1-2 bits, moved $d")
    // an unrelated sawtooth envelope sits far away
    val saw = wav((0 until 65).map(b => if (b % 2 == 0) 2000 else 100))
    val far = java.lang.Long.bitCount(
      AudioCodec.eHash(saw).get ^ AudioCodec.eHash(rising).get)
    assert(far > 20, s"alternating vs rising envelopes must differ widely: $far")

    // too-short and undecodable payloads degrade to None
    assert(AudioCodec.eHash(AudioCodec.squareWav(8000, 40, 1000)).isEmpty)
    assert(AudioCodec.eHash("not audio".getBytes).isEmpty)

    // column surface + HammingIndex composition: the audio serving path
    val rows = Seq((1L, rising), (2L, doubled), (3L, saw),
      (4L, "junk".getBytes)).toDF("id", "content")
    val hashed = Multimodal.audioEHash(rows, "content")
    val ix = graft.operators.HammingIndex.build(
      hashed.filter($"id" === 1L), "id", "ehash")
    val probe = graft.operators.HammingIndex.pairsAgainst(ix,
      hashed.filter($"id" =!= 1L), "id", "ehash", maxDistance = 3)
    val pairs = probe.pairs.select("id_existing", "id_incoming")
      .as[(Long, Long)].collect().toSet
    probe.unpersist(); ix.unpersist()
    assert(pairs == Set((1L, 2L)), "the gain-scaled copy pairs; saw and junk do not")
  }

  test("column surfaces: audio_meta header struct and audio_stats decode struct, null-safe") {
    val rows = Seq(
      (1L, AudioCodec.squareWav(8000, 400, 16384)),
      (2L, "definitely not a wav".getBytes),
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "content")
    val meta = Multimodal.withAudioMetadata(rows, "content")
      .select($"id", $"audio_meta.media_type", $"audio_meta.sample_rate", $"audio_meta.n_frames")
      .as[(Long, String, Option[Int], Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(meta(1L) == (("audio/wav", Some(8000), Some(400L))))
    assert(meta(2L) == (("application/octet-stream", None, None)))
    assert(meta(3L) == (("application/octet-stream", None, None)))

    val stats = Multimodal.audioStats(rows, "content")
      .select($"id", $"audio_stats.rms", $"audio_stats.duration_s")
      .as[(Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(stats(1L) == ((Some(0.5), Some(0.05))))
    assert(stats(2L) == ((None, None)) && stats(3L) == ((None, None)))
  }
}
