package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[HammingIndex]]'s contract: probe == brute force over the
  * fingerprints (modulo capped buckets), the lifecycle is the family's
  * (append stores batch-local counts, compact repairs, merge == union),
  * and the generic hash column makes it the image-dedup serving path
  * (dHash longs probe exactly like any fingerprint).
  */
class HammingIndexSpec extends SparkSpec {
  import spark.implicits._

  // deterministic fingerprints with planted near-dup structure: base
  // patterns far apart, per-id variants flip 0-2 low bits
  private def hashOf(i: Long): Long = {
    val base = (i % 5) * 0x1111111111111111L
    base ^ ((i / 5) % 3 match {
      case 0 => 0L
      case 1 => 1L
      case 2 => 3L
    })
  }
  private def frame(ids: Range) = ids.map(i => (i.toLong, hashOf(i))).toDF("id", "h")

  test("pairsAgainst == brute force; dedupAgainst drops exactly the matched incoming ids") {
    val kept = frame(0 until 60)
    val batch = frame(100 until 140)
    val ix = HammingIndex.build(kept, "id", "h")
    val probe = HammingIndex.pairsAgainst(ix, batch, "id", "h", maxDistance = 2)
    val got = probe.pairs.as[(Long, Long, Int)].collect().toSet
    probe.unpersist()

    val keptH = (0 until 60).map(i => i.toLong -> hashOf(i))
    val batchH = (100 until 140).map(i => i.toLong -> hashOf(i))
    val want = (for {
      (ke, ha) <- keptH
      (in, hb) <- batchH
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 2
    } yield (ke, in, d)).toSet
    assert(got == want && got.nonEmpty)

    val survivors = HammingIndex.dedupAgainst(ix, batch, "id", "h", maxDistance = 2)
      .select("id").as[Long].collect().toSet
    assert(survivors == batchH.map(_._1).toSet -- want.map(_._2))
    ix.unpersist()
  }

  test("append probes like a fresh build; compact == rebuild; mergeMany == build(union)") {
    val a = frame(0 until 40)
    val b = frame(200 until 240)
    def probeSet(ix: org.apache.spark.sql.DataFrame) = {
      val p = HammingIndex.pairsAgainst(ix, frame(500 until 520), "id", "h", 2)
      val out = p.pairs.as[(Long, Long, Int)].collect().toSet
      p.unpersist(); out
    }
    val appended = HammingIndex.append(HammingIndex.build(a, "id", "h"), b, "id", "h")
    val rebuilt = HammingIndex.build(a.unionAll(b), "id", "h")
    assert(probeSet(appended) == probeSet(rebuilt))
    assert(HammingIndex.readMeta(appended).nDocs == 80L)
    val compacted = HammingIndex.compact(appended, "id")
    assert(probeSet(compacted) == probeSet(rebuilt))
    val merged = HammingIndex.mergeMany(
      Seq(HammingIndex.build(a, "id", "h"), HammingIndex.build(b, "id", "h")), "id")
    assert(probeSet(merged) == probeSet(rebuilt))
    assert(HammingIndex.readMeta(merged) == HammingIndex.readMeta(compacted))
    appended.unpersist(); rebuilt.unpersist(); compacted.unpersist(); merged.unpersist()
  }

  test("image dHash longs serve as fingerprints: index probe matches the one-shot pair geometry") {
    import graft.multimodal.Multimodal
    def img9x8(f: (Int, Int) => Int) =
      Multimodal.ImageCodec.grayPng(Array.tabulate(8, 9)((y, x) => f(x, y)))
    val kept = Seq(
      (1L, img9x8((x, _) => x * 20)),
      (2L, img9x8((_, _) => 100))).toDF("id", "content")
    val incoming = Seq(
      (10L, img9x8((x, y) => if (x == 4 && y == 2) 150 else x * 20)), // near 1
      // genuinely mixed gradients (a monotone-DEcreasing ramp would
      // hash all-zeros, same as the flat image — dHash sees direction)
      (11L, img9x8((x, y) => ((x * 83 + y * 53) % 7) * 30)),
      (12L, "corrupt".getBytes)).toDF("id", "content")
    val ix = HammingIndex.build(
      Multimodal.imageDHash(kept, "content"), "id", "dhash")
    val probe = HammingIndex.pairsAgainst(ix,
      Multimodal.imageDHash(incoming, "content"), "id", "dhash", maxDistance = 3)
    val pairs = probe.pairs.select("id_existing", "id_incoming")
      .as[(Long, Long)].collect().toSet
    probe.unpersist()
    assert(pairs == Set((1L, 10L)))
    // corrupt rows have null hashes: dropped from the probe, and they
    // pass dedupAgainst untouched (no fingerprint, no identity)
    val surv = HammingIndex.dedupAgainst(ix,
        Multimodal.imageDHash(incoming, "content"), "id", "dhash", maxDistance = 3)
      .select("id").as[Long].collect().toSet
    assert(surv == Set(11L, 12L))
    ix.unpersist()
  }

  test("saturated buckets are suppressed with the drop reported; typed errors on junk") {
    // 30 identical fingerprints: every segment bucket holds 30 > cap 8
    val kept = (0 until 30).map(i => (i.toLong, 42L)).toDF("id", "h")
    val ix = HammingIndex.build(kept, "id", "h", maxBucketSize = 8)
    val probe = HammingIndex.pairsAgainst(ix,
      Seq((100L, 42L)).toDF("id", "h"), "id", "h", maxDistance = 2)
    assert(probe.pairs.isEmpty && probe.droppedBuckets == 4L)
    probe.unpersist(); ix.unpersist()

    assert(intercept[IllegalArgumentException] {
      HammingIndex.readMeta(kept)
    }.getMessage.contains("not a Hamming index"))
    assert(intercept[IllegalArgumentException] {
      HammingIndex.build(kept, "id", "h", segments = 5)
    }.getMessage.contains("divide 64"))
  }

  test("compact records deleted over-cap buckets in meta; mergeMany sums the records") {
    // 30 identical fingerprints under cap 8: 4 saturated buckets that
    // build retains (probe suppresses + reports) but compact DELETES —
    // the deletion must stay visible as meta.builtDroppedBuckets, else
    // the missing-pair signal silently disappears (r9 ADVICE).
    val kept = (0 until 30).map(i => (i.toLong, 42L)).toDF("id", "h")
    val ix = HammingIndex.build(kept, "id", "h", maxBucketSize = 8)
    assert(HammingIndex.readMeta(ix).builtDroppedBuckets == 0L)
    val compacted = HammingIndex.compact(ix, "id")
    assert(HammingIndex.readMeta(compacted).builtDroppedBuckets == 4L)
    // the probe now sees no saturated rows, so droppedBuckets reads 0 —
    // exactly the blind spot the meta record closes
    val probe = HammingIndex.pairsAgainst(compacted,
      Seq((100L, 42L)).toDF("id", "h"), "id", "h", maxDistance = 2)
    assert(probe.pairs.isEmpty && probe.droppedBuckets == 0L)
    probe.unpersist()
    // a second compact deletes nothing new; the record is monotone
    val again = HammingIndex.compact(compacted, "id")
    assert(HammingIndex.readMeta(again).builtDroppedBuckets == 4L)
    // mergeMany carries the SUM of generation records before adding its
    // own compaction drops (disjoint ids, no new saturation here)
    val other = (100 until 130).map(i => (i.toLong, 0x5555L)).toDF("id", "h")
    val ix2 = HammingIndex.compact(
      HammingIndex.build(other, "id", "h", maxBucketSize = 8), "id")
    assert(HammingIndex.readMeta(ix2).builtDroppedBuckets == 4L)
    val merged = HammingIndex.mergeMany(Seq(compacted, ix2), "id")
    assert(HammingIndex.readMeta(merged).builtDroppedBuckets == 8L)
    assert(HammingIndex.readMeta(merged).nDocs == 60L)
    ix.unpersist(); compacted.unpersist(); again.unpersist()
    ix2.unpersist(); merged.unpersist()
  }

  test("capDriftReport fires on cross-append bucket growth; compactIfDrifted repairs then silences") {
    val H = 0x7777000012345678L
    def docs(ids: Range) = ids.map(i => (i.toLong, H)).toDF("id", "h")
    // 3 identical hashes at cap 3: built clean, no drift
    val ix = HammingIndex.build(docs(0 until 3), "id", "h", maxBucketSize = 3)
    val quiet = HammingIndex.capDriftReport(ix)
    assert(!quiet.crossed && quiet.drifted.isEmpty)
    // two more of the same hash: each stored row claims <= cap, the
    // true bucket size is 5 on every segment
    val grown = HammingIndex.append(ix, docs(10 until 12), "id", "h")
    val report = HammingIndex.capDriftReport(grown)
    assert(report.crossed && report.drifted.length == 4)
    assert(report.drifted.forall { case (_, _, t, s) => t == 5L && s <= 3L })
    // the loop: fires -> compact deletes the 4 over-cap buckets and
    // records them; a second pass is a no-op on the same frame
    val (repaired, fired) = HammingIndex.compactIfDrifted(grown, "id")
    assert(fired.crossed)
    assert(HammingIndex.readMeta(repaired).builtDroppedBuckets == 4L)
    val (same, silent) = HammingIndex.compactIfDrifted(repaired, "id")
    assert((same eq repaired) && !silent.crossed)
    ix.unpersist(); grown.unpersist(); repaired.unpersist()
  }

  test("capDriftReportMany: per-generation quiet, union-wide fires; recipe mismatch typed") {
    val H = 0x0f0f0f0f0f0f0f0fL
    def docs(ids: Range) = ids.map(i => (i.toLong, H)).toDF("id", "h")
    val gen1 = HammingIndex.build(docs(0 until 2), "id", "h", maxBucketSize = 3)
    val gen2 = HammingIndex.build(docs(10 until 12), "id", "h", maxBucketSize = 3)
    assert(!HammingIndex.capDriftReport(gen1).crossed)
    assert(!HammingIndex.capDriftReport(gen2).crossed)
    val union = HammingIndex.capDriftReportMany(Seq(gen1, gen2))
    assert(union.crossed && union.nDocs == 4L && union.drifted.length == 4)
    val other = HammingIndex.build(docs(20 until 22), "id", "h", segments = 2)
    assert(intercept[IllegalArgumentException] {
      HammingIndex.capDriftReportMany(Seq(gen1, other))
    }.getMessage.contains("one recipe"))
    gen1.unpersist(); gen2.unpersist(); other.unpersist()
  }
}
