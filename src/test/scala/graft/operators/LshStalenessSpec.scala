package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quantifies the LSH frozen-stop-set staleness trade-off (r8 VERDICT
  * ask #7) on a synthetic corpus where it can be pinned exactly. The
  * stop set is frozen at build time; when boilerplate arrives LATE (a
  * template that becomes corpus-common only after the build), a probe
  * against the appended index diverges from a rebuilt index in BOTH
  * directions:
  *   - SPURIOUS pairs: un-stopped boilerplate shingles dominate the
  *     Jaccard between content-unrelated docs that share the template;
  *   - MISSED true dups: a duplicate of a PRE-boilerplate kept doc that
  *     itself carries the template has its content similarity diluted
  *     below threshold by the un-stopped boilerplate shingles.
  * A rebuild's fresh stop set crosses the DF bar, prunes the template,
  * and both defects vanish while dup-of-late-doc pairs survive both
  * paths. ProfileScale's `staleness` mode measures the same geometry at
  * sf0.1 scale (SCALE.md record); this spec pins the mechanism.
  */
class LshStalenessSpec extends SparkSpec {
  import spark.implicits._

  test("late boilerplate: frozen probe emits spurious pairs and misses diluted true dups; rebuild fixes both") {
    // ~120 distinct 3-grams of boilerplate vs ~30 of content, so two
    // content-unrelated suffixed docs sit at J ~ 0.6 (above the 0.5
    // threshold) and a suffixed copy of a CLEAN doc at J ~ 0.2 (below)
    val boil = " subscribe to our newsletter and accept all cookies to continue " +
      "reading this exclusive premium article today best regards the editorial team"
    // per-doc content is UNIQUE tokens (no shared template beyond a
    // 1-char prefix), so distinct docs never pair on content — only the
    // boilerplate can link them
    def uniq(prefix: String, i: Long) =
      (0 until 5).map(k => s"$prefix${i * 37 + k * 11}z").mkString(" ")
    def baseText(i: Long) = uniq("q", i)
    // each family draws from a DISJOINT index range so no two docs of
    // different families share content tokens (same-index tokens across
    // prefixes would share nearly all their 3-grams)
    def lateText(i: Long) = uniq("v", i - 1000 + 200) + boil

    val base = (0L until 100L).map(i => (i, baseText(i))).toDF("doc_id", "text")
    val late = (1000L until 1150L).map(i => (i, lateText(i))).toDF("doc_id", "text")
    val incoming = (
      (2000L until 2020L).map(i => (i, uniq("f", i - 2000 + 600) + boil)) ++
      (0 until 5).map(j => (3000L + j, lateText(1000L + j))) ++      // dups of LATE docs
      (0 until 5).map(j => (4000L + j, baseText(j.toLong) + boil))   // dups of CLEAN docs + template
    ).toDF("doc_id", "text")

    // frozen path: stop set from the CLEAN base (no boilerplate in it),
    // late batch appended under it
    val frozenIx = LshIndex.append(
      LshIndex.build(base, "doc_id", "text", minDocFreq = 0),
      late, "doc_id", "text")
    // rebuild path: fresh stop set over base ∪ late — boilerplate df
    // 150/250 crosses the 0.5 bar and is pruned
    val rebuiltIx = LshIndex.build(base.unionAll(late), "doc_id", "text", minDocFreq = 0)
    assert(LshIndex.readMeta(rebuiltIx)._2.length > LshIndex.readMeta(frozenIx)._2.length,
      "rebuild must have stopped the late template; frozen must not have")

    def pairsOf(ix: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val p = LshIndex.pairsAgainst(ix, incoming, "doc_id", "text", threshold = 0.5)
      val out = p.pairs.select($"id_existing", $"id_incoming")
        .as[(Long, Long)].collect().toSet
      p.unpersist()
      out
    }
    val frozen = pairsOf(frozenIx)
    val rebuilt = pairsOf(rebuiltIx)
    frozenIx.unpersist(); rebuiltIx.unpersist()

    val dupOfLate = (0 until 5).map(j => (1000L + j, 3000L + j)).toSet
    val dupOfClean = (0 until 5).map(j => (j.toLong, 4000L + j)).toSet

    // dup-of-late pairs (identical text): found by BOTH paths
    assert(dupOfLate.subsetOf(frozen) && dupOfLate.subsetOf(rebuilt))
    // spurious: frozen pairs content-unrelated docs on shared boilerplate
    val spurious = frozen -- dupOfLate -- dupOfClean
    assert(spurious.size >= 5, s"expected spurious boilerplate pairs, got ${spurious.size}")
    assert(spurious.forall { case (e, _) => e >= 1000L }) // all against suffixed LATE docs
    // missed: the diluted dup-of-clean pairs are invisible to the frozen probe
    assert(dupOfClean.intersect(frozen).isEmpty)
    // the rebuild fixes both defects: exactly the ten true pairs, nothing else
    assert(rebuilt == dupOfLate ++ dupOfClean)
  }
}
