package graft.operators

import graft.SparkSpec

/** The absolute floor under the LSH document-frequency prune
  * (VERDICT r6 ask #2 / NEXT r6 #4): the ratio bar alone is
  * mix-sensitive on small corpora — at N = 6, "df > 3" stops ordinary
  * content shingles and silently blinds Jaccard to REAL near-dups.
  * `minDocFreq` puts `max(ratio * N, minDocFreq)` under the bar, so
  * tiny corpora run effectively un-pruned by default while the frozen
  * replay oracles (q24/q56/q57) pin the pure-ratio form via
  * `minDocFreq = 0`.
  */
class DfFloorSpec extends SparkSpec {
  import spark.implicits._

  // Docs 0/1: the same long article, one character apart — a REAL
  // near-dup pair. The article body also opens docs 2/3 (a quote-heavy
  // small corpus), so every article shingle has df = 4 > 0.5 * 6 = 3:
  // the pure ratio bar prunes the pair's entire similarity signal.
  private val article =
    "the migration patterns of arctic terns span both polar regions " +
      "every single year covering astonishing distances over open ocean"
  private def corpus = Seq(
    (0L, article),
    (1L, article + "!"),
    (2L, article + " and here follows a long unrelated essay on volcanic " +
      "geology mineral formations basalt columns and tectonic drift"),
    (3L, article + " but instead this one discusses deep sea vents thermal " +
      "ecosystems chemosynthetic bacteria and hadal zone exploration"),
    (4L, "completely different content about quarterly cloud revenue " +
      "growth and enterprise software margins in the fiscal year"),
    (5L, "another unrelated piece describing sourdough fermentation " +
      "hydration ratios and the maillard reaction in home baking")
  ).toDF("id", "text")

  test("ratio-only bar (minDocFreq = 0) prunes a legitimate shingle set and loses the real pair") {
    val res = TextDedup.minHashLshDedup(corpus, "id", "text",
      n = 3, numPerm = 64, bands = 16, threshold = 0.7, minDocFreq = 0L)
    val pairs = res.pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(res.prunedShingles > 0, "the old bar must engage for this spec to mean anything")
    assert(!pairs.contains((0L, 1L)),
      "with the article shingles pruned, the near-identical pair is invisible")
    res.unpersist()
  }

  test("default floor keeps the small corpus un-pruned and finds the real pair") {
    val res = TextDedup.minHashLshDedup(corpus, "id", "text",
      n = 3, numPerm = 64, bands = 16, threshold = 0.7) // minDocFreq default
    val pairs = res.pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(res.prunedShingles == 0, "df can't exceed the floor in a 6-doc corpus")
    assert(pairs.contains((0L, 1L)))
    res.unpersist()
  }

  test("the floor is max()'d with the ratio bar, not a replacement") {
    // minDocFreq = 2 below the ratio bar (3): cutoff stays 3 and the
    // article shingles (df = 4) are still pruned — the floor can only
    // RAISE the bar, never lower it.
    val res = TextDedup.minHashLshDedup(corpus, "id", "text",
      n = 3, numPerm = 64, bands = 16, threshold = 0.7, minDocFreq = 2L)
    assert(res.prunedShingles > 0)
    res.unpersist()
  }

  test("cross-corpus path shares the floor (one lshCore)") {
    val even = corpus.filter($"id" % 2 === 0)
    val odd = corpus.filter($"id" % 2 =!= 0)
    val floored = TextDedup.minHashLshPairsAgainst(
      even, odd, "id", "text", n = 3, threshold = 0.7)
      .select("id_existing", "id_incoming").as[(Long, Long)].collect().toSet
    assert(floored.contains((0L, 1L)))
    val ratioOnly = TextDedup.minHashLshPairsAgainst(
      even, odd, "id", "text", n = 3, threshold = 0.7, minDocFreq = 0L)
      .select("id_existing", "id_incoming").as[(Long, Long)].collect().toSet
    assert(!ratioOnly.contains((0L, 1L)))
  }
}
