package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-frequency line deduplication — the CCNet/RefinedWeb-style
  * boilerplate pass: segment every document, count how many DISTINCT
  * documents each segment occurs in corpus-wide, drop segments above a
  * document-frequency bar, and rebuild each document from its surviving
  * segments in original order. This removes cookie banners, nav menus,
  * share buttons and licence footers that exact/near-dup DOCUMENT dedup
  * cannot touch (the documents differ; their lines don't).
  *
  * Scale design (100 TB lens): cost is O(corpus segments), never
  * all-pairs. Three shuffles — (1) doc-frequency `groupBy(segment)`
  * with partial distinct aggregation, (2) the segments ⋈ frequency
  * join (one row per distinct segment on the frequency side; mega-hot
  * boilerplate keys are uneven-partition skew, which AQE's skew-join
  * split handles, not a row-explosion), (3) the per-document rebuild
  * `groupBy(id)` whose `collect_list` is bounded by single-document
  * length. The input is scanned twice (segments + per-doc totals), both
  * times pruned to (id, text). All segmentation is `functions._`
  * expressions — codegen'd, no UDF.
  */
object LineDedup {

  /** How to cut a document into dedup units. */
  sealed trait Segmenter

  /** Split on a regex delimiter — the production mode (`"\n"` for web
    * text). Segments are trimmed and empty segments are dropped, so
    * blank lines neither count nor survive.
    */
  final case class DelimSegments(regex: String = "\n") extends Segmenter

  /** Fixed non-overlapping k-word chunks (split on a single space) —
    * the span-level mode for corpora without line structure. Chunks
    * keep raw split semantics (no trimming) so the unit is exactly
    * reconstructable with a `" "` joiner.
    */
  final case class WordChunkSegments(k: Int) extends Segmenter {
    require(k > 0, s"chunk size must be positive, got $k")
  }

  private[operators] def joinerFor(seg: Segmenter): String = seg match {
    case DelimSegments(_)     => "\n"
    case WordChunkSegments(_) => " "
  }

  /** Ordered segment array for one text value; null/empty text yields
    * an empty array in both modes. The `when` guard on the word-chunk
    * sequence matters: `sequence(0, -1)` evaluates DESCENDING in Spark
    * (`[0, -1]`), so the unguarded form would fabricate segments for
    * empty docs (same trap as [[TextDedup.shingles]]).
    */
  private[operators] def segmentsCol(text: Column, seg: Segmenter): Column = seg match {
    case DelimSegments(re) =>
      filter(
        transform(split(coalesce(text, lit("")), re), s => trim(s)),
        s => s =!= "")
    case WordChunkSegments(k) =>
      val words = split(text, " ")
      val nseg = ceil(size(words).cast("double") / k).cast("long")
      when(text.isNotNull && length(text) > 0,
        transform(
          sequence(lit(0L), nseg - 1),
          i => array_join(slice(words, (i * k + 1).cast("int"), lit(k)), " ")))
        .otherwise(array().cast("array<string>"))
  }

  /** Rebuild every document from the segments whose corpus document
    * frequency is ≤ `maxDocFreq`. Returns one row per input document:
    * `(idCol, text_kept, n_total, n_kept)` — a document whose segments
    * are all boilerplate survives with `text_kept = ""` so the caller
    * decides the drop policy (CCNet drops; a provenance pipeline may
    * keep the tombstone). Join back on `idCol` for the remaining
    * columns.
    *
    * `joiner` defaults per mode (`"\n"` / `" "`), so
    * `maxDocFreq = ∞` reproduces the input text byte-for-byte for
    * clean inputs — pinned by spec as the reconstruction-order
    * invariant.
    */
  def dedupLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      segmenter: Segmenter,
      maxDocFreq: Long,
      joiner: Option[String] = None): DataFrame = {
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1, got $maxDocFreq")
    val id = col(idCol)
    val join = joiner.getOrElse(joinerFor(segmenter))

    val segs = df.select(
      id, posexplode(segmentsCol(col(textCol), segmenter)).as(Seq("pos", "seg")))
    val dfreq = segs.groupBy("seg")
      .agg(countDistinct(id).as("__df"))
    val kept = segs.join(dfreq, Seq("seg"))
      .filter(col("__df") <= maxDocFreq)
    val rebuilt = kept.groupBy(idCol).agg(
      array_join(
        transform(
          array_sort(collect_list(struct(col("pos"), col("seg")))),
          x => x.getField("seg")),
        join).as("text_kept"),
      count(lit(1)).as("n_kept"))

    val totals = df.select(
      id, size(segmentsCol(col(textCol), segmenter)).cast("long").as("n_total"))
    totals.join(rebuilt, Seq(idCol), "left")
      .select(
        id,
        coalesce(col("text_kept"), lit("")).as("text_kept"),
        col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Exact repeated-span diagnostics (the substring-dedup signal of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better"): slide an n-word window over every document, count each
    * window's TOTAL corpus-wide occurrences (within-doc repeats count —
    * boilerplate repeats inside one doc are the same memorization
    * hazard), and report per document how many of its windows recur
    * ≥ `minDup` times. Returns `(idCol, n_windows, n_dup, dup_ratio)`;
    * documents shorter than `n` words keep a zero row. The removal
    * policy stays with the caller — this is the measurement half.
    *
    * Scale: the window explode is one row per token position (each
    * carrying an n-word string — bandwidth n× the corpus, the price of
    * EXACT counting; callers at extreme scale can pre-hash to
    * `md5(win)` on both sides of the count if 2^-64 collision odds are
    * acceptable). Shuffles: occurrence `groupBy(win)` with partial
    * aggregation, the windows ⋈ counts join (hot boilerplate windows =
    * AQE skew-split territory, one count row per distinct window), and
    * the per-doc rebuild `groupBy(id)`. Nothing quadratic, nothing
    * driver-side.
    */
  def duplicatedSpanStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDup: Long): DataFrame = {
    require(n >= 1, s"window width must be >= 1, got $n")
    require(minDup >= 1, s"minDup must be >= 1, got $minDup")
    val id = col(idCol)
    val text = col(textCol)
    def nWindows: Column = nWindowsCol(text, n)
    def windowsCol: Column = slidingWindowsCol(text, n)

    val wins = df.select(id, explode(windowsCol).as("win"))
    val cnt = wins.groupBy("win").agg(count(lit(1)).as("__c"))
    val per = wins.join(cnt, Seq("win"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("__nw"),
        sum(when(col("__c") >= minDup, 1L).otherwise(0L)).as("__nd"))
    df.select(id, nWindows.as("n_windows"))
      .join(per, Seq(idCol), "left")
      .select(
        id,
        col("n_windows"),
        coalesce(col("__nd"), lit(0L)).as("n_dup"),
        round(
          when(col("n_windows") > 0,
            coalesce(col("__nd"), lit(0L)).cast("double") / col("n_windows"))
            .otherwise(lit(0.0)),
          6).as("dup_ratio"))
  }

  /** Sliding n-word window count for one text value (0 for null/empty). */
  private[operators] def nWindowsCol(text: Column, n: Int): Column = {
    val words = split(text, " ")
    when(text.isNotNull && length(text) > 0,
      greatest(size(words) - (n - 1), lit(0)).cast("long"))
      .otherwise(lit(0L))
  }

  /** Ordered sliding n-word windows (space-joined). Same
    * sequence(0, -1)-descends guard as [[segmentsCol]].
    */
  private[operators] def slidingWindowsCol(text: Column, n: Int): Column = {
    val words = split(text, " ")
    when(nWindowsCol(text, n) > 0,
      transform(
        sequence(lit(0L), nWindowsCol(text, n) - 1),
        i => array_join(slice(words, (i + 1).cast("int"), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact repeated-span REMOVAL — the policy half of
    * [[duplicatedSpanStats]] (Lee et al.'s ExactSubstr dedup, the
    * word-level Spark-first form): a word position is DUPLICATED when it
    * lies inside any sliding n-word window whose corpus-wide occurrence
    * count (within-doc repeats included, same counting rule as the
    * stats) reaches `minDup`; every duplicated position is removed and
    * each document is rebuilt from its surviving words in original
    * order. Unlike a suffix-array formulation this needs no global
    * order — the window counts ARE the duplicate oracle, n is the
    * minimal span length worth removing (Lee et al. use 50 BPE tokens;
    * words here), and any repeat of length >= n is covered because all
    * its length-n sub-windows are themselves repeats.
    *
    * Returns one row per input document: `(idCol, text_kept, n_words,
    * n_removed)`. A fully-duplicated document survives as
    * `text_kept = ""` (caller owns the drop policy, as in
    * [[dedupLines]]); with no window reaching `minDup` the rebuild is
    * byte-identical to the input for space-joined text — the
    * reconstruction invariant, spec-pinned.
    *
    * Scale (100 TB lens): three shuffles — the window-occurrence
    * `groupBy(win)` (partial agg; hot boilerplate windows are AQE
    * skew-join territory on the count join), the anti-join of word
    * positions against covered positions on `(id, wpos)`, and the
    * per-doc rebuild `groupBy(id)` (collect_list bounded by document
    * length). The n-x row fan-out (start -> covered positions) happens
    * ONLY on duplicated window starts, so clean corpora pay ~nothing
    * for it; nothing is quadratic, nothing driver-side.
    */
  def removeDuplicatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDup: Long): DataFrame = {
    require(n >= 1, s"window width must be >= 1, got $n")
    require(minDup >= 2, s"minDup must be >= 2 (1 would remove every word), got $minDup")
    val wins = df.select(
      col(idCol), posexplode(slidingWindowsCol(col(textCol), n)).as(Seq("pos", "win")))
    val dupWins = wins.groupBy("win").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minDup).select("win")
    rebuildWithoutCoveredSpans(df, idCol, textCol, n, wins, dupWins)
  }

  /** Shared removal core for [[removeDuplicatedSpans]] and
    * [[SpanFreqIndex.removeAgainst]]: given each document's positioned
    * windows and the set of duplicated window VALUES, drop every word
    * position covered by a duplicated window and rebuild. `wins` must be
    * `(idCol, pos, win)` for exactly `df`'s rows; `dupWins` one `win`
    * column (values may repeat — the join fans out per occurrence and
    * the anti side tolerates duplicates).
    */
  private[operators] def rebuildWithoutCoveredSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      wins: DataFrame,
      dupWins: DataFrame): DataFrame = {
    val id = col(idCol)
    val text = col(textCol)
    val words = split(text, " ")
    // duplicated starts fan out to their n covered positions; duplicate
    // (id, wpos) rows from overlapping windows are harmless on the anti
    // side, so no distinct — one shuffle saved
    val covered = wins.join(dupWins.select(col("win")), "win")
      .select(id, explode(sequence(col("pos"), col("pos") + (n - 1))).as("wpos"))

    val wordRows = df.select(
      id,
      posexplode(
        when(text.isNotNull && length(text) > 0, words)
          .otherwise(array().cast("array<string>"))).as(Seq("wpos", "word")))
    val kept = wordRows.join(covered, Seq(idCol, "wpos"), "left_anti")
    val rebuilt = kept.groupBy(idCol).agg(
      array_join(
        transform(
          array_sort(collect_list(struct(col("wpos"), col("word")))),
          x => x.getField("word")),
        " ").as("text_kept"),
      count(lit(1)).as("__nk"))

    val totals = df.select(
      id,
      when(text.isNotNull && length(text) > 0, size(words).cast("long"))
        .otherwise(lit(0L)).as("n_words"))
    totals.join(rebuilt, Seq(idCol), "left")
      .select(
        id,
        coalesce(col("text_kept"), lit("")).as("text_kept"),
        col("n_words"),
        (col("n_words") - coalesce(col("__nk"), lit(0L))).as("n_removed"))
  }
}
