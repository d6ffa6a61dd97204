package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application (Sennrich et
  * al. 2016) — the learned-subword upgrade over the regex proxy
  * [[graft.functions.Cols.bpeTokenCount]]: a training-data pipeline
  * reports per-document token counts under the REAL tokenizer the
  * model will train with, not a heuristic.
  *
  * Scale shape (the [[TextAnalysis.trainLm]] pattern): training runs
  * on the distributed WORD HISTOGRAM — one wordcount over the corpus
  * (the only corpus-sized pass), collected to the driver capped at
  * `maxVocabWords` distinct words by (count desc, word) — then the
  * merge loop is pure driver-side model fitting over vocab-sized state
  * (exactly like a k-means fit; at 100 TB the histogram is the
  * standard practical BPE-training reduction — HF tokenizers train the
  * same way). Application is a per-row kernel with the rank map closed
  * over (task-closure broadcast): O(doc length) per row, no explode,
  * no shuffle, no join, repeated words memoized within each document
  * because text is zipfian.
  *
  * Determinism: the histogram cap orders by (count desc, word asc);
  * merge ties break on the lexicographically smallest pair; greedy
  * lowest-rank application is the standard BPE apply. Same corpus →
  * same merges, bit for bit, on any cluster layout (spec-pinned).
  */
object Bpe {

  /** End-of-word marker symbol (a separate symbol, never merged into
    * view by accident: it cannot appear inside a whitespace token).
    */
  val EndOfWord = "</w>"

  /** A trained merge list, in training order; `ranks` is the apply-time
    * lookup (pair -> merge priority).
    */
  final case class BpeModel(merges: Seq[(String, String)]) {
    lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  private def words(textCol: Column): Column =
    filter(split(trim(coalesce(textCol, lit(""))), "\\s+"), w => w =!= "")

  /** Train `numMerges` merges on the corpus word histogram.
    *
    * @param maxVocabWords driver-memory bound: keep only this many
    *        distinct words, most frequent first (ties by word) — the
    *        deterministic cap that makes a 100-TB histogram collectable.
    */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxVocabWords: Int = 1 << 20): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    BpeModel(mergeLoop(histogramOf(df, textCol, maxVocabWords), numMerges))
  }

  /** Train to a target VOCAB SIZE — the knob real tokenizers expose
    * ("32k vocab"), where vocab = base symbols (every distinct
    * character in the capped histogram, plus the [[EndOfWord]] marker)
    * + one new symbol per merge. Runs `vocabSize - base` merges over
    * the same histogram reduction as [[train]]; fails typed when the
    * target doesn't exceed the base (no merge budget is not a model).
    * Merge outputs are counted one-per-merge (the standard convention;
    * two merge paths producing the same string is a degenerate corpus
    * case, and the model's `merges.length` — not a distinct-string
    * count — is what apply-time cost scales with).
    */
  def trainToVocab(
      df: DataFrame,
      textCol: String,
      vocabSize: Int,
      maxVocabWords: Int = 1 << 20): BpeModel = {
    val hist = histogramOf(df, textCol, maxVocabWords)
    val base = hist.iterator.flatMap(_._1.iterator).toSet.size + 1 // chars + </w>
    require(vocabSize > base,
      s"vocabSize $vocabSize must exceed the base vocabulary " +
        s"($base = ${base - 1} distinct chars + the $EndOfWord marker)")
    BpeModel(mergeLoop(hist, vocabSize - base))
  }

  /** The one corpus-sized pass: capped word histogram, deterministic
    * (count desc, word asc) order.
    */
  private def histogramOf(
      df: DataFrame, textCol: String, maxVocabWords: Int): Array[(String, Long)] = {
    require(maxVocabWords >= 1, s"maxVocabWords must be >= 1, got $maxVocabWords")
    df.select(explode(words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxVocabWords)
      .collect().map(r => r.getString(0) -> r.getLong(1))
  }

  /** Driver-side merge loop over vocab-sized state. */
  private def mergeLoop(
      hist: Array[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var segs: Array[(Array[String], Long)] = hist.map { case (w, c) =>
      (w.map(_.toString).toArray :+ EndOfWord, c)
    }
    val merges = Seq.newBuilder[(String, String)]
    var it = 0
    var done = false
    while (it < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      segs.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // max count; ties -> lexicographically smallest pair
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        segs = segs.map { case (syms, c) => (mergeOnce(syms, best), c) }
        it += 1
      }
    }
    merges.result()
  }

  /** One left-to-right merge pass of `pair` over a symbol sequence. */
  private def mergeOnce(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Greedy lowest-rank BPE apply for one word (chars + end marker,
    * repeatedly merge the best-ranked adjacent pair) — the standard
    * apply, equivalent to replaying the training merges in order.
    */
  private[operators] def applyWord(
      ranks: Map[(String, String), Int], word: String): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray :+ EndOfWord
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i + 1 < syms.length) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) continue = false
      else syms = mergeOnce(syms, bestPair)
    }
    syms
  }

  /** Subword tokens of the text under `model` (per word: greedy apply;
    * `</w>` rides on each word's final token). Null/blank text yields
    * an empty array. Within-document word memoization — text is
    * zipfian, so repeated words hit the cache instead of re-merging.
    */
  def tokenize(model: BpeModel, c: Column): Column = {
    val ranks = model.ranks
    val f = (text: String) => {
      if (text == null) Array.empty[String]
      else {
        val ws = text.trim.split("\\s+").filter(_.nonEmpty)
        val cache = scala.collection.mutable.HashMap.empty[String, Array[String]]
        ws.flatMap(w => cache.getOrElseUpdate(w, applyWord(ranks, w)))
      }
    }
    udf(f).apply(c)
  }

  /** Token count of the text under `model` — the real-tokenizer cost
    * a data pipeline budgets with.
    */
  def tokenCount(model: BpeModel, c: Column): Column =
    size(tokenize(model, c)).cast("long")

  /** A trained model as a persistable artifact: one `(rank, left,
    * right)` row per merge, rank = training order. The tokenizer is the
    * train-once/apply-nightly member of the artifact family — the model
    * a corpus was counted/packed under must be THE model every later
    * run applies, bit for bit, or token budgets drift silently — so it
    * follows the index-family contract: write once, reopen anywhere
    * (`spark.read.parquet` + [[modelFromDf]]), nothing rides on the
    * training session. Round-trip == identity is spec-pinned.
    */
  def modelToDf(spark: org.apache.spark.sql.SparkSession, model: BpeModel): DataFrame = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
  }

  /** Reopen a persisted model. Ranks must be exactly 0..n-1 (training
    * order is the model — a hole or duplicate means a corrupt artifact,
    * failed typed here rather than mis-tokenizing later).
    */
  def modelFromDf(df: DataFrame): BpeModel = {
    require(Seq("rank", "left", "right").forall(df.columns.contains),
      "not a BPE model artifact: expected columns (rank, left, right)")
    val rows = df.select(col("rank").cast("int"), col("left"), col("right"))
      .collect().map(r => (r.getInt(0), (r.getString(1), r.getString(2))))
      .sortBy(_._1)
    require(rows.map(_._1).toSeq == rows.indices.toSeq,
      s"corrupt BPE model artifact: ranks must be exactly 0..${rows.length - 1}")
    BpeModel(rows.map(_._2).toSeq)
  }
}
