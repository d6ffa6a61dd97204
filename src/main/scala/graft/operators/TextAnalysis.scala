package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language-ID, quality scoring, token statistics, document
  * fingerprinting. All pure `functions._` compositions (whole-stage
  * codegen, no UDFs) so they hold up on 100 TB text scans; every formula
  * is also expressible in ANSI SQL for the DuckDB oracle (deterministic
  * left-fold arithmetic, modular hashes instead of float tricks).
  */
object TextAnalysis {

  /** Whitespace tokens of the lowercased text ("" -> empty array). */
  def tokens(c: Column): Column = {
    val t = trim(c)
    when(c.isNull || t === "", array().cast("array<string>"))
      .otherwise(split(lower(t), "\\s+"))
  }

  /** Tiny per-language stopword lists (top function words; enough for an
    * n-gram-free heuristic — the classic stopword-hit language guesser).
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"),
    "en" -> Seq("the", "and", "is", "of", "to", "in", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "de", "que", "en", "por"),
    "fr" -> Seq("le", "la", "les", "et", "est", "de", "que", "dans", "pour", "avec"),
    "pt" -> Seq("o", "a", "os", "as", "e", "é", "de", "que", "em", "para"))

  /** Distinct-stopword hit count for one language. */
  def stopwordHits(c: Column, words: Seq[String]): Column =
    size(array_intersect(array_distinct(tokens(c)),
      array(words.map(lit): _*)))

  /** Predicted language: argmax of stopword hits, first-listed language
    * winning ties (score must strictly beat the running best to replace
    * it) — a deterministic fold, same shape as the SQL CASE oracle.
    */
  def langId(c: Column): Column = {
    val scored = stopwords.map { case (lang, ws) => (lang, stopwordHits(c, ws)) }
    scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
         when(score > bestScore, score).otherwise(bestScore))
    }._1
  }

  /** Heuristic quality score in [0,1]: balanced mix of length, stopword
    * density and punctuation sanity (the usual pre-training corpus
    * filters). Deterministic double arithmetic, identical op order to the
    * SQL oracle.
    */
  def qualityScore(c: Column): Column = {
    val nTok = size(tokens(c)).cast("double")
    val nChars = length(c).cast("double")
    val stopHits = stopwordHits(c, stopwords.flatMap(_._2).distinct).cast("double")
    val punct = (nChars - length(regexp_replace(c, "[.,;:!?]", ""))).cast("double")
    val lenScore = least(nTok / lit(64.0), lit(1.0))
    val stopScore = least(stopHits / lit(4.0), lit(1.0))
    val punctScore = when(nTok > 0, least(punct / nTok, lit(1.0))).otherwise(lit(1.0))
    when(c.isNull || nTok === 0, lit(0.0))
      .otherwise(lit(0.5) * lenScore + lit(0.3) * stopScore + lit(0.2) * (lit(1.0) - punctScore))
  }

  /** 32-ish-bit rolling document fingerprint: per-token code
    * (31*len + first-char codepoint), left-folded as acc*131 + code
    * mod 1e9+7. Pure integer arithmetic — ANSI-overflow-safe (products
    * stay far below 2^63) and bit-identical in any engine.
    */
  def fingerprint(c: Column): Column = {
    val M = 1000000007L
    val codes = transform(tokens(c),
      w => (length(w).cast("long") * 31 + ascii(substring(w, 1, 1)).cast("long")) % M)
    aggregate(codes, lit(0L), (acc, v) => (acc * 131 + v) % M)
  }

  /** PII scrubbing for pretraining corpora: URLs, emails and
    * phone-shaped digit runs replaced by typed placeholder tokens, in
    * that order (URLs first so an address inside a URL is not half-
    * redacted). A pure `regexp_replace` chain — codegen'd linear scans,
    * no UDF — and every pattern is RE2-safe (no lookaround), so any SQL
    * engine replays the redaction bit-for-bit.
    */
  val UrlRe = "https?://[^\\s]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?\\(?[0-9][0-9()\\- ]{6,}[0-9]"

  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, UrlRe, "<URL>"),
        EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Intra-document repetition: the fraction of word `n`-grams that are
    * duplicates (`1 - distinct/total`) — the Gopher/MassiveText-style
    * repetition-filter signal (docs above ~0.2 are boilerplate/spam
    * candidates). Shorter-than-n docs score 0.
    *
    * Expression-tree HOFs evaluate interpreted, but the cost here is
    * per n-gram (linear in tokens, like [[TextDedup.shingleHashesPortable]]),
    * not tokens x constants — the 100x kernel rationale does not apply.
    */
  def repetitionScore(c: Column, n: Int = 3): Column = {
    val toks = tokens(c)
    val grams = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))
    when(size(grams) > 0,
      lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Token statistics: count + mean token length (0-safe). */
  def tokenStats(c: Column): (Column, Column) = {
    val toks = tokens(c)
    val n = size(toks)
    val totalLen = aggregate(transform(toks, w => length(w).cast("long")),
      lit(0L), (a, v) => a + v)
    (n, when(n > 0, totalLen.cast("double") / n.cast("double")).otherwise(lit(0.0)))
  }

  /** Top-k vocabulary by document frequency: for tokenizer/vocab
    * construction and corpus profiling. One explode of distinct
    * per-doc tokens, a partial-agg group-count on the token, and a
    * TakeOrdered top-k (per-partition heaps merged on the driver — the
    * full token distribution is never globally sorted). Ties break on
    * the token string so results are total-ordered and replayable.
    */
  def topTokensByDocFreq(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    df.select(explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("token"))
      .limit(k)
  }
}
