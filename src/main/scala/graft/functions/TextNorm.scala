package graft.functions

import java.text.Normalizer
import java.util.regex.Pattern

/** Pure-JVM text normalization kernel.
  *
  * Reimplements (from observed behavior, not code) the normalization the
  * reference applies to ~every string: `normalize_text` (etl_ui.py:28-34,
  * 322-331 — trim, strip accents, collapse whitespace, lowercase) and
  * `remove_prefixes` (etl_ui.py:22-25,52-56 — strip Portuguese
  * municipality/parish prefixes after normalization).
  *
  * Kept free of Spark imports so it is callable from driver-side label
  * logic (column headers are data in the reference's model), from Scala
  * UDFs, and from generated code (see [[AccentFoldExpr]]).
  */
object TextNorm {

  private val wsRe = Pattern.compile("\\s+")
  private val marksRe = Pattern.compile("\\p{M}+")

  /** Strip diacritical marks: NFD-decompose then drop combining marks.
    * Matches unidecode on the Portuguese alphabet (ã á à â é ê í ó ô õ ú ç
    * and uppercase) which is the domain the reference cares about.
    */
  def foldAccents(s: String): String = {
    if (s == null) return null
    // Fast path: pure ASCII needs no decomposition.
    var i = 0
    var ascii = true
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) s
    else marksRe.matcher(Normalizer.normalize(s, Normalizer.Form.NFD)).replaceAll("")
  }

  /** trim -> fold accents -> collapse whitespace runs to one space ->
    * lowercase; null/empty/whitespace-only -> "".
    * (Reference: etl_ui.py:322-331, the surviving definition.)
    */
  def normalize(s: String): String = {
    if (s == null) return ""
    val t = s.trim
    if (t.isEmpty) ""
    // Locale.ROOT: default-locale lowercasing diverges under e.g. tr_TR
    // ('I' -> 'ı'), silently changing join/dedup keys per deployment JVM.
    else wsRe.matcher(foldAccents(t)).replaceAll(" ").toLowerCase(java.util.Locale.ROOT)
  }

  /** Entity prefixes stripped from normalized names (etl_ui.py:22-25):
    * municipality and parish designators incl. contracted articles.
    */
  val municipalityPrefixRe: String =
    "^(municipio|camara municipal|cm|c m)( de| do| da| dos| das)? "
  val parishPrefixRe: String =
    "^(freguesia|junta de freguesia|uniao de freguesias|uniao das freguesias)( de| do| da| dos| das)? "

  private val muniP = Pattern.compile(municipalityPrefixRe)
  private val parP = Pattern.compile(parishPrefixRe)

  /** normalize, then strip a leading municipality/parish designator
    * (etl_ui.py:52-56). Note the reference applies unidecode first, so the
    * accented "município" arrives as "municipio".
    */
  def removePrefixes(s: String): String = {
    val n = normalize(s)
    val m1 = muniP.matcher(n).replaceFirst("")
    parP.matcher(m1).replaceFirst("").trim
  }

  private val bracketP = Pattern.compile("\\[(.*?)\\]")

  /** First `[...]` group trimmed; no bracket -> whole trimmed string
    * (etl_ui.py:57-62). Null -> null.
    */
  def extractBrackets(s: String): String = {
    if (s == null) return null
    val m = bracketP.matcher(s)
    if (m.find()) m.group(1).trim else s.trim
  }

  /** Sentence-split regex of split_coments (etl_ui.py:486-492): break after
    * terminal punctuation, or at a comma followed by an uppercase (incl.
    * accented) letter. Java regex supports both lookarounds.
    */
  val sentenceSplitRe: String =
    "(?<=[.!?;/|])\\s+|,\\s+(?=[A-ZÁÉÍÓÚÂÊÎÔÛÃÕÇ])"

  private val sentenceP = Pattern.compile(sentenceSplitRe)

  def splitSentences(s: String): Seq[String] =
    if (s == null) Seq.empty
    else sentenceP.split(s).iterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** Invalid entity-name sentinels filtered by the pipeline (etl_ui.py:79),
    * compared post-normalization.
    */
  val invalidNames: Set[String] =
    Set("", "nd", "nan", "n/a", "na", "nao definido", "sem dados")
}
