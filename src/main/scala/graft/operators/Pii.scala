package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII tagging and redaction (T86, r11) — the Dolma/CCNet-style
  * pre-release scrub every shipped training corpus runs: count and
  * mask email addresses, IPv4 literals, and international-format
  * phone numbers. A TAGGER plus a REWRITER, never a row filter —
  * documents keep their identity (the release decides per-policy
  * whether to drop high-PII docs via the counts, the way the
  * [[QualityClassifier]] gate consumes quality scores).
  *
  * Pattern discipline — every regex is chosen to mean THE SAME THING
  * in Java's engine (Spark executors) and RE2 (the DuckDB oracle):
  *
  *  - no backreferences, no lookaround (RE2 has neither);
  *  - no `\b`: Java's word boundary is Unicode-aware while RE2's is
  *    ASCII, so `\b` silently diverges next to accented letters —
  *    exactly the text a multilingual corpus is full of. The patterns
  *    instead anchor on their own required punctuation (`@`, dots,
  *    `+`), accepting the documented looseness that a digit run
  *    longer than the cap matches its prefix;
  *  - ASCII character classes only (`[0-9]`-style via `\d`, which is
  *    ASCII in both engines by default).
  *
  * Counts are computed per kind on the ORIGINAL text (kinds are
  * independent signals; a mask must not hide one kind from another's
  * counter). Redaction applies sequentially email -> IPv4 -> phone —
  * emails contain dots and digits, so masking them first keeps their
  * host part from feeding the IPv4/phone patterns.
  *
  * Scale shape: pure scan-side `regexp_extract_all`/`regexp_replace`
  * compositions — whole-stage codegen, zero shuffle, zero UDF
  * (PlanSpec-pinned). On 100 TB this is a map-only pass that fuses
  * into whatever scan precedes it.
  */
object Pii {

  /** ASCII email: local part, `@`, dotted host with a >=2-letter TLD. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 literal (1-3 digits per octet; no range check —
    * the tagger's job is recall, the policy layer's is precision).
    */
  val Ipv4Pattern = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  /** International-format phone: `+` then 7-15 digits (E.164 length). */
  val PhonePattern = "\\+\\d{7,15}"

  val EmailMask = "<EMAIL>"
  val Ipv4Mask = "<IPV4>"
  val PhoneMask = "<PHONE>"

  /** IPv6 literal, full form (8 hex groups) or `::`-compressed with
    * hex groups REQUIRED on both sides (`2001:db8::1`, `a:b::c:d`).
    * Documented looseness, all three directions: edge-compressed forms
    * (`::1`, `fe80::`) are NOT matched — a one-sided `::` pattern tags
    * every hex-lettered `::` identifier pair in a code corpus
    * (`std::vector` survives, but so does the loopback spelling); a
    * both-sides-hex identifier pair (`d::ab` inside `std::abs`) still
    * false-positives — the narrow residue of having no `\b`; and there
    * is no validity check on group counts across the `::` (recall over
    * precision, the IPv4 octet discipline). Alternation order is
    * full-form first; both Java and RE2 match alternatives
    * leftmost-first, so the two engines pick the same branch.
    */
  val Ipv6Pattern =
    "([0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}" +
      "|([0-9A-Fa-f]{1,4}:){1,7}:[0-9A-Fa-f]{1,4}(:[0-9A-Fa-f]{1,4}){0,6}"

  /** IPv6 with the EDGE-COMPRESSED forms included (r13, VERDICT r12
    * #6) — the opt-in STRICTNESS KNOB for the one default-pattern
    * looseness a real corpus actually hits: loopback/link-local
    * spellings (`::1`, `fe80::`) are common in logs, and [[Ipv6Pattern]]
    * deliberately skips them because a one-sided `::` branch tags every
    * hex-lettered `::` identifier pair in a code corpus. Opting in buys
    * the log spellings and pays exactly that documented price
    * (`std::abs` tags `::ab`; `life::` tags `fe::`) — a per-corpus
    * policy call, which is why it is a second pattern and not a new
    * default. Branch order is full form, both-sides-compressed,
    * trailing-compressed, leading-compressed — leftmost-first in both
    * Java and RE2, so the engines pick the same branch; bare `::` alone
    * never matches (every other C++ line would). Same no-`\b`, no
    * validity-check recall-over-precision discipline as the default.
    */
  val Ipv6EdgePattern: String =
    "([0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}" +
      "|([0-9A-Fa-f]{1,4}:){1,7}:[0-9A-Fa-f]{1,4}(:[0-9A-Fa-f]{1,4}){0,6}" +
      "|([0-9A-Fa-f]{1,4}:){1,7}:" +
      "|::[0-9A-Fa-f]{1,4}(:[0-9A-Fa-f]{1,4}){0,6}"

  /** IBAN-shaped account number: 2-letter country, 2 check digits,
    * 11-30 alphanumerics (the q117 registry pattern, promoted to a
    * built-in). No country-length table and no mod-97 check — the
    * tagger's job is recall; the policy layer prunes.
    */
  val IbanPattern = "[A-Z]{2}\\d{2}[A-Z0-9]{11,30}"

  /** Payment-card number: the 4-4-4-N grouped form (space or dash
    * separated) or a bare 13-19 digit run. Documented looseness: no
    * Luhn check, and the bare-run branch matches any long digit run
    * (account numbers, order ids) — by design, the same
    * recall-over-precision call as the digit-cap prefix matching.
    */
  val CreditCardPattern =
    "\\d{4}[ -]\\d{4}[ -]\\d{4}[ -]\\d{1,7}|\\d{13,19}"

  val Ipv6Mask = "<IPV6>"
  val IbanMask = "<IBAN>"
  val CreditCardMask = "<CARD>"

  /** The widened built-in registry (r12, VERDICT r11 #7) — the default
    * trio plus IPv6/IBAN/card, every regex [[validatePortable]]-clean,
    * in redaction order: email first (its host part feeds the IP and
    * digit patterns), then the colon-anchored kinds, then PHONES
    * BEFORE the digit-run kinds (a `+`-prefixed 13-digit run is a
    * phone; the bare-run card branch would otherwise eat it and ship
    * `+<CARD>`), then IBAN before card (an IBAN's interior digit run
    * is already masked when the card pattern scans).
    */
  def widePatterns: Seq[Pattern] = Seq(
    Pattern("emails", EmailPattern, EmailMask),
    Pattern("ipv6", Ipv6Pattern, Ipv6Mask),
    Pattern("ipv4", Ipv4Pattern, Ipv4Mask),
    Pattern("phones", PhonePattern, PhoneMask),
    Pattern("iban", IbanPattern, IbanMask),
    Pattern("cards", CreditCardPattern, CreditCardMask))

  /** [[widePatterns]] with the IPv6 strictness knob: `ipv6Edge = true`
    * swaps in [[Ipv6EdgePattern]] so edge-compressed spellings
    * (`::1`, `fe80::`) are tagged too — same registry order, same
    * masks, same portability guarantees.
    */
  def widePatterns(ipv6Edge: Boolean): Seq[Pattern] =
    if (!ipv6Edge) widePatterns
    else widePatterns.map(p =>
      if (p.name == "ipv6") p.copy(regex = Ipv6EdgePattern) else p)

  private def countOf(text: Column, pattern: String): Column =
    when(text.isNull, lit(0L))
      .otherwise(size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long"))

  /** Per-document PII tag counts on the raw text. */
  def scanColumns(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> countOf(text, EmailPattern),
    "n_ipv4" -> countOf(text, Ipv4Pattern),
    "n_phones" -> countOf(text, PhonePattern))

  /** The masked text: email -> IPv4 -> phone, in that order (see the
    * class doc for why the order is load-bearing). Null rides through.
    */
  def redactColumn(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, EmailMask),
        Ipv4Pattern, Ipv4Mask),
      PhonePattern, PhoneMask)

  /** The q114 surface: id, per-kind counts, total, and the redacted
    * text. Output: `idCol`, `n_emails`, `n_ipv4`, `n_phones`,
    * `pii_total`, `redacted`.
    */
  def scan(df: DataFrame, idCol: String, textCol: String): DataFrame =
    scanPatterns(df, idCol, textCol, Seq(
      Pattern("emails", EmailPattern, EmailMask),
      Pattern("ipv4", Ipv4Pattern, Ipv4Mask),
      Pattern("phones", PhonePattern, PhoneMask)))

  /** One registry entry: `name` becomes the `n_<name>` count column,
    * `regex` must pass [[validatePortable]], `mask` replaces matches in
    * redaction order (the Seq order given to [[scanPatterns]]).
    */
  final case class Pattern(name: String, regex: String, mask: String)

  /** Reject regex constructs that mean DIFFERENT THINGS in Java (the
    * Spark executors) and RE2 (every replay engine in DuckDB's family)
    * — the operator's whole correctness story is that one pattern
    * string is one semantics everywhere, so non-portable constructs
    * fail TYPED at registration instead of silently diverging at the
    * first accented character or backreference:
    *
    *  - `\b`/`\B`: Java word boundaries are Unicode-aware, RE2's are
    *    ASCII (divergence class, not a missing feature);
    *  - lookarounds `(?=`, `(?!`, `(?<=`, `(?<!`: RE2 has none;
    *  - backreferences `\1`..`\9`, `\k<`: RE2 has none;
    *  - possessive quantifiers `*+`, `++`, `?+`, `{n,m}+`: RE2 has
    *    none (and Java's change match outcomes, not just performance);
    *  - atomic groups `(?>`: same.
    *
    * The check is syntactic over the pattern string with escapes
    * honored (`\\b` is a literal backspace-class escape pair, fine).
    * It is a GUARD, not a parser: constructs it cannot see (e.g.
    * exotic character-class intersections) remain the author's
    * responsibility, documented here.
    */
  def validatePortable(regex: String): Unit = {
    // strip escaped-escape pairs first so `\\b` (literal backslash + b)
    // does not read as a word boundary, then scan for the offenders
    val s = regex.replace("\\\\", "")
    def fail(construct: String, why: String): Nothing =
      throw new IllegalArgumentException(
        s"non-portable regex construct '$construct' in pattern '$regex': $why " +
          "— patterns must mean the same thing in Java and RE2")
    if (s.contains("\\b") || s.contains("\\B"))
      fail("\\b", "Java word boundaries are Unicode-aware, RE2's are ASCII")
    for (la <- Seq("(?=", "(?!", "(?<=", "(?<!"))
      if (s.contains(la)) fail(la, "RE2 has no lookaround")
    if (s.contains("(?>")) fail("(?>", "RE2 has no atomic groups")
    if (raw"\\[1-9]".r.findFirstIn(s).isDefined || s.contains("\\k<"))
      fail("backreference", "RE2 has no backreferences")
    // named groups: Java spells them `(?<name>`, RE2 only accepts
    // `(?P<name>` — the same pattern string cannot mean a named group in
    // both engines, so both spellings fail typed (use a plain group).
    // `(?<=`/`(?<!` were already rejected above as lookbehind, so any
    // surviving `(?<` is the Java named-group form.
    if (s.contains("(?<") || s.contains("(?P<"))
      fail("named group", "Java spells named groups (?<n>, RE2 (?P<n>) — use a plain group")
    // a quantifier char PRECEDED BY A BACKSLASH is an escaped literal
    // (`\++` = one-or-more literal '+', valid and identical in both
    // engines) — only an unescaped quantifier followed by '+' is the
    // Java possessive form (r11 ADVICE)
    if (raw"(?<!\\)[*+?}]\+".r.findFirstIn(s).isDefined)
      fail("possessive quantifier", "RE2 has none and Java's change matches")
    // and it must at least be a valid Java pattern
    java.util.regex.Pattern.compile(regex)
  }

  /** [[scan]] over a caller-supplied pattern registry: one `n_<name>`
    * count column per entry (counts on the RAW text, independent
    * signals), `pii_total`, and `redacted` masked in REGISTRY ORDER —
    * order is load-bearing exactly as in [[scan]] (put patterns whose
    * matches can contain other kinds' fragments first). Every regex
    * must pass [[validatePortable]]. Same scale shape as [[scan]]:
    * scan-side codegen, zero shuffle, zero UDF.
    */
  def scanPatterns(
      df: DataFrame,
      idCol: String,
      textCol: String,
      patterns: Seq[Pattern]): DataFrame = {
    require(patterns.nonEmpty, "need at least one pattern")
    require(patterns.map(_.name).distinct.size == patterns.size,
      s"pattern names collide: ${patterns.map(_.name).mkString(", ")}")
    patterns.foreach { p =>
      validatePortable(p.regex)
      // the mask is passed to regexp_replace as the REPLACEMENT string,
      // where Java reads `$N` as a group reference and `\` as an escape
      // (and DuckDB reads `\N` — a different syntax again), so a mask
      // containing either would redact differently per engine or throw
      // (r11 ADVICE). Masks are literal text by contract.
      require(!p.mask.contains('$') && !p.mask.contains('\\'),
        s"mask '${p.mask}' for pattern '${p.name}' contains '$$' or '\\' — " +
          "replacement-string syntax differs between engines; masks must be literal text")
    }
    val text = col(textCol)
    val counts = patterns.map(p => s"n_${p.name}" -> countOf(text, p.regex))
    val redacted = patterns.foldLeft(text) { (c, p) =>
      regexp_replace(c, p.regex, p.mask)
    }
    df.select(
      (col(idCol) +: counts.map { case (n, c) => c.as(n) }) :+
        counts.map(_._2).reduce(_ + _).as("pii_total") :+
        redacted.as("redacted"): _*)
  }
}
