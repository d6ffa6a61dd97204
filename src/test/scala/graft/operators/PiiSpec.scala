package graft.operators

import graft.SparkSpec

/** PII tagging + redaction (T86): planted fixtures for each kind, the
  * load-bearing mask order, the documented looseness decisions
  * (no `\b`, no octet range check, digit-cap prefix matching), and the
  * null/empty contract.
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def scanOne(text: String) = {
    val r = Pii.scan(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text").head()
    (r.getAs[Long]("n_emails"), r.getAs[Long]("n_ipv4"),
      r.getAs[Long]("n_phones"), r.getAs[String]("redacted"))
  }

  test("each kind tags and masks; total folds the kinds") {
    val (e, i, p, red) = scanOne(
      "write a.b+c_d%x@mail.example.co reach 10.0.0.1 or +4915123456789 now")
    assert((e, i, p) == ((1L, 1L, 1L)))
    assert(red == "write <EMAIL> reach <IPV4> or <PHONE> now")
    val tot = Pii.scan(Seq((1L, "x@y.org and 1.2.3.4")).toDF("doc_id", "text"),
      "doc_id", "text").head().getAs[Long]("pii_total")
    assert(tot == 2L)
  }

  test("mask order is load-bearing: an email's dotted-digit local part never leaks an IPV4 mask") {
    // counts are per-kind on the RAW text (independent signals — the
    // ipv4 counter does see the digits inside the email), but the
    // redaction masks the email FIRST, so the shipped text carries one
    // <EMAIL> and no <IPV4>
    val (e, i, _, red) = scanOne("ping 1.2.3.4@host.com please")
    assert(e == 1L)
    assert(i == 1L)
    assert(red == "ping <EMAIL> please")
    assert(!red.contains(Pii.Ipv4Mask))
  }

  test("null and empty texts: zero counts, null/empty redaction") {
    val rows = Pii.scan(
      Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "   ")).toDF("doc_id", "text"),
      "doc_id", "text").collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("pii_total") == 0L && rows(1L).isNullAt(5))
    assert(rows(2L).getAs[Long]("pii_total") == 0L &&
      rows(2L).getAs[String]("redacted") == "")
    assert(rows(3L).getAs[Long]("pii_total") == 0L)
  }

  test("documented looseness: digit caps match prefixes, octets are unchecked") {
    // 16 digits after '+': the 15-digit E.164 cap matches the prefix
    // (one tag, the last digit survives the mask) — the no-`\b`
    // decision's visible edge, identical in both engines
    val (_, _, p1, red1) = scanOne("call +1234567890123456")
    assert(p1 == 1L && red1 == "call <PHONE>6")
    // out-of-range octets still tag (recall over precision)
    val (_, i2, _, _) = scanOne("host 999.999.999.999 up")
    assert(i2 == 1L)
    // unicode adjacency: no `\b` means an accented letter before '+'
    // does not suppress the match (Java and RE2 would disagree on \b)
    val (_, _, p3, _) = scanOne("café+4912345678")
    assert(p3 == 1L)
  }

  test("multiple occurrences count and mask independently") {
    val (e, i, p, red) = scanOne(
      "a@b.co c@d.org 1.1.1.1 2.2.2.2 +1234567 +7654321")
    assert((e, i, p) == ((2L, 2L, 2L)))
    assert(red == "<EMAIL> <EMAIL> <IPV4> <IPV4> <PHONE> <PHONE>")
  }

  test("the same scan runs under a file stream (stateless, append mode)") {
    // tagging + masking is a per-row projection — no state, no
    // watermark — so the identical call runs under readStream and
    // yields exactly the batch answer (the stateless-op discipline
    // chunkByTokens and DecontaminationGate pin for their families);
    // this is the streaming ingest scrub path
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("pii_stream").toString
    (0 to 2).foreach { k =>
      docs.filter($"doc_id" % 3 === k).coalesce(1)
        .write.parquet(s"$dir/in/b$k.parquet")
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*/")
    val q = Pii.scan(stream, "doc_id", "text")
      .writeStream.outputMode("append").format("memory").queryName("pii_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()
    val streamed = spark.table("pii_out")
      .as[(Long, Long, Long, Long, Long, String)].collect().toSet
    val batch = Pii.scan(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, String)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("pattern registry: custom patterns scan and mask in registry order") {
    val pats = Seq(
      Pii.Pattern("iban", "[A-Z]{2}\\d{2}[A-Z0-9]{11,30}", "<IBAN>"),
      Pii.Pattern("digits", "\\d{4,}", "<NUM>"))
    val r = Pii.scanPatterns(
      Seq((1L, "pay PT50123456789012345678901 ref 99887766")).toDF("doc_id", "text"),
      "doc_id", "text", pats).head()
    // counts on the RAW text: the digit run inside the IBAN counts too
    assert(r.getAs[Long]("n_iban") == 1L)
    assert(r.getAs[Long]("n_digits") == 2L)
    assert(r.getAs[Long]("pii_total") == 3L)
    // registry order: IBAN masked first, so its digits never become <NUM>
    assert(r.getAs[String]("redacted") == "pay <IBAN> ref <NUM>")
  }

  test("pattern registry: non-portable constructs fail typed at registration") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    def rejects(regex: String, construct: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        Pii.scanPatterns(df, "doc_id", "text",
          Seq(Pii.Pattern("p", regex, "<X>")))
      }
      assert(e.getMessage.contains("non-portable"), s"$regex: ${e.getMessage}")
      assert(e.getMessage.contains(construct), s"$regex: ${e.getMessage}")
    }
    rejects("\\bword\\b", "\\b")
    rejects("a(?=b)", "(?=")
    rejects("a(?!b)", "(?!")
    rejects("(?<=a)b", "(?<=")
    rejects("(?<!a)b", "(?<!")
    rejects("(?>ab)c", "(?>")
    rejects("(a)\\1", "backreference")
    rejects("a*+b", "possessive")
    rejects("a++b", "possessive")
    rejects("a{2,3}+", "possessive")
    // named groups spell differently per engine (Java (?<n>, RE2 (?P<n>))
    rejects("(?<year>\\d{4})", "named group")
    rejects("(?P<year>\\d{4})", "named group")
    // ESCAPED quantifier chars are literals — `\++` is one-or-more of a
    // literal '+', valid and identical in both engines (r11 ADVICE: the
    // old check false-positived on these)
    Pii.validatePortable("\\++")
    Pii.validatePortable("a\\?+")
    Pii.validatePortable("x\\}+")
    Pii.validatePortable("a+\\+") // quantifier then literal plus: fine
    // an escaped literal backslash before 'b' is NOT a word boundary
    Pii.validatePortable("a\\\\b")
    // ...but an escaped-backslash pair BEFORE a quantifier is still the
    // possessive form (one-or-more-possessive of a literal backslash)
    rejects("a\\\\++", "possessive")
    // still must be a valid Java pattern
    intercept[java.util.regex.PatternSyntaxException] {
      Pii.validatePortable("[unclosed")
    }
    // registry hygiene: empty and name-colliding registries fail typed
    assert(intercept[IllegalArgumentException] {
      Pii.scanPatterns(df, "doc_id", "text", Seq.empty)
    }.getMessage.contains("at least one"))
    assert(intercept[IllegalArgumentException] {
      Pii.scanPatterns(df, "doc_id", "text", Seq(
        Pii.Pattern("p", "a", "<A>"), Pii.Pattern("p", "b", "<B>")))
    }.getMessage.contains("collide"))
    // masks are literal text: `$`/`\` mean group-reference/escape to
    // Java and something ELSE again to DuckDB (r11 ADVICE) — typed
    // rejection instead of per-engine divergent redaction
    Seq("<$1>", "a\\mask").foreach { m =>
      assert(intercept[IllegalArgumentException] {
        Pii.scanPatterns(df, "doc_id", "text", Seq(Pii.Pattern("p", "a", m)))
      }.getMessage.contains("literal"), m)
    }
  }

  test("widened built-ins: IPv6 forms match per the documented looseness") {
    def scanIpv6(text: String) = {
      val r = Pii.scanPatterns(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", Seq(Pii.Pattern("ipv6", Pii.Ipv6Pattern, Pii.Ipv6Mask))).head()
      (r.getAs[Long]("n_ipv6"), r.getAs[String]("redacted"))
    }
    // full form and both-sides-compressed match and mask
    assert(scanIpv6("at 2001:0db8:85a3:0000:0000:8a2e:0370:7334 now") ==
      ((1L, "at <IPV6> now")))
    assert(scanIpv6("via 2001:db8::1 ok") == ((1L, "via <IPV6> ok")))
    assert(scanIpv6("a:b::c:d") == ((1L, "<IPV6>")))
    // documented looseness: edge-compressed forms do NOT match...
    assert(scanIpv6("loopback ::1 here")._1 == 0L)
    assert(scanIpv6("prefix fe80:: done")._1 == 0L)
    // ...which is what keeps code text intact
    assert(scanIpv6("use std::vector or boost::bind") ==
      ((0L, "use std::vector or boost::bind")))
    // the documented residue: hex-only identifiers on BOTH sides
    assert(scanIpv6("call std::abs now")._1 == 1L)
  }

  test("IPv6 edge knob (r13): edge-compressed spellings match opted-in, with the documented residue") {
    def scanEdge(text: String) = {
      val r = Pii.scanPatterns(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text",
        Seq(Pii.Pattern("ipv6", Pii.Ipv6EdgePattern, Pii.Ipv6Mask))).head()
      (r.getAs[Long]("n_ipv6"), r.getAs[String]("redacted"))
    }
    // everything the default pattern matches still matches, same spans
    assert(scanEdge("at 2001:0db8:85a3:0000:0000:8a2e:0370:7334 now") ==
      ((1L, "at <IPV6> now")))
    assert(scanEdge("via 2001:db8::1 ok") == ((1L, "via <IPV6> ok")))
    assert(scanEdge("a:b::c:d") == ((1L, "<IPV6>")))
    // the knob's point: the log spellings the default skips
    assert(scanEdge("loopback ::1 here") == ((1L, "loopback <IPV6> here")))
    assert(scanEdge("prefix fe80:: done") == ((1L, "prefix <IPV6> done")))
    assert(scanEdge("gw ::ffff:10:1 x") == ((1L, "gw <IPV6> x")))
    // bare :: alone never matches (every other C++ line would)...
    assert(scanEdge("a = b :: c")._1 == 0L)
    // ...but the documented opt-in price is real: hex-lettered
    // identifiers around :: now tag (the reason this is a knob, not
    // the new default)
    assert(scanEdge("call std::abs now")._1 == 1L) // 'd::ab' (both-sides residue, as in the default)
    assert(scanEdge("use std::vector here")._1 == 1L) // 'd::' (the new trailing-branch residue)
    // widePatterns(ipv6Edge) swaps exactly the ipv6 entry
    val wide = Pii.widePatterns(ipv6Edge = true)
    assert(wide.map(_.name) == Pii.widePatterns.map(_.name))
    assert(wide.find(_.name == "ipv6").get.regex == Pii.Ipv6EdgePattern)
    assert(Pii.widePatterns(ipv6Edge = false) == Pii.widePatterns)
    wide.foreach(p => Pii.validatePortable(p.regex))
  }

  test("edge-knob wide registry: the ipv6-before-ipv4 mask-order residue, pinned") {
    // The registry masks ipv6 BEFORE ipv4, and the edge knob's
    // leading-compressed branch can eat the HEAD of an IPv4-mapped
    // address (`::ffff:10.0.0.1` — `10` is a valid hex group, the `.`
    // stops the group chain), so the ipv4 pattern later sees only the
    // three-octet tail `.0.0.1` and leaves it. The residue is the
    // documented counts-on-raw contract made visible: n_ipv4 counts the
    // full dotted quad on the RAW text while the mask ships
    // `<IPV6>.0.0.1` — over-masking the prefix (recall over precision)
    // and leaving a tail that is no longer a parseable address.
    def scanWide(text: String) = {
      val r = Pii.scanPatterns(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", Pii.widePatterns(ipv6Edge = true)).head()
      (r.getAs[Long]("n_ipv6"), r.getAs[Long]("n_ipv4"), r.getAs[String]("redacted"))
    }
    assert(scanWide("gw ::ffff:10.0.0.1 x") == ((1L, 1L, "gw <IPV6>.0.0.1 x")))
    // the same residue class exists WITHOUT the knob (the default
    // both-sides branch eats `fe80::10` out of `fe80::10.0.0.1`) — the
    // knob widens which spellings reach it, it does not create it
    val r0 = Pii.scanPatterns(Seq((1L, "gw fe80::10.0.0.1 x")).toDF("doc_id", "text"),
      "doc_id", "text", Pii.widePatterns).head()
    assert(r0.getAs[String]("redacted") == "gw <IPV6>.0.0.1 x")
    // a space-separated pair has no interplay: both kinds mask whole
    assert(scanWide("lo ::1 and 10.0.0.1") == ((1L, 1L, "lo <IPV6> and <IPV4>")))
  }

  test("widened built-ins: IBAN and card forms; wide-registry mask order") {
    val r = Pii.scanPatterns(
      Seq((1L, "acct PT50000201231234567890154 pay 4111-1111 1111-1111 " +
        "or 4111111111111111 mail x@y.org ip 10.0.0.1 v6 2001:db8::2 " +
        "call +3519123456789")).toDF("doc_id", "text"),
      "doc_id", "text", Pii.widePatterns).head()
    assert(r.getAs[Long]("n_emails") == 1L)
    assert(r.getAs[Long]("n_ipv6") == 1L)
    assert(r.getAs[Long]("n_ipv4") == 1L)
    assert(r.getAs[Long]("n_iban") == 1L)
    // counts are on the RAW text: the IBAN's interior digit run and the
    // phone digits also hit the bare-run card branch (documented
    // looseness: 3 = grouped card + bare card + IBAN interior)
    assert(r.getAs[Long]("n_cards") == 4L)
    assert(r.getAs[Long]("n_phones") == 1L)
    val red = r.getAs[String]("redacted")
    // registry order: IBAN masked before the card pattern scans, so its
    // interior digits ship as <IBAN>, not <CARD>; the grouped and bare
    // card forms each mask whole
    assert(red == "acct <IBAN> pay <CARD> or <CARD> mail <EMAIL> " +
      "ip <IPV4> v6 <IPV6> call <PHONE>", red)
    // every wide pattern is validatePortable-clean by construction
    Pii.widePatterns.foreach(p => Pii.validatePortable(p.regex))
  }

  test("default scan == the three-entry registry (the built-ins ride the same path)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50).select("doc_id", "text")
    val a = Pii.scan(docs, "doc_id", "text").collect().map(_.toSeq).toSet
    val b = Pii.scanPatterns(docs, "doc_id", "text", Seq(
      Pii.Pattern("emails", Pii.EmailPattern, Pii.EmailMask),
      Pii.Pattern("ipv4", Pii.Ipv4Pattern, Pii.Ipv4Mask),
      Pii.Pattern("phones", Pii.PhonePattern, Pii.PhoneMask)))
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("scan is a zero-exchange, zero-UDF, single-scan plan (wide registry included)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def pin(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$what must not shuffle:\n$plan")
      assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
        s"$what must stay codegen:\n$plan")
      val scans = "ReadSchema".r.findAllIn(plan).size
      assert(scans == 1, s"$what: expected one corpus scan, got $scans")
    }
    pin(Pii.scan(docs, "doc_id", "text"), "pii scan")
    // the widened registry rides the same scanPatterns path — six
    // patterns, still one scan-side codegen'd projection
    pin(Pii.scanPatterns(docs, "doc_id", "text", Pii.widePatterns), "wide registry scan")
    // the edge knob swaps one regex string; the plan shape must not move
    pin(Pii.scanPatterns(docs, "doc_id", "text", Pii.widePatterns(ipv6Edge = true)),
      "edge-knob registry scan")
  }
}
