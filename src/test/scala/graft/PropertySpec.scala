package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextNorm

/** Property tests (SURVEY.md §5): driver-side string-kernel laws checked
  * with ScalaCheck directly (no Spark needed — the kernels are pure), and
  * Spark-side partition/dedup invariants on generated frames.
  */
class TextNormPropSpec extends AnyFunSuite {

  private val ptChars = "abcdefghijklmnopqrstuvwxyz áéíóúâêôãõç ABCÁÉÍÓÚÂÊÔÃÕÇ  \t".toSeq
  private val ptString: Gen[String] =
    Gen.listOf(Gen.oneOf(ptChars)).map(_.mkString)

  private def check(name: String, p: Prop): Unit = test(name) {
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  check("normalize is idempotent", forAll(ptString) { s =>
    TextNorm.normalize(TextNorm.normalize(s)) == TextNorm.normalize(s)
  })

  check("normalize output is lowercase ascii-folded single-spaced", forAll(ptString) { s =>
    val n = TextNorm.normalize(s)
    !n.exists(_.isUpper) && !n.contains("  ") && n == n.trim &&
      !n.exists(c => "áéíóúâêôãõç".contains(c))
  })

  check("removePrefixes strips at most one leading designator", forAll(ptString) { s =>
    val out = TextNorm.removePrefixes("Município de " + s)
    !out.startsWith("municipio ")
  })

  check("splitSentences loses no non-blank content", forAll(ptString) { s =>
    val parts = TextNorm.splitSentences(s)
    parts.forall(_.nonEmpty) && (s.trim.isEmpty || parts.nonEmpty || s.trim.isEmpty)
  })

  check("fingerprint codes stay in the modular field", forAll(ptString) { s =>
    // mirrors TextAnalysis.fingerprint arithmetic bounds: acc*131+v < 2^63
    val M = 1000000007L
    (M - 1) * 131 + (M - 1) < Long.MaxValue
  })
}

class PartitionInvariantSpec extends SparkSpec {
  import spark.implicits._

  test("simHash kernel == expression for random unicode-ish strings, both hashers") {
    import graft.operators.TextDedup
    // mixed alphabet incl. accents, digits, ALL whitespace classes and
    // XML-ish specials — the shapes where a hand-rolled tokenizer would
    // diverge from Spark's trim/split semantics
    val alphabet = "abcXYZ áçÉ 0123 \t\n\r  .,<>&\"'".toSeq
    val rnd = new scala.util.Random(17)
    val texts = (0 until 300).map { i =>
      (i.toLong, (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString)
    } :+ (300L -> null.asInstanceOf[String])
    val d = texts.toDF("id", "text")
    for (h <- Seq(TextDedup.TokenHasher.Murmur3, TextDedup.TokenHasher.PortableMd5)) {
      val mismatches = d.select($"id",
          TextDedup.simHash($"text", h).as("k"),
          TextDedup.simHashExpr($"text", h).as("e"))
        .filter($"k" =!= $"e").count()
      assert(mismatches == 0, s"hasher=$h")
    }
  }

  test("portable shingle-hash kernel == expression for random unicode-ish strings") {
    import graft.operators.TextDedup
    val alphabet = "abcXYZ áçÉ 0123 \t\n\r  .,<>&\"'".toSeq
    val rnd = new scala.util.Random(23)
    val texts = (0 until 300).map { i =>
      (i.toLong, (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString)
    } ++ Seq(300L -> null.asInstanceOf[String], 301L -> "", 302L -> "ab") // short-text guard
    val d = texts.toDF("id", "text")
    // compare as SETS: distinct-ordering differs (LinkedHashSet vs
    // array_distinct keep first occurrence — same order in fact, but the
    // LSH path is order-agnostic, so pin the contract actually relied on)
    val mismatches = d.select($"id",
        TextDedup.shingleHashesPortable($"text", 3).as("k"),
        TextDedup.shingleHashesPortableExpr($"text", 3).as("e"))
      .filter(!(array_sort($"k") <=> array_sort($"e"))).count()
    assert(mismatches == 0)
  }

  test("quality/repetition kernels == expressions for random unicode-ish strings") {
    import graft.operators.TextAnalysis
    val alphabet = "abc the de el la XYZ áçÉ 0123 \t\n\r  .,;:!?<>&\"'".toSeq
    val rnd = new scala.util.Random(31)
    val texts = (0 until 300).map { i =>
      (i.toLong, (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString)
    } ++ Seq(300L -> null.asInstanceOf[String], 301L -> "", 302L -> "   ", 303L -> "a b")
    val d = texts.toDF("id", "text")
    val qMis = d.select(
        TextAnalysis.qualityScore($"text").as("k"),
        TextAnalysis.qualityScoreExpr($"text").as("e"))
      .filter(!($"k" <=> $"e")).count()
    assert(qMis == 0, "qualityScore kernel != expression")
    val rMis = d.select(
        TextAnalysis.repetitionScore($"text", 3).as("k"),
        TextAnalysis.repetitionScoreExpr($"text", 3).as("e"))
      .filter(!($"k" <=> $"e")).count()
    assert(rMis == 0, "repetitionScore kernel != expression")
  }

  test("shingles kernel == expression for random unicode-ish strings") {
    import graft.operators.TextDedup
    val alphabet = "abcXYZ áçÉ 0123 \t\n\r  .,<>&\"'".toSeq
    val rnd = new scala.util.Random(29)
    val texts = (0 until 300).map { i =>
      (i.toLong, (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString)
    } ++ Seq(300L -> null.asInstanceOf[String], 301L -> "", 302L -> "ab")
    val d = texts.toDF("id", "text")
    val mismatches = d.select($"id",
        TextDedup.shinglesKernel($"text", 3).as("k"),
        TextDedup.shingles($"text", 3).as("e"))
      .filter(!(array_sort($"k") <=> array_sort($"e"))).count()
    assert(mismatches == 0)
  }

  test("heuristic-filter kernel == expression for random unicode-ish strings") {
    import graft.operators.CorpusFilters
    // includes newlines (line rules), bullets/ellipses, '#', braces,
    // boilerplate markers AND astral-plane chars (UTF-16 vs codepoint
    // length is exactly where a Java kernel diverges from Spark/DuckDB)
    val alphabet = ("abc the XYZ áçÉ 0123 \t\n\r  .!?\"”…#{-*• ".toSeq.map(_.toString) ++
      Seq("🚀", "😀", "lorem ipsum ", "javascript ", "... "))
    val rnd = new scala.util.Random(37)
    val texts = (0 until 300).map { i =>
      (i.toLong, (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString)
    } ++ Seq(300L -> null.asInstanceOf[String], 301L -> "", 302L -> "   ", 303L -> "\n\n")
    val d = texts.toDF("id", "text")
    val kern = CorpusFilters.heuristicFilter(d, "id", "text")
    val exprd = d.select(
      $"id" +: CorpusFilters.heuristicSignalsExpr($"text").map { case (n, c) => c.as(n) }: _*)
    assert(kern.exceptAll(exprd).count() == 0 && exprd.exceptAll(kern).count() == 0)
  }

  test("mixToWeights: output is a subset, binding domain intact, membership is pure") {
    val rnd = new scala.util.Random(41)
    val domains = Seq("a", "b", "c", "d")
    val rows = (0 until 2000).map(i => (i.toLong, domains(rnd.nextInt(domains.size))))
    val df = rows.toDF("id", "dom")
    val weights = Map("a" -> 0.6, "b" -> 0.25, "c" -> 0.15) // d unweighted -> dropped
    val out = graft.operators.Sampling.mixToWeights(df, "id", "dom", weights)
      .as[(Long, String)].collect().toSet
    assert(out.subsetOf(rows.toSet), "output must be a subset of the input")
    assert(out.forall(_._2 != "d"), "unweighted domains are dropped")
    val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val binding = weights.keys.minBy(k => counts(k) / weights(k))
    assert(out.count(_._2 == binding) == counts(binding),
      "the binding domain keeps every row")
    // membership is a pure per-row function: doubling a kept row's
    // frame context cannot change its fate — rerun on a shuffled frame
    val out2 = graft.operators.Sampling.mixToWeights(
      rows.reverse.toDF("id", "dom"), "id", "dom", weights)
      .as[(Long, String)].collect().toSet
    assert(out == out2)
    // null rows are dropped, exactly as the scaladoc contracts: a null
    // domain can't be attributed to a weight, a null id can't be
    // deterministically kept/dropped — and neither perturbs the fate
    // of any other row
    val withNulls = (rows.map { case (i, d) => (Option(i), Option(d)) } ++ Seq(
      (Some(90001L), None), (None, Some("a")), (None, None)))
    val out3 = graft.operators.Sampling.mixToWeights(
      withNulls.toDF("id", "dom"), "id", "dom", weights)
      .as[(Option[Long], Option[String])].collect().toSet
    assert(out3 == out.map { case (i, d) => (Option(i), Option(d)) },
      "null-domain/null-id rows silently drop; everything else is untouched")
  }

  test("temperatureMix == mixToWeights with count^alpha weights; alpha endpoints behave") {
    val rnd = new scala.util.Random(43)
    val domains = Seq("en", "es", "de", "fi")
    val rows = (0 until 2500).map(i => (i.toLong,
      domains(math.min(rnd.nextInt(domains.size * 2), domains.size - 1))))
    val df = rows.toDF("id", "dom")
    val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap

    // the closed form IS mixToWeights with w_d = n_d^alpha: same kept set
    for (alpha <- Seq(0.0, 0.3, 0.5, 0.7)) {
      val viaTemp = graft.operators.Sampling.temperatureMix(df, "id", "dom", alpha)
        .as[(Long, String)].collect().toSet
      val viaMix = graft.operators.Sampling.mixToWeights(df, "id", "dom",
        counts.map { case (d, n) => d -> math.pow(n.toDouble, alpha) }.toMap)
        .as[(Long, String)].collect().toSet
      assert(viaTemp == viaMix, s"alpha=$alpha: closed form diverged from mixToWeights")
    }

    // alpha = 1: the natural distribution — everything survives
    val natural = graft.operators.Sampling.temperatureMix(df, "id", "dom", 1.0)
    assert(natural.count() == rows.size)
    // alpha = 0: every domain cut toward the smallest's size (threshold
    // = floor(Buckets * n_min/n_d) buckets, so kept counts land near
    // n_min and far under the natural count for big domains)
    val flat = graft.operators.Sampling.temperatureMix(df, "id", "dom", 0.0)
      .as[(Long, String)].collect().toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nMin = counts.values.min
    assert(flat(counts.minBy(_._2)._1) == nMin, "smallest domain keeps every row")
    for ((d, n) <- counts if n > nMin * 2)
      assert(flat(d) < n / 2 && flat(d) > nMin / 2,
        s"alpha=0 must cut $d (n=$n) toward n_min=$nMin, kept ${flat(d)}")
    // rare-domain share grows monotonically as alpha falls
    def rareShare(a: Double): Double = {
      val kept = graft.operators.Sampling.temperatureMix(df, "id", "dom", a)
        .as[(Long, String)].collect().toSeq
      kept.count(_._2 == counts.minBy(_._2)._1).toDouble / kept.size
    }
    assert(rareShare(0.0) > rareShare(0.5) && rareShare(0.5) > rareShare(1.0))
  }

  test("dedup split partitions the input for random frames") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 500).map(i => (rnd.nextInt(50).toLong, i.toLong))
    val df = rows.toDF("key", "row_id")
    val r = graft.operators.Dedup.keepFirst(df, Seq(col("key")), col("row_id"))
    assert(r.kept.count() + r.duplicates.count() == 500)
    assert(r.kept.select("key").distinct().count() == r.kept.count())
    // kept row per key is the minimum row_id
    val keptMap = r.kept.as[(Long, Long)].collect().toMap
    val expect = rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    assert(keptMap == expect)
  }

  test("chunkByTokens == driver reference for random unicode/whitespace strings") {
    // both sides split on the JVM regex \s+ (Spark's split IS Java
    // regex), so the reference is the law, not a reimplementation
    // hazard: exact window geometry over adversarial whitespace
    // (\t \n \r, doubled spaces, leading/trailing runs, CJK, accents,
    // and U+00A0 which \s does NOT treat as whitespace — it must ride
    // inside tokens)
    val alphabet = "ab 字語é\t\n\r  ç z."
    val rnd = new scala.util.Random(17)
    val texts = (0 until 300).map { i =>
      (i.toLong, (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = texts.toDF("doc_id", "text")
    for ((size, stride) <- Seq((4, 2), (5, 5), (3, 7))) {
      val got = graft.operators.TextAnalysis
        .chunkByTokens(df, "doc_id", "text", size, stride)
        .as[(Long, Int, String, Int)].collect().toSet
      val want = texts.flatMap { case (id, text) =>
        val toks = Option(text).toSeq
          .flatMap(_.split("\\s+").toSeq).filter(_.nonEmpty)
        (0 until toks.length by stride).zipWithIndex.map { case (s, k) =>
          val w = toks.slice(s, s + size)
          (id, k, w.mkString(" "), w.length)
        }
      }.toSet
      assert(got == want, s"size=$size stride=$stride")
    }
  }

  test("unpivot row count equals non-null gated cells for random frames") {
    val rnd = new scala.util.Random(4)
    val rows = (0 until 300).map { i =>
      (i.toLong,
        if (rnd.nextBoolean()) Some(rnd.nextInt(10).toString) else None,
        if (rnd.nextBoolean()) Some(rnd.nextInt(10).toString) else None)
    }
    val df = rows.toDF("row_id", "qa", "qb")
    val melted = graft.operators.Reshape.unpivotNonNull(
      df, Seq("row_id"), Seq("qa", "qb"), "q", "v")
    val expected = rows.map(r => r._2.size + r._3.size).sum
    assert(melted.count() == expected)
  }

  test("getOrCreate ids are unique and preserve existing for random inputs") {
    val rnd = new scala.util.Random(5)
    val existing = (1 to 20).map(i => (i.toLong, s"k$i")).toDF("id", "k")
    val incoming = (0 until 200).map(_ => s"k${rnd.nextInt(40)}").toDF("k")
    val dim = graft.operators.SurrogateKeys.getOrCreate(existing, incoming, "id", "k")
    val n = dim.count()
    assert(dim.select("id").distinct().count() == n)
    assert(dim.select("k").distinct().count() == n)
    assert(dim.filter($"id" <= 20).count() == 20) // existing intact
  }
}
