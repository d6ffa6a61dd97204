package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Data-card contracts: driver-reference equality on real data, the
  * vocabulary axis actually discriminating, degenerate domains, and
  * layout invariance of the integer quality mass.
  */
class DataCardSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("counts and vocabulary match a driver reference on real data") {
    val got = TextAnalysis.dataCard(docs, "text", "lang")
      .select($"lang", $"n_docs", $"n_tokens", $"distinct_tokens")
      .as[(String, Long, Long, Long)].collect().toSet
    val rows = docs.select($"lang", $"text").as[(String, Option[String])].collect()
    val want = rows.groupBy(_._1).map { case (lang, rs) =>
      val toksPer = rs.map(_._2 match {
        case Some(t) if t.trim.nonEmpty => t.trim.toLowerCase.split("\\s+").toSeq
        case _                          => Seq.empty[String]
      })
      (lang, rs.size.toLong, toksPer.map(_.size.toLong).sum,
        toksPer.flatten.toSet.size.toLong)
    }.toSet
    assert(got == want)
  }

  test("ttr discriminates vocabulary at equal token counts") {
    // rich: 12 distinct tokens; poor: the same token 12 times — equal
    // n_tokens, vocabulary 12 vs 1
    val rich = (0 until 12).map(i => s"w$i").mkString(" ")
    val poor = Seq.fill(12)("w").mkString(" ")
    val card = TextAnalysis.dataCard(
        Seq(("rich", rich), ("poor", poor)).toDF("dom", "text"), "text", "dom")
      .select($"dom", $"n_tokens", $"distinct_tokens", $"ttr")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(card("rich") == (12L, 12L, 1.0))
    assert(card("poor") == (12L, 1L, math.rint(1.0 / 12 * 1e6) / 1e6))
  }

  test("degenerate domain: all-empty texts give zero counts and null ttr") {
    val card = TextAnalysis.dataCard(
        Seq(("e", ""), ("e", "   "), ("ok", "a b")).toDF("dom", "text"), "text", "dom")
      .select($"dom", $"n_tokens", $"distinct_tokens", $"ttr", $"quality_micro")
      .as[(String, Long, Long, Option[Double], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(card("e") == (0L, 0L, None, 0L))
    assert(card("ok")._1 == 2L && card("ok")._2 == 2L && card("ok")._3.contains(1.0))
  }

  test("quality mass is an exact integer fold: layout-invariant") {
    val a = TextAnalysis.dataCard(docs, "text", "lang")
      .select($"lang", $"quality_micro").as[(String, Long)].collect().toSet
    val b = TextAnalysis.dataCard(docs.repartition(13), "text", "lang")
      .select($"lang", $"quality_micro").as[(String, Long)].collect().toSet
    assert(a == b && a.forall(_._2 > 0))
  }

  private def cardSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("mergeable card: append == rebuild bit-for-bit (T81)") {
    // the nightly-maintenance contract: index yesterday's corpus once,
    // fold today's batch in, and the card off the artifact equals a
    // from-scratch rebuild over the union — including the NON-additive
    // distinct-vocabulary column the index exists for
    val ix = TextAnalysis.dataCardIndex(docs.filter($"doc_id" % 2 === 0), "text", "lang")
    val merged = TextAnalysis.dataCardAppend(
      ix, docs.filter($"doc_id" % 2 =!= 0), "text", "lang")
    assert(cardSet(TextAnalysis.dataCardOf(merged, "lang")) ==
      cardSet(TextAnalysis.dataCard(docs, "text", "lang")))
    // three-way merge and the single-index identity
    val thirds = Seq(0, 1, 2).map(k =>
      TextAnalysis.dataCardIndex(docs.filter($"doc_id" % 3 === k), "text", "lang"))
    assert(cardSet(TextAnalysis.dataCardOf(
      TextAnalysis.dataCardMerge(thirds), "lang")) ==
      cardSet(TextAnalysis.dataCard(docs, "text", "lang")))
    val whole = TextAnalysis.dataCardIndex(docs, "text", "lang")
    assert(cardSet(TextAnalysis.dataCardOf(
      TextAnalysis.dataCardMerge(Seq(whole)), "lang")) ==
      cardSet(TextAnalysis.dataCard(docs, "text", "lang")))
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.dataCardMerge(Seq.empty)
    }.getMessage.contains("at least one"))
  }

  test("mergeable card: artifact persists, reopens in a fresh session, layout-invariant") {
    val dir = java.nio.file.Files.createTempDirectory("cardix").toString
    TextAnalysis.dataCardIndex(docs.filter($"doc_id" % 2 === 0), "text", "lang")
      .write.parquet(s"$dir/ix")
    val s2 = spark.newSession()
    val reopened = s2.read.parquet(s"$dir/ix")
    val merged = TextAnalysis.dataCardAppend(reopened, {
      import s2.implicits._
      s2.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter($"doc_id" % 2 =!= 0)
    }, "text", "lang")
    val want = cardSet(TextAnalysis.dataCard(docs, "text", "lang"))
    assert(TextAnalysis.dataCardOf(merged, "lang").collect()
      .map(_.toSeq).toSet == want)
    // index layout does not move the card (repartitioned artifact)
    assert(cardSet(TextAnalysis.dataCardOf(
      TextAnalysis.dataCardIndex(docs.repartition(13), "text", "lang"), "lang")) == want)
  }

  test("mergeable card: a batch with no new vocabulary grows counts, not the vocab") {
    val base = Seq(("en", "alpha beta gamma")).toDF("lang", "text")
    val ix = TextAnalysis.dataCardIndex(base, "text", "lang")
    val again = TextAnalysis.dataCardAppend(
      ix, Seq(("en", "beta gamma")).toDF("lang", "text"), "text", "lang")
    val row = TextAnalysis.dataCardOf(again, "lang")
      .select($"n_docs", $"n_tokens", $"distinct_tokens")
      .as[(Long, Long, Long)].head()
    assert(row == ((2L, 5L, 3L)))
  }

  test("card drift: planted added/removed/common statuses and exact deltas (T85)") {
    // yesterday: web (4 tokens of 2 distinct) + books; today: web grew
    // by one doc, books vanished, code appeared
    val a = TextAnalysis.dataCard(Seq(
      ("web", "x y x y"), ("books", "a b c")).toDF("dom", "text"), "text", "dom")
    val b = TextAnalysis.dataCard(Seq(
      ("web", "x y x y"), ("web", "z z"), ("code", "if else")).toDF("dom", "text"),
      "text", "dom")
    val d = TextAnalysis.dataCardDiff(a, b, "dom").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(d("books").getString(1) == "removed")
    assert(d("code").getString(1) == "added")
    assert(d("web").getString(1) == "common")
    // web: docs 1 -> 2, tokens 4 -> 6, vocab 2 -> 3
    assert(d("web").getAs[Long]("docs_delta") == 1L)
    assert(d("web").getAs[Long]("tokens_delta") == 2L)
    assert(d("web").getAs[Long]("vocab_delta") == 1L)
    // shares: A totals 7 tokens -> web 4/7; B totals 8 -> web 6/8
    assert(d("web").getAs[Long]("token_share_micro_a") == 4L * 1000000L / 7L)
    assert(d("web").getAs[Long]("token_share_micro_b") == 6L * 1000000L / 8L)
    assert(d("web").getAs[Long]("share_delta_micro") ==
      6L * 1000000L / 8L - 4L * 1000000L / 7L)
    // removed side: B columns null, deltas fold the side to zero
    assert(d("books").isNullAt(d("books").fieldIndex("n_docs_b")))
    assert(d("books").getAs[Long]("docs_delta") == -1L)
    assert(d("books").getAs[Long]("tokens_delta") == -3L)
  }

  test("card drift: identical cards diff to all-common, all-zero deltas") {
    val card = TextAnalysis.dataCard(docs, "text", "lang")
    val d = TextAnalysis.dataCardDiff(card, card, "lang").collect()
    assert(d.nonEmpty)
    assert(d.forall(_.getString(1) == "common"))
    Seq("docs_delta", "tokens_delta", "vocab_delta",
        "share_delta_micro", "quality_delta_micro").foreach { c =>
      assert(d.forall(r => r.getAs[Long](c) == 0L), c)
    }
  }

  test("card drift: diff(a,b) and diff(b,a) are exactly antisymmetric for random corpora") {
    // deltas negate, added/removed swap, *_a/*_b columns mirror — the
    // all-long design makes this EXACT (a rounded-double delta would
    // only be approximately antisymmetric)
    val rnd = new scala.util.Random(41)
    val rows = (0 until 400).map { _ =>
      (s"d${rnd.nextInt(6)}",
        (0 until rnd.nextInt(12)).map(_ => s"w${rnd.nextInt(30)}").mkString(" "))
    }
    val cardA = TextAnalysis.dataCard(rows.take(250).toDF("dom", "text"), "text", "dom")
    val cardB = TextAnalysis.dataCard(rows.drop(150).toDF("dom", "text"), "text", "dom")
    def byDom(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => Option(r.getString(0)).getOrElse("§null") -> r).toMap
    val ab = byDom(TextAnalysis.dataCardDiff(cardA, cardB, "dom"))
    val ba = byDom(TextAnalysis.dataCardDiff(cardB, cardA, "dom"))
    assert(ab.keySet == ba.keySet && ab.nonEmpty)
    val negate = Seq("docs_delta", "tokens_delta", "vocab_delta",
      "share_delta_micro", "quality_delta_micro")
    val mirror = Seq("n_docs", "n_tokens", "distinct_tokens",
      "token_share_micro", "mean_quality_micro")
    ab.foreach { case (dom, f) =>
      val r = ba(dom)
      val (sf, sr) = (f.getString(1), r.getString(1))
      assert(sf == (sr match {
        case "added" => "removed"; case "removed" => "added"; case s => s
      }), s"$dom: $sf vs $sr")
      negate.foreach { c =>
        assert(f.getAs[Long](c) == -r.getAs[Long](c), s"$dom.$c")
      }
      mirror.foreach { c =>
        def g(row: org.apache.spark.sql.Row, n: String) = {
          val i = row.fieldIndex(n)
          if (row.isNullAt(i)) None else Some(row.getLong(i))
        }
        assert(g(f, s"${c}_a") == g(r, s"${c}_b"), s"$dom.${c}_a")
        assert(g(f, s"${c}_b") == g(r, s"${c}_a"), s"$dom.${c}_b")
      }
    }
  }

  test("card drift: token shares stay exact past the long-multiply horizon (r11 ADVICE)") {
    // a domain with > ~9.2e12 tokens wraps `n_tokens * 1000000` in long
    // arithmetic (that's ~35 TB of text — inside the design scale); the
    // share multiply widens to DECIMAL(38,0) first, so shares stay in
    // [0, 1e6] and exact. Cards are constructed directly: the diff's
    // contract is over card frames, not raw corpora.
    val big = 4000000000000000000L // 4e18, near the long ceiling
    val card = Seq(
      ("web", 10L, big, 5L, 0.5, 100L),
      ("code", 10L, big / 3L, 5L, 0.5, 100L))
      .toDF("dom", "n_docs", "n_tokens", "distinct_tokens", "ttr", "quality_micro")
    val d = TextAnalysis.dataCardDiff(card, card, "dom").collect()
      .map(r => r.getString(0) -> r).toMap
    val total = big + big / 3L
    // exact integer shares via BigInt reference — no wrap, no negative
    val wantWeb = (BigInt(big) * 1000000 / BigInt(total)).toLong
    val wantCode = (BigInt(big / 3L) * 1000000 / BigInt(total)).toLong
    assert(d("web").getAs[Long]("token_share_micro_a") == wantWeb)
    assert(d("code").getAs[Long]("token_share_micro_a") == wantCode)
    assert(d.values.forall(r => r.getAs[Long]("share_delta_micro") == 0L))
    assert(d.values.forall { r =>
      val s = r.getAs[Long]("token_share_micro_b")
      s >= 0L && s <= 1000000L
    })
  }

  test("card drift: null domain rows join null-safely instead of cross-firing") {
    val a = TextAnalysis.dataCard(Seq(
      (null.asInstanceOf[String], "u v"), ("en", "a")).toDF("dom", "text"),
      "text", "dom")
    val b = TextAnalysis.dataCard(Seq(
      (null.asInstanceOf[String], "u v w")).toDF("dom", "text"), "text", "dom")
    val d = TextAnalysis.dataCardDiff(a, b, "dom").collect()
    assert(d.length == 2)
    val nullRow = d.find(_.isNullAt(0)).get
    assert(nullRow.getString(1) == "common" &&
      nullRow.getAs[Long]("tokens_delta") == 1L)
    assert(d.find(r => !r.isNullAt(0)).get.getString(1) == "removed")
  }
}
