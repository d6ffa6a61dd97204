package graft.operators

import graft.SparkSpec

/** Exact distributed quantiles (T87): percentile_disc semantics on
  * planted fixtures, tie handling, per-key independence, the null and
  * guard contracts, the one-exchange plan shape, and the approx twin's
  * tolerance pin.
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("percentile_disc semantics on a planted 1..10 group") {
    val df = (1 to 10).map(v => ("k", v.toLong)).toDF("key", "v")
    val got = Quantiles.exactQuantiles(df, "key", "v", Seq(0.1, 0.25, 0.5, 1.0))
      .select($"quantile", $"n", $"value").as[(Double, Long, Long)]
      .collect().sortBy(_._1).toSeq
    // rank = ceil(q * 10): 1, 3 (ceil 2.5), 5, 10
    assert(got == Seq((0.1, 10L, 1L), (0.25, 10L, 3L), (0.5, 10L, 5L), (1.0, 10L, 10L)))
  }

  test("ties: the value at the rank, not the distinct value") {
    val df = Seq(1L, 1L, 1L, 2L).map(("k", _)).toDF("key", "v")
    val got = Quantiles.exactQuantiles(df, "key", "v", Seq(0.5, 1.0))
      .select($"quantile", $"value").as[(Double, Long)].collect().toMap
    assert(got(0.5) == 1L && got(1.0) == 2L)
  }

  test("keys are independent; null values are excluded; all-null keys vanish") {
    val df = Seq(
      ("a", Some(10L)), ("a", Some(20L)), ("a", None),
      ("b", Some(5L)),
      ("c", None)).toDF("key", "v")
    val got = Quantiles.exactQuantiles(df, "key", "v", Seq(0.5))
      .select($"key", $"n", $"value").as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // a: n=2 (null dropped), rank ceil(1)=1 -> 10; b: the single row
    assert(got == Map("a" -> ((2L, 10L)), "b" -> ((1L, 5L))))
  }

  test("layout invariance: repartitioned input gives identical rows") {
    val base = docs.selectExpr("lang", "CAST(length(text) AS BIGINT) AS v")
    val a = Quantiles.exactQuantiles(base, "lang", "v", Seq(0.5, 0.9))
      .collect().map(_.toSeq).toSet
    val b = Quantiles.exactQuantiles(base.repartition(13), "lang", "v", Seq(0.5, 0.9))
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("plan shape: exactly one exchange (the window sort), no join") {
    val base = docs.selectExpr("lang", "CAST(length(text) AS BIGINT) AS v")
    val plan = Quantiles.exactQuantiles(base, "lang", "v", Seq(0.5, 0.99))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected the one window exchange, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"no join expected:\n$plan")
  }

  test("approx twin lands within sketch tolerance of the exact answer") {
    val base = docs.selectExpr("lang", "CAST(length(text) AS BIGINT) AS v")
    val qs = Seq(0.5, 0.9)
    val exact = Quantiles.exactQuantiles(base, "lang", "v", qs)
      .select($"lang", $"quantile", $"value").as[(String, Double, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val approx = Quantiles.approxQuantiles(base, "lang", "v", qs)
      .select($"lang", $"quantile", $"value").as[(String, Double, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, ev) =>
      val av = approx(k)
      assert(math.abs(av - ev).toDouble <= math.max(2.0, ev * 0.05),
        s"$k: approx $av vs exact $ev")
    }
  }

  test("random-data parity with a driver reference (the percentile_disc law)") {
    // the window + integer-rank plumbing vs a naive sort on the driver,
    // over random keys/values with heavy ties and sprinkled nulls
    val rnd = new scala.util.Random(29)
    val rows = (0 until 800).map { _ =>
      (s"k${rnd.nextInt(7)}",
        if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(50).toLong))
    }
    val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.9, 1.0)
    val got = Quantiles.exactQuantiles(rows.toDF("key", "v"), "key", "v", qs)
      .select($"key", $"quantile", $"n", $"value")
      .as[(String, Double, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val want = rows.collect { case (k, Some(v)) => (k, v) }
      .groupBy(_._1).flatMap { case (k, kvs) =>
        val sorted = kvs.map(_._2).sorted
        val n = sorted.length
        qs.map { q =>
          val rank = ((math.round(q * 1e6) * n + 999999L) / 1000000L).toInt
          (k, q) -> ((n.toLong, sorted(rank - 1)))
        }
      }
    assert(got == want)
  }

  test("scalable twin: bit-equal to exactQuantiles over random keys, ties, nulls, null keys") {
    // the r12 few-key path decomposes the rank into range-partitioned
    // pieces — same percentile_disc answer, bit for bit, including the
    // null-KEY group (its offsets join is null-safe) and heavy ties
    val rnd = new scala.util.Random(31)
    val rows = (0 until 1200).map { _ =>
      (if (rnd.nextInt(15) == 0) None else Some(s"k${rnd.nextInt(5)}"),
        if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(40).toLong))
    }
    val df = rows.toDF("key", "v")
    val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.9, 1.0)
    def rowSet(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSet
    val a = rowSet(Quantiles.exactQuantiles(df, "key", "v", qs))
    val b = rowSet(Quantiles.exactQuantilesScalable(df, "key", "v", qs))
    assert(a == b && a.nonEmpty)
    // and on real data at the q115 shape
    val base = docs.selectExpr("lang", "CAST(length(text) AS BIGINT) AS v")
    assert(rowSet(Quantiles.exactQuantiles(base, "lang", "v", Seq(0.5, 0.99))) ==
      rowSet(Quantiles.exactQuantilesScalable(base, "lang", "v", Seq(0.5, 0.99))))
  }

  test("scalable twin: ONE key stays bit-equal and no corpus window is keyed on the key alone") {
    val df = (1 to 5000).map(v => ("only", (v % 937).toLong)).toDF("key", "v")
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val scalable = Quantiles.exactQuantilesScalable(df, "key", "v", qs)
    assert(scalable.collect().map(_.toSeq).toSet ==
      Quantiles.exactQuantiles(df, "key", "v", qs).collect().map(_.toSeq).toSet)
    // plan pin (the single-task-stage guard): the corpus-grain window
    // is partitioned by (key, slice) — never by the key alone; windows
    // keyed on the key alone exist ONLY over the dimension-sized
    // offsets aggregate (grouped by key AND slice, so its row count is
    // bounded by shuffle partitions per key, not by the corpus)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val windows = scalable.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    val (sliceWins, keyWins) = windows.partition(_.partitionSpec.size == 2)
    assert(sliceWins.size == 1,
      s"expected exactly one (key, slice) window: ${windows.map(_.partitionSpec)}")
    keyWins.foreach { w =>
      val dimAgg = w.collectFirst {
        case a: Aggregate if a.groupingExpressions.size == 2 => a
      }
      assert(dimAgg.isDefined,
        s"a key-alone window must sit over the (key, slice) offsets aggregate:\n$w")
    }
  }

  test("value-type audit: both twins agree on DOUBLE and STRING values (rank math is type-free)") {
    // the rank arithmetic touches only COUNTS; the value column just
    // needs a total order — so negative/fractional doubles and UTF-8
    // strings ride both twins unchanged, `value` keeping its input type
    val rnd = new scala.util.Random(37)
    val dbl = (0 until 600).map(_ =>
      (s"k${rnd.nextInt(4)}", rnd.nextGaussian() * 100.0)).toDF("key", "v")
    val qs = Seq(0.25, 0.5, 0.9)
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.toSeq).toSet
    val dw = Quantiles.exactQuantiles(dbl, "key", "v", qs)
    assert(dw.schema("value").dataType == org.apache.spark.sql.types.DoubleType)
    assert(rows(dw) == rows(Quantiles.exactQuantilesScalable(dbl, "key", "v", qs)))
    val str = (0 until 500).map(i =>
      (s"k${i % 3}", s"w${rnd.nextInt(40)}é${rnd.nextInt(9)}")).toDF("key", "v")
    val sw = Quantiles.exactQuantiles(str, "key", "v", qs)
    assert(sw.schema("value").dataType == org.apache.spark.sql.types.StringType)
    assert(rows(sw) == rows(Quantiles.exactQuantilesScalable(str, "key", "v", qs)))
  }

  test("scalable twin: guards match the window twin") {
    val df = Seq(("k", 1L)).toDF("key", "v")
    assert(intercept[IllegalArgumentException] {
      Quantiles.exactQuantilesScalable(df, "key", "v", Seq.empty)
    }.getMessage.contains("at least one"))
    assert(intercept[IllegalArgumentException] {
      Quantiles.exactQuantilesScalable(df, "key", "v", Seq(1.5))
    }.getMessage.contains("(0, 1]"))
    assert(intercept[IllegalArgumentException] {
      Quantiles.exactQuantilesScalable(df, "key", "v", Seq(0.5, 0.5000001))
    }.getMessage.contains("collide"))
  }

  test("weighted quantiles: planted mass distribution picks by cumulative weight") {
    // values 1,2,3 with weights 1,1,8 (total 10): the mass sits at 3,
    // so medians-by-weight land there while the unweighted median is 2
    val df = Seq(("k", 1L, 1L), ("k", 2L, 1L), ("k", 3L, 8L)).toDF("key", "v", "w")
    val got = Quantiles.exactQuantilesWeighted(df, "key", "v", "w", Seq(0.1, 0.2, 0.5, 1.0))
      .select($"quantile", $"total_weight", $"value").as[(Double, Long, Long)]
      .collect().sortBy(_._1).toSeq
    // ranks = ceil(q * 10): 1 -> v1, 2 -> v2, 5 -> v3, 10 -> v3
    assert(got == Seq((0.1, 10L, 1L), (0.2, 10L, 2L), (0.5, 10L, 3L), (1.0, 10L, 3L)))
    // tied values pool their weights
    val tied = Seq(("k", 5L, 3L), ("k", 5L, 4L), ("k", 9L, 3L)).toDF("key", "v", "w")
    val t = Quantiles.exactQuantilesWeighted(tied, "key", "v", "w", Seq(0.7, 1.0))
      .select($"quantile", $"value").as[(Double, Long)].collect().toMap
    assert(t(0.7) == 5L && t(1.0) == 9L) // rank 7 falls exactly on 5's cum
  }

  test("weighted quantiles: all-1 weights degenerate to the unweighted law") {
    val base = docs.selectExpr("lang", "CAST(length(text) AS BIGINT) AS v", "1L AS w")
    val qs = Seq(0.25, 0.5, 0.9, 0.99)
    val unweighted = Quantiles.exactQuantiles(base, "lang", "v", qs)
      .select($"lang", $"quantile", $"n".as("total_weight"), $"value")
      .collect().map(_.toSeq).toSet
    val weighted = Quantiles.exactQuantilesWeighted(base, "lang", "v", "w", qs)
      .collect().map(_.toSeq).toSet
    assert(weighted == unweighted && weighted.nonEmpty)
  }

  test("weighted quantiles: zero/null weights and null values are unselectable mass") {
    val df = Seq(
      ("a", Some(10L), Some(0L)), // zero mass: excluded
      ("a", Some(20L), Some(2L)),
      ("a", None, Some(5L)),      // null value: excluded
      ("a", Some(30L), None),     // null weight: excluded
      ("b", Some(7L), Some(0L))). // a key with ONLY zero mass vanishes
      toDF("key", "v", "w")
    val got = Quantiles.exactQuantilesWeighted(df, "key", "v", "w", Seq(0.5, 1.0))
      .select($"key", $"total_weight", $"value").as[(String, Long, Long)].collect()
    // both quantiles land on the single surviving (a, 20) row; b is gone
    assert(got.length == 2 && got.forall(_ == (("a", 2L, 20L))))
  }

  test("weighted quantiles: the rank multiply survives token-mass past the long horizon") {
    // two values carrying 4e18 weight each: total 8e18 fits a long, but
    // q_micro * total = 8e24 does NOT — the DECIMAL(38,0) widening is
    // what keeps the rank exact (the r11 dataCardDiff overflow class)
    val big = 4000000000000000000L
    val df = Seq(("k", 1L, big), ("k", 2L, big)).toDF("key", "v", "w")
    val got = Quantiles.exactQuantilesWeighted(df, "key", "v", "w", Seq(0.5, 1.0))
      .select($"quantile", $"total_weight", $"value").as[(Double, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((0.5, 2 * big, 1L), (1.0, 2 * big, 2L)))
  }

  test("weighted scalable twin: bit-equal to the window form, random and one-key") {
    val rnd = new scala.util.Random(43)
    val rows = (0 until 900).map { _ =>
      (if (rnd.nextInt(12) == 0) None else Some(s"k${rnd.nextInt(4)}"),
        if (rnd.nextInt(15) == 0) None else Some(rnd.nextInt(30).toLong),
        rnd.nextInt(5).toLong - 1) // includes negative and zero mass
    }
    val df = rows.toDF("key", "v", "w")
    val qs = Seq(0.1, 0.5, 0.9, 1.0)
    def rowsOf(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.toSeq).toSet
    assert(rowsOf(Quantiles.exactQuantilesWeighted(df, "key", "v", "w", qs)) ==
      rowsOf(Quantiles.exactQuantilesWeightedScalable(df, "key", "v", "w", qs)))
    val one = (1 to 4000).map(i => ("only", (i % 611).toLong, (i % 7 + 1).toLong))
      .toDF("key", "v", "w")
    val a = rowsOf(Quantiles.exactQuantilesWeighted(one, "key", "v", "w", qs))
    assert(a == rowsOf(Quantiles.exactQuantilesWeightedScalable(one, "key", "v", "w", qs))
      && a.nonEmpty)
  }

  test("hist artifact: append == rebuild, merge is order-free, quantiles read off it exactly (T92)") {
    val base = docs.selectExpr("lang", "CAST(length(text) AS BIGINT) AS v", "doc_id")
    def histSet(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.toSeq).toSet
    val even = base.filter($"doc_id" % 2 === 0).drop("doc_id")
    val odd = base.filter($"doc_id" % 2 =!= 0).drop("doc_id")
    val all = base.drop("doc_id")
    val grown = Quantiles.histAppend(
      Quantiles.histIndex(even, "lang", "v"), odd, "lang", "v")
    val rebuilt = Quantiles.histIndex(all, "lang", "v")
    assert(histSet(grown) == histSet(rebuilt), "append must equal rebuild")
    // merge: order-free over three shards
    val shards = (0 to 2).map(k =>
      Quantiles.histIndex(base.filter($"doc_id" % 3 === k).drop("doc_id"), "lang", "v"))
    assert(histSet(Quantiles.histMerge(shards, "lang", "v")) ==
      histSet(Quantiles.histMerge(shards.reverse, "lang", "v")))
    assert(histSet(Quantiles.histMerge(shards, "lang", "v")) == histSet(rebuilt))
    // quantiles off the artifact == the direct operator, bit for bit
    val qs = Seq(0.25, 0.5, 0.9, 0.99)
    assert(
      Quantiles.quantilesOfHist(grown, "lang", "v", qs).collect().map(_.toSeq).toSet ==
        Quantiles.exactQuantiles(all, "lang", "v", qs).collect().map(_.toSeq).toSet)
  }

  test("hist artifact: parquet round trip in a fresh session; weighted masses; null keys") {
    val df = Seq(
      (Some("a"), 1L, 3L), (Some("a"), 2L, 1L),
      (None: Option[String], 5L, 2L), (None, 5L, 1L)).toDF("key", "v", "w")
    val ix = Quantiles.histIndex(df, "key", "v", weightCol = Some("w"))
    val dir = java.nio.file.Files.createTempDirectory("histix").toString
    ix.write.parquet(s"$dir/ix")
    val s2 = spark.newSession()
    val reopened = s2.read.parquet(s"$dir/ix")
    val got = Quantiles.quantilesOfHist(
        reopened, "key", "v", Seq(0.5, 1.0), totalName = "total_weight")
      .collect().map(_.toSeq).toSet
    val want = Quantiles.exactQuantilesWeighted(
        { import s2.implicits._
          Seq((Some("a"), 1L, 3L), (Some("a"), 2L, 1L),
            (None: Option[String], 5L, 2L), (None, 5L, 1L)).toDF("key", "v", "w") },
        "key", "v", "w", Seq(0.5, 1.0))
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
    // null-key rows pooled into one real group (mass 3 at v=5)
    assert(reopened.filter($"key".isNull).collect().map(r =>
      (r.getLong(1), r.getLong(2))).toSet == Set((5L, 3L)))
  }

  test("hist quantiles dispatch (r13): bit-equal across the maxBroadcastKeys boundary, no broadcast past it") {
    // 40 keys x a handful of values each, weighted masses, a null key —
    // the same artifact read through both physical forms
    val rows = (0 until 40).flatMap(k =>
      (1 to 5).map(v => (if (k == 7) None else Some(s"k$k"), v.toLong * (k + 1), (v % 3 + 1).toLong)))
    val ix = Quantiles.histIndex(rows.toDF("key", "v", "w"), "key", "v", weightCol = Some("w"))
    val qs = Seq(0.25, 0.5, 0.9, 1.0)
    val viaBroadcast = Quantiles.quantilesOfHist(ix, "key", "v", qs) // 40 <= default bound
    val viaWindow = Quantiles.quantilesOfHist(ix, "key", "v", qs, maxBroadcastKeys = 2)
    assert(viaBroadcast.collect().map(_.toSeq).toSet ==
      viaWindow.collect().map(_.toSeq).toSet)
    assert(viaWindow.count() > 0)
    // plan pins: under the bound the offsets frame is broadcast (the
    // scalable decomposition); past it NOTHING is broadcast — the
    // dispatched window twin has no join at all, so a 10^6-key
    // artifact can never push |keys| x |partitions| rows at the driver
    val under = viaBroadcast.queryExecution.executedPlan.toString
    val over = viaWindow.queryExecution.executedPlan.toString
    assert(under.contains("BroadcastHashJoin"), s"expected the offsets broadcast:\n$under")
    assert(!over.contains("Broadcast") && !over.contains("Join"),
      s"past the bound the plan must carry no broadcast and no join:\n$over")
  }

  test("binned artifact (T95): append == rebuild, merge order-free, grid frozen in the artifact") {
    // a CONTINUOUS value — chars per whitespace token — on real docs
    val base = docs.selectExpr(
      "lang",
      "CAST(length(text) AS DOUBLE) / size(split(text, ' ')) AS cpt",
      "doc_id")
    def aset(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.toSeq).toSet
    val even = base.filter($"doc_id" % 2 === 0).drop("doc_id")
    val odd = base.filter($"doc_id" % 2 =!= 0).drop("doc_id")
    val all = base.drop("doc_id")
    // append reads the grid FROM the artifact — no width parameter to drift
    val grown = Quantiles.binnedAppend(
      Quantiles.binnedIndex(even, "lang", "cpt", 0.25), odd, "lang", "cpt")
    val rebuilt = Quantiles.binnedIndex(all, "lang", "cpt", 0.25)
    assert(aset(grown) == aset(rebuilt), "binned append must equal rebuild")
    val shards = (0 to 2).map(k =>
      Quantiles.binnedIndex(base.filter($"doc_id" % 3 === k).drop("doc_id"), "lang", "cpt", 0.25))
    assert(aset(Quantiles.binnedMerge(shards, "lang")) ==
      aset(Quantiles.binnedMerge(shards.reverse, "lang")))
    assert(aset(Quantiles.binnedMerge(shards, "lang")) == aset(rebuilt))
    // parquet round trip in a fresh session: reads ride the stored grid
    val dir = java.nio.file.Files.createTempDirectory("binix").toString
    grown.write.parquet(s"$dir/ix")
    val s2 = spark.newSession()
    val qs = Seq(0.25, 0.5, 0.9, 0.99)
    assert(Quantiles.quantilesOfBinned(s2.read.parquet(s"$dir/ix"), "lang", qs)
      .collect().map(_.toSeq).toSet ==
      Quantiles.quantilesOfBinned(rebuilt, "lang", qs).collect().map(_.toSeq).toSet)
    // mixed grids fail typed BEFORE any aggregation can interleave them
    val other = Quantiles.binnedIndex(all, "lang", "cpt", 0.5)
    assert(intercept[IllegalArgumentException] {
      Quantiles.binnedMerge(Seq(rebuilt, other), "lang")
    }.getMessage.contains("mixed bin grids"))
    // an empty artifact has no grid to read — typed, never silent
    val empty = Quantiles.binnedIndex(
      Seq((Option.empty[String], Option.empty[Double])).toDF("lang", "cpt"),
      "lang", "cpt", 0.25)
    assert(intercept[IllegalArgumentException] {
      Quantiles.binnedAppend(empty, all, "lang", "cpt")
    }.getMessage.contains("empty binned artifact"))
    assert(intercept[IllegalArgumentException] {
      Quantiles.binnedIndex(all, "lang", "cpt", 0.0)
    }.getMessage.contains("positive finite"))
  }

  test("binned quantiles (T95): the error-bound law against the exact operator on random doubles") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 500).map { i =>
      (s"k${i % 5}", rnd.nextGaussian() * 10.0)
    }
    val df = rows.toDF("key", "v")
    val width = 0.5
    val ix = Quantiles.binnedIndex(df, "key", "v", width)
    val qs = Seq(0.1, 0.5, 0.9, 1.0)
    val binned = Quantiles.quantilesOfBinned(ix, "key", qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    val exact = Quantiles.exactQuantiles(df, "key", "v", qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(binned.keySet == exact.keySet)
    exact.foreach { case (kq, (n, vStar)) =>
      val (bn, bin, lo, hi) = binned(kq)
      assert(bn == n, s"$kq: totals must agree exactly")
      assert(lo <= vStar && vStar < hi,
        s"$kq: exact quantile $vStar must land inside the answer bin [$lo, $hi)")
      assert(bin == math.floor(vStar / width).toLong,
        s"$kq: the answer bin must be the exact quantile's own bin")
    }
    // the read inherits the hist dispatch: both physical forms, one answer
    assert(Quantiles.quantilesOfBinned(ix, "key", qs, maxBroadcastKeys = 2)
      .collect().map(_.toSeq).toSet ==
      Quantiles.quantilesOfBinned(ix, "key", qs).collect().map(_.toSeq).toSet)
  }

  test("binned artifact (T95): non-finite values excluded, negative values floor down, weighted masses") {
    val df = Seq(
      ("k", Some(-0.3)), ("k", Some(0.0)), ("k", Some(0.25)),
      ("k", Some(Double.NaN)), ("k", Some(Double.PositiveInfinity)),
      ("k", Some(Double.NegativeInfinity)), ("k", None)).toDF("key", "v")
    val ix = Quantiles.binnedIndex(df, "key", "v", 0.25)
    // only the three finite values carry mass; -0.3 floors to bin -2
    // (the [-0.5, -0.25) cell), 0.25 lands in ITS bin [0.25, 0.5)
    assert(ix.collect().map(r => (r.getLong(1), r.getLong(2))).toSet ==
      Set((-2L, 1L), (0L, 1L), (1L, 1L)))
    val got = Quantiles.quantilesOfBinned(ix, "key", Seq(0.33, 0.5, 1.0))
      .collect().map(r => (r.getDouble(1), (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got(0.33) == ((3L, -2L, -0.5, -0.25)))
    assert(got(0.5) == ((3L, 0L, 0.0, 0.25)))
    assert(got(1.0) == ((3L, 1L, 0.25, 0.5)))
    // weighted: masses sum integral weights; zero/negative weight is no mass
    val wdf = Seq(("k", 0.1, 3L), ("k", 0.6, 1L), ("k", 0.9, 0L), ("k", 0.7, -2L))
      .toDF("key", "v", "w")
    val wix = Quantiles.binnedIndex(wdf, "key", "v", 0.25, weightCol = Some("w"))
    assert(wix.collect().map(r => (r.getLong(1), r.getLong(2))).toSet ==
      Set((0L, 3L), (2L, 1L)))
    val wq = Quantiles.quantilesOfBinned(wix, "key", Seq(0.75, 1.0), totalName = "total_weight")
      .collect().map(r => (r.getDouble(1), r.getLong(3))).toMap
    assert(wq == Map(0.75 -> 0L, 1.0 -> 2L))
  }

  test("guards: empty and out-of-range quantiles, micro-unit collisions") {
    val df = Seq(("k", 1L)).toDF("key", "v")
    assert(intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, "key", "v", Seq.empty)
    }.getMessage.contains("at least one"))
    assert(intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, "key", "v", Seq(0.0))
    }.getMessage.contains("(0, 1]"))
    assert(intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, "key", "v", Seq(1.5))
    }.getMessage.contains("(0, 1]"))
    assert(intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, "key", "v", Seq(0.5, 0.5000001))
    }.getMessage.contains("collide"))
  }
}
