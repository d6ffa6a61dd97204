package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusFiltersSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    (1L, "A plain paragraph that ends properly. " * 20 + "\nAnd a second line!"),
    (2L, null),
    (3L, ""),
    (4L, "- bullet one\n- bullet two\n* bullet three\n• bullet four"),
    (5L, "to be continued...\nor with the unicode char…\nplain end."),
    (6L, "function f() { return 1; } // JavaScript snippet"),
    (7L, "Lorem ipsum dolor sit amet, consectetur adipiscing elit. " * 10),
    (8L, "### markdown #### headers ##### everywhere"),
    (9L, "1234 5678 !!! ??? +++ --- 9999"), // no alphabetic words
    (10L, "word " * 60), // 60 words, all 4-char, no punct
    (11L, "  spaced   out\ttabs\nand lines  "),
    (12L, "......" + " six dots then words" * 30),
    (13L, "Um parágrafo acentuado çãé. " * 20), // accented-only words count via ASCII rule
    // astral-plane chars: one emoji = 1 codepoint (Spark/DuckDB length)
    // but 2 UTF-16 units — pins the kernel's codePointCount fix
    (14L, "rocket 🚀 launch 🌍 globe. " * 15))

  test("kernel signals == expression twin on crafted edges + corpus sample") {
    val edge = cases.toDF("doc_id", "text")
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    for (df <- Seq(edge, corpus)) {
      val kern = CorpusFilters.heuristicFilter(df, "doc_id", "text")
      val exprd = df.select(
        col("doc_id") +: CorpusFilters.heuristicSignalsExpr(col("text"))
          .map { case (n, c) => c.as(n) }: _*)
      val mismatches = kern.exceptAll(exprd).count() + exprd.exceptAll(kern).count()
      assert(mismatches == 0, s"kernel/expr divergence on ${df.schema}")
    }
  }

  test("rule battery fires on the right documents") {
    val out = CorpusFilters.heuristicFilter(cases.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("keep") == 1)
    assert(out(2L).getAs[Int]("keep") == 0) // null
    assert(out(3L).getAs[Int]("keep") == 0) // empty
    assert(out(4L).getAs[Double]("bullet_line_ratio") == 1.0)
    assert(out(5L).getAs[Double]("ellipsis_line_ratio") == 2.0 / 3.0)
    assert(out(6L).getAs[Int]("has_brace") == 1)
    assert(out(6L).getAs[Int]("has_javascript") == 1)
    assert(out(7L).getAs[Int]("has_lorem") == 1)
    assert(out(7L).getAs[Int]("keep") == 0)
    assert(out(8L).getAs[Double]("symbol_word_ratio") > 0.1)
    assert(out(9L).getAs[Double]("alpha_word_ratio") == 0.0)
    assert(out(10L).getAs[Int]("keep") == 1) // 60 words, mean len 4
    assert(out(10L).getAs[Long]("word_count") == 60L)
    assert(out(12L).getAs[Double]("symbol_word_ratio") > 0.0) // "......" = 2 runs
    assert(out(13L).getAs[Int]("keep") == 0) // ASCII alpha rule: 'çãé.' words still count via other chars
  }

  test("mixToWeightsByMass (T96): membership equals the bucket-prefix reference; maximality; determinism") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select($"doc_id", $"lang", length($"text").cast("long").as("mass"))
    val weights = Map("en" -> 0.5, "es" -> 0.3, "de" -> 0.2)
    val mixed = Sampling.mixToWeightsByMass(docs, "doc_id", "lang", "mass", weights)
    // driver reference: recompute the cutoffs from the dimension-sized
    // (lang, bucket, mass) profile and derive exact expected membership
    val prof = docs.filter($"lang".isin(weights.keys.toSeq: _*) && $"mass" > 0)
      .withColumn("b", Sampling.hashBucket($"doc_id"))
    val bm = prof.groupBy("lang", "b").agg(sum("mass").as("bm"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val md = bm.groupBy(_._1).map { case (d, rs) => d -> rs.map(_._3).sum }
    val T = weights.keys.map(d => md(d).toDouble / weights(d)).min
    val cutoff = weights.keys.map { d =>
      if (md(d).toDouble / weights(d) == T) d -> Sampling.Buckets.toLong
      else {
        var cum = 0L; var cut = -1L
        bm.filter(_._1 == d).sortBy(_._2).foreach { case (_, b, m) =>
          cum += m; if (cum.toDouble <= weights(d) * T) cut = b
        }
        d -> cut
      }
    }.toMap
    val expIds = prof.select("doc_id", "lang", "b").collect()
      .filter(r => r.getLong(2) <= cutoff(r.getString(1)))
      .map(_.getLong(0)).toSet
    assert(mixed.select("doc_id").collect().map(_.getLong(0)).toSet == expIds)
    assert(expIds.nonEmpty)
    // at least one domain is actually cut (or the fixture proves nothing)
    assert(cutoff.values.exists(_ < Sampling.Buckets.toLong))
    // maximality: each cut domain keeps the longest prefix within target
    weights.keys.foreach { d =>
      if (cutoff(d) < Sampling.Buckets) {
        val target = weights(d) * T
        val keptMass = bm.filter(r => r._1 == d && r._2 <= cutoff(d)).map(_._3).sum
        val next = bm.filter(r => r._1 == d && r._2 > cutoff(d)).sortBy(_._2)
          .headOption.map(_._3).getOrElse(0L)
        assert(keptMass.toDouble <= target, s"$d overshoots the mass budget")
        assert(next == 0L || keptMass.toDouble + next > target,
          s"$d left a whole bucket of budget on the table")
      }
    }
    // deterministic: rerun is identical
    val again = Sampling.mixToWeightsByMass(docs, "doc_id", "lang", "mass", weights)
    assert(mixed.exceptAll(again).count() == 0 && again.exceptAll(mixed).count() == 0)
  }

  test("mixToWeightsByMass: zero/null mass and null ids unselectable; mass-proportional weights keep all") {
    val df = Seq(
      (Option(1L), "a", Option(10L)), (Option(2L), "a", Option(0L)),
      (Option(3L), "a", Option.empty[Long]), (Option.empty[Long], "a", Option(5L)),
      (Option(4L), "b", Option(5L)), (Option(5L), "c", Option(7L)))
      .toDF("id", "dom", "mass")
    // a: 10 mass at w=2; b: 5 at w=1 -> mass/w = 5.0 for BOTH (exact
    // doubles) -> both binding -> every massy weighted row survives
    val out = Sampling.mixToWeightsByMass(df, "id", "dom", "mass",
      Map("a" -> 2.0, "b" -> 1.0))
    assert(out.collect().map(_.getLong(0)).toSet == Set(1L, 4L))
  }

  test("temperatureMixByMass (T97): == mixToWeightsByMass with mass^alpha weights; alpha endpoints") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select($"doc_id", $"lang", length($"text").cast("long").as("mass"))
    val masses = docs.filter($"lang".isNotNull && $"mass" > 0)
      .groupBy("lang").agg(sum("mass").as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the closed form IS mixToWeightsByMass with w_d = mass_d^alpha:
    // same kept set, bit-for-bit (the temperatureMix == mixToWeights
    // law, lifted to the mass family)
    for (alpha <- Seq(0.0, 0.3, 0.5, 0.7)) {
      val viaTemp = Sampling.temperatureMixByMass(docs, "doc_id", "lang", "mass", alpha)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val viaMix = Sampling.mixToWeightsByMass(docs, "doc_id", "lang", "mass",
        masses.map { case (d, m) => d -> math.pow(m.toDouble, alpha) })
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(viaTemp == viaMix,
        s"alpha=$alpha: closed form diverged from mixToWeightsByMass")
    }
    // alpha = 1: w = mass, mass/w = 1.0 exactly for every domain — all
    // binding, every sampleable row survives (the natural mix identity)
    val sampleable = docs
      .filter($"doc_id".isNotNull && $"lang".isNotNull && $"mass" > 0).count()
    assert(Sampling.temperatureMixByMass(docs, "doc_id", "lang", "mass", 1.0)
      .count() == sampleable)
    // the rare domain's kept-MASS share grows as alpha falls (the
    // flattening is in mass space, not doc count)
    def rareMassShare(a: Double): Double = {
      val kept = Sampling.temperatureMixByMass(docs, "doc_id", "lang", "mass", a)
        .groupBy("lang").agg(sum("mass").as("m")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      kept.getOrElse(masses.minBy(_._2)._1, 0L).toDouble / kept.values.sum
    }
    assert(rareMassShare(0.0) > rareMassShare(0.5) &&
      rareMassShare(0.5) > rareMassShare(1.0))
  }

  test("temperatureMixByMass: null id/domain and non-positive mass unselectable") {
    val df = Seq(
      (Option(1L), Option("a"), Option(10L)), (Option(2L), Option("a"), Option(0L)),
      (Option(3L), Option("a"), Option.empty[Long]),
      (Option.empty[Long], Option("a"), Option(5L)),
      (Option(4L), Option.empty[String], Option(5L)),
      (Option(5L), Option("b"), Option(7L)))
      .toDF("id", "dom", "mass")
    // alpha = 1: keeps exactly the sampleable rows — the contract rows drop
    val out = Sampling.temperatureMixByMass(df, "id", "dom", "mass", 1.0)
    assert(out.collect().map(_.getLong(0)).toSet == Set(1L, 5L))
  }

  test("mixToWeights hits target proportions, binding domain keeps all") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val weights = Map("en" -> 0.5, "es" -> 0.3, "de" -> 0.2)
    val mixed = Sampling.mixToWeights(docs, "doc_id", "lang", weights)
    val got = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == weights.keySet) // unweighted langs dropped
    // binding domain: min(count/w) over en:218 es:73 de:70 -> es binds
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val binding = weights.keys.minBy(d => counts(d) / weights(d))
    assert(got(binding) == counts(binding))
    // achieved mix within hash-bucket quantization of the target
    val total = got.values.sum.toDouble
    weights.foreach { case (d, w) =>
      val target = w / weights.values.sum
      assert(math.abs(got(d) / total - target) < 0.05,
        s"$d: got ${got(d) / total}, want ~$target")
    }
    // deterministic: rerun is identical
    val again = Sampling.mixToWeights(docs, "doc_id", "lang", weights)
    assert(mixed.exceptAll(again).count() == 0 && again.exceptAll(mixed).count() == 0)
  }
}
