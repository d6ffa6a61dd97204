package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Delivery-manifest contracts: order/layout independence, what each
  * checksum fold catches, strict null canonicalization, the diff
  * status lattice, and the recompute-and-compare consumer path.
  */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text", $"lang")

  private def mf(df: org.apache.spark.sql.DataFrame) =
    Manifest.build(df, "lang", Seq("doc_id", "text"), length($"text"))

  test("manifest is independent of row order and partitioning") {
    val a = mf(docs).collect().toSet
    val b = mf(docs.repartition(13).orderBy(desc("text"))).collect().toSet
    assert(a == b)
    // and every group's folds are engine-portable values, not platform
    // artifacts: rowHash is bounded to [0, 2^32)
    val hs = docs.select(Manifest.rowHash(Seq($"doc_id", $"text")).as("h"))
      .agg(min($"h"), max($"h")).as[(Long, Long)].head()
    assert(hs._1 >= 0L && hs._2 < (1L << 32))
  }

  test("single-row corruption flips the group's checksums; others untouched") {
    val base = mf(docs)
    val corrupted = docs.withColumn("text",
      when($"doc_id" === 7L, concat($"text", lit("x"))).otherwise($"text"))
    val d = Manifest.diff(base, mf(corrupted), "lang")
    val lang7 = docs.filter($"doc_id" === 7L).select($"lang").as[String].head()
    val statuses = d.select($"lang", $"status").as[(String, String)].collect().toMap
    assert(statuses(lang7) == "mismatch")
    assert(statuses.filter(_._1 != lang7).values.forall(_ == "match"))
    // row counts are carried for the report reader — equal here (a
    // rewrite, not a loss)
    val row = d.filter($"lang" === lang7)
      .select($"n_rows_exp", $"n_rows_act").as[(Long, Long)].head()
    assert(row._1 == row._2)
  }

  test("an even duplicate defeats xor but not sum — why both folds exist") {
    val dup = docs.filter($"doc_id" === 11L)
    val twice = docs.unionAll(dup).unionAll(dup)
    val a = mf(docs)
    val b = mf(twice)
    val lang11 = dup.select($"lang").as[String].head()
    val joined = a.alias("a").join(b.alias("b"), "lang").filter($"lang" === lang11)
      .select($"a.xor_hash", $"b.xor_hash", $"a.sum_hash", $"b.sum_hash", $"a.n_rows", $"b.n_rows")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(joined._1 == joined._2, "two identical copies xor-cancel")
    assert(joined._3 != joined._4, "sum catches the added hash mass")
    assert(joined._5 + 2 == joined._6)
    assert(Manifest.diff(a, b, "lang").filter($"lang" === lang11)
      .select($"status").as[String].head() == "mismatch")
  }

  test("strict canonicalization: null position matters; null group keys get a row") {
    val x = Seq((1L, Option("x"), Option.empty[String], "g"))
      .toDF("id", "a", "b", "grp")
    val y = Seq((1L, Option.empty[String], Option("x"), "g"))
      .toDF("id", "a", "b", "grp")
    def m(df: org.apache.spark.sql.DataFrame) =
      Manifest.build(df, "grp", Seq("a", "b"), lit(0))
    assert(Manifest.diff(m(x), m(y), "grp")
      .select($"status").as[String].head() == "mismatch",
      "(x, null) and (null, x) must not hash alike — column-shift corruption")
    // null group key: the row is IN the manifest, under the null group
    val withNullGrp = Seq((1L, "t", Option("g")), (2L, "u", Option.empty[String]))
      .toDF("id", "text", "grp")
    val m2 = Manifest.build(withNullGrp, "grp", Seq("id", "text"), length($"text"))
    assert(m2.count() == 2)
    assert(m2.filter($"grp".isNull).select($"n_rows").as[Long].head() == 1L)
  }

  test("diff status lattice: match, mismatch, missing, extra — and check() composes") {
    val exp = docs.filter($"lang" =!= "de")
    // actual: drops es, adds de, perturbs fr, keeps en/zh byte-identical
    val act = docs.filter($"lang" =!= "es").withColumn("text",
      when($"lang" === "fr", concat($"text", lit("!"))).otherwise($"text"))
    val d = Manifest.check(mf(exp), act, "lang", Seq("doc_id", "text"), length($"text"))
      .select($"lang", $"status").as[(String, String)].collect().toMap
    assert(d("es") == "missing")
    assert(d("de") == "extra")
    assert(d("fr") == "mismatch")
    assert(d("en") == "match")
  }

  test("merge == rebuild bit-for-bit; groups missing from a batch ride through") {
    // the nightly-turn shape: per-batch manifests fold-merged into the
    // standing one must equal a from-scratch rebuild over the union —
    // exactly, because every fold is commutative+associative
    val b1 = mf(docs.filter($"doc_id" % 3 === 0))
    val b2 = mf(docs.filter($"doc_id" % 3 === 1))
    val b3 = mf(docs.filter($"doc_id" % 3 === 2))
    val merged = Manifest.merge(Seq(b1, b2, b3), "lang")
    val rebuilt = mf(docs)
    assert(Manifest.diff(rebuilt, merged, "lang")
      .filter($"status" =!= "match").isEmpty)
    // a group entirely absent from one batch still consolidates
    val only1 = mf(docs.filter($"lang" === "de"))
    val only2 = mf(docs.filter($"lang" =!= "de"))
    assert(Manifest.diff(rebuilt, Manifest.merge(Seq(only1, only2), "lang"), "lang")
      .filter($"status" =!= "match").isEmpty)
    // single-manifest merge is the identity
    assert(Manifest.diff(rebuilt, Manifest.merge(Seq(rebuilt), "lang"), "lang")
      .filter($"status" =!= "match").isEmpty)
    // typed guard
    assert(intercept[IllegalArgumentException] {
      Manifest.merge(Seq.empty, "lang")
    }.getMessage.contains("at least one"))
  }

  test("composed delivery story: pack to shards, manifest per shard, corruption localizes") {
    // pack documents into token-budget shards, manifest BY SHARD, then
    // corrupt one document in transit: the diff must flag exactly the
    // shards holding that document and no others
    val packed = Packing.packSequences(docs, "doc_id", "text", budget = 512, nShards = 7)
      .select($"doc_id", $"shard")
      .join(docs, "doc_id")
    def m(df: org.apache.spark.sql.DataFrame) =
      Manifest.build(df, "shard", Seq("doc_id", "text"), length($"text"))
    val published = m(packed)
    assert(published.count() == 7)
    val corrupted = packed.withColumn("text",
      when($"doc_id" === 42L, lit("flipped bits")).otherwise($"text"))
    val badShard = packed.filter($"doc_id" === 42L).select($"shard").as[Long].head()
    val d = Manifest.check(published, corrupted, "shard", Seq("doc_id", "text"), length($"text"))
      .select($"shard", $"status").as[(Long, String)].collect().toMap
    assert(d(badShard) == "mismatch")
    assert(d.filter(_._1 != badShard).values.forall(_ == "match"),
      "corruption must localize to the one shard")
  }

  test("null group diffs as ONE row; merge is by-name, not positional") {
    // the null group has its own manifest row on both sides — the diff
    // must null-safe-join it into one comparison, not missing + extra
    val x = Seq((1L, "t", Option("g")), (2L, "u", Option.empty[String]))
      .toDF("id", "text", "grp")
    val y = Seq((1L, "t", Option("g")), (2L, "CHANGED", Option.empty[String]))
      .toDF("id", "text", "grp")
    def m(df: org.apache.spark.sql.DataFrame) =
      Manifest.build(df, "grp", Seq("id", "text"), length($"text"))
    val d = Manifest.diff(m(x), m(y), "grp").collect()
    assert(d.length == 2, s"null group must be one row: ${d.mkString(", ")}")
    val byGrp = d.map(r => Option(r.getString(0)) -> r.getString(1)).toMap
    assert(byGrp(Some("g")) == "match" && byGrp(None) == "mismatch")
    assert(Manifest.diff(m(x), m(x), "grp").collect()
      .forall(_.getString(1) == "match"))
    // a manifest reopened with reordered columns still merges exactly
    val half1 = mf(docs.filter($"doc_id" % 2 === 0))
      .select($"xor_hash", $"lang", $"sum_hash", $"n_rows", $"n_bytes")
    val half2 = mf(docs.filter($"doc_id" % 2 =!= 0))
    assert(Manifest.diff(mf(docs), Manifest.merge(Seq(half1, half2), "lang"), "lang")
      .filter($"status" =!= "match").isEmpty)
  }

  test("turn accounting: per-turn curated manifests merge to the union's manifest") {
    // the delivery story for incremental curation: every nightly turn
    // manifests ONLY its own curated batch (O(batch)) and merges it
    // into the standing manifest; after two turns the standing
    // manifest must equal a from-scratch build over everything ever
    // curated — accounting follows the corpus without ever rescanning
    // it
    // a third of sf0.001 keeps both turns non-trivial while the LSH
    // work inside curateIncremental stays test-sized: the assertion is
    // manifest merge == rebuild over WHATEVER was curated, so the
    // corpus size is a fixture knob, not part of the contract
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"doc_id" % 3 === 0)
      .select($"doc_id", $"text", $"lang")
    val kept = all.filter($"doc_id" % 2 === 0)
    val bench = all.filter($"doc_id" % 97 === 0).select("doc_id", "text")
    val params = Curation.CurationParams(
      minQuality = 0.0, maxRepetition = 1.0, maxContamination = 0.5)
    def curatedOf(r: Curation.IncrementalResult) =
      r.curated.select($"doc_id", $"text", $"lang")
    def m(df: org.apache.spark.sql.DataFrame) =
      Manifest.build(df, "lang", Seq("doc_id", "text"), length($"text"))

    val ix0 = LshIndex.build(kept, "doc_id", "text")
    val r1 = Curation.curateIncremental(
      ix0, all.filter($"doc_id" % 4 === 1), bench, "doc_id", "text", "lang", params)
    val night1 = curatedOf(r1).cache()
    val r2 = Curation.curateIncremental(
      r1.kept, all.filter($"doc_id" % 4 === 3), bench, "doc_id", "text", "lang", params)
    val night2 = curatedOf(r2).cache()
    assert(night1.count() > 0 && night2.count() > 0, "fixture turns must curate something")

    val standing = Manifest.merge(Seq(m(night1), m(night2)), "lang")
    val rebuilt = m(night1.unionByName(night2))
    assert(Manifest.diff(rebuilt, standing, "lang")
      .filter($"status" =!= "match").isEmpty)
    night1.unpersist(); night2.unpersist()
    r1.unpersist(); r2.unpersist()
  }

  test("delivery pair: write+manifest round-trips; a lost partition fails typed naming the group") {
    val dir = java.nio.file.Files.createTempDirectory("delivery").toString
    Manifest.writeWithManifest(docs, s"$dir/rel1", "lang",
      Seq("doc_id", "text"), length($"text"))

    // clean round-trip in a FRESH session (the artifact discipline):
    // verification passes and the data content survives intact
    val s2 = spark.newSession()
    val got = Manifest.readVerified(s2, s"$dir/rel1", "lang",
      Seq("doc_id", "text"), org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
    assert(got.count() == docs.count())
    assert(got.select("doc_id").exceptAll(docs.select("doc_id")).isEmpty)

    // a partition lost in transit: delete one lang directory — the
    // read must fail typed, naming exactly that group as missing
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    rmTree(java.nio.file.Paths.get(s"$dir/rel1/data/lang=zh"))
    val e = intercept[IllegalArgumentException] {
      Manifest.readVerified(spark.newSession(), s"$dir/rel1", "lang",
        Seq("doc_id", "text"), org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")))
    }
    assert(e.getMessage.contains("zh=missing") && e.getMessage.contains("re-pull"))
    assert(!e.getMessage.contains("en="), "intact groups must not be named")
  }

  test("delivery pair: numeric-looking STRING groups round-trip verbatim") {
    // partition-directory type inference rewrites "01" -> int 1 and
    // "1e3" -> double on a naive reopen, which made diff report an
    // intact delivery as missing+extra (r10 ADVICE); readVerified pins
    // the partition column to the manifest's recorded group type
    val df = Seq((1L, "alpha", "01"), (2L, "beta", "1e3"), (3L, "gamma", "7"))
      .toDF("id", "text", "shard")
    val dir = java.nio.file.Files.createTempDirectory("delivery-str").toString
    Manifest.writeWithManifest(df, s"$dir/rel", "shard",
      Seq("id", "text"), length($"text"))
    val got = Manifest.readVerified(spark.newSession(), s"$dir/rel", "shard",
      Seq("id", "text"), org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
    assert(got.schema("shard").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(got.select("shard").as[String].collect().toSet == Set("01", "1e3", "7"))
  }

  test("typed guard: empty hash column list") {
    val e = intercept[IllegalArgumentException] {
      Manifest.build(docs, "lang", Seq.empty, length($"text"))
    }
    assert(e.getMessage.contains("checksum"))
  }
}
