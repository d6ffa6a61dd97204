package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Bpe]]: the merge loop against a hand-checked classic fixture,
  * the round-trip invariant (tokens reconstruct every word exactly),
  * determinism across cluster layouts, and the monotone value of more
  * merges.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text")

  test("classic corpus: merges follow pair frequencies, frequent word collapses to one token") {
    // 5x "low", 2x "lower", 6x "newest", 3x "widest" (Sennrich-style)
    val corpus = Seq((0L,
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
      .toDF("doc_id", "text")
    val m = Bpe.train(corpus, "text", numMerges = 10)
    // highest-count first pair: ('e','s') in newest+widest = 9;
    // then ('es','t') = 9, then ('est','</w>') = 9
    assert(m.merges.take(3) == Seq(("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord)))
    val toks = corpus.select(Bpe.tokenize(m, $"text").as("t"))
      .as[Seq[String]].head()
    // "newest" (most frequent word) ends fully merged after 10 merges
    assert(toks.containsSlice(Seq("newest</w>")))
    // token count under more merges never increases
    val few = Bpe.train(corpus, "text", numMerges = 2)
    val nFew = corpus.select(Bpe.tokenCount(few, $"text")).as[Long].head()
    val nMany = corpus.select(Bpe.tokenCount(m, $"text")).as[Long].head()
    assert(nMany <= nFew)
    assert(nMany >= 16L) // at least one token per word occurrence
  }

  test("round trip: concatenating a word's tokens (minus the marker) rebuilds the word") {
    val m = Bpe.train(docs.filter($"doc_id" < 200), "text", numMerges = 200)
    val sample = docs.filter($"doc_id" < 50)
      .select(explode(filter(split(trim(coalesce($"text", lit(""))), "\\s+"),
        w => w =!= "")).as("w")).distinct()
      .as[String].collect()
    assert(sample.nonEmpty)
    sample.foreach { w =>
      val toks = Bpe.applyWord(m.ranks, w)
      assert(toks.mkString.stripSuffix(Bpe.EndOfWord) == w, s"round trip broke for '$w'")
      assert(toks.last.endsWith(Bpe.EndOfWord))
    }
  }

  test("training is layout-deterministic and merges actually compress the corpus") {
    val slice = docs.filter($"doc_id" < 300)
    val a = Bpe.train(slice, "text", numMerges = 100)
    val b = Bpe.train(slice.repartition(13), "text", numMerges = 100)
    assert(a.merges == b.merges)
    val n0 = slice.select(sum(Bpe.tokenCount(BpeModelEmpty, $"text"))).as[Long].head()
    val n100 = slice.select(sum(Bpe.tokenCount(a, $"text"))).as[Long].head()
    assert(n100 < n0, s"100 merges should compress: $n100 vs $n0")
  }
  private val BpeModelEmpty = Bpe.BpeModel(Seq.empty)

  test("greedy lowest-rank apply == replaying trained merges in order (q78 oracle contract)") {
    // The q78 DuckDB oracle replays the learned merges IN TRAINING
    // ORDER (one left-to-right pass each); the kernel applies greedily
    // by lowest rank. For a TRAINED merge list the two coincide — every
    // merge's parts are built only by earlier merges, and no later
    // merge can create an earlier merge's adjacency — and this pins
    // that equivalence on every corpus word under both a shallow and a
    // deep model (deep models exercise multi-symbol merge chains).
    def replayInOrder(m: Bpe.BpeModel, word: String): Seq[String] = {
      var syms: Seq[String] = word.map(_.toString) :+ Bpe.EndOfWord
      m.merges.foreach { case (a, b) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toSeq
      }
      syms
    }
    val vocab = docs
      .select(explode(filter(split(trim(coalesce($"text", lit(""))), "\\s+"),
        w => w =!= "")).as("w")).distinct()
      .as[String].collect()
    assert(vocab.nonEmpty)
    for (numMerges <- Seq(8, 100)) {
      val m = Bpe.train(docs, "text", numMerges)
      vocab.foreach { w =>
        assert(Bpe.applyWord(m.ranks, w).toSeq == replayInOrder(m, w),
          s"greedy vs in-order replay diverged on '$w' at $numMerges merges")
      }
    }
  }

  test("trainToVocab: vocab budget = base symbols + merges; under-budget fails typed") {
    val corpus = Seq((0L,
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
      .toDF("doc_id", "text")
    // distinct chars: l o w e r n s t i d -> 10; base vocab = 11 with </w>
    val m = Bpe.trainToVocab(corpus, "text", vocabSize = 14)
    assert(m.merges == Bpe.train(corpus, "text", numMerges = 3).merges)
    // the emitted symbol inventory respects the budget
    val symbols = corpus.select(Bpe.tokenize(m, $"text").as("t"))
      .as[Seq[String]].head().toSet
    assert(symbols.size <= 14)
    val e = intercept[IllegalArgumentException] {
      Bpe.trainToVocab(corpus, "text", vocabSize = 11)
    }
    assert(e.getMessage.contains("must exceed the base vocabulary"))
  }

  test("model artifact round-trips through Parquet into a fresh session; corrupt ranks fail typed") {
    val m = Bpe.train(docs, "text", numMerges = 50)
    val dir = java.nio.file.Files.createTempDirectory("bpe_model").toString
    Bpe.modelToDf(spark, m).write.parquet(s"$dir/model")
    val s2 = spark.newSession()
    val m2 = Bpe.modelFromDf(s2.read.parquet(s"$dir/model"))
    assert(m2.merges == m.merges) // training order preserved exactly
    // reopened model tokenizes bit-identically
    val a = docs.select($"doc_id", Bpe.tokenize(m, $"text").as("t"))
      .as[(Long, Seq[String])].collect().toMap
    val b = docs.select($"doc_id", Bpe.tokenize(m2, $"text").as("t"))
      .as[(Long, Seq[String])].collect().toMap
    assert(a == b)
    // a hole in the rank sequence is a corrupt artifact, not a model
    val holed = Bpe.modelToDf(spark, m).filter($"rank" =!= 3)
    val e = intercept[IllegalArgumentException](Bpe.modelFromDf(holed))
    assert(e.getMessage.contains("corrupt"))
    val notModel = docs.limit(1)
    val e2 = intercept[IllegalArgumentException](Bpe.modelFromDf(notModel))
    assert(e2.getMessage.contains("not a BPE model"))
  }

  test("histogram cap keeps the most frequent words and stays deterministic") {
    val corpus = Seq((0L, "aa aa aa bb bb cc")).toDF("doc_id", "text")
    // cap to 1 word: only "aa" trains — pairs (a,a) and (a,</w>) tie at
    // count 3, and the lexicographic rule picks (a,</w>) ('<' sorts
    // below 'a'); with "bb"/"cc" in the histogram the cap would be
    // proven leaky by any b- or c-merge appearing later
    val m = Bpe.train(corpus, "text", numMerges = 1, maxVocabWords = 1)
    assert(m.merges == Seq(("a", Bpe.EndOfWord)))
    // null/empty text tokenizes empty
    val withNull = Seq((1L, null.asInstanceOf[String]), (2L, " ")).toDF("doc_id", "text")
    val counts = withNull.select(Bpe.tokenCount(m, $"text")).as[Long].collect().toSeq
    assert(counts == Seq(0L, 0L))
  }
}
