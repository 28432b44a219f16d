package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bigram LM training/scoring against hand-computed values on a tiny
  * corpus, plus partitioning invariance (the quantized score must be
  * bit-stable under any shuffle order) and sidecar round-trip.
  */
class LanguageModelSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // corpus: "a b a b", "a b c" → tokens a:3 b:3 c:1
  private lazy val docs =
    Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")

  test("train caps the vocabulary and maps OOV to <unk>") {
    val m = LanguageModel.train(docs, "doc_id", "text", vocabSize = 2)
    assert(m.vocab.as[String].collect().toSet == Set("a", "b"))
    assert(m.smoothingV == 3L)
    val uni = m.unigrams.collect().map(r => (r.getString(0), r.getLong(1)))
      .toMap
    // c collapsed to <unk>
    assert(uni == Map("a" -> 3L, "b" -> 3L, LanguageModel.unkToken -> 1L))
    val bi = m.bigrams.collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // doc1: (a,b) (b,a) (a,b); doc2: (a,b) (b,<unk>)
    assert(bi == Map(("a", "b") -> 3L, ("b", "a") -> 1L,
      ("b", LanguageModel.unkToken) -> 1L))
  }

  test("score matches the hand-computed quantized mean") {
    val m = LanguageModel.train(docs, "doc_id", "text", vocabSize = 2)
    // V=3. p(b|a) = (3+1)/(3+3) = 2/3; p(a|b) = (1+1)/(3+3) = 1/3;
    // p(<unk>|b) = (1+1)/(3+3) = 1/3
    def q(p: Double) = math.floor(1e9 * p).toLong
    val want1 = (q(2.0 / 3) + q(1.0 / 3) + q(2.0 / 3)).toDouble / (3 * 1e9)
    val want2 = (q(2.0 / 3) + q(1.0 / 3)).toDouble / (2 * 1e9)
    val got = LanguageModel.score(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got(1L) == ((3L, want1)))
    assert(got(2L) == ((2L, want2)))
  }

  test("docs with <2 tokens keep n_bigrams=0 and a null score") {
    val m = LanguageModel.train(docs, "doc_id", "text", vocabSize = 2)
    val shorties = Seq((10L, "a"), (11L, ""), (12L, "  ")).toDF(
      "doc_id", "text")
    val got = LanguageModel.score(shorties, "doc_id", "text", m).collect()
    assert(got.length == 3)
    got.foreach { r =>
      assert(r.getLong(1) == 0L && r.isNullAt(2), r.toString)
    }
  }

  test("quantized score is invariant under partitioning") {
    val big = spark.range(200).select(col("id").as("doc_id"),
      concat(lit("w"), (col("id") % 7).cast("string"), lit(" x y w"),
        (col("id") % 3).cast("string"), lit(" z q a b c d")).as("text"))
    val m1 = LanguageModel.train(big, "doc_id", "text", vocabSize = 6)
    val m2 = LanguageModel.train(big.repartition(13), "doc_id", "text",
      vocabSize = 6)
    val s1 = LanguageModel.score(big, "doc_id", "text", m1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val s2 = LanguageModel.score(big.repartition(17), "doc_id", "text", m2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(s1 == s2) // bit-exact double equality, by quantization
  }

  test("logProb variant ranks reference-like text above junk") {
    val m = LanguageModel.train(docs, "doc_id", "text", vocabSize = 2)
    val probe = Seq((1L, "a b a b"), (2L, "zz qq rr ss")).toDF(
      "doc_id", "text")
    val got = LanguageModel.score(probe, "doc_id", "text", m,
        logProb = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) < got(2L), s"perplexity of natural text must be lower: $got")
  }

  test("merge(yesterday, trainWithVocab(batch)) = train once on the union") {
    val yesterday = Seq((1L, "a b a b"), (2L, "a b c")).toDF(
      "doc_id", "text")
    val batch = Seq((3L, "b a b a"), (4L, "c c a")).toDF(
      "doc_id", "text")
    val m0 = LanguageModel.train(yesterday, "doc_id", "text",
      vocabSize = 2)
    val merged = LanguageModel.merge(m0,
      LanguageModel.trainWithVocab(batch, "doc_id", "text", m0))
    // equals one-shot training on the union UNDER THE SAME VOCAB
    val oneShot = LanguageModel.merge(
      LanguageModel.trainWithVocab(yesterday.union(batch), "doc_id",
        "text", m0),
      LanguageModel.trainWithVocab(spark.emptyDataset[(Long, String)]
        .toDF("doc_id", "text"), "doc_id", "text", m0))
    def counts(m: LanguageModel.BigramLm) = (
      m.unigrams.collect().map(r => (r.getString(0), r.getLong(1))).toSet,
      m.bigrams.collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toSet)
    assert(counts(merged) == counts(oneShot))
    // scores through the merged model are well-defined
    val s = LanguageModel.score(batch, "doc_id", "text", merged)
      .collect()
    assert(s.length == 2 && s.forall(!_.isNullAt(2)))
  }

  test("merge refuses a vocabulary mismatch") {
    val m1 = LanguageModel.train(docs, "doc_id", "text", vocabSize = 2)
    val other = Seq((1L, "x y x y z")).toDF("doc_id", "text")
    val m2 = LanguageModel.train(other, "doc_id", "text", vocabSize = 2)
    val e = intercept[IllegalArgumentException] {
      LanguageModel.merge(m1, m2)
    }
    assert(e.getMessage.contains("vocabularies differ"))
  }

  test("sidecar round-trip preserves scores; vocabSize mismatch refuses") {
    val m = LanguageModel.train(docs, "doc_id", "text", vocabSize = 2)
    val path = java.nio.file.Files.createTempDirectory("graft_lm_test")
      .toString
    LanguageModel.writeLm(m, path)
    val r = LanguageModel.readLm(spark, path, expectVocabSize = Some(2))
    val a = LanguageModel.score(docs, "doc_id", "text", m)
      .collect().map(_.toSeq).toSet
    val b = LanguageModel.score(docs, "doc_id", "text", r)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    val e = intercept[IllegalArgumentException] {
      LanguageModel.readLm(spark, path, expectVocabSize = Some(99))
    }
    assert(e.getMessage.contains("vocabSize"))
  }
}
