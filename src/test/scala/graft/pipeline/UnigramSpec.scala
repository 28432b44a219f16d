package graft.pipeline

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer: Viterbi segmentation with pinned tie rules,
  * unknown fallback, sidecar round-trip, trainer determinism and the
  * SQL surface.
  */
class UnigramSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Tiny hand-checkable model over marker '_': costs in micro-nats. */
  private def model(): UnigramModel = {
    val costs = Map[String, Long](
      "_" -> 4000000L, "t" -> 3000000L, "h" -> 3000000L,
      "e" -> 3000000L, "a" -> 3000000L, "n" -> 3000000L,
      "_the" -> 5000000L, "th" -> 4000000L, "he" -> 4000000L,
      "_t" -> 4000000L, "an" -> 2000000L,
      // two-way cost tie fixtures: "_a" + "n" == "_" + "an" == 9e6
      "_a" -> 7000000L)
    UnigramModel(costs, Unigram.deriveIds(costs), marker = "_",
      unkCost = 9000000L)
  }

  test("viterbi picks the min-cost parse; cost tie -> longest piece") {
    val m = model()
    // "_the": whole piece 5e6 beats _t+he (8e6), _+t+h+e (13e6) …
    assert(UnigramKernel.pieces(m, "the").toSeq == Seq("_the"))
    // "an": '_'+ 'an' = 6e6 beats '_a'+'n' = 10e6
    assert(UnigramKernel.pieces(m, "an").toSeq == Seq("_", "an"))
    // tie: "_an" two parses at 9e6? _a+n = 10e6; _+an = 6e6 — no tie.
    // construct a real tie: "_aan": _a+an = 9e6 vs _+a+an = 9e6 —
    // equal cost; at the final position both end with "an", the
    // difference is earlier: position 2 has _a (j=0) vs _+a (j=1,
    // same cost 7e6) -> smallest j (longest piece, "_a") wins
    assert(UnigramKernel.pieces(m, "aan").toSeq == Seq("_a", "an"))
    // total score is the exact integer sum: _the + (_ + an)
    assert(UnigramKernel.scoreText(m, "the an") ==
      5000000L + 4000000L + 2000000L)
    assert(UnigramKernel.countText(m, "the the an") == 4)
  }

  test("unknown characters take the single-char fallback at unkCost") {
    val m = model()
    // 'q' and 'z' are not in the vocab
    assert(UnigramKernel.pieces(m, "qz").toSeq == Seq("_", "q", "z"))
    assert(UnigramKernel.encodeText(m, "qz").toSeq ==
      Seq(m.ids("_"), m.unkId, m.unkId))
    assert(UnigramKernel.scoreText(m, "qz") ==
      4000000L + 2 * m.unkCost)
    // a word with a known prefix and unknown tail mixes both
    assert(UnigramKernel.pieces(m, "theq").toSeq == Seq("_the", "q"))
  }

  test("expressions: codegen result == kernel; null text -> null") {
    import graft.functions.UnigramExpressions._
    val m = model()
    val df = Seq((1L, "the an theq"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = df.select($"id", unigramCountC($"text", m).as("n"),
        concat_ws(" ", unigramPiecesC($"text", m)).as("ps"),
        unigramScoreC($"text", m).as("cost"),
        unigramEncodeC($"text", m).as("ids"))
      .orderBy("id").collect()
    assert(got(0).getInt(1) == UnigramKernel.countText(m, "the an theq"))
    assert(got(0).getString(2) == UnigramKernel
      .piecesText(m, "the an theq").mkString(" "))
    assert(got(0).getLong(3) == UnigramKernel
      .scoreText(m, "the an theq"))
    assert(got(0).getAs[scala.collection.Seq[Int]]("ids").toSeq ==
      UnigramKernel.encodeText(m, "the an theq").toSeq)
    assert(got(1).isNullAt(1) && got(1).isNullAt(3))
  }

  test("model sidecar round-trip preserves every served value") {
    val m = model()
    val path = java.nio.file.Files
      .createTempDirectory("unigram").toString + "/model"
    Unigram.writeModel(spark, m, path)
    val m2 = Unigram.readModel(spark, path)
    assert(m2.costs == m.costs && m2.ids == m.ids &&
      m2.marker == m.marker && m2.unkCost == m.unkCost &&
      m2.unkId == m.unkId)
    assert(UnigramKernel.piecesText(m2, "the an qz").toSeq ==
      UnigramKernel.piecesText(m, "the an qz").toSeq)
  }

  test("trainer: frequent words become single pieces; deterministic") {
    val corpus = Seq.fill(50)("the table") ++ Seq.fill(30)("fast sort") ++
      Seq.fill(5)("zq")
    val df = corpus.toDF("text")
    val m1 = Unigram.train(df, "text", vocabSize = 40, marker = "_",
      maxPieceLen = 6)
    val m2 = Unigram.train(df, "text", vocabSize = 40, marker = "_",
      maxPieceLen = 6)
    assert(m1.costs == m2.costs && m1.ids == m2.ids, "nondeterministic")
    // the dominant words segment into ONE piece each
    assert(UnigramKernel.pieces(m1, "the").length == 1)
    assert(UnigramKernel.pieces(m1, "table").length == 1)
    // every corpus char is parseable (the parse-exists invariant)
    assert(UnigramKernel.countText(m1, "zq table") > 0)
    // frequent pieces cost less than rare ones
    assert(m1.costs("_the") < m1.costs("_zq") ||
      !m1.costs.contains("_zq"))
  }

  test("trainer: distributed E-step is bit-identical to the driver " +
      "E-step (micro-count quantization makes sums order-independent)") {
    val corpus = Seq.fill(50)("the table") ++ Seq.fill(30)("fast sort") ++
      Seq.fill(7)("tablet the") ++ Seq.fill(5)("zq")
    // many partitions: the distributed reduce must not depend on
    // partition order or count
    val df = corpus.toDF("text").repartition(7)
    val md = Unigram.train(df, "text", vocabSize = 40, marker = "_",
      maxPieceLen = 6)
    val mx = Unigram.train(df, "text", vocabSize = 40, marker = "_",
      maxPieceLen = 6, distributedE = true)
    assert(md.costs == mx.costs, "distributed E-step diverged from driver")
    assert(md.ids == mx.ids)
  }

  test("token-budget integrations: sharding and chunking ride the kernel") {
    val m = model()
    val docs = Seq((0L, "the an"), (1L, "the the the"), (2L, "qz an"))
      .toDF("doc_id", "text")
    // counts: 3 (_the,_,an), 3 (_the x3), 5 (_,q,z,_,an) → cum 0,3,6
    val sh = Sharding.shardDocumentsByUnigramBudget(docs, "doc_id",
      "text", m, budget = 4L)
      .select("doc_id", "_tokens", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(sh.toSeq == Seq((0L, 3L, 0L), (1L, 3L, 0L), (2L, 5L, 1L)))
    val ch = Chunking.chunkDocumentsUnigram(
      docs.filter($"doc_id" === 1), "doc_id", "text", m,
      size = 2, overlap = 1)
      .orderBy("chunk_id").collect()
    assert(ch.length == 2)
    assert(ch.map(_.getAs[String]("chunk")).toSeq ==
      Seq("the the", "the the"))
    assert(ch.map(_.getAs[Int]("start_tok")).toSeq == Seq(0, 1))
  }

  test("SQL surface: graft_unigram_* over a registered model") {
    graft.functions.GraftFunctions.register(spark)
    Unigram.registerModel("spec_uni", model())
    Seq((1L, "the an")).toDF("id", "text")
      .createOrReplaceTempView("unigram_spec_docs")
    val row = spark.sql("""
      SELECT graft_unigram_count(text, 'spec_uni') AS n,
             concat_ws(' ', graft_unigram_pieces(text, 'spec_uni')) AS ps,
             graft_unigram_score(text, 'spec_uni') AS cost,
             graft_unigram_encode(text, 'spec_uni') AS ids
      FROM unigram_spec_docs""").head()
    assert(row.getInt(0) == 3)
    assert(row.getString(1) == "_the _ an")
    assert(row.getLong(2) == 5000000L + 4000000L + 2000000L)
  }
}
