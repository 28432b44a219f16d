package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the real BPE tokenizer: hand-computed encodes on
  * the Queries fixture model, the deterministic trainer on the classic
  * Sennrich toy corpus, sidecar IO round-trip, byte-level alphabet,
  * native-expression and SQL-function parity, and the token-budget
  * integrations (sharding / chunking).
  */
class BpeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val fixture = graft.Queries.bpeFixtureModel

  test("hand-computed encodes on the fixture model") {
    // '_ t h e' -> (_,t) -> (_t,h) -> (_th,e) -> whole-word token
    assert(BpeKernel.pieces(fixture, "the").toSeq === Seq("_the"))
    // '_ v a l u e': (l,u) rank 15 fires BEFORE (_,va)'s parts? walk:
    // best ranks: (t? no) — (v,a)=16,(l,u)=15,(_?) none... (l,u) wins,
    // then (v,a)=16 -> va, (_,va)=17 -> _va, (_va,lu)=18, (_valu,e)=19
    assert(BpeKernel.pieces(fixture, "value").toSeq === Seq("_value"))
    // no applicable merges except none: 'agg' -> marker unmerged
    assert(BpeKernel.pieces(fixture, "agg").toSeq ===
      Seq("_", "a", "g", "g"))
    // partial merges: 'customer' -> _ c u st o m er
    assert(BpeKernel.pieces(fixture, "customer").toSeq ===
      Seq("_", "c", "u", "st", "o", "m", "er"))
    // rank order drives everything: (_,t)=0 beats (t,a)=4, so 'tata'
    // merges the marker first and only ONE (t,a) survives adjacently
    assert(BpeKernel.pieces(fixture, "tata").toSeq === Seq("_t", "a", "ta"))
    // left-to-right non-overlap on a self-adjacent pair: (t,a) over
    // 'atata' -> [_, a (blocked: (a,t) unplanted), ta, ta]
    assert(BpeKernel.pieces(fixture, "atata").toSeq ===
      Seq("_", "a", "ta", "ta"))
    assert(BpeKernel.countText(fixture, " the value  customer ") === 9)
    assert(BpeKernel.countText(fixture, "") === 0)
    assert(BpeKernel.countText(fixture, "   ") === 0)
    // ids: every piece resolved in the derived vocab (no unk)
    val ids = BpeKernel.encodeText(fixture, "the customer")
    assert(!ids.contains(fixture.unkId))
    assert(ids.head === fixture.vocab("_the"))
    // decode inverts encode up to whitespace normalization
    assert(BpeKernel.decodePieces(fixture,
      BpeKernel.piecesText(fixture, "the value customer").toSeq) ===
      "the value customer")
  }

  test("trainer reproduces the published toy example deterministically") {
    // Sennrich et al. toy corpus (word-frequency view): low x5,
    // lower x2, newest x6, widest x3 — with the marker convention the
    // most frequent pair is (e,s) from newest+widest (9), then (es,t).
    val docs = Seq.fill(5)("low").mkString(" ") + " " +
      Seq.fill(2)("lower").mkString(" ") + " " +
      Seq.fill(6)("newest").mkString(" ") + " " +
      Seq.fill(3)("widest").mkString(" ")
    val df = Seq((1L, docs)).toDF("id", "text")
    val m = Bpe.train(df, "text", numMerges = 10, marker = "_")
    assert(m.merges.take(2) === Vector("e" -> "s", "es" -> "t"))
    // deterministic: training twice gives the identical model
    val m2 = Bpe.train(df, "text", numMerges = 10, marker = "_")
    assert(m.merges === m2.merges)
    assert(m.vocab === m2.vocab)
    // the trained encode compresses: 'newest' in <= 3 pieces
    assert(BpeKernel.pieces(m, "newest").length <= 3)
    // count equals pieces length over the corpus
    assert(BpeKernel.countText(m, docs) ===
      BpeKernel.piecesText(m, docs).length)
  }

  test("model sidecar IO round-trips") {
    val dir = java.nio.file.Files
      .createTempDirectory("bpe_model").toString
    Bpe.writeModel(spark, fixture, dir)
    val back = Bpe.readModel(spark, dir)
    assert(back.merges === fixture.merges)
    assert(back.vocab === fixture.vocab)
    assert(back.marker === fixture.marker)
    assert(back.byteLevel === fixture.byteLevel)
    // fromTables on the same sidecar frames
    val viaTables = Bpe.fromTables(
      spark.read.parquet(s"$dir/merges"),
      Some(spark.read.parquet(s"$dir/vocab")), marker = "_")
    assert(viaTables.merges === fixture.merges)
    assert(viaTables.vocab === fixture.vocab)
  }

  test("byte-level alphabet: no OOV, decode inverts") {
    val df = Seq((1L, "héllo wörld héllo")).toDF("id", "text")
    val m = Bpe.train(df, "text", numMerges = 20, byteLevel = true)
    val ids = BpeKernel.encodeText(m, "héllo wörld")
    assert(!ids.contains(m.unkId))
    assert(BpeKernel.decodePieces(m,
      BpeKernel.piecesText(m, "héllo wörld").toSeq) === "héllo wörld")
    // an unseen-but-same-alphabet word still encodes (char coverage)
    assert(BpeKernel.countText(m, "dlrow") > 0)
  }

  test("native expressions and SQL functions match the kernel") {
    val df = Seq((0L, "the value customer"), (1L, ""), (2L, null))
      .toDF("id", "text")
    val t = coalesce(col("text"), lit(""))
    val got = df.select(col("id"),
        graft.functions.BpeExpressions.bpeCountC(t, fixture).as("n"),
        concat_ws(" ", graft.functions.BpeExpressions
          .bpePiecesC(t, fixture)).as("p"))
      .orderBy("id").collect()
    assert(got(0).getInt(1) ===
      BpeKernel.countText(fixture, "the value customer"))
    assert(got(0).getString(2) ===
      BpeKernel.piecesText(fixture, "the value customer").mkString(" "))
    assert(got(1).getInt(1) === 0 && got(1).getString(2) === "")
    assert(got(2).getInt(1) === 0)

    Bpe.registerModel("spec_fixture", fixture)
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("bpe_spec_docs")
    val sql = spark.sql("""
      SELECT id, graft_bpe_count(coalesce(text,''), 'spec_fixture') AS n,
             graft_bpe_encode(coalesce(text,''), 'spec_fixture') AS ids
      FROM bpe_spec_docs ORDER BY id""").collect()
    assert(sql(0).getInt(1) === got(0).getInt(1))
    assert(sql(0).getSeq[Int](2) ===
      BpeKernel.encodeText(fixture, "the value customer").toSeq)
    // unknown model name fails fast at analysis time
    val err = intercept[Exception] {
      spark.sql("SELECT graft_bpe_count('x', 'nope') AS n").collect()
    }
    assert(err.getMessage.contains("no BPE model registered"))
  }

  test("BPE token-budget sharding and chunking integrations") {
    val docs = (0L until 20L)
      .map(i => (i, Seq.fill(8)("the value customer scan").mkString(" ")))
      .toDF("doc_id", "text")
    val perDoc = BpeKernel.countText(fixture,
      Seq.fill(8)("the value customer scan").mkString(" "))
    val sharded = Sharding.shardDocumentsByBpeBudget(
      docs, "doc_id", "text", fixture, budget = perDoc * 4L)
      .orderBy("doc_id").collect()
    assert(sharded.forall(_.getAs[Long]("_tokens") === perDoc.toLong))
    assert(sharded.map(_.getAs[Long]("shard")).toSeq ===
      (0 until 20).map(i => (i / 4).toLong))

    val chunks = Chunking.chunkDocumentsBpe(docs.limit(1), "doc_id",
      "text", fixture, size = 10, overlap = 2)
      .orderBy("chunk_id").collect()
    val stream = BpeKernel.piecesText(fixture,
      Seq.fill(8)("the value customer scan").mkString(" "))
    val expChunks =
      if (stream.length <= 10) 1 else (stream.length - 10 + 7) / 8 + 1
    assert(chunks.length === expChunks)
    // first chunk decodes to the first 10-token window
    assert(chunks.head.getAs[String]("chunk") ===
      BpeKernel.decodePieces(fixture, stream.take(10).toSeq))
    assert(chunks.head.getAs[Int]("n_tok") === math.min(10, stream.length))
    // byte-level models are rejected (chunk text is Column-decoded)
    val byteModel = fixture.copy(byteLevel = true)
    intercept[IllegalArgumentException] {
      Chunking.chunkDocumentsBpe(docs, "doc_id", "text", byteModel, 10)
    }
  }
}
