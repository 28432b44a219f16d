package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tombstoned index reads must equal a REBUILD on the reduced corpus —
  * the whole point of deletion-without-rebuild. One parity test per
  * persisted dedup index family, plus the contentTombstones closure
  * contract and the stale-bloom safety claim of the exact family.
  */
class TombstoneSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs: DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))

  private def tmp(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_tomb_$tag").toString

  // deletion request: every 5th doc; per-doc families delete by id,
  // the exact family by content closure
  private def deleted: DataFrame = docs.filter($"doc_id" % 5 === 0)
  private def reduced: DataFrame = docs.filter($"doc_id" % 5 =!= 0)

  // probe batch: near-dup variants of corpus docs (some of whose
  // partners are deleted) under fresh ids
  private def batch: DataFrame = docs.filter($"doc_id" % 10 === 0)
    .select(($"doc_id" + 20000).as("doc_id"),
      concat($"text", lit(" zz qq xx")).as("text"))

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("exact family: tombstoned read == rebuilt index") {
    val (pTomb, pRebuild) = (tmp("exact"), tmp("exact_rb"))
    Dedup.writeExactIndex(docs, "doc_id", "text", pTomb)
    Dedup.writeTombstones(deleted, "doc_id", "text", pTomb)
    Dedup.writeExactIndex(reduced, "doc_id", "text", pRebuild)
    // batch mixes deleted contents (must resurface as new/dup_in_batch)
    // with surviving contents (still dup_of_corpus, original keeper)
    val b = docs.filter($"doc_id" % 5 === 0)
      .select(($"doc_id" + 30000).as("doc_id"), $"text")
      .union(docs.filter($"doc_id" % 7 === 1)
        .select(($"doc_id" + 40000).as("doc_id"), $"text"))
    val t = Dedup.exactKeepFromIndex(spark, pTomb, b, "doc_id", "text")
    val r = Dedup.exactKeepFromIndex(spark, pRebuild, b, "doc_id", "text")
    assert(rows(t) == rows(r) && rows(t).nonEmpty)
    // the deleted-content slice really does come back as non-corpus
    val st = t.filter($"doc_id" >= 30000 && $"doc_id" < 40000)
      .select("status").distinct().as[String].collect().toSet
    assert(st == Set("new"),
      s"deleted contents must probe as new, got $st")
  }

  test("exact family: stale bloom is safe on an all-deleted batch") {
    val p = tmp("exact_bloom")
    Dedup.writeExactIndex(docs, "doc_id", "text", p)
    Dedup.writeTombstones(deleted, "doc_id", "text", p)
    // batch is ONLY deleted content: the unrewritten bloom still says
    // "maybe present", the pruned join then finds no live row — every
    // doc must resolve new/dup_in_batch, never dup_of_corpus
    val b = deleted.select(($"doc_id" + 50000).as("doc_id"), $"text")
    val st = Dedup.exactKeepFromIndex(spark, p, b, "doc_id", "text")
      .select("status").distinct().as[String].collect().toSet
    assert(st == Set("new"), s"got $st")
  }

  test("minhash family: tombstoned read == rebuilt index") {
    val (pTomb, pRebuild) = (tmp("mh"), tmp("mh_rb"))
    Dedup.writeMinhashIndex(docs, "doc_id", "text", pTomb)
    Dedup.writeTombstones(deleted, "doc_id", "text", pTomb)
    Dedup.writeMinhashIndex(reduced, "doc_id", "text", pRebuild)
    val t = Dedup.minhashPairsFromIndex(spark, pTomb, batch,
      "doc_id", "text", threshold = 0.7)
    val r = Dedup.minhashPairsFromIndex(spark, pRebuild, batch,
      "doc_id", "text", threshold = 0.7)
    assert(rows(t) == rows(r) && rows(t).nonEmpty)
    // tombstoned partners are really gone: no pair lands on a deleted id
    assert(t.filter($"id_b" < 20000 && $"id_b" % 5 === 0).count() == 0)
  }

  test("ngram family: tombstoned read == rebuilt index") {
    val (pTomb, pRebuild) = (tmp("ng"), tmp("ng_rb"))
    Dedup.writeNgramIndex(docs, "doc_id", "text", pTomb)
    Dedup.writeTombstones(deleted, "doc_id", "text", pTomb)
    Dedup.writeNgramIndex(reduced, "doc_id", "text", pRebuild)
    val t = Dedup.ngramJaccardPairsFromIndex(spark, pTomb, batch,
      "doc_id", "text", threshold = 0.7)
    val r = Dedup.ngramJaccardPairsFromIndex(spark, pRebuild, batch,
      "doc_id", "text", threshold = 0.7)
    assert(rows(t) == rows(r) && rows(t).nonEmpty)
  }

  test("simhash family: tombstoned read == rebuilt index") {
    val (pTomb, pRebuild) = (tmp("sh"), tmp("sh_rb"))
    // pin one operating point on both builds: the two corpora differ in
    // size, and the parity claim is about tombstones, not the derivation
    Dedup.writeSimhashIndex(docs, "doc_id", "text", pTomb, blocks = 8)
    Dedup.writeTombstones(deleted, "doc_id", "text", pTomb)
    Dedup.writeSimhashIndex(reduced, "doc_id", "text", pRebuild,
      blocks = 8)
    val t = Dedup.simhashPairsFromIndex(spark, pTomb, batch,
      "doc_id", "text", threshold = 0.7)
    val r = Dedup.simhashPairsFromIndex(spark, pRebuild, batch,
      "doc_id", "text", threshold = 0.7)
    assert(rows(t) == rows(r) && rows(t).nonEmpty)
  }

  test("embedding family: tombstoned read == rebuilt index") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val dim = e.head().getAs[Seq[Float]]("embedding").length
    val del = e.filter($"vec_id" % 5 === 0)
    val (pTomb, pRebuild) = (tmp("emb"), tmp("emb_rb"))
    Dedup.writeEmbeddingIndex(e, "vec_id", "embedding", pTomb, dim)
    // embeddings carry no text column; the sidecar only needs ids for
    // this family — hash the id itself as the content stand-in
    Dedup.writeTombstones(
      del.select($"vec_id", $"vec_id".cast("string").as("text")),
      "vec_id", "text", pTomb)
    Dedup.writeEmbeddingIndex(e.filter($"vec_id" % 5 =!= 0),
      "vec_id", "embedding", pRebuild, dim)
    // %7==1 straddles the deletion rule: ids ≡ 15 (mod 35) are deleted,
    // the rest survive — both sides of the parity are exercised
    val eb = e.filter($"vec_id" % 7 === 1)
      .select(($"vec_id" + 100000).as("vec_id"),
        transform($"embedding", x => x * 1.001f).as("embedding"))
    val t = Dedup.embeddingPairsFromIndex(spark, pTomb, eb,
      "vec_id", "embedding", threshold = 0.999)
    val r = Dedup.embeddingPairsFromIndex(spark, pRebuild, eb,
      "vec_id", "embedding", threshold = 0.999)
    assert(rows(t) == rows(r) && rows(t).nonEmpty)
  }

  test("contentTombstones closes a deletion request over shared content") {
    val d = Seq((1L, "alpha beta gamma"), (2L, "delta eps"),
      (3L, "alpha beta gamma"), (4L, "zeta eta"),
      (5L, "delta eps")).toDF("doc_id", "text")
    val closure = Dedup.contentTombstones(d, "doc_id", "text",
      Seq(1L).toDF("doc_id"))
    // seed 1 shares content with 3; 2/4/5 untouched
    assert(closure.select("id").as[Long].collect().toSet == Set(1L, 3L))
    // tombstone appends ACCUMULATE: two requests, union visible
    val p = tmp("accum")
    Dedup.writeExactIndex(d, "doc_id", "text", p)
    Dedup.writeTombstones(d.filter($"doc_id".isin(1L, 3L)),
      "doc_id", "text", p)
    Dedup.writeTombstones(d.filter($"doc_id".isin(2L, 5L)),
      "doc_id", "text", p)
    val probe = d.select(($"doc_id" + 100).as("doc_id"), $"text")
    val st = Dedup.exactKeepFromIndex(spark, p, probe, "doc_id", "text")
    // only content of doc 4 survives in the index
    assert(st.filter($"status" === "dup_of_corpus")
      .select("doc_id").as[Long].collect().toSet == Set(104L))
  }
}
