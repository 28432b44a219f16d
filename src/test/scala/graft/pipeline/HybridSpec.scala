package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HybridSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text")
  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id", $"embedding")

  test("rrfContrib: exact integral quotients") {
    val got = Seq(1, 2, 20, 6000).toDF("rank")
      .select(Hybrid.rrfContrib($"rank", 60).as("c"))
      .as[Long].collect().toSeq
    assert(got == Seq(1000000000000L / 61, 1000000000000L / 62,
      1000000000000L / 80, 1000000000000L / 6060))
  }

  test("rrfFuse: hand-computed fusion, absent-from-one-list convention") {
    // q1: listA ranks d1,d2; listB ranks d2,d3. d2 fuses two
    // contributions; d1/d3 one each (absent = zero, not a penalty).
    val a = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("q", "d", "rank")
    val b = Seq((1L, 20L, 1), (1L, 30L, 2)).toDF("q", "d", "rank")
    val got = Hybrid.rrfFuse(Seq(a, b), "q", "d", "rank", k0 = 60,
        topK = 3)
      .orderBy("rank").as[(Long, Long, Long, Int)].collect().toSeq
    val c = (r: Int) => 1000000000000L / (60 + r)
    assert(got == Seq(
      (1L, 20L, c(2) + c(1), 1), // both lists
      (1L, 10L, c(1), 2), // ties impossible here; c(1) > c(2)
      (1L, 30L, c(2), 3)))
  }

  test("rrfFuse: equal fused scores break ties on id ascending") {
    val a = Seq((1L, 99L, 3), (1L, 11L, 3)).toDF("q", "d", "rank")
    val got = Hybrid.rrfFuse(Seq(a), "q", "d", "rank", topK = 2)
      .orderBy("rank").as[(Long, Long, Long, Int)].collect().toSeq
    assert(got.map(_._2) == Seq(11L, 99L))
  }

  test("hybridSearch: fused top-k equals manual RRF of the two legs") {
    val queries = docs.filter($"doc_id" % 29 === 1)
      .select($"doc_id".as("qid"),
        array_join(slice(split(lower(trim($"text")), "\\s+"), 1, 3), " ")
          .as("qtext"))
      .join(emb.select($"vec_id".as("qid"), $"embedding".as("qv")), "qid")
    val fused = Hybrid.hybridSearch(docs, "doc_id", "text",
      emb, "vec_id", "embedding",
      queries, "qid", "qtext", "qv", kEach = 10, k0 = 60, topK = 5)

    val bm = Search.searchCorpus(docs, "doc_id", "text",
        queries.select("qid", "qtext"), "qid", "qtext", 10)
      .select($"query_id", $"doc_id".as("id"), $"rank")
    val ann = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries.select("qid", "qv"), "qid", "qv", 10)
      .select($"query_id", $"id", $"rank")
    val manual = Hybrid.rrfFuse(Seq(bm, ann), "query_id", "id", "rank",
      60, 5)

    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.orderBy("query_id", "rank")
        .as[(Long, Long, Long, Int)].collect().toSeq
    assert(key(fused) == key(manual))
    assert(fused.count() > 0)
    // a query's own document is its exact ANN self-match (cosine 1 is
    // the unique max — no clones in this corpus), so it always carries
    // at least the ANN rank-1 contribution and must appear in the
    // fused top-5 of its own query
    val c1 = 1000000000000L / 61
    val self = key(fused).filter(r => r._1 == r._2)
    assert(self.nonEmpty, "no fused self-matches at all")
    assert(self.forall(_._3 >= c1),
      "a self-match scored below the guaranteed ANN rank-1 contribution")
  }
}
