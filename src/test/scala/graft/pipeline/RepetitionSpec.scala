package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RepetitionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def stats(text: String): (Int, Int, Int, Int) = {
    val r = TextAnalysis.withRepetitionStats(
      Seq(Tuple1(text)).toDF("text"), "text")
      .select("n_tokens", "n_distinct_tokens", "max_token_count",
        "max_bigram_count").head()
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
  }

  test("all-distinct text: max token 1, max bigram 1") {
    assert(stats("alpha beta gamma delta") == ((4, 4, 1, 1)))
  }

  test("repeated token counted; case folded") {
    // 'the' x3 (one capitalized); bigram 'the end' twice
    assert(stats("The end the end the story") == ((6, 3, 3, 2)))
  }

  test("degenerate repetition: one token repeated") {
    assert(stats("spam spam spam spam spam") == ((5, 1, 5, 4)))
  }

  test("single word and empty text") {
    assert(stats("word") == ((1, 1, 1, 0)))
    assert(stats("") == ((0, 0, 1, 0)))
  }

  test("kernel equals the Column fold on the real corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val viaKernel = TextAnalysis.repetitionStatsKernel(docs,
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val viaFold = TextAnalysis.withRepetitionStats(docs, "text")
      .select($"doc_id", $"n_tokens", $"n_distinct_tokens",
        $"max_token_count", $"max_bigram_count")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(viaKernel == viaFold)
    // edge rows through the kernel specifically
    val edge = TextAnalysis.repetitionStatsKernel(
      Seq((1L, ""), (2L, "word"), (3L, "a a a")).toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(edge(1L) == ((0, 0, 1, 0)))
    assert(edge(2L) == ((1, 1, 1, 0)))
    assert(edge(3L) == ((3, 1, 3, 2)))
  }

  test("fold agrees with explode+groupBy on the real corpus sample") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").limit(200)
    val viaFold = TextAnalysis.withRepetitionStats(docs, "text")
      .select($"doc_id", $"max_token_count").as[(Long, Int)]
      .collect().toMap
    val viaShuffle = docs
      .select($"doc_id",
        explode(split(lower(trim($"text")), "\\s+")).as("t"))
      .groupBy("doc_id", "t").count()
      .groupBy("doc_id").agg(max("count").cast("int").as("m"))
      .as[(Long, Int)].collect().toMap
    assert(viaFold == viaShuffle)
  }
}
