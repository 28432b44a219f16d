package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VocabTfidfSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "a cat and a dog"),
    (4L, ""),
    (5L, "  The THE the  ")
  ).toDF("doc_id", "text")

  test("vocabulary counts occurrences and doc frequency, top-k ordered") {
    val v = TextAnalysis.vocabulary(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // 'the': 2 + 1 + 0 + 3 = 6 occurrences in 3 docs; then 'a' (2 in 1),
    // ties at n=2 broken by token asc: a < cat < dog < sat
    assert(v.toSeq == Seq(("the", 6L, 3L), ("a", 2L, 1L), ("cat", 2L, 2L)))
  }

  test("vocabulary ignores blank documents and empty tokens") {
    val v = TextAnalysis.vocabulary(docs, "doc_id", "text", 100)
      .collect()
    assert(!v.exists(_.getString(0).isEmpty))
    // doc 4 (blank) contributes nothing anywhere
    val total = v.map(_.getLong(1)).sum
    assert(total == 6 + 3 + 5 + 0 + 3) // 17 non-empty tokens total
  }

  test("tfidf ranks rare tokens above ubiquitous ones") {
    val k = TextAnalysis.tfidfKeywords(docs.filter($"doc_id" <= 3),
        "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(5)))
    // doc 1: 'the' has tf=2 but df=2 of 3; 'mat'/'on'/'sat' have tf=1.
    // score(the) = 2*(4/3) = 2.67 beats 1*(4/2)=2.0 — tf wins here;
    // second slot: 'mat' vs 'on' vs 'sat': mat/on df=1 → 1*(4/2)=2.0,
    // sat df=2 → 4/3; tie mat/on broken by token asc → 'mat'
    assert(k.filter(_._1 == 1L).map(_._2).toSeq == Seq("the", "mat"))
    // doc 3: 'a' tf=2 df=1 → 2*(4/2)=4.0 top; then 'and' (df=1, 2.0)
    assert(k.filter(_._1 == 3L).map(_._2).toSeq == Seq("a", "and"))
  }

  test("tfidf rank is dense per doc and bounded by k") {
    val k = TextAnalysis.tfidfKeywords(docs, "doc_id", "text", 3)
    val byDoc = k.groupBy("doc_id")
      .agg(collect_list("rank").as("ranks")).collect()
    byDoc.foreach { r =>
      val ranks = r.getSeq[Int](1).sorted
      assert(ranks == (1 to ranks.size), s"doc ${r.getLong(0)}: $ranks")
      assert(ranks.size <= 3)
    }
    // blank doc 4 yields no keyword rows at all
    assert(k.filter($"doc_id" === 4L).count() == 0)
  }

  test("logIdf variant preserves the ratio ordering on this fixture") {
    val a = TextAnalysis.tfidfKeywords(docs, "doc_id", "text", 2)
      .select("doc_id", "tok", "rank").collect().toSet
    val b = TextAnalysis.tfidfKeywords(docs, "doc_id", "text", 2,
        logIdf = true)
      .select("doc_id", "tok", "rank").collect().toSet
    assert(a == b)
  }
}
