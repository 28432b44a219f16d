package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch append for the span/line/exact indexes through the shared
  * IndexDeltas layer: append+probe ≡ rebuild+probe, a replayed batch id
  * is a no-op, and compaction folds to the rebuilt base (the additive
  * line fold merges per-hash sums).
  */
class IndexAppendSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ixa_$tag")
      .toString + "/idx"

  // 40 docs of 30 sequential tokens; doc i and i+20 share a 25-token
  // run (span dups), line-structured variant reuses boilerplate lines
  private def docs: DataFrame =
    (0L until 40L).map { i =>
      val base = if (i < 20) i else i - 20
      val toks = (0 until 30).map(t => s"w${base * 5 + t}")
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")

  test("span append+probe == rebuild+probe; replay no-op; compact " +
      "folds to the same rows") {
    val apath = tmp("span_a")
    val rpath = tmp("span_r")
    SpanDedup.writeSpanIndex(docs.filter($"doc_id" % 2 === 0),
      "doc_id", "text", apath, windowTokens = 10)
    SpanDedup.appendToSpanIndex(spark, apath,
      docs.filter($"doc_id" % 4 === 1), "doc_id", "text", batchId = 1L)
    SpanDedup.appendToSpanIndex(spark, apath,
      docs.filter($"doc_id" % 4 === 3), "doc_id", "text", batchId = 2L)
    SpanDedup.appendToSpanIndex(spark, apath,
      docs.filter($"doc_id" % 4 === 3), "doc_id", "text", batchId = 2L)
    SpanDedup.writeSpanIndex(docs, "doc_id", "text", rpath,
      windowTokens = 10)
    val batch = docs.select(($"doc_id" + 100).as("doc_id"),
      concat(lit("zz"), $"doc_id", lit(" "), $"text").as("text"))
    def probe(p: String) =
      SpanDedup.duplicateSpansFromIndex(spark, p, batch, "doc_id",
          "text")
        .as[(Long, Int, Int)].collect().toSet
    val want = probe(rpath)
    assert(probe(apath) == want)
    assert(want.nonEmpty)
    // the stored hash SET equals the rebuild's (no dups from replay)
    val arows = IndexDeltas.rows(spark, s"$apath/hashes")
      .select("h").as[String].collect()
    val rrows = IndexDeltas.rows(spark, s"$rpath/hashes")
      .select("h").as[String].collect()
    assert(arows.length == arows.distinct.length, "duplicate hashes")
    assert(arows.toSet == rrows.toSet)
    SpanDedup.compactSpanIndex(spark, apath)
    assert(probe(apath) == want, "compaction changed probe results")
    assert(IndexDeltas.rows(spark, s"$apath/hashes")
      .select("h").as[String].collect().toSet == rrows.toSet)
    CacheScope.releaseSession(spark)
  }

  // line fixture: boilerplate line "FOOTER" in every doc (crosses the
  // threshold ONLY when base + delta doc_freqs merge), unique body line
  private def linedDocs: DataFrame =
    (0L until 40L).map { i =>
      (i, s"body line $i\nFOOTER")
    }.toDF("doc_id", "text")

  test("line append merges frequencies additively: threshold crossed " +
      "only via base+delta sums; replay no-op; compact folds sums") {
    val apath = tmp("line_a")
    val rpath = tmp("line_r")
    // evens alone: FOOTER doc_freq 20; threshold 25 → crossed only
    // after the odd halves merge (base 20 + 10 + 10 = 40)
    LineDedup.writeLineIndex(linedDocs.filter($"doc_id" % 2 === 0),
      "doc_id", "text", apath)
    LineDedup.appendToLineIndex(spark, apath,
      linedDocs.filter($"doc_id" % 4 === 1), "doc_id", "text",
      batchId = 1L)
    LineDedup.appendToLineIndex(spark, apath,
      linedDocs.filter($"doc_id" % 4 === 3), "doc_id", "text",
      batchId = 2L)
    LineDedup.appendToLineIndex(spark, apath,
      linedDocs.filter($"doc_id" % 4 === 3), "doc_id", "text",
      batchId = 2L)
    LineDedup.writeLineIndex(linedDocs, "doc_id", "text", rpath)
    def probe(p: String) =
      LineDedup.dropBoilerplateFromIndex(spark, p, linedDocs,
          "doc_id", "text", maxDocFreq = 25)
        .select("doc_id", "text", "n_dropped")
        .as[(Long, String, Long)].collect().toSet
    val want = probe(rpath)
    assert(probe(apath) == want)
    // FOOTER must actually be dropped (freq 40 > 25 only when merged)
    assert(want.forall { case (_, t, d) => !t.contains("FOOTER") && d == 1 })
    LineDedup.compactLineIndex(spark, apath)
    assert(probe(apath) == want, "compaction changed probe results")
    // the folded base holds ONE merged row per hash
    val folded = IndexDeltas.rows(spark, s"$apath/hashes")
      .groupBy("h").count().filter($"count" > 1).count()
    assert(folded == 0, "compaction left split frequency rows")
    CacheScope.releaseSession(spark)
  }

  test("exact append is exactly-once under replay (no duplicate probe " +
      "rows) and first-arrival keepers hold; compact folds") {
    val apath = tmp("exact_a")
    val texts = (0L until 20L).map(i => (i, s"content ${i % 5}"))
      .toDF("doc_id", "text") // 5 distinct contents, 4 copies each
    Dedup.writeExactIndex(texts.filter($"doc_id" % 2 === 0),
      "doc_id", "text", apath)
    Dedup.appendToExactIndex(spark, apath,
      texts.filter($"doc_id" % 2 === 1), "doc_id", "text", batchId = 1L)
    Dedup.appendToExactIndex(spark, apath,
      texts.filter($"doc_id" % 2 === 1), "doc_id", "text", batchId = 1L)
    val batch = texts.select(($"doc_id" + 100).as("doc_id"), $"text")
    val got = Dedup.exactKeepFromIndex(spark, apath, batch,
        "doc_id", "text")
      .as[(Long, String, Long)].collect().sorted
    // one decision per batch row — a double-inserted hash would emit 40
    assert(got.length == 20, s"expected 20 rows, got ${got.length}")
    got.foreach { case (id, st, keep) =>
      assert(st == "dup_of_corpus")
      // content c = id%5; min even id with that content: c if c even
      // else c+5 (ids 0..19, content i%5)
      val c = (id - 100) % 5
      val expectKeep = if (c % 2 == 0) c else c + 5
      assert(keep == expectKeep, s"id=$id keep=$keep want=$expectKeep")
    }
    Dedup.compactExactIndex(spark, apath)
    val got2 = Dedup.exactKeepFromIndex(spark, apath, batch,
        "doc_id", "text")
      .as[(Long, String, Long)].collect().sorted
    assert(got2.toSeq == got.toSeq, "compaction changed probe results")
    CacheScope.releaseSession(spark)
  }
}
