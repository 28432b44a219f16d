package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact duplicated-span detection: window hashing, keep-first
  * flagging, span merging, and the rewrite.
  */
class SpanDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def seq(range: Range): String = range.map(i => s"t$i").mkString(" ")

  test("windowHashes emits one hash per start; short docs emit nothing") {
    val docs = Seq((1L, seq(0 until 5)), (2L, seq(0 until 2)))
      .toDF("doc_id", "text")
    val w = SpanDedup.windowHashes(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(w.map(_._1).toSet == Set(1L)) // doc 2 shorter than a window
    assert(w.map(_._2).sorted.toSeq == Seq(0, 1, 2))
  }

  test("corpus-first occurrence survives; later copies become spans") {
    // doc 1 owns tokens 0..9; docs 2 and 3 embed doc 1's tokens 2..7
    // inside otherwise-unique text
    val shared = seq(2 until 8) // 6 tokens
    val docs = Seq(
      (1L, seq(0 until 10)),
      (2L, s"u1 u2 u3 $shared u4 u5"),
      (3L, s"v1 $shared v2 v3 v4")).toDF("doc_id", "text")
    val spans = SpanDedup.duplicateSpans(docs, "doc_id", "text",
        windowTokens = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // doc 1 is the first occurrence (lowest id) -> no spans there;
    // doc 2: shared block sits at tokens 3..8 -> span [3, 9)
    // doc 3: at tokens 1..6 -> span [1, 7)
    assert(spans == Set((2L, 3, 9), (3L, 1, 7)))
  }

  test("overlapping and adjacent windows merge into one span") {
    // two copies of a 10-token run: windows at starts 0..6 all flagged
    // in the second doc and merge to one [0, 10) span
    val run = seq(100 until 110)
    val docs = Seq((1L, run), (2L, run)).toDF("doc_id", "text")
    val spans = SpanDedup.duplicateSpans(docs, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(spans.toSeq == Seq((2L, 0, 10)))
  }

  test("within-document repeats keep their first occurrence") {
    val rep = seq(0 until 6)
    val docs = Seq((1L, s"$rep x1 x2 $rep")).toDF("doc_id", "text")
    val spans = SpanDedup.duplicateSpans(docs, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // tokens: rep at 0..5, x1 x2 at 6..7, rep again at 8..13
    assert(spans.toSeq == Seq((1L, 8, 14)))
  }

  test("index path equals one-shot over corpus+batch, batch side") {
    val shared = seq(2 until 8)
    val corpus = Seq(
      (1L, seq(0 until 10)),
      (2L, s"c1 c2 c3 c4 c5 c6 c7 c8")).toDF("doc_id", "text")
    // batch: one doc embedding corpus content, one with a batch-internal
    // repeat, one clean
    val batchRepeat = seq(200 until 206)
    val batch = Seq(
      (10L, s"u1 u2 $shared u3 u4"),
      (11L, s"$batchRepeat x1 x2 $batchRepeat"),
      (12L, "w1 w2 w3 w4 w5 w6 w7 w8")).toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("span_idx").toString
    SpanDedup.writeSpanIndex(corpus, "doc_id", "text", path,
      windowTokens = 4)
    val viaIdx = SpanDedup.duplicateSpansFromIndex(spark, path, batch,
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val oneShot = SpanDedup.duplicateSpans(corpus.union(batch),
        "doc_id", "text", 4)
      .filter(col("id") >= 10L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(viaIdx == oneShot)
    // the batch-internal repeat keeps its first copy
    assert(viaIdx.contains((11L, 8, 14)))
    // params store width + corpus size
    val p = spark.read.json(s"$path/params").head()
    assert(p.getAs[Long]("windowTokens") == 4L)
    assert(p.getAs[Long]("corpusDocs") == 2L)
  }

  test("null and blank text count zero tokens and are never dropped") {
    val docs = Seq((1L, Some(seq(0 until 25))), (2L, None),
      (3L, Some("")), (4L, Some("   ")))
      .toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicateSpans(docs, "doc_id", "text", 20)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.size == 4)
    assert(out(2L) == (("", 0L, 0L)))
    assert(out(3L) == (("", 0L, 0L)))
    assert(out(4L) == (("", 0L, 0L)))
  }

  test("removeDuplicateSpans drops span tokens, keeps the rest") {
    val shared = seq(2 until 8)
    val docs = Seq(
      (1L, seq(0 until 10)),
      (2L, s"u1 u2 u3 $shared u4 u5")).toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicateSpans(docs, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((seq(0 until 10), 10L, 0L))) // first copy intact
    assert(out(2L) == (("u1 u2 u3 u4 u5", 11L, 6L)))
  }
}
