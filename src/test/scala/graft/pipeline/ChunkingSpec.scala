package graft.pipeline

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Chunking: exact chunk boundaries with and without overlap, the
  * short-doc and blank-doc conventions, last-chunk remainder handling,
  * reassembly equality, and the map-only plan (no exchange).
  */
class ChunkingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def doc(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")

  private def chunksOf(text: String, size: Int, overlap: Int) =
    Chunking.chunkDocuments(Seq((1L, text)).toDF("id", "text"),
        "id", "text", size, overlap)
      .orderBy("chunk_id")
      .collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))

  test("no overlap: exact tiling with a short tail") {
    val c = chunksOf(doc(10), 4, 0)
    assert(c.toSeq == Seq(
      (0, 0, 4, "t1 t2 t3 t4"),
      (1, 4, 4, "t5 t6 t7 t8"),
      (2, 8, 2, "t9 t10")))
  }

  test("overlap: neighbours share exactly `overlap` tokens") {
    val c = chunksOf(doc(10), 4, 2)
    assert(c.toSeq == Seq(
      (0, 0, 4, "t1 t2 t3 t4"),
      (1, 2, 4, "t3 t4 t5 t6"),
      (2, 4, 4, "t5 t6 t7 t8"),
      (3, 6, 4, "t7 t8 t9 t10")))
  }

  test("overlap with remainder: final chunk reaches the end once") {
    val c = chunksOf(doc(11), 4, 2)
    assert(c.length == 5)
    assert(c.last == ((4, 8, 3, "t9 t10 t11")))
    // every start advances by stride
    assert(c.map(_._2).toSeq == Seq(0, 2, 4, 6, 8))
  }

  test("exact multiple: no phantom empty chunk") {
    val c = chunksOf(doc(8), 4, 0)
    assert(c.length == 2 && c.last._4 == "t5 t6 t7 t8")
    val c2 = chunksOf(doc(4), 4, 2)
    assert(c2.length == 1)
  }

  test("short, blank, and null docs") {
    assert(chunksOf(doc(3), 5, 1).toSeq == Seq((0, 0, 3, "t1 t2 t3")))
    val d = Seq((1L, "one two"), (2L, "   "), (3L, null))
      .toDF("id", "text")
    val out = Chunking.chunkDocuments(d, "id", "text", 5, 0).collect()
    assert(out.length == 1 && out(0).getLong(0) == 1L)
  }

  test("no-overlap chunks reassemble the token stream exactly") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val orig = docs.selectExpr("doc_id",
      "array_join(split(trim(text), ' '), ' ') AS t")
    val bad = Chunking.chunkDocuments(docs, "doc_id", "text", 7, 0)
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.concat_ws(" ",
        org.apache.spark.sql.functions.flatten(
          org.apache.spark.sql.functions.transform(
            org.apache.spark.sql.functions.sort_array(
              org.apache.spark.sql.functions.collect_list(
                org.apache.spark.sql.functions.struct(
                  $"chunk_id", $"chunk"))),
            s => org.apache.spark.sql.functions.split(
              s.getField("chunk"), " ")))).as("glued"))
      .join(orig, "doc_id")
      .filter($"glued" =!= $"t")
      .count()
    assert(bad == 0L)
  }

  test("map-only plan: no exchange anywhere") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Chunking.chunkDocuments(docs, "doc_id", "text", 64, 16)
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e }
    assert(exchanges.isEmpty, s"chunking must be map-only: $plan")
  }

  test("refusals: bad size/overlap") {
    val d = Seq((1L, "a b")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Chunking.chunkDocuments(d, "id", "text", 0, 0) }
    intercept[IllegalArgumentException] {
      Chunking.chunkDocuments(d, "id", "text", 4, 4) }
    intercept[IllegalArgumentException] {
      Chunking.chunkDocuments(d, "id", "text", 4, -1) }
  }

  private def sentChunks(text: String, size: Int, overlap: Int) =
    Chunking.chunkBySentences(Seq((1L, text)).toDF("id", "text"),
        "id", "text", size, overlap)
      .orderBy("chunk_id")
      .collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))

  test("sentence chunks: boundaries at .!? + space, windows overlap") {
    val text = "One two. Three four!  Five? Six seven. Eight"
    // sentences: [One two.] [Three four!] [Five?] [Six seven.] [Eight]
    val c = sentChunks(text, 2, 1)
    assert(c.toSeq == Seq(
      (0, 0, 2, "One two. Three four!"),
      (1, 1, 2, "Three four! Five?"),
      (2, 2, 2, "Five? Six seven."),
      (3, 3, 2, "Six seven. Eight")))
  }

  test("sentence chunks: terminator stays attached, no-terminator doc") {
    assert(sentChunks("just one sentence no punctuation", 3, 0).toSeq ==
      Seq((0, 0, 1, "just one sentence no punctuation")))
    // a period NOT followed by a space does not split (decimals, urls)
    assert(sentChunks("pi is 3.14 ok. next one", 1, 0).toSeq ==
      Seq((0, 0, 1, "pi is 3.14 ok."), (1, 1, 1, "next one")))
    // blank and null yield nothing
    assert(Chunking.chunkBySentences(
      Seq((1L, ""), (2L, "   ")).toDF("id", "text"),
      "id", "text", 2).count() == 0)
  }

  test("sentence chunking is map-only: no exchange anywhere") {
    val plan = Chunking.chunkBySentences(
        Seq((1L, "a. b. c.")).toDF("id", "text"), "id", "text", 2, 1)
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e }
    assert(exchanges.isEmpty, s"sentence chunking must be map-only: $plan")
  }
}
