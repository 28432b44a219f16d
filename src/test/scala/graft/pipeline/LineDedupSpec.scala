package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Line-level boilerplate dedup: stats, rewrite, structural-empty
  * exemption, all-dropped documents, and index-path parity.
  */
class LineDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val footer = "copyright footer all rights reserved"
  private val nav = "nav home about contact"

  // 12 docs: all carry the footer, ids %2 carry the nav line, each has
  // one unique body line; doc 11's body IS the footer (all lines boiler
  // at tau=3); doc 10 contains an empty structural line.
  private def docs = spark.range(12).select(col("id").as("doc_id"),
    concat(
      when(col("id") % 2 === 0, concat(lit(nav), lit("\n")))
        .otherwise(lit("")),
      when(col("id") === 11, lit(footer))
        .otherwise(concat(lit("body line "), col("id"))),
      when(col("id") === 10, lit("\n\nextra after blank"))
        .otherwise(lit("")),
      lit("\n"), lit(footer)).as("text"))

  test("lineStats counts distinct docs per line, excluding empties") {
    val stats = LineDedup.lineStats(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(stats(footer) == (12L, 13L)) // doc 11 carries it twice
    assert(stats(nav) == (6L, 6L))
    assert(stats("body line 3") == (1L, 1L))
    assert(!stats.contains("")) // structural empties never counted
  }

  test("dropBoilerplate strips high-frequency lines, keeps order") {
    val out = LineDedup.dropBoilerplate(docs, "doc_id", "text",
        maxDocFreq = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.size == 12)
    assert(out(3L) == (("body line 3", 2L, 1L))) // footer dropped
    assert(out(2L) == (("body line 2", 3L, 2L))) // nav + footer dropped
    // doc 11: every line was boilerplate -> empty text survives as a row
    assert(out(11L) == (("", 2L, 2L)))
    // doc 10: empty structural line is exempt and keeps its position
    assert(out(10L) == (("body line 10\n\nextra after blank", 5L, 2L)))
  }

  test("low threshold keeps everything below it") {
    val out = LineDedup.dropBoilerplate(docs, "doc_id", "text",
        maxDocFreq = 12)
      .agg(sum("n_dropped")).head().getLong(0)
    assert(out == 0L)
  }

  test("index path matches the one-shot rewrite") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_line_idx").toString
    LineDedup.writeLineIndex(docs, "doc_id", "text", path)
    val direct = LineDedup.dropBoilerplate(docs, "doc_id", "text", 3)
      .orderBy("doc_id").collect().toSeq
    val viaIdx = LineDedup.dropBoilerplateFromIndex(spark, path,
        docs, "doc_id", "text", 3)
      .orderBy("doc_id").collect().toSeq
    assert(direct == viaIdx)
    // params store the delimiter + corpus size
    val p = spark.read.json(s"$path/params").head()
    assert(p.getAs[String]("delim") == "\n")
    assert(p.getAs[Long]("corpusDocs") == 12L)
  }

  test("null text survives as an empty-text row, never dropped") {
    val d = Seq((1L, Some("common\nunique")), (2L, None),
      (3L, Some("common\nother")), (4L, Some("common\nthird")))
      .toDF("doc_id", "text")
    val out = LineDedup.dropBoilerplate(d, "doc_id", "text",
        maxDocFreq = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.size == 4)
    assert(out(2L) == (("", 1L, 0L))) // null -> one structural empty line
  }

  test("a literal regex-metachar delimiter splits literally") {
    val d = Seq((1L, "a|b|a|b")).toDF("doc_id", "text")
    val stats = LineDedup.lineStats(d, "doc_id", "text", delim = "|")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(stats == Map("a" -> 2L, "b" -> 2L))
  }
}
