package graft.sources

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class WarcFilesSpec extends AnyFunSuite with SparkTestBase {

  private val CRLF = "\r\n"

  /** One WARC record's bytes: version line, headers, blank line, block,
    * two trailing CRLFs (the spec's record separator).
    */
  private def record(headers: Seq[(String, String)],
      payload: Array[Byte]): Array[Byte] = {
    val head = ("WARC/1.0" +: headers.map { case (k, v) => s"$k: $v" })
      .mkString("", CRLF, CRLF) +
      s"Content-Length: ${payload.length}$CRLF$CRLF"
    head.getBytes("UTF-8") ++ payload ++ (CRLF + CRLF).getBytes("UTF-8")
  }

  private def conversion(url: String, date: String,
      text: String): Array[Byte] =
    record(Seq("WARC-Type" -> "conversion", "WARC-Target-URI" -> url,
      "WARC-Date" -> date, "WARC-Record-ID" -> s"<urn:test:$url>",
      "Content-Type" -> "text/plain"), text.getBytes("UTF-8"))

  private def write(dir: java.nio.file.Path, name: String,
      bytes: Array[Byte]): Unit =
    java.nio.file.Files.write(dir.resolve(name), bytes)

  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(bytes); g.close()
    bos.toByteArray
  }

  test("reads multi-record WET files: headers, payload bytes, text view") {
    val dir = java.nio.file.Files.createTempDirectory("warc")
    write(dir, "a.wet",
      conversion("http://a.example/1", "2024-01-01T00:00:00Z", "héllo") ++
        conversion("http://a.example/2", "2024-01-02T00:00:00Z", "world"))
    write(dir, "b.wet",
      conversion("http://b.example/3", "2024-01-03T00:00:00Z", ""))
    val rows = WarcFiles.read(spark, dir.toString)
      .orderBy("url").collect()
    assert(rows.length == 3)
    val r0 = rows(0)
    assert(r0.getAs[String]("record_type") == "conversion")
    assert(r0.getAs[String]("url") == "http://a.example/1")
    assert(r0.getAs[String]("warc_date") == "2024-01-01T00:00:00Z")
    assert(r0.getAs[String]("content_type") == "text/plain")
    assert(new String(r0.getAs[Array[Byte]]("payload"), "UTF-8") == "héllo")
    assert(rows(2).getAs[Array[Byte]]("payload").isEmpty)
    val text = WarcFiles.readText(spark, dir.toString)
      .orderBy("url").collect()
    assert(text.map(_.getAs[String]("text")).toSeq ==
      Seq("héllo", "world", ""))
  }

  test("gzipped files: one member per record (the Common Crawl layout)") {
    val dir = java.nio.file.Files.createTempDirectory("warcgz")
    write(dir, "a.wet.gz",
      gzipMember(conversion("http://gz.example/1", "2024-01-01T00:00:00Z",
        "alpha")) ++
        gzipMember(conversion("http://gz.example/2",
          "2024-01-01T00:00:00Z", "beta")))
    val rows = WarcFiles.readText(spark, dir.toString)
      .orderBy("url").collect()
    assert(rows.map(_.getAs[String]("text")).toSeq == Seq("alpha", "beta"))
  }

  test("payload containing CRLFs and WARC-like lines is framed by length") {
    val dir = java.nio.file.Files.createTempDirectory("warcbin")
    // a block that LOOKS like a record boundary — only Content-Length
    // framing reads it correctly
    val tricky = s"line1${CRLF}${CRLF}WARC/1.0${CRLF}not: a header"
    write(dir, "t.warc",
      record(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> "http://t.example/x",
        "Content-Type" -> "application/http"),
        tricky.getBytes("UTF-8")) ++
        conversion("http://t.example/y", "2024-01-01T00:00:00Z", "after"))
    val rows = WarcFiles.read(spark, dir.toString)
      .orderBy("url").collect()
    assert(rows.length == 2)
    assert(new String(rows(0).getAs[Array[Byte]]("payload"),
      "UTF-8") == tricky)
    assert(rows(1).getAs[String]("record_type") == "conversion")
  }

  test("folded continuation headers and case-insensitive names") {
    val dir = java.nio.file.Files.createTempDirectory("warcfold")
    val payload = "x".getBytes("UTF-8")
    val bytes = ("WARC/1.0" + CRLF +
      "warc-type: conversion" + CRLF +
      "WARC-TARGET-URI: http://f.example/long" + CRLF +
      " /folded/path" + CRLF +
      s"content-length: ${payload.length}" + CRLF + CRLF)
      .getBytes("UTF-8") ++ payload ++ (CRLF + CRLF).getBytes("UTF-8")
    write(dir, "f.warc", bytes)
    val r = WarcFiles.read(spark, dir.toString).collect().head
    assert(r.getAs[String]("url") == "http://f.example/long /folded/path")
    assert(r.getAs[String]("record_type") == "conversion")
  }

  test("truncated block and missing Content-Length fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("warcbad")
    val good = conversion("http://x/1", "2024-01-01T00:00:00Z", "abcdef")
    write(dir, "trunc.warc", good.dropRight(8)) // cuts into the block
    val e1 = intercept[Exception] {
      WarcFiles.read(spark, dir.toString).collect()
    }
    assert(e1.getMessage.contains("truncated") ||
      (e1.getCause != null &&
        e1.getCause.getMessage.contains("truncated")))
    val dir2 = java.nio.file.Files.createTempDirectory("warcbad2")
    write(dir2, "nolen.warc",
      ("WARC/1.0" + CRLF + "WARC-Type: conversion" + CRLF + CRLF)
        .getBytes("UTF-8"))
    val e2 = intercept[Exception] {
      WarcFiles.read(spark, dir2.toString).collect()
    }
    assert(e2.getMessage.contains("Content-Length") ||
      (e2.getCause != null &&
        e2.getCause.getMessage.contains("Content-Length")))
  }

  test("responseText strips the HTTP header block and composes with " +
      "markup strip") {
    val dir = java.nio.file.Files.createTempDirectory("warcresp")
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "X-Hdr: v\r\n\r\n<html><body>Hello <b>crawl</b></body></html>"
    write(dir, "r.warc",
      record(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> "http://r.example/page",
        "Content-Type" -> "application/http; msgtype=response"),
        http.getBytes("UTF-8")) ++
        conversion("http://r.example/wet", "2024-01-01T00:00:00Z",
          "already text")) // conversion records are NOT response rows
    val resp = WarcFiles.responseText(
      WarcFiles.read(spark, dir.toString)).collect()
    assert(resp.length == 1)
    assert(resp.head.getAs[String]("body") ==
      "<html><body>Hello <b>crawl</b></body></html>")
    val text = WarcFiles.responseText(WarcFiles.read(spark, dir.toString))
      .select(graft.pipeline.TextAnalysis.stripMarkup(
        org.apache.spark.sql.functions.col("body")).as("t"))
      .collect().head.getString(0)
    assert(text == "Hello crawl", s"got '$text'")
  }

  test("streaming read: segments arriving in waves equal batch read") {
    val dir = java.nio.file.Files.createTempDirectory("warcstream")
    val q = WarcFiles.readTextStream(spark, dir.toString)
      .writeStream.format("memory").queryName("warc_file_stream")
      .outputMode("append").start()
    write(dir, "w1.wet",
      conversion("http://s.example/1", "2024-01-01T00:00:00Z", "one") ++
        conversion("http://s.example/2", "2024-01-01T00:00:00Z", "two"))
    q.processAllAvailable() // wave 1 = micro-batch 1
    write(dir, "w2.wet.gz",
      gzipMember(conversion("http://s.example/3", "2024-01-02T00:00:00Z",
        "three")))
    q.processAllAvailable() // wave 2 = micro-batch 2
    q.stop()
    val streamed = spark.table("warc_file_stream")
      .orderBy("url").collect().map(_.toSeq.toList).toList
    val batch = WarcFiles.readText(spark, dir.toString)
      .orderBy("url").collect().map(_.toSeq.toList).toList
    assert(streamed == batch, s"$streamed != $batch")
    assert(streamed.length == 3)
  }
}
