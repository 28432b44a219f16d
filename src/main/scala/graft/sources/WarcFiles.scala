package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC / WET web-archive source (ISO 28500 — the format Common Crawl
  * ships, i.e. the REAL input of the curation stack's published
  * recipes: WET `conversion` records carry extracted text, WARC
  * `response` records carry raw HTTP payloads).
  *
  * Spark-first shape (the [[AvroFiles]] discipline): files arrive
  * through the built-in `binaryFile` source — one task per file, which
  * parallelizes across the ~64k segment files a Common Crawl dump
  * ships as — and each task walks its file's records with a
  * per-partition splitter (the record framing is self-describing:
  * a `WARC/1.0` version line, `Name: Value` headers, `Content-Length`
  * bytes of block, a blank-line trailer — no external parser needed).
  * `.gz` members decode transparently: Common Crawl gzips each record
  * as its own member, and `GZIPInputStream` reads concatenated members
  * as one stream, so the same splitter serves `.warc`, `.wet`,
  * `.warc.gz` and `.wet.gz`. [[readStream]] is the identical pipeline
  * over the binaryFile FILE-STREAM source: segments landing under the
  * path become micro-batches, the continuously-arriving-crawl shape.
  *
  * Whole-file tasks mean a single file must fit a task (Common Crawl
  * caps segments at ~1 GiB — the format's own scale discipline);
  * thousands of files spread across executors, so the 100 TB read is
  * bound by file count × scan, never by a driver loop.
  *
  * Output schema (one row per record):
  * `(path, record_id, record_type, url, warc_date, content_type,
  * payload binary)` — header absence lands NULL, never a parse error.
  */
object WarcFiles {

  /** binaryFile's fixed schema — required explicitly by the streaming
    * variant (file-stream sources cannot infer).
    */
  private val binaryFileSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Files picked up by default: plain and gzipped WARC/WET. */
  val defaultGlob = "*.{warc,wet,warc.gz,wet.gz}"

  /** One parsed record; `payload` is the raw block (exactly
    * `Content-Length` bytes).
    */
  final case class WarcRecord(path: String, record_id: String,
      record_type: String, url: String, warc_date: String,
      content_type: String, payload: Array[Byte])

  // ------------------------------------------------------------- splitter

  /** Read one header line: bytes up to LF (CR stripped), decoded UTF-8;
    * null at EOF.
    */
  private def readLine(in: java.io.InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(128)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
    val bytes = buf.toByteArray
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
      bytes.length - 1 else bytes.length
    new String(bytes, 0, n, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def readFully(in: java.io.InputStream, n: Long,
      file: String): Array[Byte] = {
    require(n <= Int.MaxValue, s"$file: record block of $n bytes")
    val out = new Array[Byte](n.toInt)
    var off = 0
    while (off < out.length) {
      val r = in.read(out, off, out.length - off)
      if (r < 0) throw new IllegalArgumentException(
        s"$file: truncated record block ($off of $n bytes)")
      off += r
    }
    out
  }

  /** Walk every record of one (possibly gzipped) WARC/WET stream.
    * Lenient where the spec allows writers latitude: header names
    * match case-insensitively, folded continuation lines (leading
    * space/tab) append to the previous header, and any number of blank
    * lines may separate records; strict where mis-parsing would corrupt
    * data: the version line must read `WARC/…` and `Content-Length`
    * must be present and honored exactly.
    */
  private[sources] def parseStream(file: String,
      in: java.io.InputStream): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var version: String = nextNonEmpty()

      private def nextNonEmpty(): String = {
        var l = readLine(in)
        while (l != null && l.isEmpty) l = readLine(in)
        l
      }

      override def hasNext: Boolean = version != null

      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException
        if (!version.startsWith("WARC/"))
          throw new IllegalArgumentException(
            s"$file: expected WARC version line, got '$version'")
        val headers = scala.collection.mutable.ListBuffer
          .empty[(String, String)]
        var l = readLine(in)
        while (l != null && l.nonEmpty) {
          if ((l.charAt(0) == ' ' || l.charAt(0) == '\t') &&
              headers.nonEmpty) {
            val (k, v) = headers.remove(headers.length - 1)
            headers += ((k, v + " " + l.trim))
          } else {
            val i = l.indexOf(':')
            if (i > 0) headers += ((l.substring(0, i).trim.toLowerCase,
              l.substring(i + 1).trim))
          }
          l = readLine(in)
        }
        val h = headers.toMap
        val len = h.getOrElse("content-length",
          throw new IllegalArgumentException(
            s"$file: record without Content-Length")).toLong
        val payload = readFully(in, len, file)
        version = nextNonEmpty()
        WarcRecord(file, h.getOrElse("warc-record-id", null),
          h.getOrElse("warc-type", null),
          h.getOrElse("warc-target-uri", null),
          h.getOrElse("warc-date", null),
          h.getOrElse("content-type", null), payload)
      }
    }

  /** One file's bytes → records ([[parseStream]] behind transparent
    * multi-member gzip when the path says so).
    */
  private def parseFile(file: String,
      bytes: Array[Byte]): Iterator[WarcRecord] = {
    val raw = new java.io.ByteArrayInputStream(bytes)
    val in =
      if (file.endsWith(".gz"))
        new java.util.zip.GZIPInputStream(raw, 64 * 1024)
      else raw
    parseStream(file, in)
  }

  private def toRecordsDf(files: Dataset[(String, Array[Byte])]): DataFrame = {
    import files.sparkSession.implicits._
    files.flatMap { case (file, bytes) => parseFile(file, bytes) }
      .toDF()
  }

  /** Read WARC/WET files under `path` — one row per record. */
  def read(spark: SparkSession, path: String,
      glob: String = defaultGlob): DataFrame = {
    import spark.implicits._
    toRecordsDf(spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])])
  }

  /** [[read]] as a Structured Streaming source: segment files appearing
    * under `path` arrive as micro-batches (binaryFile file stream),
    * split by the identical record walker.
    */
  def readStream(spark: SparkSession, path: String,
      glob: String = defaultGlob): DataFrame = {
    import spark.implicits._
    toRecordsDf(spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", glob)
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])])
  }

  /** The WET text view — `conversion` records (or any `text/…` block)
    * decoded UTF-8: `(url, warc_date, text)`. This is the frame the
    * curation stack starts from (`TextAnalysis` → `Curation.curate`);
    * raw `response` records route through an HTML-strip first.
    */
  def readText(spark: SparkSession, path: String,
      glob: String = defaultGlob): DataFrame =
    textView(read(spark, path, glob))

  /** [[readText]] over the streaming source. */
  def readTextStream(spark: SparkSession, path: String,
      glob: String = defaultGlob): DataFrame =
    textView(readStream(spark, path, glob))

  private def textView(records: DataFrame): DataFrame =
    records
      .filter(col("record_type") === "conversion" ||
        col("content_type").startsWith("text/"))
      .select(col("url"), col("warc_date"),
        decodeUtf8(col("payload")).as("text"))

  /** The RESPONSE-record text view — raw WARC (not WET) captures carry
    * the full HTTP exchange in the block: drop the HTTP header section
    * (everything through the first blank line) and decode the body
    * UTF-8 as `(url, warc_date, body)`. Compose with
    * [[graft.pipeline.TextAnalysis.stripMarkup]] for HTML bodies — the
    * raw-crawl leg of the ingest path (WET already ships extracted
    * text). Column-only (codegen'd regexp), no UDFs.
    */
  def responseText(records: DataFrame): DataFrame =
    records
      .filter(col("record_type") === "response")
      .select(col("url"), col("warc_date"),
        regexp_replace(decodeUtf8(col("payload")),
          "(?s)^.*?\r\n\r\n", "").as("body"))

  private def decodeUtf8(payload: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.decode(payload, "UTF-8")
}
