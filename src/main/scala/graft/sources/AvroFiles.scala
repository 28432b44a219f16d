package graft.sources

import graft.functions.AvroBinary
import graft.schema.AvroSchema
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro object-container-file source (the `.avro` file format: header +
  * embedded writer schema + sync-marked blocks).
  *
  * Spark-first shape: files arrive through the built-in `binaryFile`
  * source (one task per file — container blocks could be split on sync
  * markers, but whole-file tasks parallelize across the thousands of
  * files a 100 TB dataset ships as); each task streams the container
  * with avro-java's `DataFileStream`, re-frames records as single-record
  * payloads, and the existing [[AvroBinary.fromAvroBinary]] Catalyst
  * expression decodes them WITH reader-schema evolution (aliases,
  * promotions, default fill) — one verified decode path for columns,
  * streams and files. [[readStream]] is the same pipeline over the
  * binaryFile FILE-STREAM source: new `.avro` files appearing under the
  * path become micro-batches, each decoded by the identical core.
  *
  * The caller's `writerSchema` must match the schema embedded in each
  * file — verified at runtime per file (a mismatch fails with both
  * spellings rather than mis-decoding).
  */
object AvroFiles {

  /** binaryFile's fixed schema — required explicitly by the streaming
    * variant (file-stream sources cannot infer).
    */
  private val binaryFileSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** The shared per-file decode core: one container's bytes → re-framed
    * single-record Avro payloads (file path kept for lineage).
    */
  private def reframe(writerJson: String)(
      file: String, bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val jWriter = new org.apache.avro.Schema.Parser().parse(writerJson)
    val in = new java.io.ByteArrayInputStream(bytes)
    val reader = new org.apache.avro.generic.GenericDatumReader[
      org.apache.avro.generic.GenericRecord]()
    val stream = new org.apache.avro.file.DataFileStream(in, reader)
    try {
      val fileSchema = stream.getSchema
      if (fileSchema != jWriter)
        throw new IllegalArgumentException(
          s"$file: container schema ${fileSchema.getFullName} does " +
            s"not match the declared writer schema " +
            s"${jWriter.getFullName}")
      val datumWriter = new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](fileSchema)
      val out = new java.io.ByteArrayOutputStream()
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[(String, Array[Byte])]
      while (stream.hasNext) {
        val rec = stream.next()
        out.reset()
        val enc = org.apache.avro.io.EncoderFactory.get()
          .binaryEncoder(out, null)
        datumWriter.write(rec, enc)
        enc.flush()
        buf += ((file, out.toByteArray))
      }
      buf.toSeq
    } finally stream.close()
  }

  private def decode(files: Dataset[(String, Array[Byte])],
      writerSchema: AvroSchema, readerSchema: AvroSchema): DataFrame = {
    import files.sparkSession.implicits._
    val writerJson = writerSchema.exportString
    files.flatMap { case (file, bytes) =>
        reframe(writerJson)(file, bytes)
      }.toDF("path", "bin")
      .select(col("path"),
        AvroBinary.fromAvroBinary(col("bin"), writerSchema, readerSchema)
          .as("r"))
  }

  /** Read `.avro` container files under `path` into the internal
    * DataFrame form (reader-shaped struct column `r`, plus the source
    * file path for lineage).
    */
  def read(spark: SparkSession, path: String, writerSchema: AvroSchema,
      readerSchema: AvroSchema): DataFrame = {
    import spark.implicits._
    decode(spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])], writerSchema, readerSchema)
  }

  /** [[read]] as a Structured Streaming source: `.avro` files appearing
    * under `path` arrive as micro-batches (binaryFile file stream),
    * decoded by the same reframe + evolution-aware expression core —
    * the container-file ingest shape of a continuously-landing dataset.
    */
  def readStream(spark: SparkSession, path: String,
      writerSchema: AvroSchema, readerSchema: AvroSchema): DataFrame = {
    import spark.implicits._
    decode(spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.avro")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])], writerSchema, readerSchema)
  }
}
