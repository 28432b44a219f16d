package graft.sources

import graft.functions.AvroBinary
import graft.schema.AvroSchema
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  * streams and files.
  *
  * The caller's `writerSchema` must match the schema embedded in each
  * file — verified at runtime per file (a mismatch fails with both
  * spellings rather than mis-decoding).
  */
object AvroFiles {

  /** Read `.avro` container files under `path` into the internal
    * DataFrame form (reader-shaped struct column `r`, plus the source
    * file path for lineage).
    */
  def read(spark: SparkSession, path: String, writerSchema: AvroSchema,
      readerSchema: AvroSchema): DataFrame = {
    import spark.implicits._
    val writerJson = writerSchema.exportString
    val payloads = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
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
      }.toDF("path", "bin")
    payloads.select(col("path"),
      AvroBinary.fromAvroBinary(col("bin"), writerSchema, readerSchema)
        .as("r"))
  }
}
