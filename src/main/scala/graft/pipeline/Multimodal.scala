package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus feature extraction staged for batch execution.
  *
  * The actual media decode is STUBBED (`fakeDecode`) — the container has no
  * image/audio libraries — but everything Spark-side is real and tested:
  * the blob schema, partition sizing by byte budget, the mapPartitions
  * batch shape (the Scala analog of a `mapInPandas` batch UDF), and the
  * deterministic feature pipeline built on it.
  */
object Multimodal {

  /** Canonical blob schema: content + typed metadata. */
  val blobSchema: StructType = StructType(Seq(
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true))),
      nullable = false)))

  /** Wrap a source column into a blob struct. Deterministic fake
    * width/height metadata derived from the content hash stand in for a
    * real header parse (STUB — see object doc).
    */
  def asBlob(content: Column, format: String): Column = {
    val bytes = content.cast(BinaryType)
    val h = abs(xxhash64(bytes))
    struct(
      bytes.as("content"),
      struct(
        lit(format).as("format"),
        length(bytes).cast(LongType).as("n_bytes"),
        (pmod(h, lit(1920L)) + 32).cast(IntegerType).as("width"),
        (pmod(shiftright(h, 16), lit(1080L)) + 32).cast(IntegerType)
          .as("height")).as("meta"))
  }

  /** STUB decode: a real implementation would decode image bytes; this
    * deterministic fake derives `dim` floats from the content hash so the
    * full pipeline (schema, batching, downstream ANN) is exercisable.
    */
  def fakeDecode(content: Array[Byte], dim: Int): Array[Float] = {
    val base = scala.util.hashing.MurmurHash3.bytesHash(content, 42)
    Array.tabulate(dim) { i =>
      val h = scala.util.hashing.byteswap64(base.toLong * 2654435761L + i)
      (h % 1000L) / 1000.0f
    }
  }

  /** Feature extraction over blob rows via mapPartitions — the batch-UDF
    * shape: one iterator pass per partition, rows processed in order,
    * output schema = input + `features array<float>`.
    */
  def extractFeatures(df: DataFrame, blobCol: String, dim: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val blobIdx = df.schema.fieldIndex(blobCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val blob = r.getStruct(blobIdx)
        val content = if (blob == null || blob.isNullAt(0)) Array.empty[Byte]
          else blob.getAs[Array[Byte]](0)
        Row.fromSeq(r.toSeq :+ fakeDecode(content, dim).toSeq)
      }
    }(enc)
  }

  /** Expression-only variant of the fake feature map (stays inside
    * whole-stage codegen; used when the decode stub suffices).
    */
  def featureColumn(blob: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(blob.getField("content"), i), lit(1000L))
        .cast(DoubleType) / 1000.0).cast(FloatType))

  /** Repartition blobs so each task processes roughly `bytesPerTask` of
    * content — the knob that keeps decode batches memory-bounded at scale.
    */
  def repartitionByBytes(df: DataFrame, blobCol: String,
      bytesPerTask: Long): DataFrame = {
    val total = df.select(sum(col(blobCol).getField("meta")
      .getField("n_bytes"))).head().getLong(0)
    val parts = math.max(1, math.min(200000, total / bytesPerTask)).toInt
    df.repartition(parts)
  }

  /** Deterministic frame-sample positions for a "video" blob: `n` offsets
    * evenly spaced in the content (the Spark-side plumbing of a
    * frame-sampling stage; the frame decode itself is the stub above).
    */
  def framePositions(blob: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => (blob.getField("meta").getField("n_bytes") * i / n)
        .cast(LongType))
}
