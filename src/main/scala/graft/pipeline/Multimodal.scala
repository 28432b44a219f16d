package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus feature extraction staged for batch execution.
  *
  * The IMAGE DECODE IS REAL: [[decodeImageMeta]] parses actual PNG/JPEG/
  * GIF/BMP bytes with the JDK's `javax.imageio` (ships with Java — zero
  * extra dependencies) and [[withImageMeta]] runs it as a mapPartitions
  * batch stage, the Scala analog of a `mapInPandas` decode UDF. Only the
  * FEATURE EMBEDDING (`fakeDecode`) remains a deterministic stub — the
  * container has no ML feature libraries — clearly marked below.
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

  /** Wrap a source column into a blob struct. `format` is the CLAIMED
    * container format (from the source system); width/height start null —
    * unknown until [[withImageMeta]] decodes the actual bytes.
    */
  def asBlob(content: Column, format: String): Column = {
    val bytes = content.cast(BinaryType)
    struct(
      bytes.as("content"),
      struct(
        lit(format).as("format"),
        length(bytes).cast(LongType).as("n_bytes"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height")).as("meta"))
  }

  /** REAL image header decode via the JDK's ImageIO: sniffs the container
    * (png/jpeg/gif/bmp), reads width/height from the header WITHOUT
    * decoding the raster — the right cost profile for a metadata pass
    * over 100 TB of blobs. Returns None for bytes no installed reader
    * recognizes (corrupt, truncated, or non-image).
    */
  def decodeImageMeta(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    if (bytes == null || bytes.isEmpty) return None
    // explicit memory-cache stream: ImageIO.createImageInputStream
    // defaults to a DISK-backed cache file per image — a silent temp-file
    // write per blob, ruinous at scale for bytes already in memory
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          Some((r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0)))
        } catch { case _: java.io.IOException => None
        } finally r.dispose()
      }
    } finally iis.close()
  }

  /** Decode stage: fills each blob's meta (format, width, height) from
    * the REAL bytes via [[decodeImageMeta]], one mapPartitions pass
    * (batch-UDF shape). Undecodable blobs keep their claimed format and
    * null dimensions — route them to a quarantine sink downstream rather
    * than failing the batch.
    */
  def withImageMeta(df: DataFrame, blobCol: String): DataFrame = {
    val blobIdx = df.schema.fieldIndex(blobCol)
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val blob = r.getStruct(blobIdx)
        val out =
          if (blob == null) blob
          else {
            val content = if (blob.isNullAt(0)) null
              else blob.getAs[Array[Byte]](0)
            val meta = blob.getStruct(1)
            decodeImageMeta(content) match {
              case Some((fmt, w, h)) =>
                Row(content, Row(fmt, meta.getLong(1), w, h))
              case None => blob
            }
          }
        Row.fromSeq(r.toSeq.updated(blobIdx, out))
      }
    }(enc)
  }

  /** Deterministic in-memory image fixture: a real `w`×`h` PNG/JPEG/BMP
    * encoded with the JDK (pixels seeded from `seed`). This is how specs
    * and the driver query plant decodable bytes without fixture files —
    * the decode path then proves itself by recovering the planted
    * dimensions.
    */
  def encodeImage(w: Int, h: Int, seed: Long, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (scala.util.hashing.byteswap64(seed * 31 + y * w + x)
            & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, baos)
    baos.toByteArray
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
    *
    * The total is read from Catalyst plan statistics (for a parquet scan:
    * file footer/size metadata) — DRIVER-SIDE ONLY, no job runs. Blob
    * content dominates row size in a media table, so the whole-row
    * estimate is the right magnitude. Pass `exact = true` to pay one
    * aggregate scan of `meta.n_bytes` when the table mixes blobs with
    * wide non-blob columns and the estimate would oversize tasks.
    */
  def repartitionByBytes(df: DataFrame, blobCol: String,
      bytesPerTask: Long, exact: Boolean = false): DataFrame = {
    val total: Long =
      if (exact)
        df.select(sum(col(blobCol).getField("meta")
          .getField("n_bytes"))).head().getLong(0)
      else df.queryExecution.optimizedPlan.stats.sizeInBytes
        .min(BigInt(Long.MaxValue)).toLong
    val parts = math.max(1L, math.min(200000L, total / bytesPerTask)).toInt
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
