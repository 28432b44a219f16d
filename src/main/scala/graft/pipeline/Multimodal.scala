package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus feature extraction staged for batch execution.
  *
  * EVERY DECODE HERE IS REAL, with zero extra dependencies:
  * [[decodeImageMeta]] parses actual PNG/JPEG/GIF/BMP headers with the
  * JDK's `javax.imageio`; [[decodeAudioMeta]] walks real RIFF/WAVE
  * chunks; [[imageLumaGrid]]/[[imageEmbedding]] decode the FULL raster
  * and compute a pHash-shaped luminance-grid embedding. Each runs as a
  * mapPartitions batch stage ([[withImageMeta]], [[withAudioMeta]],
  * [[withImageEmbedding]]) — the Scala analog of a `mapInPandas` decode
  * UDF.
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
          // Locale.ROOT: under a Turkish default locale "GIF" lowercases
          // to a dotless-i "gıf", breaking format equality checks
          Some((r.getFormatName.toLowerCase(java.util.Locale.ROOT),
            r.getWidth(0), r.getHeight(0)))
        } catch {
          // ImageIO readers throw unchecked exceptions on crafted headers
          // (IllegalArgument, IndexOutOfBounds) — the contract is
          // "quarantine downstream, never fail the batch", so any
          // non-fatal decode failure is a None
          case scala.util.control.NonFatal(_) => None
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

  // ------------------------------------------------------------- audio

  /** Audio blob schema: content + typed audio metadata (the audio analog
    * of [[blobSchema]]).
    */
  val audioBlobSchema: StructType = StructType(Seq(
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("bits_per_sample", IntegerType, nullable = true),
      StructField("n_frames", LongType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))),
      nullable = false)))

  /** Wrap a source column into an audio blob struct (metadata unknown
    * until [[withAudioMeta]] parses the actual bytes).
    */
  def asAudioBlob(content: Column, format: String): Column = {
    val bytes = content.cast(BinaryType)
    struct(
      bytes.as("content"),
      struct(
        lit(format).as("format"),
        length(bytes).cast(LongType).as("n_bytes"),
        lit(null).cast(IntegerType).as("sample_rate"),
        lit(null).cast(IntegerType).as("channels"),
        lit(null).cast(IntegerType).as("bits_per_sample"),
        lit(null).cast(LongType).as("n_frames"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"))
  }

  /** REAL audio header decode: a zero-dependency RIFF/WAVE parse (chunk
    * walk → `fmt ` + `data`) recovering sample rate, channels, bit
    * depth, frame count and duration WITHOUT touching the sample data —
    * the audio analog of [[decodeImageMeta]]'s header-only cost profile.
    * Returns None for anything that is not a well-formed PCM WAV
    * (corrupt, truncated, non-RIFF) — quarantine downstream, never fail
    * the batch.
    */
  def decodeAudioMeta(bytes: Array[Byte])
      : Option[(String, Int, Int, Int, Long, Long)] = {
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (u16(o).toLong) | (u16(o + 2).toLong << 16)
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    try {
      if (bytes == null || bytes.length < 44) return None
      if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var off = 12
      var rate = 0; var channels = 0; var bits = 0; var blockAlign = 0
      var dataSize = -1L
      var walking = true
      while (walking && off + 8 <= bytes.length &&
          (rate == 0 || dataSize < 0)) {
        val id = tag(off)
        val size = u32(off + 4)
        if (id == "fmt " && size >= 16) {
          channels = u16(off + 10)
          rate = u32(off + 12).toInt
          blockAlign = u16(off + 20)
          bits = u16(off + 22)
        } else if (id == "data") dataSize = size
        // advance in LONG space: `size` is u32, so an Int advance can be
        // zero or negative (size 0xFFFFFFF8 → `8 + size.toInt` = 0 = no
        // progress) and the walk would spin forever on crafted bytes —
        // the contract is "quarantine, never fail (or hang) the batch".
        // A chunk whose body runs past the buffer is the last chunk by
        // construction (truncated or lying header): stop walking; the
        // fields parsed so far still decide Some/None below.
        val adv = 8L + size + (size & 1L) // chunks are 2-aligned
        if (off + adv > bytes.length) walking = false
        else off += adv.toInt
      }
      if (rate <= 0 || blockAlign <= 0 || dataSize < 0) None
      else {
        val frames = dataSize / blockAlign
        Some(("wav", rate, channels, bits, frames,
          frames * 1000L / rate))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decode stage for audio blobs: fills meta from the REAL bytes via
    * [[decodeAudioMeta]] in one mapPartitions pass. Undecodable blobs
    * keep their claimed format and null fields.
    */
  def withAudioMeta(df: DataFrame, blobCol: String): DataFrame = {
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
            decodeAudioMeta(content) match {
              case Some((fmt, rate, ch, bits, frames, ms)) =>
                Row(content, Row(fmt, meta.getLong(1), rate, ch, bits,
                  frames, ms))
              case None => blob
            }
          }
        Row.fromSeq(r.toSeq.updated(blobIdx, out))
      }
    }(enc)
  }

  /** Deterministic in-memory WAV fixture: a real PCM RIFF/WAVE byte
    * stream (seeded sample data) — how specs and the driver query plant
    * decodable audio without fixture files; the decode proves itself by
    * recovering the planted rate/channels/frames.
    */
  def encodeWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nFrames: Int, seed: Long): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nFrames * blockAlign
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < dataSize) {
      out.put(scala.util.hashing.byteswap64(seed * 131 + i).toByte)
      i += 1
    }
    out.array()
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

  /** REAL perceptual image embedding, zero extra dependencies: full
    * ImageIO raster decode → per-cell integer-luma average over a
    * `gridW`×`gridH` grid. This is the pHash family's front half
    * (luminance downsample): near-identical images (re-encodes, small
    * edits) land near each other in cosine space, so the output plugs
    * straight into [[Dedup.embeddingPairs]] / [[Similarity]] top-k.
    *
    * Luma is integer BT.601 — `(299·R + 587·G + 114·B) / 1000` — whose
    * weights sum to exactly 1000, so a gray pixel (R=G=B=L) lumas to
    * EXACTLY `L` and a constant-luma cell averages to EXACTLY its
    * planted value: the property the `multimodal_embedding` oracle query
    * checks arithmetically. Cell pixel ranges are the integer split
    * `[c·w/grid, (c+1)·w/grid)` widened to at least one pixel, so images
    * smaller than the grid replicate pixels rather than divide by zero.
    * Returns None for undecodable bytes (quarantine contract, like the
    * metadata decodes).
    */
  def imageLumaGrid(bytes: Array[Byte], gridW: Int, gridH: Int)
      : Option[Array[Int]] = {
    require(gridW > 0 && gridH > 0, "grid dims must be positive")
    if (bytes == null || bytes.isEmpty) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      Some(Array.tabulate(gridH * gridW) { c =>
        val cx = c % gridW; val cy = c / gridW
        val x0 = cx * w / gridW
        val x1 = math.min(w, math.max(x0 + 1, (cx + 1) * w / gridW))
        val y0 = cy * h / gridH
        val y1 = math.min(h, math.max(y0 + 1, (cy + 1) * h / gridH))
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
              + 114 * (rgb & 0xff)) / 1000
            x += 1
          }
          y += 1
        }
        val n = (x1 - x0).toLong * (y1 - y0)
        ((sum + n / 2) / n).toInt // rounded mean; exact on constant cells
      })
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** [[imageLumaGrid]] normalized to `[0, 1]` floats — the embedding
    * vector consumed by the dedup/ANN operators.
    */
  def imageEmbedding(bytes: Array[Byte], gridW: Int, gridH: Int)
      : Option[Array[Float]] =
    imageLumaGrid(bytes, gridW, gridH).map(_.map(l => l / 255.0f))

  /** Embedding extraction over blob rows via mapPartitions — the
    * batch-UDF shape: one iterator pass per partition, output schema =
    * input + `embedding array<float>` (null when the bytes don't decode
    * — quarantine downstream, never fail the batch).
    */
  def withImageEmbedding(df: DataFrame, blobCol: String,
      gridW: Int, gridH: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("embedding", ArrayType(FloatType, containsNull = false)))
    val blobIdx = df.schema.fieldIndex(blobCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val blob = r.getStruct(blobIdx)
        val content = if (blob == null || blob.isNullAt(0)) null
          else blob.getAs[Array[Byte]](0)
        val emb = imageEmbedding(content, gridW, gridH)
          .map(_.toSeq).orNull
        Row.fromSeq(r.toSeq :+ emb)
      }
    }(enc)
  }

  /** Deterministic constant-cell image fixture: a `gridW`×`gridH` grid
    * of `cellPx`×`cellPx` gray cells, cell `c` at luma `lumas(c)` —
    * planted so [[imageLumaGrid]] at the same grid recovers EXACTLY
    * `lumas` (lossless containers: png/bmp). The oracle-side analog of
    * [[encodeImage]] for the embedding query.
    */
  def encodeCellImage(gridW: Int, gridH: Int, cellPx: Int,
      lumas: Array[Int], format: String): Array[Byte] = {
    require(lumas.length == gridW * gridH, "one luma per cell")
    val img = new java.awt.image.BufferedImage(gridW * cellPx,
      gridH * cellPx, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < gridH * cellPx) {
      var x = 0
      while (x < gridW * cellPx) {
        val l = lumas((y / cellPx) * gridW + x / cellPx) & 0xff
        img.setRGB(x, y, (l << 16) | (l << 8) | l)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, baos)
    baos.toByteArray
  }

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
