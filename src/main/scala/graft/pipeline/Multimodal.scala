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

  // ------------------------------------------- shared decode fast path

  /** Thread-cached ImageIO readers keyed by sniffed container format.
    * The registry path (`ImageIO.read` / `getImageReaders`) scans the
    * provider registry AND instantiates a fresh reader — with its
    * decode buffers — per call; on the video fingerprint hot path
    * (millions of tiny MJPEG frames per corpus pass) that constant
    * cost plus its allocation churn measured ~1.6-2× of the whole
    * decode under 32 concurrent tasks. Readers are NOT thread-safe, so
    * the cache is per thread (executor task threads are pooled and
    * reused, so each reader amortizes over every image the thread ever
    * decodes). A reader that throws is disposed and evicted — decoder
    * state after a failed decode is not trustworthy for reuse.
    */
  private val readerCache = ThreadLocal.withInitial(
    () => new java.util.HashMap[String, javax.imageio.ImageReader]())

  /** Container sniff by magic bytes for the four formats this module
    * documents (png/jpeg/gif/bmp) — exactly the containers the JDK
    * registry would route these bytes to, so the cached-reader path
    * decodes byte-identically to the registry path. Anything else
    * (including too-short buffers) returns null and takes the registry
    * fallback.
    */
  private def sniffFormat(bytes: Array[Byte], off: Int, len: Int): String = {
    if (len >= 2 && (bytes(off) & 0xff) == 0xff &&
      (bytes(off + 1) & 0xff) == 0xd8) "jpeg"
    else if (len >= 8 && (bytes(off) & 0xff) == 0x89 &&
      bytes(off + 1) == 'P' && bytes(off + 2) == 'N' &&
      bytes(off + 3) == 'G') "png"
    else if (len >= 2 && bytes(off) == 'B' && bytes(off + 1) == 'M') "bmp"
    else if (len >= 6 && bytes(off) == 'G' && bytes(off + 1) == 'I' &&
      bytes(off + 2) == 'F' && bytes(off + 3) == '8') "gif"
    else null
  }

  /** The cached reader for a sniffed format (instantiated once per
    * thread per format via the same SPI the registry path uses). None
    * when no reader is installed — the caller falls back to the
    * registry path.
    */
  private def cachedReader(fmt: String)
      : Option[javax.imageio.ImageReader] = {
    val cache = readerCache.get()
    val hit = cache.get(fmt)
    if (hit != null) Some(hit)
    else {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
      if (!it.hasNext) None
      else { val r = it.next(); cache.put(fmt, r); Some(r) }
    }
  }

  private def evictReader(fmt: String,
      r: javax.imageio.ImageReader): Unit = {
    readerCache.get().remove(fmt)
    try r.dispose() catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Full-raster decode of `bytes[off, off+len)` through the cached
    * reader when the container sniffs as png/jpeg/gif/bmp, the plain
    * registry path otherwise — the shared front end of
    * [[imageLumaGrid]] and [[imageLumaSum]]. Returns null for bytes no
    * reader can decode; decode EXCEPTIONS propagate (callers' quarantine
    * catch turns them into None, exactly as the registry path did).
    */
  private def readImage(bytes: Array[Byte], off: Int,
      len: Int): java.awt.image.BufferedImage = {
    val fmt = sniffFormat(bytes, off, len)
    val fallback = () => javax.imageio.ImageIO.read(
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes, off, len)))
    if (fmt == null) fallback()
    else cachedReader(fmt) match {
      case None => fallback()
      case Some(r) =>
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes, off, len))
        try r.setInput(iis, true, true)
        catch { case e: Throwable => iis.close(); evictReader(fmt, r); throw e }
        try r.read(0)
        catch { case e: Throwable => evictReader(fmt, r); throw e }
        finally iis.close()
    }
  }

  /** REAL image header decode via the JDK's ImageIO: sniffs the container
    * (png/jpeg/gif/bmp), reads width/height from the header WITHOUT
    * decoding the raster — the right cost profile for a metadata pass
    * over 100 TB of blobs. Returns None for bytes no installed reader
    * recognizes (corrupt, truncated, or non-image). The four documented
    * containers take the cached-reader fast path (same SPI, same
    * header parse — identical results); anything else pays the registry
    * scan it always did.
    */
  def decodeImageMeta(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    if (bytes == null || bytes.isEmpty) return None
    val sniffed = sniffFormat(bytes, 0, bytes.length)
    val cached = if (sniffed == null) None else cachedReader(sniffed)
    cached match {
      case Some(r) =>
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          r.setInput(iis, true, true)
          // Locale.ROOT: under a Turkish default locale "GIF" lowercases
          // to a dotless-i "gıf", breaking format equality checks
          Some((r.getFormatName.toLowerCase(java.util.Locale.ROOT),
            r.getWidth(0), r.getHeight(0)))
        } catch {
          case scala.util.control.NonFatal(_) =>
            evictReader(sniffed, r); None
        } finally iis.close()
      case None =>
        // explicit memory-cache stream: ImageIO.createImageInputStream
        // defaults to a DISK-backed cache file per image — a silent
        // temp-file write per blob, ruinous at scale for bytes already
        // in memory
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis, true, true)
              Some((r.getFormatName.toLowerCase(java.util.Locale.ROOT),
                r.getWidth(0), r.getHeight(0)))
            } catch {
              // ImageIO readers throw unchecked exceptions on crafted
              // headers (IllegalArgument, IndexOutOfBounds) — the
              // contract is "quarantine downstream, never fail the
              // batch", so any non-fatal decode failure is a None
              case scala.util.control.NonFatal(_) => None
            } finally r.dispose()
          }
        } finally iis.close()
    }
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

  /** Deterministic constant-window WAV fixture: 16-bit mono PCM where
    * every sample of time-window `w` (of 64) holds `amps(w)` — planted
    * so [[audioFingerprint64]]'s window energies are EXACTLY
    * `framesPerWindow * amps(w)` and an arithmetic oracle replays every
    * bit. The audio analog of [[encodeCellImage]].
    */
  def encodeWindowWav(framesPerWindow: Int, amps: Array[Int],
      sampleRate: Int = 8000): Array[Byte] = {
    require(amps.length == 64, "one amplitude per window")
    val n = framesPerWindow * 64
    val dataSize = n * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < n) {
      out.putShort(amps(i / framesPerWindow).toShort)
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
    writeImageBytes(img, format)
  }

  /** Encode a BufferedImage to bytes through a MEMORY-cached output
    * stream: the plain-OutputStream `ImageIO.write` overload otherwise
    * buffers through a FileCacheImageOutputStream — one temp file per
    * encoded image (same tmpdir coupling as the decode side).
    */
  private def writeImageBytes(img: java.awt.image.BufferedImage,
      format: String): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try javax.imageio.ImageIO.write(img, format, ios)
    finally ios.close() // flushes the cache into baos
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
      // memory-cached stream + thread-cached reader ([[readImage]]):
      // the plain-InputStream ImageIO.read overload wraps its input in
      // a FileCacheImageInputStream by default — a temp file CREATED
      // AND DELETED PER IMAGE on the decode hot path, which couples
      // decode throughput to tmpdir writeback pressure (measured 3×
      // swings on a loaded disk); executors decoding millions of blobs
      // must stay off the filesystem entirely
      val img = readImage(bytes, 0, bytes.length)
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      // one bulk getRGB per cell: identical ARGB conversion to a
      // per-pixel loop, without W*H ColorModel calls on the decode hot
      // path; the buffer is allocated once and reused across cells so
      // the bulk read adds no per-image garbage beyond one cell
      var buf: Array[Int] = null
      Some(Array.tabulate(gridH * gridW) { c =>
        val cx = c % gridW; val cy = c / gridW
        val x0 = cx * w / gridW
        val x1 = math.min(w, math.max(x0 + 1, (cx + 1) * w / gridW))
        val y0 = cy * h / gridH
        val y1 = math.min(h, math.max(y0 + 1, (cy + 1) * h / gridH))
        val cw = x1 - x0
        val n = cw * (y1 - y0)
        if (buf == null || buf.length < n) buf = new Array[Int](n)
        img.getRGB(x0, y0, cw, y1 - y0, buf, 0, cw)
        var sum = 0L
        var i = 0
        while (i < n) {
          val rgb = buf(i)
          sum += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
            + 114 * (rgb & 0xff)) / 1000
          i += 1
        }
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

  /** 64-bit perceptual IMAGE fingerprint: the 8×8 luminance grid with
    * bit `c` set iff cell `c`'s luma exceeds the image's mean luma —
    * the aHash shape of the published perceptual-hash family. The
    * threshold rule is INTEGER (`luma * 64 > total`): no float mean, so
    * an arithmetic oracle can replay every bit exactly. Because the
    * grid averages over the full raster, the fingerprint is invariant
    * to lossless re-encoding, container changes, and resizing (cell
    * boundaries land on the same image fractions), and it moves only a
    * few bits under small local edits — which is what lets the SimHash
    * block machinery ([[graft.pipeline.Dedup.fingerprintCandidatePairs]])
    * band it for near-dup candidate generation at corpus scale.
    */
  def imageFingerprint64(bytes: Array[Byte]): Option[Long] =
    imageLumaGrid(bytes, 8, 8).map { lumas =>
      var total = 0L
      var i = 0
      while (i < 64) { total += lumas(i); i += 1 }
      var fp = 0L
      i = 0
      while (i < 64) {
        if (lumas(i).toLong * 64 > total) fp |= (1L << i)
        i += 1
      }
      fp
    }

  /** `(id, sh)` fingerprint frame over blob rows — the
    * [[graft.pipeline.Dedup.fingerprintCandidatePairs]] input shape.
    * Rows whose bytes don't decode are DROPPED here (an undecodable
    * image can match nothing; quarantine is the ingest stage's job).
    */
  def imageFingerprintDf(df: DataFrame, idCol: String,
      blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val blobIdx = df.schema.fieldIndex(blobCol)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val blob = r.getStruct(blobIdx)
        val content = if (blob == null || blob.isNullAt(0)) null
          else blob.getAs[Array[Byte]](0)
        imageFingerprint64(content).map(fp => (r.getLong(idIdx), fp))
      }
    }.toDF("id", "sh")
  }

  /** Re-encode / resize-robust image near-duplicate pairs: perceptual
    * fingerprints ([[imageFingerprint64]]) banded through the SimHash
    * block join — `(id_a, id_b, hamming)` for every pair within
    * `maxHamming`. The default point (blocks=8, probeBits=1) carries
    * the pigeonhole guarantee for every pair within Hamming 15, so
    * `maxHamming` ≤ 15 keeps the candidate bound derivation exact; the
    * bucket cap defaults OFF (unconditional recall — image corpora
    * concentrate on flat-image fingerprints like all-zero bits, pass a
    * cap explicitly when that skew dominates a corpus).
    */
  def imageDedupPairs(blobs: DataFrame, idCol: String, blobCol: String,
      maxHamming: Int = 8, blocks: Int = 8, probeBits: Int = 1,
      maxBucketSize: Int = Int.MaxValue,
      scope: graft.pipeline.CacheScope =
        graft.pipeline.CacheScope.session): DataFrame = {
    require(maxHamming <=
      graft.pipeline.Dedup.guaranteedRadius(blocks, probeBits),
      s"maxHamming $maxHamming exceeds the guaranteed radius " +
        s"${graft.pipeline.Dedup.guaranteedRadius(blocks, probeBits)} " +
        s"of blocks=$blocks/probeBits=$probeBits — pairs past it would " +
        "be silently incomplete; raise blocks/probeBits or lower the " +
        "threshold")
    graft.pipeline.Dedup.fingerprintCandidatePairs(
      imageFingerprintDf(blobs, idCol, blobCol), blocks, maxHamming,
      maxBucketSize, probeBits, scope)
  }

  /** Persist an image-fingerprint index: the corpus's 64-bit perceptual
    * fingerprints ([[imageFingerprint64]] — 8 bytes/image) as parquet
    * plus a params sidecar storing the banding operating point
    * (blocks/probeBits) and corpus size — the other dedup families'
    * index discipline. The DECODE runs once at build; every later
    * batch probe scans fingerprints only.
    */
  def writeImageIndex(blobs: DataFrame, idCol: String, blobCol: String,
      path: String, blocks: Int = 8, probeBits: Int = 1): Unit = {
    val spark = blobs.sparkSession
    import spark.implicits._
    require(blocks >= 2 && 64 % blocks == 0, "blocks must divide 64")
    require(probeBits == 0 || probeBits == 1, "probeBits must be 0 or 1")
    val fp = imageFingerprintDf(blobs, idCol, blobCol)
    fp.write.mode("overwrite").parquet(s"$path/fingerprints")
    val n = spark.read.parquet(s"$path/fingerprints").count()
    Seq((blocks, probeBits, n))
      .toDF("blocks", "probeBits", "nImages")
      .coalesce(1).write.mode("overwrite").json(s"$path/params")
  }

  /** Incremental image near-dup pairs of a NEW batch of blobs against a
    * [[writeImageIndex]] corpus — the `*PairsFromIndex` shape for the
    * image family: batch decodes + fingerprints, corpus side is the
    * 8-byte-per-image fingerprint scan, multi-probe expansion on the
    * BATCH side only (cost scales with |batch|). Emits
    * `(id_a, id_b, hamming <= maxHamming)`, batch id first for
    * batch-vs-corpus, `a < b` batch-internal; `maxHamming` past the
    * stored point's guaranteed radius is refused (silently incomplete
    * pairs otherwise).
    */
  def imageDedupPairsFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, idCol: String, blobCol: String,
      maxHamming: Int = 8, maxBucketSize: Int = Int.MaxValue,
      scope: graft.pipeline.CacheScope =
        graft.pipeline.CacheScope.session): DataFrame =
    imageDedupPairsFromLoaded(loadFingerprintIndex(spark, path), batch,
      idCol, blobCol, maxHamming, maxBucketSize, scope)

  /** Fixed per-index state of a 64-bit fingerprint probe: the stored
    * banding point plus the tombstone-reduced corpus fingerprint frame.
    * A serving stream loads this ONCE at stream construction instead of
    * paying the params read + index frame setup per micro-batch
    * (the kmeans-model discipline); fold/rebuild the index → reload.
    * Shared by the image/audio/video families ([[LoadedFpIndexWide]]
    * is the 256-bit analog).
    */
  final case class LoadedFpIndex(blocks: Int, probeBits: Int,
    corpus: DataFrame)

  /** 256-bit analog of [[LoadedFpIndex]]. */
  final case class LoadedFpIndexWide(words: Int, blocks: Int,
    probeBits: Int, corpus: DataFrame)

  def loadFingerprintIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): LoadedFpIndex = {
    val params = spark.read.json(s"$path/params").head()
    LoadedFpIndex(params.getAs[Long]("blocks").toInt,
      params.getAs[Long]("probeBits").toInt,
      graft.pipeline.Dedup.dropTombstoned(spark, path,
        spark.read.parquet(s"$path/fingerprints"), "id"))
  }

  def loadFingerprintIndexWide(spark: org.apache.spark.sql.SparkSession,
      path: String): LoadedFpIndexWide = {
    val params = spark.read.json(s"$path/params").head()
    LoadedFpIndexWide(params.getAs[Long]("words").toInt,
      params.getAs[Long]("blocks").toInt,
      params.getAs[Long]("probeBits").toInt,
      graft.pipeline.Dedup.dropTombstoned(spark, path,
        spark.read.parquet(s"$path/fingerprints"), "id"))
  }

  /** The incremental probe shared by every loaded-handle member: batch
    * fingerprints vs the handle's corpus frame at the stored banding
    * point — identical output to the path-taking `*FromIndex` variants.
    */
  private def pairsFromLoadedCore(ix: LoadedFpIndex, batchFp: DataFrame,
      maxHamming: Int, maxBucketSize: Int,
      scope: graft.pipeline.CacheScope): DataFrame = {
    val sc = graft.pipeline.CacheScope.resolve(scope,
      batchFp.sparkSession)
    requireRadius(maxHamming, ix.blocks, ix.probeBits, stored = true)
    val sh = graft.pipeline.Dedup.spread(batchFp)
      .withColumn("new", lit(true))
      .union(ix.corpus.withColumn("new", lit(false)))
    graft.pipeline.Dedup.fingerprintIncrementalCandidates(sh, ix.blocks,
      maxHamming, maxBucketSize, ix.probeBits, sc)
  }

  private def pairsFromLoadedCoreWide(ix: LoadedFpIndexWide,
      batchFp: DataFrame, maxHamming: Int, maxBucketSize: Int,
      scope: graft.pipeline.CacheScope): DataFrame = {
    val sc = graft.pipeline.CacheScope.resolve(scope,
      batchFp.sparkSession)
    requireRadius(maxHamming, ix.blocks, ix.probeBits, stored = true)
    val sh = graft.pipeline.Dedup.spread(batchFp)
      .withColumn("new", lit(true))
      .union(ix.corpus.withColumn("new", lit(false)))
    graft.pipeline.Dedup.fingerprintIncrementalCandidatesWide(sh,
      ix.words, ix.blocks, maxHamming, maxBucketSize, ix.probeBits, sc)
  }

  /** [[imageDedupPairsFromIndex]] against a pre-loaded handle. */
  def imageDedupPairsFromLoaded(ix: LoadedFpIndex, batch: DataFrame,
      idCol: String, blobCol: String, maxHamming: Int = 8,
      maxBucketSize: Int = Int.MaxValue,
      scope: graft.pipeline.CacheScope =
        graft.pipeline.CacheScope.session): DataFrame =
    pairsFromLoadedCore(ix, imageFingerprintDf(batch, idCol, blobCol),
      maxHamming, maxBucketSize, scope)

  // --------------------------------------------- wide (256-bit) images

  /** 256-bit WIDE perceptual IMAGE fingerprint: the 16×16 luminance
    * grid with bit `c` set iff cell `c`'s luma exceeds the image's mean
    * (`luma * 256 > total` — the same integer rule as
    * [[imageFingerprint64]], so an arithmetic oracle replays every
    * bit), packed little-endian into 4 longs (bit `c` → word `c/64`,
    * position `c%64`). This is the SCALE tier of the image family: at
    * 16×16-bit bands the per-band bucket space is 2^16, so banding
    * stays selective past the ~10⁶-image point where the 64-bit
    * family's 2^8 buckets saturate and candidates grow ~n²/2048
    * (measured 41.7× wall on 10× data at sf1). Same invariances
    * (re-encode, resize, container) — the grid still averages over
    * full-raster fractions.
    */
  def imageFingerprintWide(bytes: Array[Byte]): Option[Array[Long]] =
    imageLumaGrid(bytes, 16, 16).map { lumas =>
      var total = 0L
      var i = 0
      while (i < 256) { total += lumas(i); i += 1 }
      val fp = new Array[Long](4)
      i = 0
      while (i < 256) {
        if (lumas(i).toLong * 256 > total) fp(i / 64) |= (1L << (i % 64))
        i += 1
      }
      fp
    }

  /** `(id, sh array<long>)` wide-fingerprint frame over blob rows —
    * the [[graft.pipeline.Dedup.fingerprintCandidatePairsWide]] input
    * shape; undecodable blobs drop (quarantine is ingest's job).
    */
  def imageFingerprintWideDf(df: DataFrame, idCol: String,
      blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val blobIdx = df.schema.fieldIndex(blobCol)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val blob = r.getStruct(blobIdx)
        val content = if (blob == null || blob.isNullAt(0)) null
          else blob.getAs[Array[Byte]](0)
        imageFingerprintWide(content)
          .map(fp => (r.getLong(idIdx), fp.toSeq))
      }
    }.toDF("id", "sh")
  }

  /** [[imageDedupPairsWide]]'s radius guard, shared with the index and
    * stream variants.
    */
  private def requireRadius(maxHamming: Int, blocks: Int,
      probeBits: Int, stored: Boolean): Unit =
    require(maxHamming <=
      graft.pipeline.Dedup.guaranteedRadius(blocks, probeBits),
      s"maxHamming $maxHamming exceeds the guaranteed radius " +
        s"${graft.pipeline.Dedup.guaranteedRadius(blocks, probeBits)} " +
        s"of blocks=$blocks/probeBits=$probeBits" +
        (if (stored) " (the index's stored point) — rebuild with more " +
          "probing or lower the threshold"
         else " — pairs past it would be silently incomplete; raise " +
          "blocks/probeBits or lower the threshold"))

  /** Re-encode / resize-robust image near-duplicate pairs on the WIDE
    * (256-bit) fingerprint — [[imageDedupPairs]]'s contract at the
    * scale operating point: 16 bands of 16 bits carry the pigeonhole
    * guarantee to Hamming 15 with NO multi-probe (half the probe rows
    * of the 64-bit default), and the 2^16 bucket space keeps the
    * candidate join ~linear where the 64-bit family went quadratic.
    */
  def imageDedupPairsWide(blobs: DataFrame, idCol: String,
      blobCol: String, maxHamming: Int = 8, blocks: Int = 16,
      probeBits: Int = 0, maxBucketSize: Int = Int.MaxValue,
      scope: graft.pipeline.CacheScope =
        graft.pipeline.CacheScope.session): DataFrame = {
    requireRadius(maxHamming, blocks, probeBits, stored = false)
    graft.pipeline.Dedup.fingerprintCandidatePairsWide(
      imageFingerprintWideDf(blobs, idCol, blobCol), 4, blocks,
      maxHamming, maxBucketSize, probeBits, scope)
  }

  /** Persist a WIDE image-fingerprint index (32 bytes/image) — the
    * [[writeImageIndex]] discipline at the 256-bit operating point.
    */
  def writeImageIndexWide(blobs: DataFrame, idCol: String,
      blobCol: String, path: String, blocks: Int = 16,
      probeBits: Int = 0): Unit = {
    val spark = blobs.sparkSession
    import spark.implicits._
    require(blocks >= 2 && 256 % blocks == 0 && 256 / blocks <= 64 &&
      64 % (256 / blocks) == 0,
      "blocks must divide 256 with bands of at most 64 bits that do " +
        "not straddle words (blocks >= 4, power-of-two band widths)")
    require(probeBits == 0 || probeBits == 1, "probeBits must be 0 or 1")
    imageFingerprintWideDf(blobs, idCol, blobCol)
      .write.mode("overwrite").parquet(s"$path/fingerprints")
    val n = spark.read.parquet(s"$path/fingerprints").count()
    Seq((4, blocks, probeBits, n))
      .toDF("words", "blocks", "probeBits", "nImages")
      .coalesce(1).write.mode("overwrite").json(s"$path/params")
  }

  /** Incremental WIDE image near-dup against a [[writeImageIndexWide]]
    * corpus — batch decodes + fingerprints, corpus side is the
    * 32-byte-per-image scan (tombstone-aware), probing on the batch
    * side only.
    */
  def imageDedupPairsWideFromIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, idCol: String, blobCol: String,
      maxHamming: Int = 8, maxBucketSize: Int = Int.MaxValue,
      scope: graft.pipeline.CacheScope =
        graft.pipeline.CacheScope.session): DataFrame =
    imageDedupPairsWideFromLoaded(loadFingerprintIndexWide(spark, path),
      batch, idCol, blobCol, maxHamming, maxBucketSize, scope)

  /** [[imageDedupPairsWideFromIndex]] against a pre-loaded handle. */
  def imageDedupPairsWideFromLoaded(ix: LoadedFpIndexWide,
      batch: DataFrame, idCol: String, blobCol: String,
      maxHamming: Int = 8, maxBucketSize: Int = Int.MaxValue,
      scope: graft.pipeline.CacheScope =
        graft.pipeline.CacheScope.session): DataFrame =
    pairsFromLoadedCoreWide(ix,
      imageFingerprintWideDf(batch, idCol, blobCol), maxHamming,
      maxBucketSize, scope)

  /** 64-bit perceptual AUDIO fingerprint: the time-domain analog of
    * [[imageFingerprint64]] — 64 equal time windows over the decoded
    * 16-bit PCM stream, bit `w` set iff window `w`'s mean absolute
    * amplitude exceeds the clip's mean (energy envelope aHash). The
    * rule is pure integer cross-multiplication
    * (`energy_w * nFrames > total * frames_w`, BigInt compare — exact
    * at any clip length), so an arithmetic oracle replays every bit.
    * Invariances, all EXACT under the integer rule: volume scaling
    * that scales samples exactly (both sides of the comparison scale
    * together), container rewrites, and uniform resampling that
    * preserves window time-fractions; local edits move only their
    * windows' bits — which lets the SimHash block machinery band it.
    * Returns None for non-PCM/non-16-bit/shorter-than-64-frame clips
    * (too short to carry an envelope).
    */
  def audioFingerprint64(bytes: Array[Byte]): Option[Long] = {
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def i16(o: Int): Int = u16(o).toShort.toInt
    def u32(o: Int): Long = u16(o).toLong | (u16(o + 2).toLong << 16)
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    try {
      if (bytes == null || bytes.length < 44) return None
      if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var off = 12
      var fmt = 0; var channels = 0; var bits = 0; var blockAlign = 0
      var dataOff = -1; var dataSize = -1L
      var walking = true
      while (walking && off + 8 <= bytes.length &&
          (fmt == 0 || dataOff < 0)) {
        val id = tag(off)
        val size = u32(off + 4)
        if (id == "fmt " && size >= 16) {
          fmt = u16(off + 8)
          channels = u16(off + 10)
          blockAlign = u16(off + 20)
          bits = u16(off + 22)
        } else if (id == "data") { dataOff = off + 8; dataSize = size }
        val adv = 8L + size + (size & 1L) // strict progress, Long space
        if (off + adv > bytes.length) walking = false
        else off += adv.toInt
      }
      if (fmt != 1 || bits != 16 || channels <= 0 || blockAlign <= 0 ||
        dataOff < 0) return None
      val usable = math.min(dataSize, (bytes.length - dataOff).toLong)
      val n = (usable / blockAlign).toInt
      if (n < 64) return None
      val energy = new Array[Long](64)
      var w = 0
      while (w < 64) {
        val start = (w.toLong * n / 64).toInt
        val end = ((w + 1).toLong * n / 64).toInt
        var i = start
        var e = 0L
        while (i < end) {
          var c = 0
          val base = dataOff + i * blockAlign
          while (c < channels) {
            e += math.abs(i16(base + 2 * c))
            c += 1
          }
          i += 1
        }
        energy(w) = e
        w += 1
      }
      var total = 0L
      w = 0
      while (w < 64) { total += energy(w); w += 1 }
      var fp = 0L
      w = 0
      while (w < 64) {
        val fw = ((w + 1).toLong * n / 64) - (w.toLong * n / 64)
        if (BigInt(energy(w)) * n > BigInt(total) * fw) fp |= (1L << w)
        w += 1
      }
      Some(fp)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** `(id, sh)` audio-fingerprint frame over blob rows — the banding
    * input shape; undecodable blobs drop (quarantine is ingest's job).
    */
  def audioFingerprintDf(df: DataFrame, idCol: String,
      blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val blobIdx = df.schema.fieldIndex(blobCol)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val blob = r.getStruct(blobIdx)
        val content = if (blob == null || blob.isNullAt(0)) null
          else blob.getAs[Array[Byte]](0)
        audioFingerprint64(content).map(fp => (r.getLong(idIdx), fp))
      }
    }.toDF("id", "sh")
  }

  /** Volume-/container-robust audio near-duplicate pairs — the
    * [[imageDedupPairs]] contract over [[audioFingerprint64]]:
    * `(id_a, id_b, hamming)` within `maxHamming`, complete by the same
    * blocks/probeBits pigeonhole derivation.
    */
  def audioDedupPairs(blobs: DataFrame, idCol: String, blobCol: String,
      maxHamming: Int = 8, blocks: Int = 8, probeBits: Int = 1,
      maxBucketSize: Int = Int.MaxValue,
      scope: graft.pipeline.CacheScope =
        graft.pipeline.CacheScope.session): DataFrame = {
    require(maxHamming <=
      graft.pipeline.Dedup.guaranteedRadius(blocks, probeBits),
      s"maxHamming $maxHamming exceeds the guaranteed radius " +
        s"${graft.pipeline.Dedup.guaranteedRadius(blocks, probeBits)} " +
        s"of blocks=$blocks/probeBits=$probeBits — pairs past it would " +
        "be silently incomplete; raise blocks/probeBits or lower the " +
        "threshold")
    graft.pipeline.Dedup.fingerprintCandidatePairs(
      audioFingerprintDf(blobs, idCol, blobCol), blocks, maxHamming,
      maxBucketSize, probeBits, scope)
  }

  /** Persist an audio-fingerprint index — [[writeImageIndex]]'s
    * discipline for the audio family: decode once at build, probe at
    * 8 bytes/clip.
    */
  def writeAudioIndex(blobs: DataFrame, idCol: String, blobCol: String,
      path: String, blocks: Int = 8, probeBits: Int = 1): Unit = {
    val spark = blobs.sparkSession
    import spark.implicits._
    require(blocks >= 2 && 64 % blocks == 0, "blocks must divide 64")
    require(probeBits == 0 || probeBits == 1, "probeBits must be 0 or 1")
    audioFingerprintDf(blobs, idCol, blobCol)
      .write.mode("overwrite").parquet(s"$path/fingerprints")
    val n = spark.read.parquet(s"$path/fingerprints").count()
    Seq((blocks, probeBits, n))
      .toDF("blocks", "probeBits", "nClips")
      .coalesce(1).write.mode("overwrite").json(s"$path/params")
  }

  /** Incremental audio near-dup against a persisted [[writeAudioIndex]]
    * — batch decodes + fingerprints, corpus side is the 8-byte scan
    * (tombstone-aware), multi-probe on the batch side only.
    */
  def audioDedupPairsFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, idCol: String, blobCol: String,
      maxHamming: Int = 8, maxBucketSize: Int = Int.MaxValue,
      scope: graft.pipeline.CacheScope =
        graft.pipeline.CacheScope.session): DataFrame =
    audioDedupPairsFromLoaded(loadFingerprintIndex(spark, path), batch,
      idCol, blobCol, maxHamming, maxBucketSize, scope)

  /** [[audioDedupPairsFromIndex]] against a pre-loaded handle. */
  def audioDedupPairsFromLoaded(ix: LoadedFpIndex, batch: DataFrame,
      idCol: String, blobCol: String, maxHamming: Int = 8,
      maxBucketSize: Int = Int.MaxValue,
      scope: graft.pipeline.CacheScope =
        graft.pipeline.CacheScope.session): DataFrame =
    pairsFromLoadedCore(ix, audioFingerprintDf(batch, idCol, blobCol),
      maxHamming, maxBucketSize, scope)

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
    writeImageBytes(img, format)
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
    * frame-sampling stage over an opaque blob; prefer
    * [[frameSampleIndices]] once [[withVideoMeta]] has recovered the real
    * frame count).
    */
  def framePositions(blob: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => (blob.getField("meta").getField("n_bytes") * i / n)
        .cast(LongType))

  // ------------------------------------------------------------- video

  /** Video blob schema: content + typed video metadata (the video analog
    * of [[audioBlobSchema]]).
    */
  val videoBlobSchema: StructType = StructType(Seq(
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("timescale", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("n_frames", LongType, nullable = true))),
      nullable = false)))

  /** Wrap a source column into a video blob struct (metadata unknown
    * until [[withVideoMeta]] parses the actual bytes).
    */
  def asVideoBlob(content: Column, format: String): Column = {
    val bytes = content.cast(BinaryType)
    struct(
      bytes.as("content"),
      struct(
        lit(format).as("format"),
        length(bytes).cast(LongType).as("n_bytes"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(IntegerType).as("timescale"),
        lit(null).cast(LongType).as("duration_ms"),
        lit(null).cast(LongType).as("n_frames")).as("meta"))
  }

  /** REAL video header decode: a zero-dependency ISO-BMFF (MP4/MOV) box
    * walk recovering the major brand, movie timescale + duration
    * (`moov/mvhd`), the first video track's pixel dimensions
    * (`trak/tkhd`, 16.16 fixed point) and its sample count
    * (`trak/mdia/minf/stbl/stsz`) WITHOUT touching sample data — the
    * video analog of [[decodeAudioMeta]]'s header-only cost profile.
    * Box sizes are u32 (or u64 `largesize`) handled in Long space with a
    * strict-progress guard, same as the WAV chunk walk: crafted sizes
    * stop the walk, they never spin it. Returns None for anything that
    * is not a parsable BMFF container with an `mvhd` (quarantine
    * downstream, never fail the batch).
    */
  def decodeVideoMeta(bytes: Array[Byte])
      : Option[(String, Int, Int, Int, Long, Long)] = {
    if (bytes == null || bytes.length < 16) return None
    def u16(o: Long): Int =
      ((bytes(o.toInt) & 0xff) << 8) | (bytes(o.toInt + 1) & 0xff)
    def u32(o: Long): Long = (u16(o).toLong << 16) | u16(o + 2)
    def u64(o: Long): Long = (u32(o) << 32) | u32(o + 4)
    def tag(o: Long): String = new String(bytes, o.toInt, 4, "US-ASCII")
    var brand: String = null
    var timescale = 0L; var duration = -1L
    var w = 0; var h = 0; var frames = -1L
    // per-trak state: dims and sample count bind only if the SAME trak
    // supplied both (the first trak with nonzero pixel dims wins)
    var trakW = 0; var trakH = 0; var trakFrames = -1L
    try {
      def walk(start: Long, limit: Long, depth: Int): Unit = {
        if (depth > 6) return
        var off = start
        while (off + 8 <= limit) {
          var size = u32(off)
          var hdr = 8L
          if (size == 1L) { // 64-bit largesize
            if (off + 16 > limit) return
            size = u64(off + 8); hdr = 16L
          } else if (size == 0L) size = limit - off // box runs to limit
          // malformed (header doesn't fit its own size) or lying
          // (runs past the buffer): stop this level — strict progress
          if (size < hdr || size > limit - off) return
          val id = tag(off + 4)
          val body = off + hdr
          id match {
            case "ftyp" if size >= hdr + 4 => brand = tag(body)
            case "mvhd" if size >= hdr + 4 =>
              val v = bytes(body.toInt) & 0xff
              if (v == 1 && size >= hdr + 32) {
                timescale = u32(body + 20); duration = u64(body + 24)
              } else if (v == 0 && size >= hdr + 20) {
                timescale = u32(body + 12); duration = u32(body + 16)
              }
            case "tkhd" if size >= hdr + 4 =>
              val v = bytes(body.toInt) & 0xff
              // width/height: 16.16 fixed point at the end of the box
              // (after fullbox + times/ids + layer block + matrix)
              val wOff = if (v == 1) body + 88 else body + 76
              if (size >= (wOff - off) + 8) {
                trakW = (u32(wOff) >> 16).toInt
                trakH = (u32(wOff + 4) >> 16).toInt
              }
            case "stsz" if size >= hdr + 12 =>
              trakFrames = u32(body + 8)
            case "trak" =>
              trakW = 0; trakH = 0; trakFrames = -1L
              walk(body, off + size, depth + 1)
              if (w == 0 && trakW > 0 && trakH > 0) {
                w = trakW; h = trakH; frames = trakFrames
              }
            case "moov" | "mdia" | "minf" | "stbl" =>
              walk(body, off + size, depth + 1)
            case _ => () // skip unknown/leaf boxes (mdat, free, hdlr, …)
          }
          off += size
        }
      }
      walk(0L, bytes.length.toLong, 0)
      // numeric sanity is part of the quarantine contract: a u32
      // timescale above Int.MaxValue would wrap negative on the .toInt,
      // and a near-2^64 duration would overflow the *1000 — both are
      // corrupt/crafted headers and must yield None, not well-typed
      // garbage metadata
      if (brand == null || timescale <= 0 || timescale > Int.MaxValue ||
          duration < 0 || duration > Long.MaxValue / 1000L) None
      else Some((brand.trim, w, h, timescale.toInt,
        duration * 1000L / timescale, frames))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decode stage for video blobs: fills meta from the REAL bytes via
    * [[decodeVideoMeta]] in one mapPartitions pass. Undecodable blobs
    * keep their claimed format and null fields.
    */
  def withVideoMeta(df: DataFrame, blobCol: String): DataFrame = {
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
            decodeVideoMeta(content) match {
              case Some((fmt, w, h, ts, ms, frames)) =>
                Row(content, Row(fmt, meta.getLong(1),
                  if (w > 0) w else null, if (h > 0) h else null,
                  ts, ms, if (frames >= 0) frames else null))
              case None => blob
            }
          }
        Row.fromSeq(r.toSeq.updated(blobIdx, out))
      }
    }(enc)
  }

  /** Deterministic frame-sample indices from DECODED metadata: `n` frame
    * numbers evenly spaced in `[0, n_frames)` — the real frame-sampling
    * plan stage ([[framePositions]]' byte-offset heuristic replaced by
    * the actual sample count [[withVideoMeta]] recovered). Null
    * `n_frames` (undecodable blob) yields null — quarantine downstream.
    */
  def frameSampleIndices(blob: Column, n: Int): Column = {
    val frames = blob.getField("meta").getField("n_frames")
    when(frames.isNotNull,
      transform(sequence(lit(0), lit(n - 1)),
        i => (frames * i / n).cast(LongType)))
  }

  /** Deterministic in-memory MP4 fixture: a real ISO-BMFF byte stream —
    * ftyp + a `free` box (walk must skip it) + moov{mvhd,
    * trak{tkhd, mdia{mdhd, minf{stbl{stsz}}}}} + a tiny mdat — with the
    * planted timescale/duration/dims/frame-count [[decodeVideoMeta]]
    * must recover exactly. The video analog of [[encodeWav]].
    */
  def encodeMp4(timescale: Int, durationTicks: Long, width: Int,
      height: Int, nFrames: Int, brand: String = "isom",
      mdatPayload: Array[Byte] = Array.emptyByteArray,
      sampleSizes: Array[Int] = Array.empty): Array[Byte] = {
    require(brand.length == 4, "brand is a 4cc")
    require(sampleSizes.isEmpty || sampleSizes.length == nFrames,
      "sampleSizes must be empty or one entry per frame")
    // a real per-sample size table (stsz sample_size=0 + table) makes
    // the mdat sliceable into frames — the MJPEG-in-MP4 layout the
    // decoded-fingerprint path reads
    val ex = 4 * sampleSizes.length
    val mdatLen = if (mdatPayload.isEmpty) 16 else 8 + mdatPayload.length
    val out = java.nio.ByteBuffer
      .allocate(16 + 8 + 292 + ex + mdatLen) // BE default
    def box(size: Int, id: String): Unit =
      { out.putInt(size); out.put(id.getBytes("US-ASCII")); () }
    def full(size: Int, id: String, version: Int): Unit =
      { box(size, id); out.putInt(version << 24); () }
    box(16, "ftyp"); out.put(brand.getBytes("US-ASCII")).putInt(0)
    box(8, "free")
    box(292 + ex, "moov")
    full(108, "mvhd", 0)
    out.putInt(0).putInt(0) // ctime, mtime
      .putInt(timescale).putInt(durationTicks.toInt)
      .putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, vol
      .putLong(0) // reserved
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
      .foreach(out.putInt) // identity matrix
    (1 to 6).foreach(_ => out.putInt(0)) // pre_defined
    out.putInt(2) // next_track_ID
    box(176 + ex, "trak")
    full(92, "tkhd", 0)
    out.putInt(0).putInt(0).putInt(1).putInt(0) // times, track_ID, rsvd
      .putInt(durationTicks.toInt).putLong(0) // duration, reserved
      .putShort(0).putShort(0).putShort(0).putShort(0) // layer..rsvd
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
      .foreach(out.putInt)
    out.putInt(width << 16).putInt(height << 16) // 16.16 fixed point
    box(76 + ex, "mdia")
    full(32, "mdhd", 0)
    out.putInt(0).putInt(0).putInt(timescale).putInt(durationTicks.toInt)
      .putShort(0x55c4.toShort).putShort(0) // 'und' language, pre_defined
    box(36 + ex, "minf")
    box(28 + ex, "stbl")
    full(20 + ex, "stsz", 0)
    out.putInt(0).putInt(nFrames) // sample_size=0 (varied), sample_count
    sampleSizes.foreach(out.putInt) // per-sample sizes (MJPEG slicing)
    if (mdatPayload.isEmpty) { box(16, "mdat"); out.putLong(0L) }
    else { box(8 + mdatPayload.length, "mdat"); out.put(mdatPayload) }
    out.array()
  }

  // ------------------------------------------- video near-duplicates

  /** Top-level `mdat` payload location `(offset, length)` — the same
    * strict-progress u32/u64 box walk as [[decodeVideoMeta]], top
    * level only (sample data never nests).
    */
  private def findMdat(bytes: Array[Byte]): Option[(Int, Int)] = {
    def u16(o: Int): Int =
      ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    def u32(o: Int): Long = (u16(o).toLong << 16) | u16(o + 2)
    def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    val limit = bytes.length.toLong
    try {
      var off = 0L
      while (off + 8 <= limit) {
        var size = u32(off.toInt)
        var hdr = 8L
        if (size == 1L) {
          if (off + 16 > limit) return None
          size = u64(off.toInt + 8); hdr = 16L
        } else if (size == 0L) size = limit - off
        if (size < hdr || size > limit - off) return None
        if (new String(bytes, off.toInt + 4, 4, "US-ASCII") == "mdat")
          return Some(((off + hdr).toInt, (size - hdr).toInt))
        off += size
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The `stsz` per-sample size table of the first trak that carries
    * one — the frame slicing a REAL MJPEG-in-MP4 decode needs. Uniform
    * `sample_size != 0` expands to a constant table; a header-only
    * `stsz` (count but no table, `sample_size == 0`) yields None — the
    * mdat is then NOT sliceable and the fingerprint falls back to
    * segment byte-sums. Same strict-progress walk as
    * [[decodeVideoMeta]].
    */
  def readStszSizes(bytes: Array[Byte]): Option[Array[Int]] = {
    if (bytes == null || bytes.length < 16) return None
    def u16(o: Long): Int =
      ((bytes(o.toInt) & 0xff) << 8) | (bytes(o.toInt + 1) & 0xff)
    def u32(o: Long): Long = (u16(o).toLong << 16) | u16(o + 2)
    def u64(o: Long): Long = (u32(o) << 32) | u32(o + 4)
    def tag(o: Long): String = new String(bytes, o.toInt, 4, "US-ASCII")
    var found: Option[Array[Int]] = None
    try {
      def walk(start: Long, limit: Long, depth: Int): Unit = {
        if (depth > 6 || found.isDefined) return
        var off = start
        while (off + 8 <= limit && found.isEmpty) {
          var size = u32(off)
          var hdr = 8L
          if (size == 1L) {
            if (off + 16 > limit) return
            size = u64(off + 8); hdr = 16L
          } else if (size == 0L) size = limit - off
          if (size < hdr || size > limit - off) return
          val body = off + hdr
          tag(off + 4) match {
            case "stsz" if size >= hdr + 12 =>
              val sampleSize = u32(body + 4)
              val count = u32(body + 8)
              if (count > 0 && count <= Int.MaxValue) {
                if (sampleSize > 0 && sampleSize <= Int.MaxValue &&
                    count <= (1L << 24))
                  found = Some(Array.fill(count.toInt)(sampleSize.toInt))
                else if (sampleSize == 0 && size >= hdr + 12 + 4 * count)
                  found = Some(Array.tabulate(count.toInt)(i =>
                    u32(body + 12 + 4L * i).toInt))
              }
            case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
              walk(body, off + size, depth + 1)
            case _ => ()
          }
          off += size
        }
      }
      walk(0L, bytes.length.toLong, 0)
      found.filter(_.forall(_ >= 0))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Total integer luma over every pixel of a decodable image — the
    * per-frame energy of the decoded video fingerprint. A single-band
    * (grayscale) decode reads the RASTER directly: its sample IS the
    * JPEG Y channel, so a uniform-gray w×h frame sums to EXACTLY
    * `g·w·h` (the property the video oracle replays arithmetically) and
    * energy stays LINEAR in the planted gray — `getRGB` would bend it
    * through the nonlinear gray→sRGB colorspace map, breaking the
    * envelope's halved-amplitude invariance. Color decodes take the
    * BT.601 integer rule over `getRGB` ([[imageLumaGrid]]'s).
    */
  def imageLumaSum(bytes: Array[Byte]): Option[Long] =
    imageLumaSum(bytes, 0, if (bytes == null) 0 else bytes.length)

  /** [[imageLumaSum]] over the byte range `[off, off+len)` — the
    * video-frame hot path decodes `stsz`-sliced frames in place instead
    * of copying each frame out of the `mdat` first.
    */
  private[pipeline] def imageLumaSum(bytes: Array[Byte], off: Int,
      len: Int): Option[Long] = {
    if (bytes == null || len <= 0) return None
    try {
      val img = readImage(bytes, off, len)
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      val buf = new Array[Int](w)
      var sum = 0L
      var y = 0
      val raster = img.getRaster
      val gray = raster.getNumBands == 1
      while (y < h) {
        if (gray) {
          raster.getSamples(0, y, w, 1, 0, buf)
          var x = 0
          while (x < w) { sum += buf(x) & 0xff; x += 1 }
        } else {
          img.getRGB(0, y, w, 1, buf, 0, w)
          var x = 0
          while (x < w) {
            val rgb = buf(x)
            sum += (299 * ((rgb >> 16) & 0xff) +
              587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
            x += 1
          }
        }
        y += 1
      }
      Some(sum)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Uniform-gray JPEG frame at an explicit quality — the MJPEG test
    * pattern (a uniform block is DC-only, so ImageIO decodes it back to
    * EXACTLY `g` at any quality — probed across all 256 grays). Cached
    * per (g, quality, dims): fixtures concatenate cached byte arrays
    * instead of re-encoding per frame.
    */
  private val grayFrameCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Float, Int, Int),
      Array[Byte]]()
  def grayFrameJpeg(g: Int, quality: Float = 1.0f, w: Int = 8,
      h: Int = 8): Array[Byte] = {
    require(g >= 0 && g <= 255, s"gray $g out of [0,255]")
    grayFrameCache.computeIfAbsent((g, quality, w, h), { _ =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { r.setSample(x, y, 0, g); x += 1 }
        y += 1
      }
      val wr = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpeg").next()
      val baos = new java.io.ByteArrayOutputStream()
      val ios =
        new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
      try {
        wr.setOutput(ios)
        val p = wr.getDefaultWriteParam
        p.setCompressionMode(
          javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(quality)
        wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      } finally { ios.close(); wr.dispose() }
      baos.toByteArray
    })
  }

  /** Per-frame DECODED luma energies when the container is sliceable
    * and every frame is a decodable image: the `stsz` table must cover
    * the frame count and tile the `mdat` exactly. Any failure → None
    * (the byte-sum fallback takes over), never a partial mix of real
    * and fallback energies.
    */
  private def decodedFrameEnergies(bytes: Array[Byte], nFrames: Int,
      mOff: Int, mLen: Int): Option[Array[Long]] =
    readStszSizes(bytes)
      .filter(s => s.length == nFrames && s.map(_.toLong).sum == mLen)
      .flatMap { sizes =>
        val out = new Array[Long](nFrames)
        var off = mOff
        var f = 0
        var ok = true
        while (ok && f < nFrames) {
          // in-place frame decode (no per-frame copyOfRange; the stsz
          // filter above already proved the slices tile the mdat)
          imageLumaSum(bytes, off, sizes(f)) match {
            case Some(e) => out(f) = e
            case None => ok = false
          }
          off += sizes(f)
          f += 1
        }
        if (ok) Some(out) else None
      }

  /** 64-bit video fingerprint — [[audioFingerprint64]]'s relative
    * energy-envelope rule over FRAME energies. The container plumbing
    * is real (`mdat` via the BMFF box walk, frame count from `stsz`),
    * and the per-frame FEATURE is now REAL where the container permits:
    * when `stsz` carries a per-sample size table that tiles the `mdat`
    * and every sample decodes as an image (MJPEG-in-MP4 — the one
    * codec the JDK can decode), frame energy is the DECODED integer
    * luma sum, so a re-encode (same frames, different bytes — e.g. a
    * different JPEG quality) fingerprints identically. For opaque
    * codecs the documented fallback remains the segment byte-sum over
    * `[f·len/n, (f+1)·len/n)` — remux/exact-copy detection only.
    * 64 cells over the frame sequence; bit `c` set where the cell's
    * energy exceeds its frame-count share of the total, so the
    * fingerprint is invariant to remuxing that doubles frames and
    * halves amplitude. Needs >= 64 frames and a payload of >= 1
    * byte/frame; anything undecodable yields None (quarantine
    * downstream, never fail the batch).
    */
  def videoFingerprint64(bytes: Array[Byte]): Option[Long] =
    videoFrameEnergies(bytes).filter(_.length >= 64)
      .map(e => envelopeBitsPacked(e, 64)(0))

  /** Per-frame energies of a decodable clip (DECODED luma sums where
    * the container slices, segment byte-sums otherwise) — the shared
    * front half of the 64-bit and WIDE video fingerprints.
    */
  private def videoFrameEnergies(bytes: Array[Byte])
      : Option[Array[Long]] = {
    if (bytes == null) return None
    val nFrames = decodeVideoMeta(bytes) match {
      case Some((_, _, _, _, _, n)) if n >= 1 && n <= Int.MaxValue =>
        n.toInt
      case _ => return None
    }
    findMdat(bytes).flatMap { case (mOff, mLen) =>
      if (mLen < nFrames) None
      else Some(decodedFrameEnergies(bytes, nFrames, mOff, mLen)
        .getOrElse {
          val e = new Array[Long](nFrames)
          var f = 0
          while (f < nFrames) {
            val s = mOff + (f.toLong * mLen / nFrames).toInt
            val en = mOff + ((f + 1).toLong * mLen / nFrames).toInt
            var i = s
            var acc = 0L
            while (i < en) { acc += (bytes(i) & 0xff); i += 1 }
            e(f) = acc
            f += 1
          }
          e
        })
    }
  }

  /** Fold `frameE` into `cells` relative-energy bits (bit `c` set where
    * cell `c`'s energy exceeds its frame-count share of the total —
    * exact BigInt cross-multiplication), packed little-endian into
    * longs. The shared back half of both video fingerprint widths.
    */
  private def envelopeBitsPacked(frameE: Array[Long],
      cells: Int): Array[Long] = {
    val n = frameE.length
    var total = 0L
    var f = 0
    while (f < n) { total += frameE(f); f += 1 }
    val fp = new Array[Long]((cells + 63) / 64)
    var c = 0
    while (c < cells) {
      val s = (c.toLong * n / cells).toInt
      val e = ((c + 1).toLong * n / cells).toInt
      var cellE = 0L
      var i = s
      while (i < e) { cellE += frameE(i); i += 1 }
      if (BigInt(cellE) * n > BigInt(total) * (e - s))
        fp(c / 64) |= (1L << (c % 64))
      c += 1
    }
    fp
  }

  /** 256-bit WIDE video fingerprint — [[videoFingerprint64]]'s
    * relative-envelope rule at 256 cells over the frame sequence, the
    * video member of the wide perceptual tier ([[imageFingerprintWide]]
    * holds the scale rationale: 16-bit bands keep the candidate join
    * selective past the 64-bit family's saturation point). Needs >= 256
    * frames (a cell must hold at least one frame); same remux/re-encode
    * invariances — the cells still cover fixed frame-sequence
    * fractions.
    */
  def videoFingerprintWide(bytes: Array[Byte]): Option[Array[Long]] =
    videoFrameEnergies(bytes).filter(_.length >= 256)
      .map(e => envelopeBitsPacked(e, 256))

  /** `(id, sh)` video-fingerprint frame over blob rows — the banding
    * input shape; undecodable blobs drop (quarantine is ingest's job).
    */
  def videoFingerprintDf(df: DataFrame, idCol: String,
      blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val blobIdx = df.schema.fieldIndex(blobCol)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val blob = r.getStruct(blobIdx)
        val content = if (blob == null || blob.isNullAt(0)) null
          else blob.getAs[Array[Byte]](0)
        videoFingerprint64(content).map(fp => (r.getLong(idIdx), fp))
      }
    }.toDF("id", "sh")
  }

  /** Remux-robust video near-duplicate pairs — the [[audioDedupPairs]]
    * contract over [[videoFingerprint64]]: `(id_a, id_b, hamming)`
    * within `maxHamming`, complete by the same blocks/probeBits
    * pigeonhole derivation.
    */
  def videoDedupPairs(blobs: DataFrame, idCol: String, blobCol: String,
      maxHamming: Int = 8, blocks: Int = 8, probeBits: Int = 1,
      maxBucketSize: Int = Int.MaxValue,
      scope: graft.pipeline.CacheScope =
        graft.pipeline.CacheScope.session): DataFrame = {
    require(maxHamming <=
      graft.pipeline.Dedup.guaranteedRadius(blocks, probeBits),
      s"maxHamming $maxHamming exceeds the guaranteed radius " +
        s"${graft.pipeline.Dedup.guaranteedRadius(blocks, probeBits)} " +
        s"of blocks=$blocks/probeBits=$probeBits — pairs past it would " +
        "be silently incomplete; raise blocks/probeBits or lower the " +
        "threshold")
    graft.pipeline.Dedup.fingerprintCandidatePairs(
      videoFingerprintDf(blobs, idCol, blobCol), blocks, maxHamming,
      maxBucketSize, probeBits, scope)
  }

  /** Persist a video-fingerprint index — [[writeAudioIndex]]'s
    * discipline for the video family: decode once at build, probe at
    * 8 bytes/clip.
    */
  def writeVideoIndex(blobs: DataFrame, idCol: String, blobCol: String,
      path: String, blocks: Int = 8, probeBits: Int = 1): Unit = {
    val spark = blobs.sparkSession
    import spark.implicits._
    require(blocks >= 2 && 64 % blocks == 0, "blocks must divide 64")
    require(probeBits == 0 || probeBits == 1, "probeBits must be 0 or 1")
    videoFingerprintDf(blobs, idCol, blobCol)
      .write.mode("overwrite").parquet(s"$path/fingerprints")
    val n = spark.read.parquet(s"$path/fingerprints").count()
    Seq((blocks, probeBits, n))
      .toDF("blocks", "probeBits", "nClips")
      .coalesce(1).write.mode("overwrite").json(s"$path/params")
  }

  /** Incremental video near-dup against a persisted [[writeVideoIndex]]
    * — batch decodes + fingerprints, corpus side is the 8-byte scan
    * (tombstone-aware), multi-probe on the batch side only.
    */
  def videoDedupPairsFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, idCol: String, blobCol: String,
      maxHamming: Int = 8, maxBucketSize: Int = Int.MaxValue,
      scope: graft.pipeline.CacheScope =
        graft.pipeline.CacheScope.session): DataFrame =
    videoDedupPairsFromLoaded(loadFingerprintIndex(spark, path), batch,
      idCol, blobCol, maxHamming, maxBucketSize, scope)

  /** [[videoDedupPairsFromIndex]] against a pre-loaded handle. */
  def videoDedupPairsFromLoaded(ix: LoadedFpIndex, batch: DataFrame,
      idCol: String, blobCol: String, maxHamming: Int = 8,
      maxBucketSize: Int = Int.MaxValue,
      scope: graft.pipeline.CacheScope =
        graft.pipeline.CacheScope.session): DataFrame =
    pairsFromLoadedCore(ix, videoFingerprintDf(batch, idCol, blobCol),
      maxHamming, maxBucketSize, scope)

  /** `(id, sh array<long>)` WIDE video-fingerprint frame over blob
    * rows — the wide banding input shape; undecodable (or <256-frame)
    * blobs drop.
    */
  def videoFingerprintWideDf(df: DataFrame, idCol: String,
      blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val blobIdx = df.schema.fieldIndex(blobCol)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val blob = r.getStruct(blobIdx)
        val content = if (blob == null || blob.isNullAt(0)) null
          else blob.getAs[Array[Byte]](0)
        videoFingerprintWide(content)
          .map(fp => (r.getLong(idIdx), fp.toSeq))
      }
    }.toDF("id", "sh")
  }

  /** Remux-robust video near-duplicate pairs on the WIDE (256-bit)
    * fingerprint — [[imageDedupPairsWide]]'s contract for the video
    * family.
    */
  def videoDedupPairsWide(blobs: DataFrame, idCol: String,
      blobCol: String, maxHamming: Int = 8, blocks: Int = 16,
      probeBits: Int = 0, maxBucketSize: Int = Int.MaxValue,
      scope: graft.pipeline.CacheScope =
        graft.pipeline.CacheScope.session): DataFrame = {
    requireRadius(maxHamming, blocks, probeBits, stored = false)
    graft.pipeline.Dedup.fingerprintCandidatePairsWide(
      videoFingerprintWideDf(blobs, idCol, blobCol), 4, blocks,
      maxHamming, maxBucketSize, probeBits, scope)
  }

  /** Persist a WIDE video-fingerprint index (32 bytes/clip) — the
    * [[writeImageIndexWide]] discipline for the video family.
    */
  def writeVideoIndexWide(blobs: DataFrame, idCol: String,
      blobCol: String, path: String, blocks: Int = 16,
      probeBits: Int = 0): Unit = {
    val spark = blobs.sparkSession
    import spark.implicits._
    require(blocks >= 2 && 256 % blocks == 0 && 256 / blocks <= 64 &&
      64 % (256 / blocks) == 0,
      "blocks must divide 256 with bands of at most 64 bits that do " +
        "not straddle words (blocks >= 4, power-of-two band widths)")
    require(probeBits == 0 || probeBits == 1, "probeBits must be 0 or 1")
    videoFingerprintWideDf(blobs, idCol, blobCol)
      .write.mode("overwrite").parquet(s"$path/fingerprints")
    val n = spark.read.parquet(s"$path/fingerprints").count()
    Seq((4, blocks, probeBits, n))
      .toDF("words", "blocks", "probeBits", "nClips")
      .coalesce(1).write.mode("overwrite").json(s"$path/params")
  }

  /** Incremental WIDE video near-dup against a [[writeVideoIndexWide]]
    * corpus — the [[imageDedupPairsWideFromIndex]] contract for the
    * video family.
    */
  def videoDedupPairsWideFromIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, idCol: String, blobCol: String,
      maxHamming: Int = 8, maxBucketSize: Int = Int.MaxValue,
      scope: graft.pipeline.CacheScope =
        graft.pipeline.CacheScope.session): DataFrame =
    videoDedupPairsWideFromLoaded(loadFingerprintIndexWide(spark, path),
      batch, idCol, blobCol, maxHamming, maxBucketSize, scope)

  /** [[videoDedupPairsWideFromIndex]] against a pre-loaded handle. */
  def videoDedupPairsWideFromLoaded(ix: LoadedFpIndexWide,
      batch: DataFrame, idCol: String, blobCol: String,
      maxHamming: Int = 8, maxBucketSize: Int = Int.MaxValue,
      scope: graft.pipeline.CacheScope =
        graft.pipeline.CacheScope.session): DataFrame =
    pairsFromLoadedCoreWide(ix,
      videoFingerprintWideDf(batch, idCol, blobCol), maxHamming,
      maxBucketSize, scope)

  /** Fixture mdat payload whose per-frame byte-sums are EXACTLY
    * `amps` — `amps(f)` written as ⌊amp/255⌋ 0xFF bytes plus the
    * remainder, zero-padded to a fixed `segLen` (so the fingerprint's
    * stubbed byte-sum feature recovers the planted envelope, the video
    * analog of [[encodeWindowWav]]'s planted window amplitudes).
    */
  def encodeFramePayload(amps: Array[Int], segLen: Int): Array[Byte] = {
    val out = new Array[Byte](amps.length * segLen)
    var f = 0
    while (f < amps.length) {
      val amp = amps(f)
      require(amp >= 0 && amp <= 255 * (segLen - 1),
        s"amp $amp unencodable in segLen $segLen")
      var rest = amp
      var i = f * segLen
      while (rest >= 255) { out(i) = 0xff.toByte; rest -= 255; i += 1 }
      out(i) = rest.toByte
      f += 1
    }
    out
  }
}
