package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and batch-shaped decode /
  * feature-extract / resize / frame-sample stages.
  *
  * Two decoders ship behind the pluggable [[ImageDecoder]] trait:
  * [[ImageIoDecoder]] is the REAL one — JDK `javax.imageio` (offline-safe,
  * no external libs): header-only metadata reads, full pixel decode for
  * features, and PNG re-encode for [[resizeImage]]. [[StubDecoder]]
  * remains for deterministic byte-derived fakes where the DuckDB oracle
  * must replay the arithmetic (a SQL oracle cannot run a PNG codec —
  * but see `q_multimodal_imageio`, whose payloads are PNGs generated
  * from the corpus so the decoded dimensions have a closed form).
  *
  * Scale design: payload columns travel as parquet binary (dictionary-off,
  * large row groups); decode runs `mapPartitions`-style so a real decoder
  * amortizes codec init per partition, not per row; metadata extraction
  * reads only the image HEADER (no pixel decode) so a 100 TB metadata
  * pass does not pay decompression; partition count is controlled by
  * bytes not rows ([[repartitionByPayload]]).
  */
object Multimodal {

  val imageMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("n_bytes", LongType)))

  /** Pluggable decoder contract: bytes → (meta, feature vector). A real
    * implementation opens the codec once per partition via `init()`.
    * Decoders signal non-image bytes with [[UndecodablePayload]]; the
    * batch stages map that to a null output column (bad rows survive
    * the pipeline for quarantine instead of failing the job).
    */
  trait ImageDecoder extends Serializable {
    def init(): Unit = ()
    def meta(bytes: Array[Byte]): (Int, Int, String)
    def features(bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** Payload bytes no registered codec can read. */
  final class UndecodablePayload(msg: String) extends RuntimeException(msg)

  /** Real JDK decoder (`javax.imageio` — PNG/JPEG/GIF/BMP/WBMP readers
    * ship with every JRE; no external dependency, works offline).
    *
    * `meta` is a HEADER-ONLY read: `ImageReader.getWidth/getHeight`
    * parse the container header (IHDR chunk / SOF segment) without
    * decompressing pixel data — the right cost model for a metadata
    * pass over 100 TB of images. `features` pays the full decode and
    * produces a normalized luminance histogram (`dim` bins, mass sums
    * to 1), a deterministic pixel-statistics vector that feeds
    * [[graft.operators.Similarity]] directly.
    */
  object ImageIoDecoder extends ImageDecoder {
    import javax.imageio.ImageIO

    /** Memory-backed image stream over an in-memory payload.
      *
      * NEVER `ImageIO.createImageInputStream` here: with the default
      * `ImageIO.getUseCache` it wraps the stream in a
      * FileCacheImageInputStream — `Files.createTempFile` PER IMAGE.
      * At 32 executor threads over 40k payloads that serializes on the
      * tmpdir's directory lock; jstack showed 20–28 of 32 task threads
      * parked in TempFileHelper.create, and the same query ran
      * bimodally at 195s vs 1270s of executor CPU depending on dentry
      * cache state. The payload is already a byte array — a disk cache
      * buys nothing. Same rule for the encode side below.
      */
    private def memStream(bytes: Array[Byte]) =
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))

    override def meta(bytes: Array[Byte]): (Int, Int, String) = {
      val iis = memStream(bytes)
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext)
          throw new UndecodablePayload(s"no image reader for ${bytes.length} bytes")
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          (r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase(java.util.Locale.ROOT))
        } finally r.dispose()
      } finally iis.close()
    }

    override def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val img = decode(bytes)
      val out = new Array[Float](dim)
      val (w, h) = (img.getWidth, img.getHeight)
      // Single-band (grayscale) images read raster samples directly:
      // getRGB would round-trip them through the gray→sRGB color
      // transform, which brightens dark values and breaks byte-exact
      // statistics. Multi-band images use integer Rec.601 luma.
      val gray = img.getRaster.getNumBands == 1
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val luma =
            if (gray) img.getRaster.getSample(x, y, 0)
            else {
              val rgb = img.getRGB(x, y)
              (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
            }
          out(luma * dim / 256) += 1f
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      var i = 0
      while (i < dim) { out(i) /= n; i += 1 }
      out
    }

    private[operators] def decode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      // ImageIO.read(InputStream) would route through the tempfile-backed
      // cache stream (see memStream); hand it the memory stream instead
      // (this overload closes it on return).
      val img = ImageIO.read(memStream(bytes))
      if (img == null)
        throw new UndecodablePayload(s"no image reader for ${bytes.length} bytes")
      img
    }

    private[operators] def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      // ImageIO.write(.., OutputStream) wraps a FileCacheImageOutputStream
      // by default — one temp file per ENCODED image; same per-image
      // tmpdir serialization as the read side. Memory-backed instead.
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try {
        if (!ImageIO.write(img, "png", ios))
          throw new UndecodablePayload("no png writer registered")
      } finally ios.close()
      bos.toByteArray
    }
  }

  /** Deterministic fake: dimensions and features derived from the bytes
    * themselves, so tests are stable and the oracle-free path is still
    * checkable. Marked stub per the builder contract.
    */
  object StubDecoder extends ImageDecoder {
    override def meta(bytes: Array[Byte]): (Int, Int, String) = {
      val w = 16 + (if (bytes.isEmpty) 0 else (bytes.head & 0x7f))
      val h = 16 + (if (bytes.length < 2) 0 else (bytes(1) & 0x7f))
      val fmt = if (bytes.length % 2 == 0) "png" else "jpeg"
      (w, h, fmt)
    }
    override def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { out(i % dim) += (bytes(i) & 0xff) / 255.0f; i += 1 }
      out
    }
  }

  /** Fake payload attach for the harness tables (no binary column ships
    * in testdata): utf-8 bytes of the text as the opaque payload.
    */
  def attachPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** REAL image payload attach: render each document's utf-8 bytes as the
    * grayscale pixels of a near-square PNG (width = ceil(sqrt(n)),
    * height = ceil(n/width), zero-padded tail), encoded with the JDK PNG
    * writer. The payloads are genuine PNGs — [[ImageIoDecoder]] exercises
    * its true codec path on them — while the decoded dimensions keep a
    * closed form a SQL oracle can replay from `length(text)`.
    */
  def attachImagePayload(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val schema = docs.schema.add("payload", BinaryType)
    val textIdx = docs.schema.fieldIndex(textCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    // Codec work must never inherit the scan's partitioning: a small
    // parquet file reads as ONE split, and per-row PNG encode is orders
    // of magnitude heavier than the row shuffle that spreads it. Fan out
    // to the session's shuffle width before the imperative pass.
    fanOut(docs).mapPartitions { it =>
      it.map { row =>
        val text = row.getString(textIdx)
        val png: Array[Byte] =
          if (text == null) null
          else {
            val bytes = text.getBytes(StandardCharsets.UTF_8)
            val n = bytes.length
            val w = math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
            val h = math.max(1, (n + w - 1) / w)
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var i = 0
            while (i < n) { raster.setSample(i % w, i / w, 0, bytes(i) & 0xff); i += 1 }
            ImageIoDecoder.encodePng(img)
          }
        Row.fromSeq(row.toSeq :+ png)
      }
    }(encoder)
  }

  /** Batch decode: payload → metadata struct. Runs per-partition with a
    * decoder instance initialized once per partition (mapInPandas shape).
    * Null or undecodable payloads → null struct (quarantine, not failure).
    */
  def decodeMeta(df: DataFrame, payloadCol: String = "payload",
      decoder: ImageDecoder = ImageIoDecoder): DataFrame = {
    val schema = df.schema.add("image_meta", imageMetaType)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { it =>
      decoder.init() // once per partition — where a real codec loads
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val metaRow: Row =
          if (bytes == null) null
          else
            try {
              val (w, h, fmt) = decoder.meta(bytes)
              Row(w, h, fmt, bytes.length.toLong)
            } catch { case _: UndecodablePayload => null }
        Row.fromSeq(row.toSeq :+ metaRow)
      }
    }(encoder)
  }

  /** Feature extraction: payload → fixed-dim float vector (embedding-like,
    * feeds straight into [[Similarity]]).
    */
  def extractFeatures(df: DataFrame, dim: Int = 16, payloadCol: String = "payload",
      decoder: ImageDecoder = ImageIoDecoder): DataFrame = {
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val schema = df.schema.add("features", ArrayType(FloatType))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { it =>
      decoder.init()
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val feats =
          if (bytes == null) null
          else
            try decoder.features(bytes, dim).toSeq
            catch { case _: UndecodablePayload => null }
        Row.fromSeq(row.toSeq :+ feats)
      }
    }(encoder)
  }

  /** Real resize: decode, bilinear-scale to `targetW`×`targetH`, re-encode
    * as PNG into a `resized` binary column. Per-partition batch shape like
    * [[decodeMeta]]; undecodable payloads → null.
    */
  def resizeImage(df: DataFrame, targetW: Int, targetH: Int,
      payloadCol: String = "payload"): DataFrame = {
    val schema = df.schema.add("resized", BinaryType)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val out: Array[Byte] =
          if (bytes == null) null
          else
            try {
              val src = ImageIoDecoder.decode(bytes)
              val dst = new java.awt.image.BufferedImage(
                targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = dst.createGraphics()
              try {
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(src, 0, 0, targetW, targetH, null)
              } finally g.dispose()
              ImageIoDecoder.encodePng(dst)
            } catch { case _: UndecodablePayload => null }
        Row.fromSeq(row.toSeq :+ out)
      }
    }(encoder)
  }

  /** Deterministic frame-sample stub: every k-th byte window as a "frame"
    * payload list — the plumbing for video columns (one row in, array of
    * frame payloads out, exploded downstream).
    */
  def frameSample(df: DataFrame, everyN: Int, frameBytes: Int = 64,
      payloadCol: String = "payload"): DataFrame =
    df.withColumn("frames",
      expr(s"transform(sequence(0, CAST(greatest(length($payloadCol) - 1, 0) AS INT) DIV ($everyN * $frameBytes)), " +
        s"i -> substring($payloadCol, i * $everyN * $frameBytes + 1, $frameBytes))"))

  /** Round-robin fan-out to the session's shuffle width — the pre-codec
    * balancing move. Skipped when the input is already at least that wide
    * (no gratuitous shuffle on an already-parallel pipeline).
    */
  private def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** Bytes-aware repartitioning: target ~`targetMb` of payload per
    * partition so a real decoder's memory stays bounded regardless of row
    * width skew.
    */
  def repartitionByPayload(df: DataFrame, targetMb: Int,
      payloadCol: String = "payload"): DataFrame = {
    val totalBytes = df.agg(sum(length(col(payloadCol)))).head().getLong(0)
    val parts = math.max(1, (totalBytes / (targetMb.toLong * 1024 * 1024)).toInt)
    df.repartition(parts)
  }

  // ---- audio modality -----------------------------------------------

  val audioFeatureType: StructType = StructType(Seq(
    StructField("n_samples", LongType),
    StructField("peak", LongType),
    StructField("rms", DoubleType),
    StructField("zero_crossings", LongType)))

  /** PCM16LE audio payload synth: a sawtooth wave whose length and
    * frequency derive from `doc_id`, so the payload is genuine
    * little-endian 16-bit PCM (the [[audioFeatures]] parser exercises a
    * real byte-level codec path) while every decoded sample keeps the
    * closed form `((i·f) mod 256 − 128)·256` a SQL oracle can replay
    * from the id alone. Sawtooth, not sine: the synth stays in exact
    * integer arithmetic, so both engines agree bit-for-bit.
    */
  def attachAudioPayload(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = docs.schema.add("audio", BinaryType)
    val idIdx = docs.schema.fieldIndex(idCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    fanOut(docs).mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(idIdx)
        val n = 512 + (id % 5).toInt * 128
        val f = 1 + (id % 7).toInt
        val bytes = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val v = (((i * f) % 256) - 128) * 256
          bytes(2 * i) = (v & 0xff).toByte
          bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        Row.fromSeq(row.toSeq :+ bytes)
      }
    }(encoder)
  }

  /** Audio feature extraction over PCM16LE payloads: one imperative
    * byte-parse pass per row (per-partition batch shape like the image
    * decoder), emitting the classic signal stats — sample count, peak
    * amplitude, RMS, zero-crossing count. RMS is the only float and is
    * `sqrt(exact-long-sum / n)`: IEEE sqrt is correctly rounded, so the
    * value is bit-identical across engines. Odd-length or null payloads
    * quarantine to a null struct like the image stages.
    */
  def audioFeatures(df: DataFrame, payloadCol: String = "audio"): DataFrame = {
    val schema = df.schema.add("audio_features", audioFeatureType)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](pIdx)
        val feats: Row =
          if (bytes == null || bytes.length % 2 != 0 || bytes.length == 0) null
          else {
            val n = bytes.length / 2
            var i = 0
            var sumSq = 0L
            var peak = 0L
            var zc = 0L
            var prevNeg = false
            while (i < n) {
              val v = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
              val a = math.abs(v.toLong)
              if (a > peak) peak = a
              sumSq += v.toLong * v
              val neg = v < 0
              if (i > 0 && neg != prevNeg) zc += 1
              prevNeg = neg
              i += 1
            }
            Row(n.toLong, peak, math.sqrt(sumSq.toDouble / n), zc)
          }
        Row.fromSeq(row.toSeq :+ feats)
      }
    }(encoder)
  }
}
