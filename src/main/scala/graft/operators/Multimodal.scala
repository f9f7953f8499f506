package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and batch-shaped decode /
  * feature-extract / resize / frame-sample stages.
  *
  * The decode kernels are STUBS (this container has no image/audio
  * libraries): [[StubDecoder]] produces deterministic fake metadata and
  * features from the bytes. Everything around the stub — the schema
  * contract, the per-partition batch processing shape (the Scala
  * equivalent of `mapInPandas`), null passthrough, and the partitioning
  * controls — is real and tested; swapping in a JNI/javacpp decoder is a
  * one-class change.
  *
  * Scale design: payload columns travel as parquet binary (dictionary-off,
  * large row groups); decode runs `mapPartitions`-style so a real decoder
  * amortizes model/codec init per partition, not per row; partition count
  * is controlled by bytes not rows ([[repartitionByPayload]]).
  */
object Multimodal {

  val imageMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("n_bytes", LongType)))

  /** Pluggable decoder contract: bytes → (meta, feature vector). A real
    * implementation opens the codec once per partition via `init()`.
    */
  trait ImageDecoder extends Serializable {
    def init(): Unit = ()
    def meta(bytes: Array[Byte]): (Int, Int, String)
    def features(bytes: Array[Byte], dim: Int): Array[Float]
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

  /** Batch decode: payload → metadata struct. Runs per-partition with a
    * decoder instance initialized once per partition (mapInPandas shape).
    */
  def decodeMeta(df: DataFrame, payloadCol: String = "payload",
      decoder: ImageDecoder = StubDecoder): DataFrame = {
    val schema = df.schema.add("image_meta", imageMetaType)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { it =>
      decoder.init() // once per partition — where a real codec loads
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val metaRow: Row =
          if (bytes == null) null
          else {
            val (w, h, fmt) = decoder.meta(bytes)
            Row(w, h, fmt, bytes.length.toLong)
          }
        Row.fromSeq(row.toSeq :+ metaRow)
      }
    }(encoder)
  }

  /** Feature extraction: payload → fixed-dim float vector (embedding-like,
    * feeds straight into [[Similarity]]).
    */
  def extractFeatures(df: DataFrame, dim: Int = 16, payloadCol: String = "payload",
      decoder: ImageDecoder = StubDecoder): DataFrame = {
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val schema = df.schema.add("features", ArrayType(FloatType))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { it =>
      decoder.init()
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val feats = if (bytes == null) null else decoder.features(bytes, dim).toSeq
        Row.fromSeq(row.toSeq :+ feats)
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
}
