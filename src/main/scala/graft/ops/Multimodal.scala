package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing (BASELINE.json north-star): image/audio/
 * video carried as opaque `binary` payloads plus a typed metadata
 * struct; decode / feature-extraction modeled as BATCHED per-partition
 * transforms with a real schema and partitioning story.
 *
 * The actual media codecs are NOT in this container, so the decode step
 * is a clearly-marked deterministic STUB (see [[stubDecode]]) — the
 * Spark-side contract (binary column, metadata struct, batch-shaped
 * mapPartitions, post-decode schema) is real and tested. Swapping in a
 * true decoder is a one-function change.
 *
 * Scale notes: payloads ride parquet binary columns (dictionary-free,
 * large row groups); decode is a narrow mapPartitions (no shuffle) whose
 * parallelism = input splits; metadata-only queries never touch payload
 * bytes thanks to parquet column pruning.
 */
object Multimodal {

  /** Media metadata carried alongside every payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("byte_length", LongType),
    StructField("checksum", StringType)))

  /**
   * Attach a synthetic binary payload + metadata struct derived from a
   * text column (deterministic stand-in for real media bytes; the
   * plumbing — binary column + struct metadata — is the real contract).
   */
  def attachPayload(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = col(textCol).cast("binary")
    val mediaType = element_at(
      array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
      (col(idCol) % 3 + 1).cast("int"))
    df.select(
      col(idCol),
      payload.as("payload"),
      struct(
        mediaType.as("media_type"),
        octet_length(payload).cast("long").as("byte_length"),
        md5(payload).as("checksum")).as("media_meta"))
  }

  /** Output schema of the (stub) decode step. */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("feature", ArrayType(DoubleType))))

  /**
   * STUB DECODER — the real image/audio libraries are not available in
   * this environment. Deterministic fake features: 4 doubles derived
   * from payload length and first/last bytes. Replace the body with a
   * real codec (e.g. javax.imageio / ffmpeg JNI) without touching the
   * surrounding plumbing.
   */
  def stubDecode(payload: Array[Byte]): Array[Double] = {
    if (payload == null || payload.isEmpty) Array(0.0, 0.0, 0.0, 0.0)
    else Array(
      payload.length.toDouble,
      (payload(0) & 0xFF).toDouble,
      (payload(payload.length - 1) & 0xFF).toDouble,
      payload.foldLeft(0L)((a, b) => a * 31 + (b & 0xFF)).toDouble % 1e9)
  }

  /**
   * Batched decode / feature extraction: mapPartitions with an explicit
   * micro-batch (the shape a vectorized/Arrow UDF would have — batch
   * size bounds peak memory when payloads are large). Narrow op: no
   * shuffle, parallel per input split.
   */
  def decodeFeatures(withPayload: DataFrame, idCol: String,
                     batchSize: Int = 64): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(FeatureSchema))
    val idIdx = withPayload.schema.fieldIndex(idCol)
    val payloadIdx = withPayload.schema.fieldIndex("payload")
    val metaIdx = withPayload.schema.fieldIndex("media_meta")
    withPayload.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // one "batch decode" call per group — mirrors a vectorized UDF
        batch.map { r =>
          val meta = r.getStruct(metaIdx)
          val payload = r.getAs[Array[Byte]](payloadIdx)
          Row(r.getLong(idIdx), meta.getString(0),
            meta.getLong(1), stubDecode(payload).toSeq)
        }
      }
    }(enc)
  }

  // ---- REAL media decode (container-parseable formats) -----------------
  //
  // BMP and PCM WAV need no codec library — their containers are plain
  // little-endian structs — so for these two the decode step is REAL
  // header/stride/chunk parsing, not a stub. Codec-dependent formats
  // (JPEG, MP3, MP4...) still fall back to [[stubDecode]], documented
  // above. Payload synthesis writes format-valid bytes whose decoded
  // features have closed forms, so an external SQL oracle can verify
  // the full write→parse round trip hash-exactly.

  import java.nio.{ByteBuffer, ByteOrder}

  /** Format-valid 24bpp bottom-up BMP, grayscale pixel (x, y) value
    * `id%200 + x + y` (< 256 — no wrap, so the mean has a closed form:
    * (w·h·(id%200) + h·Σx + w·Σy) / (w·h)). Width varies 8–15 so row
    * stride padding is exercised. */
  def bmpBytes(id: Long): Array[Byte] = {
    val w = 8 + (id % 8).toInt
    val h = 8 + (id % 5).toInt
    val stride = ((3 * w + 3) / 4) * 4
    val size = 14 + 40 + stride * h
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(stride * h).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    val base = (id % 200).toInt
    var fileRow = 0
    while (fileRow < h) {
      val y = h - 1 - fileRow // bottom-up storage
      var x = 0
      while (x < w) {
        val v = (base + x + y).toByte
        b.put(v).put(v).put(v) // B, G, R
        x += 1
      }
      var pad = 3 * w
      while (pad < stride) { b.put(0.toByte); pad += 1 }
      fileRow += 1
    }
    b.array()
  }

  /** Format-valid PCM16 mono WAV (RIFF + fmt + data), 200 samples
    * `id%100 + i%50 − 25` — mean = (200·(id%100) − 100)/200 exactly. */
  def wavBytes(id: Long): Array[Byte] = {
    val n = 200
    val sampleRate = 8000 + (id % 4).toInt * 4000
    val dataLen = n * 2
    val b = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    val base = (id % 100).toInt
    var i = 0
    while (i < n) { b.putShort((base + i % 50 - 25).toShort); i += 1 }
    b.array()
  }

  /** Parse a 24bpp BMP: [width, height, bitCount, mean blue-channel
    * value] — walks the real headers and row stride. None if the bytes
    * aren't an uncompressed 24bpp BMP. */
  def decodeBmp(bytes: Array[Byte]): Option[Array[Double]] = {
    if (bytes == null || bytes.length < 54 ||
      bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return None
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = b.getInt(10)
    val w = b.getInt(18)
    val h = math.abs(b.getInt(22))
    val bpp = b.getShort(28).toInt
    val compression = b.getInt(30)
    if (bpp != 24 || compression != 0 || w <= 0 || h == 0) return None
    val stride = ((3 * w + 3) / 4) * 4
    if (dataOffset + stride.toLong * h > bytes.length) return None
    var sum = 0L
    var row = 0
    while (row < h) {
      var x = 0
      val off = dataOffset + row * stride
      while (x < w) {
        sum += bytes(off + 3 * x) & 0xFF
        x += 1
      }
      row += 1
    }
    Some(Array(w.toDouble, h.toDouble, bpp.toDouble,
      sum.toDouble / (w.toLong * h)))
  }

  /** Parse a PCM WAV by walking its RIFF chunk list: [sampleRate,
    * channels, nSamples, mean sample]. None if not PCM WAV. */
  def decodeWav(bytes: Array[Byte]): Option[Array[Double]] = {
    if (bytes == null || bytes.length < 44) return None
    def ascii(off: Int, s: String): Boolean =
      s.indices.forall(i => bytes(off + i) == s.charAt(i).toByte)
    if (!ascii(0, "RIFF") || !ascii(8, "WAVE")) return None
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var fmtOk = false
    var dataOff = -1
    var dataLen = 0
    while (pos + 8 <= bytes.length && (!fmtOk || dataOff < 0)) {
      val size = b.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      if (ascii(pos, "fmt ") && size >= 16) {
        fmtOk = b.getShort(pos + 8) == 1 // PCM only
        channels = b.getShort(pos + 10).toInt
        sampleRate = b.getInt(pos + 12)
        bits = b.getShort(pos + 22).toInt
      } else if (ascii(pos, "data")) {
        dataOff = pos + 8
        dataLen = size
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0 || bits != 16 || channels <= 0) return None
    val nSamples = dataLen / 2 / channels
    var sum = 0L
    var i = 0
    while (i < nSamples * channels) {
      sum += b.getShort(dataOff + 2 * i)
      i += 1
    }
    Some(Array(sampleRate.toDouble, channels.toDouble, nSamples.toDouble,
      sum.toDouble / (nSamples.toLong * channels)))
  }

  /** Attach REAL format-valid media payloads: BMP for id%3=0, WAV for
    * id%3=1, an opaque (stub-decoded) payload for id%3=2 — same
    * metadata struct contract as [[attachPayload]]. */
  def synthesizeMedia(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val gen = udf((id: Long, text: String) => (id % 3) match {
      case 0 => bmpBytes(id)
      case 1 => wavBytes(id)
      case _ => if (text == null) Array.empty[Byte] else text.getBytes("UTF-8")
    })
    val mediaType = element_at(
      array(lit("image/bmp"), lit("audio/wav"), lit("video/mp4")),
      (col(idCol) % 3 + 1).cast("int"))
    df.withColumn("payload", gen(col(idCol), col(textCol)))
      .select(col(idCol), col("payload"),
        struct(
          mediaType.as("media_type"),
          octet_length(col("payload")).cast("long").as("byte_length"),
          md5(col("payload")).as("checksum")).as("media_meta"))
  }

  /**
   * REAL batched decode: sniff magic bytes per payload and parse — BMP
   * and PCM WAV genuinely (headers, stride, chunk walk), everything
   * else through the documented [[stubDecode]] fallback. Same narrow
   * mapPartitions batch shape as [[decodeFeatures]].
   */
  def decodeMedia(withPayload: DataFrame, idCol: String,
                  batchSize: Int = 64): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(FeatureSchema))
    val idIdx = withPayload.schema.fieldIndex(idCol)
    val payloadIdx = withPayload.schema.fieldIndex("payload")
    withPayload.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val payload = r.getAs[Array[Byte]](payloadIdx)
          val (mt, feats) = decodeBmp(payload)
            .map(("image/bmp", _))
            .orElse(decodeWav(payload).map(("audio/wav", _)))
            .getOrElse(("application/octet-stream", stubDecode(payload)))
          Row(r.getLong(idIdx), mt,
            if (payload == null) 0L else payload.length.toLong, feats.toSeq)
        }
      }
    }(enc)
  }
}
