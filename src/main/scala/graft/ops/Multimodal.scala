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
 * Five formats decode GENUINELY: BMP, PCM WAV, PNG and GIF by
 * hand-written container/codec parsing (headers, stride, RIFF walk,
 * zlib inflate + filter reconstruction, variable-width LZW), and JPEG
 * through the JDK's built-in javax.imageio reader (huffman + IDCT ship
 * in every JDK — no external library). Only formats whose codecs
 * genuinely aren't in a stock JVM (MP3, MP4/H.264 class) fall back to
 * the clearly-marked deterministic STUB (see [[stubDecode]]); the
 * Spark-side contract (binary column, metadata struct, batch-shaped
 * mapPartitions, post-decode schema) is identical either way, so
 * swapping in an external codec is a one-function change.
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
  // header/stride/chunk parsing, not a stub; PNG/GIF decode via
  // hand-written inflate-filter/LZW walks below, and JPEG via the
  // JDK's bundled reader. Only MP3/MP4-class formats fall back to
  // [[stubDecode]], documented above. Payload synthesis writes
  // format-valid bytes whose decoded features have closed forms
  // (except lossy JPEG), so an external SQL oracle can verify the
  // write→parse round trip hash-exactly for the lossless formats.

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

  /** Format-valid baseline JPEG via the JDK's built-in encoder
    * (javax.imageio ships in every JDK — no external codec library):
    * a w×h gradient keyed by id. JPEG is lossy, so decoded pixel
    * values have no closed form — spec/rows-only territory by
    * construction, unlike [[bmpBytes]]/[[wavBytes]]. */
  def jpegBytes(id: Long, w: Int = 16, h: Int = 16): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val base = (id % 128).toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (base + 4 * x + 2 * y) & 0xFF
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /**
   * JPEG decode via the JDK's built-in reader — a REAL codec path for
   * the JPEG class (huffman + IDCT live in the JDK, not an external
   * library), leaving only MP3/MP4-class formats on the documented
   * [[stubDecode]]. Sniffs the FF D8 FF SOI magic, decodes, and emits
   * [width, height, meanR, meanG, meanB]. Decoded pixels are
   * IDCT-implementation-specific, so this face is spec/rows-only and
   * never enters an SQL-oracle gate. None when the payload isn't a
   * JPEG or the reader rejects it.
   */
  def decodeJpeg(bytes: Array[Byte]): Option[Array[Double]] = {
    if (bytes == null || bytes.length < 3 ||
      (bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8 ||
      (bytes(2) & 0xFF) != 0xFF) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      var r = 0L
      var g = 0L
      var b = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          r += (p >> 16) & 0xFF
          g += (p >> 8) & 0xFF
          b += p & 0xFF
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Some(Array(w.toDouble, h.toDouble,
        r.toDouble / n, g.toDouble / n, b.toDouble / n))
    } catch { case _: Exception => None }
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

  /**
   * Nearest-neighbor resize of an uncompressed 24bpp BMP — the real
   * pixel transform of the image-preprocess stage (thumbnailing before
   * feature extraction), not a stub: walks the actual headers, maps in
   * IMAGE space (`src = (dst · srcDim) / dstDim`, floor — storage is
   * bottom-up so file rows are flipped on both sides), and emits a
   * valid BMP with correct row stride/padding. None if the input isn't
   * a 24bpp uncompressed BMP.
   */
  def resizeBmp(bytes: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] = {
    require(outW > 0 && outH > 0, s"bad target size ${outW}x$outH")
    if (bytes == null || bytes.length < 54 ||
      bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return None
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = b.getInt(10)
    val w = b.getInt(18)
    // negative biHeight = top-down row order; the row mapping below
    // assumes bottom-up storage, so accepting |h| would silently emit
    // a vertically flipped thumbnail — refuse like the other
    // unsupported variants instead (decodeBmp's whole-image mean is
    // orientation-insensitive, so abs stays correct there)
    val h = b.getInt(22)
    val bpp = b.getShort(28).toInt
    val compression = b.getInt(30)
    if (bpp != 24 || compression != 0 || w <= 0 || h <= 0) return None
    val srcStride = ((3 * w + 3) / 4) * 4
    if (dataOffset + srcStride.toLong * h > bytes.length) return None
    val outStride = ((3 * outW + 3) / 4) * 4
    val size = 14 + 40 + outStride * outH
    val out = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    out.putInt(40).putInt(outW).putInt(outH).putShort(1).putShort(24)
      .putInt(0).putInt(outStride * outH).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var fileRow = 0
    while (fileRow < outH) {
      val imgY = outH - 1 - fileRow
      val srcImgY = (imgY.toLong * h / outH).toInt
      val srcOff = dataOffset + (h - 1 - srcImgY) * srcStride
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * w / outW).toInt
        out.put(bytes(srcOff + 3 * sx))
          .put(bytes(srcOff + 3 * sx + 1))
          .put(bytes(srcOff + 3 * sx + 2))
        x += 1
      }
      var pad = 3 * outW
      while (pad < outStride) { out.put(0.toByte); pad += 1 }
      fileRow += 1
    }
    Some(out.array())
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

  /**
   * PCM WAV decimation (sample-and-hold downsample by an integer
   * factor): keep every `factor`-th FRAME across all channels, emit a
   * valid PCM16 WAV at `sampleRate / factor` — the audio face of
   * [[resizeBmp]]'s preprocessing (cut a 48 kHz capture to 16 kHz
   * before feature extraction), real chunk-walking and re-emission,
   * not a stub. (Proper band-limited resampling needs a filter; plain
   * decimation is the deterministic baseline and is what the oracle
   * models.) None if the input isn't PCM16 WAV.
   */
  def decimateWav(bytes: Array[Byte], factor: Int): Option[Array[Byte]] = {
    require(factor >= 1, s"factor must be >= 1: $factor")
    decodeWav(bytes) match {
      case None => None
      case Some(meta) =>
        val sampleRate = meta(0).toInt
        val channels = meta(1).toInt
        val nSamples = meta(2).toInt
        // locate the data chunk again (decodeWav validated the walk)
        val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        def ascii(off: Int, s: String): Boolean =
          s.indices.forall(i => bytes(off + i) == s.charAt(i).toByte)
        var pos = 12
        var dataOff = -1
        while (dataOff < 0 && pos + 8 <= bytes.length) {
          val size = b.getInt(pos + 4)
          if (ascii(pos, "data")) dataOff = pos + 8
          else pos += 8 + size + (size & 1)
        }
        val outFrames = (nSamples + factor - 1) / factor
        val outLen = outFrames * 2 * channels
        val out = ByteBuffer.allocate(44 + outLen)
          .order(ByteOrder.LITTLE_ENDIAN)
        out.put("RIFF".getBytes("US-ASCII")).putInt(36 + outLen)
          .put("WAVE".getBytes("US-ASCII"))
        out.put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(channels.toShort)
          .putInt(sampleRate / factor)
          .putInt(sampleRate / factor * 2 * channels)
          .putShort((2 * channels).toShort).putShort(16)
        out.put("data".getBytes("US-ASCII")).putInt(outLen)
        var f = 0
        while (f < outFrames) {
          val srcFrame = f * factor
          var c = 0
          while (c < channels) {
            out.putShort(b.getShort(dataOff + 2 * (srcFrame * channels + c)))
            c += 1
          }
          f += 1
        }
        Some(out.array())
    }
  }

  /** Format-valid PCM16 STEREO WAV (blockAlign 4), 120 frames with
    * ch0 = id%100 + i%40 and ch1 = 2·(id%100) − i%40, so the
    * interleaved mean is exactly 1.5·(id%100) — exercises the
    * multi-channel leg of [[decodeWav]] with a closed-form oracle. */
  def wavStereoBytes(id: Long): Array[Byte] = {
    val frames = 120
    val sampleRate = 8000 + (id % 4).toInt * 4000
    val dataLen = frames * 2 * 2
    val b = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(sampleRate).putInt(sampleRate * 4)
      .putShort(4).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    val base = (id % 100).toInt
    var i = 0
    while (i < frames) {
      b.putShort((base + i % 40).toShort)
      b.putShort((2 * base - i % 40).toShort)
      i += 1
    }
    b.array()
  }

  /** Format-valid 8-bit grayscale PNG (signature + IHDR + one IDAT +
    * IEND, real CRC32s, zlib-deflated filter-0 scanlines), pixel
    * (x, y) = id%200 + x + y like [[bmpBytes]] — so the mean has the
    * same closed form and the full inflate→un-filter decode path is
    * oracle-checkable. JDK zlib only; no codec library. */
  def pngBytes(id: Long): Array[Byte] = {
    val w = 8 + (id % 8).toInt
    val h = 8 + (id % 5).toInt
    val base = (id % 200).toInt
    val raw = new Array[Byte]((1 + w) * h)
    var y = 0
    var p = 0
    while (y < h) {
      raw(p) = 0 // filter type 0 (None) per scanline
      p += 1
      var x = 0
      while (x < w) { raw(p) = (base + x + y).toByte; p += 1; x += 1 }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    var n = 0
    while (!deflater.finished())
      n += deflater.deflate(buf, n, buf.length - n)
    deflater.end()
    val idat = java.util.Arrays.copyOf(buf, n)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = ByteBuffer.allocate(12 + data.length) // PNG is big-endian
      out.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII"))
      crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(0.toByte)  // color type 0 = grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/no interlace
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr.array()) ++ chunk("IDAT", idat) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Parse an 8-bit grayscale non-interlaced PNG for REAL: walk the
    * chunk list, concatenate IDAT, inflate with JDK zlib, reconstruct
    * scanlines through all five PNG filter types. Returns
    * [width, height, bitDepth, mean pixel]; None when the bytes aren't
    * a PNG this decoder supports. */
  def decodePng(bytes: Array[Byte]): Option[Array[Double]] = {
    if (bytes == null || bytes.length < 45) return None
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
    if (!sig.indices.forall(i => (bytes(i) & 0xFF) == (sig(i) & 0xFF)))
      return None
    val b = ByteBuffer.wrap(bytes) // big-endian by default
    var pos = 8
    var w = 0; var h = 0; var depth = 0; var colorType = -1
    var interlace = 0
    val idat = new java.io.ByteArrayOutputStream()
    var ended = false
    while (!ended && pos + 12 <= bytes.length) {
      val len = b.getInt(pos)
      if (len < 0 || pos + 12 + len > bytes.length) return None
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" if len == 13 =>
          w = b.getInt(pos + 8); h = b.getInt(pos + 12)
          depth = bytes(pos + 16) & 0xFF
          colorType = bytes(pos + 17) & 0xFF
          interlace = bytes(pos + 20) & 0xFF
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => ended = true
        case _      => () // ancillary chunks skipped
      }
      pos += 12 + len
    }
    if (!ended || w <= 0 || h <= 0 || depth != 8 || colorType != 0 ||
      interlace != 0) return None
    val raw = new Array[Byte]((1 + w) * h)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var n = 0
      while (n < raw.length && !inf.finished()) {
        val k = inf.inflate(raw, n, raw.length - n)
        if (k == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        n += k
      }
      if (n < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // scanline reconstruction, bpp = 1 byte (grayscale 8-bit)
    val img = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (w + 1)) & 0xFF
      if (ft > 4) return None
      var x = 0
      while (x < w) {
        val cur = raw(y * (w + 1) + 1 + x) & 0xFF
        val a = if (x > 0) img(y * w + x - 1) else 0
        val up = if (y > 0) img((y - 1) * w + x) else 0
        val c = if (x > 0 && y > 0) img((y - 1) * w + x - 1) else 0
        img(y * w + x) = ft match {
          case 0 => cur
          case 1 => (cur + a) & 0xFF
          case 2 => (cur + up) & 0xFF
          case 3 => (cur + (a + up) / 2) & 0xFF
          case _ => // 4 = Paeth
            val p0 = a + up - c
            val pa = math.abs(p0 - a)
            val pb = math.abs(p0 - up)
            val pc = math.abs(p0 - c)
            val pred = if (pa <= pb && pa <= pc) a
                       else if (pb <= pc) up else c
            (cur + pred) & 0xFF
        }
        x += 1
      }
      y += 1
    }
    var sum = 0L
    var i = 0
    while (i < img.length) { sum += img(i); i += 1 }
    Some(Array(w.toDouble, h.toDouble, depth.toDouble,
      sum.toDouble / (w.toLong * h)))
  }

  /** Real-payload synthesis over the PNG/stereo-WAV pair: PNG for even
    * ids, stereo PCM WAV for odd — the payload column shape
    * [[decodeMedia]] consumes. */
  /** One GIF image descriptor + real 9-bit LZW stream (CLEAR before
    * every literal — valid, dictionary-free) for pixel values
    * `value(x, y)`; shared by the single- and multi-frame writers. */
  private def writeGifFrame(out: java.io.ByteArrayOutputStream,
                            w: Int, h: Int,
                            value: (Int, Int) => Int): Unit = {
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write(0x2C) // image descriptor
    u16(0); u16(0); u16(w); u16(h)
    out.write(0)    // no local table, not interlaced
    out.write(8)    // LZW minimum code size
    // 9-bit codes, LSB-first bit packing, CLEAR(256) before each literal
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nBits = 0
    def putCode(c: Int): Unit = {
      acc |= c.toLong << nBits
      nBits += 9
      while (nBits >= 8) {
        bits.write((acc & 0xFF).toInt)
        acc >>>= 8
        nBits -= 8
      }
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { putCode(256); putCode(value(x, y)); x += 1 }
      y += 1
    }
    putCode(257) // end of information
    if (nBits > 0) bits.write((acc & 0xFF).toInt)
    val data = bits.toByteArray
    var off = 0
    while (off < data.length) { // 255-byte sub-blocks
      val n = math.min(255, data.length - off)
      out.write(n)
      out.write(data, off, n)
      off += n
    }
    out.write(0)    // block terminator
  }

  private def gifHeader(out: java.io.ByteArrayOutputStream,
                        w: Int, h: Int): Unit = {
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF87a".getBytes("US-ASCII"))
    u16(w); u16(h)
    out.write(0xF7) // GCT present, 8-bit resolution, 256 entries
    out.write(0)    // background color index
    out.write(0)    // aspect ratio
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
  }

  /** Format-valid single-frame GIF (grayscale GCT, real LZW), pixel
    * `id%200 + x + y`. */
  def gifBytes(id: Long): Array[Byte] = {
    val w = 8 + (id % 8).toInt
    val h = 8 + (id % 5).toInt
    val base = (id % 200).toInt
    val out = new java.io.ByteArrayOutputStream()
    gifHeader(out, w, h)
    writeGifFrame(out, w, h, (x, y) => base + x + y)
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Format-valid MULTI-frame GIF — `frames` image descriptors, each
    * with its own real LZW stream; frame f's pixel (x, y) value is
    * `id%200 + 3f + x + y` (closed-form per-frame mean for the
    * oracle). The structural "video": frame sampling runs against a
    * real container with a real per-frame decode. */
  def gifAnimBytes(id: Long, frames: Int): Array[Byte] = {
    require(frames >= 1, s"frames must be >= 1: $frames")
    val w = 8 + (id % 8).toInt
    val h = 8 + (id % 5).toInt
    val base = (id % 200).toInt
    val out = new java.io.ByteArrayOutputStream()
    gifHeader(out, w, h)
    var f = 0
    while (f < frames) {
      val b = base + 3 * f
      writeGifFrame(out, w, h, (x, y) => b + x + y)
      f += 1
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** All frames of a (possibly multi-image) GIF, each as
    * [width, height, 8, mean-palette-red] — the same real LZW decode
    * as [[decodeGif]], continued past the first image descriptor.
    * None if the container or any frame is malformed. */
  def decodeGifFrames(bytes: Array[Byte]): Option[Array[Array[Double]]] = {
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    if (bytes == null || bytes.length < 14) return None
    val hdr = new String(bytes, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    def u16(off: Int): Int = (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8)
    var pos = 6
    pos += 4 // screen w/h (per-image size is authoritative below)
    val packed = bytes(pos) & 0xFF
    pos += 3 // packed, background, aspect
    var palette: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (pos + 3 * n > bytes.length) return None
      palette = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * n)
      pos += 3 * n
    }
    while (pos < bytes.length) {
      (bytes(pos) & 0xFF) match {
        case 0x3B => // trailer: done
          return if (frames.isEmpty) None else Some(frames.toArray)
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          while (pos < bytes.length && (bytes(pos) & 0xFF) != 0)
            pos += 1 + (bytes(pos) & 0xFF)
          pos += 1
        case 0x2C =>
          if (pos + 10 > bytes.length) return None
          val w = u16(pos + 5); val h = u16(pos + 7)
          val ipacked = bytes(pos + 9) & 0xFF
          pos += 10
          // interlace (ipacked & 0x40) permutes ROW ORDER only — the
          // LZW stream and pixel multiset are identical, and every
          // feature this decoder returns (w, h, depth, mean) is
          // row-permutation-invariant, so both variants decode alike
          var pal = palette
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 7)
            if (pos + 3 * n > bytes.length) return None
            pal = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * n)
            pos += 3 * n
          }
          if (pal == null || w <= 0 || h <= 0) return None
          if (pos >= bytes.length) return None // truncated before LZW
          val minCode = bytes(pos) & 0xFF
          pos += 1
          if (minCode < 2 || minCode > 8) return None
          // concatenate data sub-blocks (terminator consumed below so
          // the block walk can continue to the NEXT frame/trailer)
          val data = new java.io.ByteArrayOutputStream()
          while (pos < bytes.length && (bytes(pos) & 0xFF) != 0) {
            val n = bytes(pos) & 0xFF
            if (pos + 1 + n > bytes.length) return None
            data.write(bytes, pos + 1, n)
            pos += 1 + n
          }
          pos += 1 // consume the 0x00 block terminator
          val d = data.toByteArray
          // general LZW decode
          val clear = 1 << minCode
          val eoi = clear + 1
          val prefix = new Array[Int](4096)
          val suffix = new Array[Byte](4096)
          var next = eoi + 1
          var width = minCode + 1
          var prev = -1
          val pixels = new java.io.ByteArrayOutputStream(w * h)
          val stack = new Array[Byte](4096)
          def firstByte(code: Int): Byte = {
            var c = code
            while (c >= clear) c = prefix(c)
            c.toByte
          }
          def emit(code: Int): Unit = {
            var sp = 0
            var c = code
            while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
            pixels.write(c)
            while (sp > 0) { sp -= 1; pixels.write(stack(sp)) }
          }
          var acc = 0L
          var nBits = 0
          var bi = 0
          var done = false
          while (!done && pixels.size < w * h) {
            while (nBits < width && bi < d.length) {
              acc |= (d(bi) & 0xFFL) << nBits
              nBits += 8
              bi += 1
            }
            if (nBits < width) done = true // truncated stream
            else {
              val code = (acc & ((1L << width) - 1)).toInt
              acc >>>= width
              nBits -= width
              if (code == clear) { next = eoi + 1; width = minCode + 1; prev = -1 }
              else if (code == eoi) done = true
              else if (code > next || (code == next && prev < 0)) return None
              else {
                if (prev >= 0 && next < 4096) {
                  prefix(next) = prev
                  suffix(next) =
                    if (code == next) firstByte(prev) else firstByte(code)
                  next += 1
                  if (next == (1 << width) && width < 12) width += 1
                }
                emit(code)
                prev = code
              }
            }
          }
          val px = pixels.toByteArray
          if (px.length != w * h) return None
          var sum = 0.0
          var j = 0
          while (j < px.length) {
            val idx = px(j) & 0xFF
            if (3 * idx + 2 >= pal.length) return None
            sum += (pal(3 * idx) & 0xFF)
            j += 1
          }
          frames += Array(w.toDouble, h.toDouble, 8.0, sum / (w * h))
        case _ => return None
      }
    }
    if (frames.isEmpty) None else Some(frames.toArray)
  }

  /** Parse a GIF for REAL (first frame): header + logical screen
    * descriptor, global color table, extension skipping, then a full
    * variable-width LZW decode (dictionary rebuild, 9→12-bit growth,
    * deferred clear). Returns [width, height, bitDepth=8, mean of the
    * palette red channel]; None when the bytes are not a GIF this
    * decoder supports. */
  def decodeGif(bytes: Array[Byte]): Option[Array[Double]] =
    decodeGifFrames(bytes).map(_.head)

  /** Frame sampling: every `k`-th frame's features (indices 0, k, 2k,
    * …) — the video-side preprocess step (sample frames before
    * feature extraction), run on a REAL multi-frame container with a
    * real per-frame decode, not a stub. */
  def frameSample(bytes: Array[Byte], k: Int): Option[Array[Array[Double]]] = {
    require(k >= 1, s"k must be >= 1: $k")
    decodeGifFrames(bytes).map(_.zipWithIndex.collect {
      case (f, i) if i % k == 0 => f
    })
  }

  /** GIF payloads for every id — the LZW leg of the real-decode gate. */
  def synthesizeGif(df: DataFrame, idCol: String): DataFrame = {
    val gen = udf((id: Long) => gifBytes(id))
    spreadIds(df, idCol).select(col(idCol), gen(col(idCol)).as("payload"))
  }

  def synthesizeJpeg(df: DataFrame, idCol: String): DataFrame = {
    val gen = udf((id: Long) => jpegBytes(id))
    spreadIds(df, idCol).select(col(idCol), gen(col(idCol)).as("payload"))
  }

  def synthesizePngWav(df: DataFrame, idCol: String): DataFrame = {
    val gen = udf((id: Long) =>
      if (id % 2 == 0) pngBytes(id) else wavStereoBytes(id))
    spreadIds(df, idCol).select(col(idCol), gen(col(idCol)).as("payload"))
  }

  /** Fan a single-split scan's id projection across the cores before
    * the synth/encode/decode kernels attach — the kernels (deflate,
    * huffman, IDCT) dominate per-row cost and would otherwise run in
    * the scan's one serial task (graft.ops.Dispatch.fanOut scaladoc;
    * no-op at production scan parallelism). */
  private def spreadIds(df: DataFrame, idCol: String): DataFrame =
    Dispatch.fanOut(df.select(col(idCol)), col(idCol))

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
    Dispatch.fanOut(df.select(col(idCol), col(textCol)), col(idCol))
      .withColumn("payload", gen(col(idCol), col(textCol)))
      .select(col(idCol), col("payload"),
        struct(
          mediaType.as("media_type"),
          octet_length(col("payload")).cast("long").as("byte_length"),
          md5(col("payload")).as("checksum")).as("media_meta"))
  }

  /**
   * REAL batched decode: sniff magic bytes per payload and parse — BMP,
   * PCM WAV (mono or multi-channel) and 8-bit grayscale PNG genuinely
   * (headers, stride, RIFF chunk walk, zlib inflate + filter
   * reconstruction), everything else through the documented
   * [[stubDecode]] fallback. Same narrow mapPartitions batch shape as
   * [[decodeFeatures]].
   */
  /** Format-valid 24bpp BMP with a deterministic per-key binary
    * pattern (multiplicative-hash checkerboard, 32×32): equal keys ⇒
    * byte-identical images; distinct keys ⇒ uncorrelated patterns.
    * The image-dedup fixture generator ([[dHash64]] spec + gate). */
  def bmpPatternBytes(key: Long): Array[Byte] = {
    val w = 32
    val h = 32
    val stride = ((3 * w + 3) / 4) * 4
    val size = 14 + 40 + stride * h
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(stride * h).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var fileRow = 0
    while (fileRow < h) {
      val y = h - 1 - fileRow
      var x = 0
      while (x < w) {
        // full-avalanche mix (murmur3 finalizer): a low bit of a mere
        // linear combination is a phase-shifted stripe pattern, and
        // translated stripes COLLIDE under gradient hashing — the
        // whole point of distinct keys is uncorrelated patterns
        var m = key * 0x9E3779B97F4A7C15L + x * 0xC2B2AE3D27D4EB4FL +
          y * 0x165667B19E3779F9L
        m ^= (m >>> 33); m *= 0xFF51AFD7ED558CCDL
        m ^= (m >>> 33); m *= 0xC4CEB9FE1A85EC53L
        m ^= (m >>> 33)
        val v = if ((m & 1L) == 1L) 255.toByte else 0.toByte
        b.put(v).put(v).put(v)
        x += 1
      }
      var pad = 3 * w
      while (pad < stride) { b.put(0.toByte); pad += 1 }
      fileRow += 1
    }
    b.array()
  }

  /**
   * 64-bit perceptual difference hash (dHash) of an encoded image —
   * the image twin of text SimHash: downsample to a 9×8 grayscale
   * grid, emit one bit per horizontally-adjacent pair (left < right).
   * Uniform brightness/contrast shifts preserve the gradient signs,
   * so re-encodes and mild edits land within a few bits while
   * unrelated images are ~32 bits apart.
   *
   * Decode goes through the JDK's bundled imageio readers (BMP, PNG,
   * GIF, JPEG — no external codec library); the downsample is
   * integer box-average pooling over exact pixel boxes, NOT a
   * Graphics2D filter, so the hash is bit-deterministic for lossless
   * formats on any JVM/platform. Returns None for undecodable bytes.
   */
  def dHash64(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < 2 || img.getHeight < 1) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val g = Array.ofDim[Double](8, 9)
        var ty = 0
        while (ty < 8) {
          var tx = 0
          while (tx < 9) {
            val x0 = tx * w / 9
            val x1 = math.max(x0 + 1, (tx + 1) * w / 9)
            val y0 = ty * h / 8
            val y1 = math.max(y0 + 1, (ty + 1) * h / 8)
            var sum = 0L
            var n = 0
            var y = y0
            while (y < math.min(y1, h)) {
              var x = x0
              while (x < math.min(x1, w)) {
                val p = img.getRGB(x, y)
                // integer ITU-R 601 luma ×1000 — exact, order-free
                sum += 299L * ((p >> 16) & 0xFF) +
                  587L * ((p >> 8) & 0xFF) + 114L * (p & 0xFF)
                n += 1
                x += 1
              }
              y += 1
            }
            g(ty)(tx) = if (n == 0) 0.0 else sum.toDouble / n
            tx += 1
          }
          ty += 1
        }
        var hash = 0L
        var bit = 0
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            if (g(yy)(xx) < g(yy)(xx + 1)) hash |= (1L << bit)
            bit += 1
            xx += 1
          }
          yy += 1
        }
        Some(hash)
      }
    } catch { case _: Exception => None }
  }

  /**
   * Per-image dHash over a payload column — the batched mapPartitions
   * narrow pass of [[decodeMedia]] (decode never leaves the
   * executor); undecodable payloads drop with a counted absence, not
   * a poisoned row. Output: (idCol, dhash).
   */
  def imageDHashes(withPayload: DataFrame, idCol: String,
                   batchSize: Int = 64): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(idCol,
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("dhash",
          org.apache.spark.sql.types.LongType, nullable = false)))))
    val idIdx = withPayload.schema.fieldIndex(idCol)
    val payloadIdx = withPayload.schema.fieldIndex("payload")
    withPayload.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          dHash64(r.getAs[Array[Byte]](payloadIdx))
            .map(hs => Row(r.getLong(idIdx), hs))
        }
      }
    }(enc)
  }

  /**
   * Near-duplicate image pairs: dHash each payload, then the SAME
   * 64-bit hamming dispatch the text family uses
   * ([[graft.ops.TextDedup.hammingPairs64]] — lossless pigeonhole
   * blocks or tiled all-pairs). One fingerprint pass over the bytes;
   * everything after is modality-blind. Output (id_a, id_b, hamming).
   */
  def imageNearDup(withPayload: DataFrame, idCol: String,
                   maxHamming: Int = 4): DataFrame =
    TextDedup.hammingPairs64(imageDHashes(withPayload, idCol),
      idCol, "dhash", maxHamming)

  /** Format-valid PCM16 mono WAV with a deterministic per-key sample
    * pattern (murmur3-finalizer mix, 2080 samples @ 8 kHz): equal
    * keys ⇒ byte-identical audio; distinct keys ⇒ uncorrelated
    * energy envelopes. The audio-dedup fixture generator. */
  def wavPatternBytes(key: Long): Array[Byte] = {
    val n = 2080
    val dataLen = n * 2
    val b = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      var m = key * 0x9E3779B97F4A7C15L + i * 0xC2B2AE3D27D4EB4FL
      m ^= (m >>> 33); m *= 0xFF51AFD7ED558CCDL
      m ^= (m >>> 33); m *= 0xC4CEB9FE1A85EC53L
      m ^= (m >>> 33)
      b.putShort(((m & 0x3FFFL) - 8192L).toShort)
      i += 1
    }
    b.array()
  }

  /**
   * 64-bit audio fingerprint — the PCM twin of [[dHash64]]: pool the
   * stream into 65 equal frame windows (exact integer box bounds, the
   * dHash pooling), take per-window energy Σ(Σ_channels s)², emit one
   * bit per adjacent window pair (left < right). Energy-envelope
   * shape survives gain changes in rank ordering; unrelated audio is
   * ~32 bits apart. Exact long arithmetic — bit-deterministic on any
   * JVM. None for non-PCM16 input or fewer than 65 frames.
   */
  def audioFingerprint64(bytes: Array[Byte]): Option[Long] =
    decodeWav(bytes) match {
      case None => None
      case Some(meta) =>
        val channels = meta(1).toInt
        val nSamples = meta(2).toInt
        if (nSamples < 65) None
        else {
          val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
          def ascii(off: Int, s: String): Boolean =
            s.indices.forall(i => bytes(off + i) == s.charAt(i).toByte)
          var pos = 12
          var dataOff = -1
          while (dataOff < 0 && pos + 8 <= bytes.length) {
            val size = b.getInt(pos + 4)
            if (ascii(pos, "data")) dataOff = pos + 8
            else pos += 8 + size + (size & 1)
          }
          val e = new Array[Long](65)
          var w = 0
          while (w < 65) {
            val f0 = w * nSamples / 65
            val f1 = math.max(f0 + 1, (w + 1) * nSamples / 65)
            var sum = 0L
            var f = f0
            while (f < math.min(f1, nSamples)) {
              var v = 0L
              var c = 0
              while (c < channels) {
                v += b.getShort(dataOff + 2 * (f * channels + c))
                c += 1
              }
              sum += v * v
              f += 1
            }
            e(w) = sum
            w += 1
          }
          var hash = 0L
          var bit = 0
          while (bit < 64) {
            if (e(bit) < e(bit + 1)) hash |= (1L << bit)
            bit += 1
          }
          Some(hash)
        }
    }

  /** Per-clip [[audioFingerprint64]] over a payload column — batched
    * narrow pass, undecodable payloads drop. Output: (idCol, afp). */
  def audioFingerprints(withPayload: DataFrame, idCol: String,
                        batchSize: Int = 64): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(idCol,
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("afp",
          org.apache.spark.sql.types.LongType, nullable = false)))))
    val idIdx = withPayload.schema.fieldIndex(idCol)
    val payloadIdx = withPayload.schema.fieldIndex("payload")
    withPayload.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          audioFingerprint64(r.getAs[Array[Byte]](payloadIdx))
            .map(hs => Row(r.getLong(idIdx), hs))
        }
      }
    }(enc)
  }

  /** Near-duplicate audio pairs through the SAME 64-bit hamming
    * dispatch as text SimHash and image dHash — fingerprint once,
    * then modality-blind. Output (id_a, id_b, hamming). */
  def audioNearDup(withPayload: DataFrame, idCol: String,
                   maxHamming: Int = 4): DataFrame =
    TextDedup.hammingPairs64(audioFingerprints(withPayload, idCol),
      idCol, "afp", maxHamming)

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
            .orElse(decodePng(payload).map(("image/png", _)))
            .orElse(decodeGif(payload).map(("image/gif", _)))
            .orElse(decodeJpeg(payload).map(("image/jpeg", _)))
            .getOrElse(("application/octet-stream", stubDecode(payload)))
          Row(r.getLong(idIdx), mt,
            if (payload == null) 0L else payload.length.toLong, feats.toSeq)
        }
      }
    }(enc)
  }
}
