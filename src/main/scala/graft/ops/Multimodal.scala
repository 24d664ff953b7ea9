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
}
