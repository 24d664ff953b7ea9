package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Merger, MergeSpec}
import graft.ops.Layout

/**
 * Streaming upsert into a parquet store — the reference's import job
 * (csv_driver.rb load→match→merge) run CONTINUOUSLY: each micro-batch
 * merges into the current target through the same [[Merger]] the batch
 * path uses, and the new target generation is promoted with the same
 * write-then-swap job-commit atomicity as the rest of the store
 * ([[Layout.atomicSwap]]).
 *
 * Exactly-once discipline (the standard idempotent-foreachBatch
 * contract): Structured Streaming may REPLAY a micro-batch after a
 * failure, so the sink records the last applied batch id INSIDE the
 * store directory (an `_`-prefixed marker parquet readers ignore) and
 * skips any batch it has already applied — replays become no-ops
 * instead of double-merges. Because the marker rides the SAME
 * directory swap as the data, batch id and data can never disagree:
 * there is no crash window where the data generation is promoted but
 * the recorded batch id is stale (a two-swap meta table would have
 * exactly that window, and a replay after it would double-merge).
 *
 * Scale shape: each micro-batch is one [[Merger.merge]] — the batch
 * family's plan (staged equi-joins, min_by best-per-target, anti-join
 * inserts), so everything said about the merge family at 100 TB holds
 * per batch; the store rewrite is proportional to the TARGET size, so
 * size micro-batches accordingly (many small batches against a huge
 * target want a table format with row-level upsert instead — out of
 * scope by design, SURVEY §2.10 D5).
 */
object MergeSink {

  private val Marker = "_graft_sink_batch"

  /** Last batch id applied to the store (read from the in-directory
    * marker), or -1 if none. */
  def lastAppliedBatch(spark: SparkSession, targetPath: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$targetPath/$Marker")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](32)
        val n = in.read(buf)
        if (n <= 0) -1L else new String(buf, 0, n, "UTF-8").trim.toLong
      } finally in.close()
    }
  }

  /**
   * Apply ONE micro-batch to the store: no-op if `batchId` was already
   * applied (replay), else merge into a tmp generation, stamp the
   * batch id marker INSIDE it, and promote with one atomic swap.
   * Public so specs (and backfills) can drive the exact code the
   * streaming query runs.
   */
  def applyBatch(spark: SparkSession, targetPath: String, spec: MergeSpec,
                 batch: DataFrame, batchId: Long): Unit = {
    if (batchId <= lastAppliedBatch(spark, targetPath)) return
    val target = spark.read.parquet(targetPath)
    val result = Merger.merge(batch, target, spec)
    val tmp = s"$targetPath.__batch$batchId"
    // materialize the new generation BEFORE touching the live dir: the
    // merge plan reads the CURRENT store, so the write must not
    // overwrite its own input (classic read-write cycle)
    result.newTarget.write.mode("overwrite").parquet(tmp)
    result.unpersist()
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$tmp/$Marker"), true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    Layout.atomicSwap(spark, tmp, targetPath)
  }

  /**
   * Start the continuous merge: `stream` (a streaming DataFrame with
   * the source's conformed schema) upserts into the parquet table at
   * `targetPath` under `spec`. The caller seeds `targetPath` with the
   * initial target (an empty frame with the right schema is fine)
   * before starting — an explicit bootstrap beats a silently-invented
   * schema.
   */
  def start(stream: DataFrame, targetPath: String, checkpointDir: String,
            spec: MergeSpec, queryName: String = "graft_merge_sink",
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val spark = stream.sparkSession
    require(new org.apache.hadoop.fs.Path(targetPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(targetPath)),
      s"seed the target store first: $targetPath does not exist")
    stream.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, targetPath, spec, batch, batchId)
      }
      .start()
  }
}
