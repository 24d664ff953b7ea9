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
 * failure, so the sink records the last applied batch id in a meta
 * table beside the data and skips any batch it has already applied —
 * replays become no-ops instead of double-merges. The meta write rides
 * the same swap as the data write (meta and data promote together or
 * not at all, up to the crash windows documented on [[Layout
 * .atomicSwap]]).
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

  private def metaPath(targetPath: String) = s"$targetPath.__sinkmeta"

  /** Last batch id recorded in the meta table, or -1 if none. */
  def lastAppliedBatch(spark: SparkSession, targetPath: String): Long = {
    val p = new org.apache.hadoop.fs.Path(metaPath(targetPath))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else spark.read.parquet(metaPath(targetPath))
      .agg(max(col("batch_id"))).collect()(0) match {
        case r if r.isNullAt(0) => -1L
        case r => r.getLong(0)
      }
  }

  /**
   * Apply ONE micro-batch to the store: no-op if `batchId` was already
   * applied (replay), else merge + swap-promote data and meta.
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
    Layout.atomicSwap(spark, tmp, targetPath)
    val metaTmp = s"${metaPath(targetPath)}.__batch$batchId"
    spark.range(1).select(lit(batchId).as("batch_id"))
      .repartition(1).write.mode("overwrite").parquet(metaTmp)
    Layout.atomicSwap(spark, metaTmp, metaPath(targetPath))
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
