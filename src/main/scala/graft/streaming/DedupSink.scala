package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.{Clusters, TextDedup}

/**
 * Streaming near-dup-filtered ingestion — the crawl loop run
 * CONTINUOUSLY: each document micro-batch is deduplicated against
 * everything ingested so far (the persisted MinHash index), then
 * against itself, and only the novel survivors are published to the
 * corpus and appended to the index — so the NEXT batch dedups against
 * the grown corpus without ever re-shingling it. This is the streaming
 * face of [[graft.ops.TextDedup.dedupIncremental]] with the index
 * (not the raw corpus) as the accumulated state.
 *
 * Idempotence under Structured Streaming's replay contract, per effect:
 *  - corpus publish: survivors land under
 *    `<corpusPath>/ingest_batch=<id>/` in overwrite mode — a replay
 *    rewrites the same directory with the same rows (hive-style, so a
 *    corpus read carries an `ingest_batch` lineage column for free);
 *  - index append: guarded by a batch-id marker INSIDE the index
 *    directory (underscore-prefixed — parquet readers ignore it). A
 *    crash between the append and the marker can replay one append;
 *    duplicated index rows are DECISION-NEUTRAL by construction — the
 *    probe's candidate set is `distinct()` over (batch, corpus) ids
 *    and the sink collapses links per batch id — so a replay can only
 *    waste index bytes, never change which documents survive
 *    ([[TextDedup.appendMinhashIndex]] documents the same property).
 *
 * Scale shape: a micro-batch pays batch-sized prep plus the probe's
 * bloom/pushdown-pruned index touch ([[TextDedup.minhashProbeIndexed]]
 * — corpus rows that cannot share a band never shuffle) and an
 * LSH-banded self-join of the batch alone. Nothing in the loop is
 * proportional to corpus size except the pruned index scan.
 */
object DedupSink {

  private val Marker = "_graft_dedup_batch"

  /** Last batch id whose survivors were appended to the index at
    * `indexPath`, or -1 if none. */
  def lastAppliedBatch(spark: SparkSession, indexPath: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/$Marker")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](32)
        val n = in.read(buf)
        // an unreadable or garbled marker means "no batch durably
        // recorded" — the worst a crash-truncated marker may cost is
        // one replayed (idempotent) application, never a wedged stream
        if (n <= 0) -1L
        else scala.util.Try(new String(buf, 0, n, "UTF-8").trim.toLong)
          .getOrElse(-1L)
      } finally in.close()
    }
  }

  /**
   * Apply ONE micro-batch: drop batch docs near-duplicating the
   * indexed corpus, collapse near-dup groups WITHIN the batch to their
   * min-id survivor, publish survivors, grow the index. Public so
   * specs and backfills drive the exact code the streaming query runs.
   * Returns the survivors written (empty frame if the batch was a
   * replay).
   */
  def applyBatch(spark: SparkSession, indexPath: String, corpusPath: String,
                 idCol: String, textCol: String, jaccardThreshold: Double,
                 batch: DataFrame, batchId: Long,
                 compactEvery: Long = 0L): DataFrame = {
    import spark.implicits._
    if (batchId <= lastAppliedBatch(spark, indexPath)) {
      // replay: nothing re-applies, and the call yields the SAME value
      // the original application returned — the written survivors
      val dirP = new org.apache.hadoop.fs.Path(
        s"$corpusPath/ingest_batch=$batchId")
      val dfs = dirP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      return if (dfs.exists(dirP)) spark.read.parquet(dirP.toString)
      else batch.limit(0)
    }
    // batch params MUST be the index's own (meta read) — the probe
    // already enforces that; the within-batch pass reads them too so
    // the two stages can never shingle differently
    val (shingleLen, numHashes, bands, seed) =
      spark.read.parquet(s"$indexPath/meta")
        .select(col("shingle_len").cast("int"),
          col("num_hashes").cast("int"), col("bands").cast("int"),
          col("seed").cast("long"))
        .as[(Int, Int, Int, Long)].head()
    // self-links excluded: after a crash BETWEEN the index append and
    // the marker write, a replayed batch finds its own survivors in the
    // index (jaccard 1.0 against themselves) — without this filter the
    // replay would drop every survivor and overwrite the published
    // directory with an empty set. Under the unique-ids contract
    // (batch ids never collide with prior corpus ids) this is a no-op
    // on the normal path, so applyBatch is deterministic under replay
    // regardless of marker state.
    val linkedIds = TextDedup.minhashProbeIndexed(spark, indexPath, batch,
      idCol, textCol, jaccardThreshold)
      .filter(col("batch_id") =!= col("corpus_id"))
      .select(col("batch_id").as(idCol)).distinct()
    val novel = batch.join(linkedIds, Seq(idCol), "left_anti")
    val intraPairs = TextDedup.minhashLshPairs(novel, idCol, textCol,
      shingleLen, numHashes, bands, jaccardThreshold, seed)
    val survivors = Clusters.dedupByPairs(novel, idCol, intraPairs)
      .persist()
    survivors.write.mode("overwrite")
      .parquet(s"$corpusPath/ingest_batch=$batchId")
    TextDedup.appendMinhashIndex(survivors, idCol, textCol, indexPath)
    // marker publish is write-temp-then-rename (the Layout.atomicSwap
    // discipline): a crash mid-write leaves only the temp file, so the
    // visible marker is always a complete value — never empty (which
    // would read as -1 and replay one batch, harmless) and never
    // truncated garbage
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val markerP = new org.apache.hadoop.fs.Path(s"$indexPath/$Marker")
    val tmpP = new org.apache.hadoop.fs.Path(
      s"$indexPath/.${Marker}.tmp")
    val out = fs.create(tmpP, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(markerP, false)
    require(fs.rename(tmpP, markerP),
      s"failed to publish batch marker $markerP")
    survivors.unpersist()
    // periodic maintenance INSIDE the loop: every append adds files,
    // and at streaming cadence the band dirs accumulate exactly the
    // small-files problem compaction exists for. Runs AFTER the batch
    // marker — a replayed compaction is harmless (idempotent rewrite),
    // answers are unchanged by contract (spec-pinned).
    if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
      TextDedup.compactMinhashIndex(spark, indexPath)
    // return the WRITTEN rows, not the live plan: after the index
    // append, re-evaluating the survivors lineage would probe the
    // grown index — where every survivor now links to ITSELF — and
    // silently come back empty once the probe's interior caches evict
    spark.read.parquet(s"$corpusPath/ingest_batch=$batchId")
  }

  /**
   * Start the continuous dedup-ingest: `stream` (a streaming DataFrame
   * with at least `idCol` and `textCol`) filters through the index at
   * `indexPath` and publishes survivors under `corpusPath`. Seed the
   * index first with [[TextDedup.saveMinhashIndex]] (an empty corpus
   * with the chosen hash params is fine) — the hash geometry is
   * immutable for the index's lifetime, so it must be an explicit
   * choice, not a silent default.
   */
  def start(stream: DataFrame, indexPath: String, corpusPath: String,
            idCol: String, textCol: String, jaccardThreshold: Double,
            checkpointDir: String, queryName: String = "graft_dedup_sink",
            trigger: Trigger = Trigger.AvailableNow(),
            compactEvery: Long = 0L): StreamingQuery = {
    val spark = stream.sparkSession
    require(new org.apache.hadoop.fs.Path(s"$indexPath/meta")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(s"$indexPath/meta")),
      s"seed the index first: $indexPath/meta does not exist")
    stream.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, indexPath, corpusPath, idCol, textCol,
          jaccardThreshold, batch, batchId, compactEvery): Unit
      }
      .start()
  }
}
