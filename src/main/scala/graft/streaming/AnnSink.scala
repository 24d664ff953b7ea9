package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Similarity

/**
 * Streaming SEMANTIC-dedup ingestion — [[DedupSink]]'s embedding-space
 * twin: each vector micro-batch is near-dup-filtered against
 * everything ingested so far (the persisted IVF-PQ index), then
 * against itself (SemDeDup on the batch alone), and only the novel
 * survivors publish to the corpus and append to the index — the next
 * batch dedups against the grown corpus without ever re-encoding it.
 * This is the continuous face of "train-once, ingest-forever"
 * embedding curation: the coarse cells and the PQ codebook are fixed
 * at index build (the FAISS add convention), batches pay
 * batch×probed-cells work, and nothing in the loop is proportional to
 * corpus size except the input-split-pruned codes scan.
 *
 * Idempotence under Structured Streaming's replay contract — one
 * deliberate divergence from [[DedupSink]]: duplicated INDEX rows are
 * NOT decision-neutral for a top-k probe (a replayed append would
 * consume shortlist slots with stale copies), so instead of
 * tolerating replayed appends this sink makes the append itself
 * effectively idempotent with a WRITE-AHEAD intent marker:
 *  - corpus publish: survivors land under
 *    `<corpusPath>/ingest_batch=<id>/` in overwrite mode (replay
 *    rewrites the same rows — survivors are deterministic, and the
 *    probe's built-in self-pair exclusion means a replayed batch
 *    never links against its own indexed copies);
 *  - index append: an intent marker naming the batch is published
 *    BEFORE the append, the batch marker after it. Spark's job-level
 *    output commit makes [[Similarity.appendIvfPqIndex]]
 *    all-or-nothing, so on re-drive the only ambiguous state is
 *    intent == batch with no batch marker — and there ONE survivor
 *    id's existence in the codes table decides it completely (all
 *    survivors landed or none did). The existence scan runs only on
 *    crash recovery, never on the normal path.
 */
object AnnSink {

  private val Marker = "_graft_ann_batch"
  private val Intent = "_graft_ann_intent"

  private def readLongMarker(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](32)
        val n = in.read(buf)
        if (n <= 0) -1L
        else scala.util.Try(new String(buf, 0, n, "UTF-8").trim.toLong)
          .getOrElse(-1L)
      } finally in.close()
    }
  }

  private def writeLongMarker(spark: SparkSession, path: String,
                              v: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(
      p.getParent, s".${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(p, false)
    require(fs.rename(tmp, p), s"failed to publish marker $p")
  }

  /** Last batch id whose survivors were appended to the index at
    * `indexPath`, or -1 if none (unparseable content reads as none —
    * the [[DedupSink.lastAppliedBatch]] contract). */
  def lastAppliedBatch(spark: SparkSession, indexPath: String): Long =
    readLongMarker(spark, s"$indexPath/$Marker")

  /**
   * Apply ONE micro-batch: drop batch vectors whose exact re-ranked
   * cosine against an indexed neighbor reaches `cosineThreshold`,
   * collapse near-dup groups WITHIN the batch to their min-id
   * survivor ([[Similarity.semDedup]] at `batchCells`), publish, grow
   * the index. Public so specs and backfills drive the exact code the
   * streaming query runs. Returns the written survivors.
   *
   * `batchCells` sizes the within-batch SemDeDup clustering and should
   * be well below the expected batch row count; `k`/`nProbe` shape the
   * index probe (k > 1 keeps a true near-dup visible past the
   * crash-window self-link).
   */
  def applyBatch(spark: SparkSession, indexPath: String, corpusPath: String,
                 idCol: String, vecCol: String, cosineThreshold: Double,
                 batch: DataFrame, batchId: Long,
                 nProbe: Int = 4, k: Int = 4, batchCells: Int = 64,
                 compactEvery: Long = 0L): DataFrame = {
    if (batchId <= lastAppliedBatch(spark, indexPath)) {
      val dirP = new org.apache.hadoop.fs.Path(
        s"$corpusPath/ingest_batch=$batchId")
      val dfs = dirP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      return if (dfs.exists(dirP)) spark.read.parquet(dirP.toString)
      else batch.limit(0)
    }
    // the probe excludes self-pairs by id (the kernels' standing
    // contract), so a crash-window replay never links a survivor
    // against its own indexed copy — the drop decision is
    // deterministic under replay with no extra filtering here
    val dupIds = Similarity.ivfPqTopKIndexed(spark, indexPath, batch,
        idCol, vecCol, k = k, nProbe = nProbe)
      .filter(col("cosine") >= cosineThreshold)
      .select(col("query_id").as(idCol)).distinct()
    val novel = batch.join(dupIds, Seq(idCol), "left_anti")
    val survivors = Similarity.semDedup(novel, idCol, vecCol,
      nCells = batchCells, threshold = cosineThreshold).persist()
    survivors.write.mode("overwrite")
      .parquet(s"$corpusPath/ingest_batch=$batchId")
    // crash-window resolution: only when a prior attempt declared
    // intent for THIS batch and died before the batch marker is the
    // append state ambiguous — and then one survivor id's existence
    // decides it completely (the append job commits all-or-nothing)
    val sampleRow = survivors.select(col(idCol)).limit(1).collect()
    val alreadyAppended =
      readLongMarker(spark, s"$indexPath/$Intent") == batchId &&
        sampleRow.nonEmpty && {
          !spark.read.parquet(s"$indexPath/codes")
            .filter(col(idCol) === lit(sampleRow(0).get(0)))
            .isEmpty
        }
    writeLongMarker(spark, s"$indexPath/$Intent", batchId)
    if (!alreadyAppended)
      Similarity.appendIvfPqIndex(survivors, idCol, vecCol, indexPath)
    writeLongMarker(spark, s"$indexPath/$Marker", batchId)
    survivors.unpersist()
    // in-loop maintenance: appends accumulate small files per cell;
    // compaction folds them (and erases tombstoned rows) AFTER the
    // marker — a replayed compaction is an idempotent rewrite
    if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
      Similarity.compactIvfPqIndex(spark, indexPath)
    // return the WRITTEN rows (the DedupSink convention): after the
    // append, re-evaluating the survivor lineage would probe the grown
    // index, where every survivor now self-links
    spark.read.parquet(s"$corpusPath/ingest_batch=$batchId")
  }

  /**
   * Start the continuous semantic-dedup ingest: `stream` (a streaming
   * DataFrame with at least `idCol` and `vecCol`) filters through the
   * IVF-PQ index at `indexPath` and publishes survivors under
   * `corpusPath`. Seed the index first with
   * [[Similarity.saveIvfPqIndex]] — cell geometry and codebook are
   * immutable for the index's lifetime, so they must be an explicit
   * choice, not a silent default.
   */
  def start(stream: DataFrame, indexPath: String, corpusPath: String,
            idCol: String, vecCol: String, cosineThreshold: Double,
            checkpointDir: String, queryName: String = "graft_ann_sink",
            trigger: Trigger = Trigger.AvailableNow(),
            nProbe: Int = 4, k: Int = 4, batchCells: Int = 64,
            compactEvery: Long = 0L): StreamingQuery = {
    val spark = stream.sparkSession
    require(new org.apache.hadoop.fs.Path(s"$indexPath/codebook")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(s"$indexPath/codebook")),
      s"seed the index first: $indexPath/codebook does not exist")
    stream.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, indexPath, corpusPath, idCol, vecCol,
          cosineThreshold, batch, batchId, nProbe, k, batchCells,
          compactEvery): Unit
      }
      .start()
  }
}
