package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Maintenance operations over a streaming sink's published corpus —
 * the `<corpusPath>/ingest_batch=<id>/` hive-partitioned layout both
 * [[DedupSink]] and [[AnnSink]] publish survivors into.
 *
 * The one operation today is [[purge]]: physically erase a set of ids
 * from the corpus, rewriting ONLY the batch partitions that contain
 * them. This closes the right-to-be-forgotten gap the r11 survey
 * records (candidate #4): `forgetEverywhere` purged catalog tables and
 * all four index families, but a sink's corpus directory — the very
 * rows the indexes were built FROM — needed a manual per-sink rewrite.
 * [[graft.sources.SnapshotStore.forgetEverywhere]] now routes its
 * `sinkCorpora` argument here, so one call covers every persisted
 * surface a streaming ingest loop maintains.
 *
 * Scale shape: one column-pruned scan of the corpus (id + partition
 * column only) finds the affected batch ids; each affected partition
 * is rewritten alone. Untouched partitions are never read or written —
 * at a 100 TB corpus with a bounded purge set, the cost is
 * proportional to the few batches the purged ids landed in, not to
 * corpus size.
 *
 * Crash safety follows the persisted-HNSW per-shard discipline
 * (`Hnsw.swapShard` — the relocated-aside [[graft.ops.Layout.atomicSwap]]
 * order): the purged copy is fully written to a staging dir OUTSIDE
 * the partitioned root, then per partition (1) live dir renames to an
 * aside (also outside the root — an `ingest_batch=N.__old` INSIDE it
 * would poison partition discovery), (2) staged dir renames in,
 * (3) aside drops. Both crash windows are unambiguous and heal
 * automatically at every sink entry point ([[healPurgeLeftovers]] runs
 * from [[purge]] itself and from both sinks' `applyBatch`): an aside
 * with no live twin restores (the purge simply re-runs — it is
 * idempotent, an anti-join); an aside with a live twin drops. Run
 * purges serialized with the sink's own writes (single-writer
 * discipline, as with every index family's maintenance).
 */
object SinkCorpus {

  private def stagingRoot(corpusPath: String) = s"$corpusPath.__purge_tmp"
  private def asideRoot(corpusPath: String) = s"$corpusPath.__purge_aside"

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Heal the unambiguous crash states a killed [[purge]] can leave.
    * Write order per partition is rename-aside / rename-in / drop-
    * aside, so: aside without a live twin ⟺ crashed between (1) and
    * (2) — restore the original (the interrupted purge re-runs
    * idempotently); aside WITH a live twin ⟺ the swap completed —
    * drop the aside. Leftover staging is deleted outright: a re-run
    * rewrites it from the live data. Cheap (two exists checks) — both
    * sinks call this per batch. */
  def healPurgeLeftovers(spark: SparkSession, corpusPath: String): Unit = {
    val aroot = new org.apache.hadoop.fs.Path(asideRoot(corpusPath))
    val fs = aroot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(aroot)) {
      fs.listStatus(aroot).foreach { st =>
        val live = new org.apache.hadoop.fs.Path(
          s"$corpusPath/${st.getPath.getName}")
        if (!fs.exists(live)) {
          require(fs.rename(st.getPath, live),
            s"healing crashed corpus purge: restore ${st.getPath} -> " +
              s"$live failed")
          // the sinks read partition dirs DIRECTLY (publishedDir), so
          // the subpath's own listing/plan cache must drop too — the
          // root refresh below does not cover paths read at a
          // different granularity (the r10 atomicSwap lesson)
          spark.catalog.refreshByPath(live.toString)
        } else fs.delete(st.getPath, true)
      }
      fs.delete(aroot, true)
      spark.catalog.refreshByPath(corpusPath)
    }
    val sroot = new org.apache.hadoop.fs.Path(stagingRoot(corpusPath))
    if (fs.exists(sroot)) fs.delete(sroot, true)
  }

  /**
   * Physically erase `ids` (first = only consulted column of the
   * frame passed in, named by `idCol`) from the sink corpus at
   * `corpusPath`, whose rows carry their id in `corpusIdCol`. Only
   * batch partitions holding a purged id are rewritten; each rewrite
   * preserves the partition's full column set (whatever the sink
   * published). Returns the number of partitions rewritten.
   *
   * A fully-purged partition ends in one of two VALID states, chosen
   * by what its rewrite physically produced: swapped in when the
   * zero-row write left a schema-carrying data file (the usual Spark
   * shape — the dir reads as zero rows), REMOVED when it left only
   * _SUCCESS (possible under adaptive planning; keeping that dir
   * would fail every direct read with a schema-inference error — the
   * missing-vs-empty lesson, inverted). Both states read cleanly:
   * both sinks treat a missing published dir as zero survivors on
   * replay (`applyBatch`'s marker short-circuit).
   *
   * Fails loudly on a MISSING corpus (never a silent no-op — the
   * delete-lifecycle contract) and on a purge-id type that cannot
   * match the corpus id losslessly (both must be integral, or exactly
   * the same type — the r10-advice lesson: a lossy cast yields null,
   * matches nothing, and silently discards the purge intent).
   */
  def purge(ids: DataFrame, idCol: String, corpusPath: String,
            corpusIdCol: String): Int = {
    val spark = ids.sparkSession
    val root = new org.apache.hadoop.fs.Path(corpusPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root),
      s"sink corpus MISSING at $corpusPath — refusing to no-op a purge")
    healPurgeLeftovers(spark, corpusPath)
    val batchDirs = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("ingest_batch="))
    if (batchDirs.isEmpty) return 0
    val purge = ids.select(col(idCol).as("__purge_id")).distinct().persist()
    try {
      val pt = purge.schema("__purge_id").dataType
      val corpus = spark.read.parquet(corpusPath)
      val ct = corpus.schema(corpusIdCol).dataType
      require(pt == ct || (integral(pt) && integral(ct)),
        s"purge id type $pt cannot match corpus id '$corpusIdCol': $ct " +
          "losslessly — a lossy cast would null out and silently void " +
          "the purge")
      // one column-pruned scan finds the affected partitions; the
      // result is a handful of batch ids (driver-side by design)
      val affected = corpus.select(col(corpusIdCol), col("ingest_batch"))
        .join(purge, col(corpusIdCol) === col("__purge_id"), "left_semi")
        .select(col("ingest_batch")).distinct().collect()
        .map(_.get(0).toString).sorted
      affected.foreach { b =>
        val live = s"$corpusPath/ingest_batch=$b"
        val tmp = s"${stagingRoot(corpusPath)}/ingest_batch=$b"
        // read the partition dir directly (no other partition is
        // touched); the purged copy is fully written before any rename
        spark.read.parquet(live)
          .join(purge, col(corpusIdCol) === col("__purge_id"), "left_anti")
          .write.mode("overwrite").parquet(tmp)
        val liveP = new org.apache.hadoop.fs.Path(live)
        val tmpP = new org.apache.hadoop.fs.Path(tmp)
        val aside = new org.apache.hadoop.fs.Path(
          s"${asideRoot(corpusPath)}/ingest_batch=$b")
        fs.mkdirs(aside.getParent)
        fs.delete(aside, true)
        val survived = fs.listStatus(tmpP).exists(s =>
          s.isFile && !s.getPath.getName.startsWith("_"))
        require(fs.rename(liveP, aside), s"rename $liveP -> $aside failed")
        if (survived)
          require(fs.rename(tmpP, liveP), s"rename $tmpP -> $liveP failed")
        else fs.delete(tmpP, true) // fully purged: the partition goes away
        fs.delete(aside, true)
        // invalidate the PARTITION path too: sink replays read it
        // directly, and a stale cached listing would resolve to the
        // renamed-away files (the r10 atomicSwap lesson)
        spark.catalog.refreshByPath(live)
      }
      val sroot = new org.apache.hadoop.fs.Path(stagingRoot(corpusPath))
      if (fs.exists(sroot)) fs.delete(sroot, true)
      if (affected.nonEmpty) spark.catalog.refreshByPath(corpusPath)
      affected.length
    } finally purge.unpersist()
  }
}
