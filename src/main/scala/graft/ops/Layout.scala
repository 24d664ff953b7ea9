package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Physical data layout for scan locality: Morton (Z-order) clustering.
 *
 * At 100 TB the cheapest query is the one that never reads the file:
 * parquet keeps per-file/row-group min/max stats for every column, and
 * a range-partition + sort by the interleaved key gives EVERY
 * clustered column tight min/max spans per file — so predicates on
 * any of them prune files, not just predicates on the leading sort
 * key (the classic lexicographic-sort failure).
 */
object Layout {

  /**
   * 64-bit Morton code of two non-negative integer columns (low
   * `bits` bits of each, interleaved x-even / y-odd). Pure Column bit
   * arithmetic — whole-stage codegen, no UDF; ~4·bits fused ops per
   * row. Values must be non-negative and < 2^bits (callers quantize
   * first; out-of-range high bits are simply ignored by the mask).
   */
  def zOrder2(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /**
   * Cluster `df` by the Morton code of two columns and write parquet:
   * range-partition on the z-value into `numFiles` output tasks, sort
   * within partitions, drop the helper column. Range partitioning
   * samples the z distribution, so skew in either column doesn't
   * produce fat files.
   */
  def zOrderWrite(df: DataFrame, xCol: String, yCol: String,
                  path: String, numFiles: Int, bits: Int = 21): Unit =
    df.withColumn("__z", zOrder2(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /**
   * Hive-partition a table by a bounded-cardinality cell/bucket column
   * (`<path>/<cellCol>=N/…`), coalescing each cell's rows into one
   * file per cell first — the storage face of the IVF family: a
   * reader's `cellCol IN (…)` filter becomes partition pruning, so
   * unselected cells' files are never OPENED (input-split pruning,
   * stronger than row-group stat skipping). One shuffle on the cell
   * id; suitable only for columns with file-count-sized cardinality
   * (IVF cells, layout buckets) — a high-cardinality key here would
   * produce a directory per value.
   */
  def writeCellPartitioned(df: DataFrame, cellCol: String,
                           path: String): Unit =
    df.repartition(col(cellCol))
      .write.mode("overwrite").partitionBy(cellCol).parquet(path)

  /** Append rows into an existing cell-partitioned layout: new files
    * land under their cells' directories, existing files are never
    * rewritten, and input-split pruning keeps working unchanged —
    * the incremental face of [[writeCellPartitioned]]. */
  def appendCellPartitioned(df: DataFrame, cellCol: String,
                            path: String): Unit =
    df.repartition(col(cellCol))
      .write.mode("append").partitionBy(cellCol).parquet(path)

  /**
   * Write parquet with per-row-group bloom filters on the named
   * columns — the third pruning face beside [[zOrderWrite]] (min/max
   * range skipping on clustered columns) and [[writeCellPartitioned]]
   * (input-split pruning on bounded-cardinality cells): POINT lookups
   * on a high-cardinality, unclustered key. Such a key's min/max
   * spans every file (random layout), so `key = x` stat-prunes
   * nothing; its distinct-count overflows parquet's dictionary page
   * mid-chunk, so exact dictionary row-group filtering is unavailable
   * either. A bloom filter per row group answers "definitely absent"
   * for equality probes and the reader skips the group — no sort, no
   * re-layout, composable with whatever clustering the table already
   * has (z-order the range columns, bloom the lookup keys).
   *
   * `expectedNdv` sizes the filter per column (per row group):
   * unset, parquet guesses and either wastes footer bytes or
   * saturates into all-maybes at exactly the cardinality bloom
   * exists for — so callers pass ~rows-per-file for a unique key.
   * Pure writer options on a plain repartition write; read-side
   * skipping is parquet-mr's standard eq-predicate bloom check,
   * on by default under Spark's pushed filters.
   */
  def bloomFilterWrite(df: DataFrame, bloomNdv: Map[String, Long],
                       path: String, numFiles: Int): Unit = {
    require(bloomNdv.nonEmpty, "no bloom columns given")
    val missing = bloomNdv.keySet -- df.columns.toSet
    require(missing.isEmpty, s"bloom columns not in frame: $missing")
    var w = df.repartition(numFiles).write.mode("overwrite")
    bloomNdv.foreach { case (c, ndv) =>
      w = w.option(s"parquet.bloom.filter.enabled#$c", "true")
      if (ndv > 0)
        w = w.option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }
    w.parquet(path)
  }

  /** What [[compact]] found and did. */
  case class CompactStats(filesBefore: Int, bytesBefore: Long,
                          filesAfter: Int)

  /**
   * Small-files compaction: rewrite a parquet directory into
   * ~`targetBytes` files. Streaming ingests and fine-grained
   * partitioned writes leave thousands of KB-sized files; at 100 TB
   * every one is a scheduler task, a namenode entry and an open-file
   * round-trip, so periodic compaction is part of operating the store,
   * not an optimization.
   *
   * The rewrite lands in `<path>.__compact` first and swaps in only
   * after the write commits — same job-commit atomicity contract as
   * the rest of the engine (SURVEY §2.10 D5). The swap is
   * rename-aside / rename-in / delete-aside: the old data is never
   * deleted before the new directory is in place, so a crash at any
   * point leaves the full table recoverable (at `path`, or at
   * `path.__old` with the compacted copy in `path.__compact`). The
   * only reader-visible gap is the metadata-only window between the
   * two renames — microseconds, vs. the unbounded recursive delete a
   * delete-then-rename swap would expose.
   */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): CompactStats = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(hPath)
    // a hive-partitioned layout (key=value subdirectories) must be
    // compacted per partition — a flat rewrite would demote partition
    // directories into plain data columns and lose pruning
    val subdirs = entries.filter(s =>
      s.isDirectory && !s.getPath.getName.startsWith("_"))
    require(subdirs.isEmpty,
      s"$path contains ${subdirs.length} subdirectories " +
        s"(partitioned layout?) — compact each partition directory " +
        "instead of the root")
    val files = entries.filter(s =>
      s.isFile && !s.getPath.getName.startsWith("_"))
    val bytes = files.map(_.getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val tmp = new org.apache.hadoop.fs.Path(path + ".__compact")
    spark.read.parquet(path).repartition(n)
      .write.mode("overwrite").parquet(tmp.toString)
    atomicSwap(spark, tmp.toString, path)
    val after = fs.listStatus(hPath).count(s =>
      s.isFile && !s.getPath.getName.startsWith("_"))
    CompactStats(files.length, bytes, after)
  }

  /**
   * Rename-aside / rename-in / delete-aside directory swap: promote a
   * fully-written `tmpPath` to `destPath` such that the previous data
   * exists on disk at every instant (never delete-before-replace). A
   * crash leaves the table recoverable — at `destPath`, or at
   * `destPath.__old` with the new copy still in `tmpPath`; the only
   * reader-visible gap is the metadata-only window between the two
   * renames. Shared by [[compact]] and the streaming
   * [[graft.streaming.MergeSink]] store promotion.
   */
  def atomicSwap(spark: org.apache.spark.sql.SparkSession,
                 tmpPath: String, destPath: String): Unit = {
    val dest = new org.apache.hadoop.fs.Path(destPath)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(tmpPath)
    val aside = new org.apache.hadoop.fs.Path(destPath + ".__old")
    require(fs.exists(tmp), s"tmp dir missing: $tmpPath")
    fs.delete(aside, true) // clear stale leftover from a prior crash
    if (fs.exists(dest))
      require(fs.rename(dest, aside), s"rename $dest -> $aside failed")
    require(fs.rename(tmp, dest), s"rename $tmp -> $dest failed")
    fs.delete(aside, true)
    // a raw rename bypasses the writer path that normally invalidates
    // the session's listing and plan caches — without this, a later
    // read of the swapped path in the same session can resolve against
    // a STALE CACHED PLAN FRAGMENT (CacheManager matches the new scan
    // subtree to a pre-swap persisted relation) and fail with
    // FAILED_READ_FILE on the renamed-away parts. refreshByPath drops
    // both layers; measured cost on the compaction gates is nil
    // (listing-only invalidation was tried and does NOT close the
    // cached-plan half — the plan audit's repeated-call harness
    // reproduces the failure)
    spark.catalog.refreshByPath(destPath)
  }

  /** Sidecar directory holding the file-level min/max manifest; the
    * leading underscore keeps parquet readers from treating it as
    * data. */
  val ManifestDir = "_graft_manifest"

  /** Diagnostic: "kept/total" file decision of the last [[readPruned]]
    * on this JVM (the [[graft.ops.Similarity]] `lastIvfPqQueryMode`
    * convention — specs assert the pruning actually pruned). */
  private[graft] val lastManifestPrune =
    new java.util.concurrent.atomic.AtomicReference[String]("")

  /**
   * Read a parquet directory that may VALIDLY hold zero data files —
   * the state a partitioned zero-row rewrite leaves (only _SUCCESS;
   * schema inference throws). Returns None for exactly that state so
   * callers can synthesize their empty layout; a MISSING path rethrows
   * instead: after an [[atomicSwap]] crash between its two renames the
   * data's only copy sits at `<path>.__old`, and treating that as
   * "validly empty" would silently serve zero rows — and a subsequent
   * compaction would then "rebuild" from the empty view and delete the
   * `.__old` copy, losing the index outright (r11 review finding).
   * One shared helper so the missing-vs-empty distinction cannot
   * drift across the index families.
   */
  private[graft] def readParquetIfData(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Option[DataFrame] =
    try Some(spark.read.parquet(path)) catch {
      case e: org.apache.spark.sql.AnalysisException =>
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(p))
          throw new IllegalStateException(
            s"$path is MISSING (not merely empty) — if `$path.__old` " +
              "exists, an atomic swap crashed between its renames: " +
              "restore by renaming it back, then re-run. Refusing to " +
              "treat a vanished directory as an empty layout.", e)
        None
    }

  /** Read the manifest rows of a manifest-tracked directory. The data
    * FILES are listed and passed explicitly rather than the manifest
    * dir itself: `_graft_manifest` is underscore-named, and Spark
    * warns `All paths were ignored` on every read whose explicit root
    * path has a metadata-style name (it proceeds anyway — the r10
    * scaling runs logged one WARN per pruned read). The listing is the
    * same single-small-dir round trip the read itself performs. */
  private def readManifest(spark: org.apache.spark.sql.SparkSession,
                           mPath: org.apache.hadoop.fs.Path): DataFrame = {
    val fs = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(mPath)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath.toString)
    require(files.nonEmpty,
      s"manifest at $mPath holds no data files (interrupted write?) — " +
        "run refreshManifest to repair")
    spark.read.parquet(files.toIndexedSeq: _*)
  }

  /**
   * (Re)build the file-level min/max manifest for a parquet directory:
   * one column-pruned scan grouped by `_metadata.file_path`, written as
   * a single small parquet under `<path>/_graft_manifest/`. Columns:
   * `file, min_<c>, max_<c>` per stats column, in the column's native
   * type. Call after any rewrite that changes the file set
   * ([[compact]], appends); [[writeWithManifest]] calls it for you.
   *
   * This is the data-skipping half of a table format (Delta/Iceberg
   * style): parquet's own footer stats prune ROW GROUPS, but only
   * after the planner has listed every file and scheduled a task per
   * split — at 100 TB / 100k files the listing and the no-op tasks ARE
   * the cost. A manifest consulted at plan time prunes the FILE LIST,
   * so unselected files are never listed into the scan, opened, or
   * given tasks.
   */
  def refreshManifest(spark: org.apache.spark.sql.SparkSession,
                      path: String, statsCols: Seq[String]): Unit = {
    require(statsCols.nonEmpty, "no stats columns given")
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    // publish via tmp + atomicSwap, not an in-place overwrite: this is
    // the documented REPAIR step, and overwrite's delete-then-write
    // would leave no manifest at all on a mid-refresh crash — the one
    // window the module's own crash-safety contract forbids
    val tmp = s"$path/$ManifestDir.__refresh"
    spark.read.parquet(path)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    atomicSwap(spark, tmp, s"$path/$ManifestDir")
  }

  /**
   * Range-cluster `df` by `clusterCols` and write parquet WITH a
   * file-level min/max manifest: range partitioning gives each file a
   * tight, nearly disjoint span of the cluster key, so a range
   * predicate through [[readPruned]] keeps only the files it can
   * touch. `statsCols` defaults to the cluster columns; add more to
   * track correlated columns' spans too (they prune when the data is
   * naturally clustered even if not sorted).
   */
  def writeWithManifest(df: DataFrame, clusterCols: Seq[String],
                        path: String, numFiles: Int,
                        statsCols: Seq[String] = Nil): Unit = {
    require(clusterCols.nonEmpty, "no cluster columns given")
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
    refreshManifest(df.sparkSession, path,
      if (statsCols.isEmpty) clusterCols else statsCols)
  }

  /**
   * Append a batch into a manifest-tracked directory at BATCH cost:
   * new files land via parquet append (existing files are never
   * rewritten), their stats come from one scan of ONLY the added files
   * (before/after listing diff), and the manifest is rewritten as
   * old-rows ∪ new-rows through the [[atomicSwap]] promotion — a
   * reader never sees a half-written manifest, and a crash is
   * fail-safe under the [[atomicSwap]] contract: the previous
   * manifest survives on disk (in the worst metadata-only window at
   * `.__old` — recoverable by rename or [[refreshManifest]]), and the
   * appended files are at most unpruned-invisible, never
   * wrongly pruned... they are absent from the manifest, so
   * [[readPruned]] would miss them — hence the swap-late ordering:
   * data first, manifest promotion last, and the manifest is the
   * publication point). Nothing here scans the existing table — the
   * incremental-index discipline of `appendMinhashIndex` /
   * `appendIvfPqIndex` applied to the layout layer.
   *
   * MULTI-WRITER SAFE: appenders serialize on a lease file inside the
   * directory (create-exclusive + ownership read-back, stale leases
   * broken after `leaseMs` — see [[acquireAppendLease]]), so
   * concurrent `appendWithManifest` calls from separate jobs or
   * drivers queue rather than losing a manifest union or corrupting
   * each other's in-flight task files. `lockTimeoutMs` bounds the
   * wait; `leaseMs` must exceed the longest expected single append.
   * [[refreshManifest]] and [[compact]] remain single-maintenance
   * operations (run them with appenders quiesced, like every other
   * index family's compaction).
   */
  // default acquisition wait = the lease term: the two ends of a lock
  // must agree on staleness (the r11 SnapshotStore lesson — its first
  // cut's 120 s commit wait lost to any vacuum pass over 2 min). A
  // waiter that gives up SOONER than the term treats a merely-busy
  // queue as failure: N queued appenders on a loaded box serialize to
  // N × append-duration, which a 120 s wait lost in practice (stress
  // leg 18 under CPU contention).
  def appendWithManifest(df: DataFrame, clusterCols: Seq[String],
                         path: String, numFiles: Int,
                         statsCols: Seq[String] = Nil,
                         lockTimeoutMs: Long = 600000L,
                         leaseMs: Long = 600000L): Unit = {
    require(clusterCols.nonEmpty, "no cluster columns given")
    val spark = df.sparkSession
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(): Set[String] = fs.listStatus(hPath)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath.toString).toSet
    // fail BEFORE any data lands: appending into an untracked directory
    // would leave files no manifest knows about
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$path/$ManifestDir")),
      s"no manifest at $path — appendWithManifest extends an existing " +
        "manifest-tracked directory; write with writeWithManifest first")
    // MULTI-WRITER SAFETY (r9 verdict #5): the whole append is one
    // lease-guarded critical section. Without it, two concurrent
    // appenders race twice — the manifest read-union-swap loses one
    // writer's union (its rows drop out of every future pruned read),
    // and the two parquet append jobs share the directory's
    // _temporary workspace, so the first job commit can delete the
    // second's in-flight task files. The lease serializes both; the
    // read path stays fail-safe regardless (duplicate manifest rows
    // dedup in readPrunedRanges, missing ones repair via
    // refreshManifest). A holder that crashes mid-append leaves a
    // lease that waiters break after `leaseMs` — size it above the
    // longest expected append; refreshManifest remains the repair for
    // whatever the crash left.
    val lock = new org.apache.hadoop.fs.Path(s"$path/$AppendLease")
    val token = acquireAppendLease(fs, lock, lockTimeoutMs, leaseMs)
    try {
      val before = dataFiles()
      df.repartitionByRange(numFiles, clusterCols.map(col): _*)
        .sortWithinPartitions(clusterCols.map(col): _*)
        .write.mode("append").parquet(path)
      val added = (dataFiles() -- before).toSeq.sorted
      if (added.nonEmpty) {
        val stats = if (statsCols.isEmpty) clusterCols else statsCols
        val aggs = stats.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
        val newRows = spark.read.parquet(added: _*)
          .groupBy(col("_metadata.file_path").as("file"))
          .agg(aggs.head, aggs.tail: _*)
        val manifestPath = s"$path/$ManifestDir"
        val tmp = s"$manifestPath.__append"
        readManifest(spark, new org.apache.hadoop.fs.Path(manifestPath))
          .unionByName(newRows)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        // FENCING: re-verify ownership immediately before the shared
        // mutation (the manifest swap). If the lease was lost — we
        // overran leaseMs and a waiter broke it — swapping would race
        // the new owner's union and silently drop one side's rows
        // from every pruned read. Aborting here is fail-safe: the
        // appended DATA files are on disk but unmanifested
        // (unpruned-invisible), and refreshManifest repairs.
        if (!holdsLease(fs, lock, token))
          throw new IllegalStateException(
            s"manifest append lease $lock lost mid-append (leaseMs " +
              "overrun — another appender holds it now); the appended " +
              "data files are unmanifested: run refreshManifest to " +
              "repair, and raise leaseMs above the longest append")
        atomicSwap(spark, tmp, manifestPath)
      }
    } finally releaseAppendLease(fs, lock, token)
  }

  /** Lease file name for [[appendWithManifest]]'s writer serialization
    * (underscore-prefixed: parquet readers ignore it). Content is
    * `<owner-token> <epoch-millis>`. */
  private[graft] val AppendLease = "_graft_manifest_lease"

  /**
   * Acquire the appender lease — delegated to the shared [[Lease]]
   * primitive since r11 (the snapshot store's vacuum/commit guard uses
   * the same protocol; one implementation, one set of specs).
   * Staleness is judged from the lease file's FILESYSTEM mtime, not a
   * holder-embedded clock stamp — cross-driver clock skew cannot break
   * a live lease (r10 advice), because the FS assigns every waiter the
   * same age from one clock source. Returns the owner token; throws
   * after `timeoutMs` of contention.
   */
  private def acquireAppendLease(fs: org.apache.hadoop.fs.FileSystem,
                                 lock: org.apache.hadoop.fs.Path,
                                 timeoutMs: Long, leaseMs: Long): String =
    Lease.acquire(fs, lock, timeoutMs, leaseMs)

  /** Ownership check for the fencing points: true iff the lease file
    * currently carries `token`. */
  private def holdsLease(fs: org.apache.hadoop.fs.FileSystem,
                         lock: org.apache.hadoop.fs.Path,
                         token: String): Boolean =
    Lease.holds(fs, lock, token)

  /** Release only a lease this caller still owns (rename-verify-
    * delete; a KNOWN-foreign lease is never touched) — the shared
    * [[Lease.release]] protocol. */
  private def releaseAppendLease(fs: org.apache.hadoop.fs.FileSystem,
                                 lock: org.apache.hadoop.fs.Path,
                                 token: String): Unit =
    Lease.release(fs, lock, token)

  /**
   * Manifest-pruned range read: `colName BETWEEN lo AND hi` (inclusive)
   * over a directory written by [[writeWithManifest]] (or refreshed by
   * [[refreshManifest]]). The manifest decides per file whether
   * [min, max] intersects [lo, hi]; only intersecting files enter the
   * scan, and the residual row filter is applied on top — the result
   * is EXACTLY the full-scan filter's rows (pruning is a plan
   * optimization, never a semantics change). Files with null stats
   * (all-null values) are kept conservatively; their rows then fail
   * the residual predicate. The manifest collect is bounded by the
   * file count — the same "≤ nCells" driver-budget discipline as the
   * ANN probe selectors.
   */
  def readPruned(spark: org.apache.spark.sql.SparkSession, path: String,
                 colName: String, lo: Any, hi: Any): DataFrame =
    readPrunedRanges(spark, path, Seq((colName, lo, hi)))

  /**
   * Conjunctive multi-column manifest pruning: keep a file only when
   * EVERY range intersects its tracked span (null spans keep the file
   * conservatively, per range). The natural partner of [[zOrderWrite]]
   * + [[refreshManifest]]: Morton clustering gives every interleaved
   * column a tight span per file, so a 2-D range probe prunes on both
   * predicates at once — the file-list analogue of the row-group
   * pruning the z-order Scaladoc promises. Residual conjunction
   * applied on top; same bounded manifest collect as [[readPruned]].
   */
  def readPrunedRanges(spark: org.apache.spark.sql.SparkSession,
                       path: String,
                       ranges: Seq[(String, Any, Any)]): DataFrame = {
    require(ranges.nonEmpty, "no ranges given")
    val mPath = new org.apache.hadoop.fs.Path(s"$path/$ManifestDir")
    val fs = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(mPath),
      s"no manifest at $path — write with writeWithManifest or call " +
        "refreshManifest first")
    val keep = ranges.map { case (c, lo, hi) =>
      coalesce(col(s"min_$c") <= lit(hi) && col(s"max_$c") >= lit(lo),
        lit(true))
    }.reduce(_ && _)
    // distinct: defense in depth for duplicate manifest rows. Writers
    // are lease-serialized now (appendWithManifest), but the read path
    // stays fail-safe on its own — a repair overlap or a hand-edited
    // manifest must never DUPLICATE a file's rows by listing it twice,
    // and files missing from the manifest are unpruned-invisible, with
    // refreshManifest as the repair
    val decisions = readManifest(spark, mPath)
      .select(col("file"), keep.as("keep"))
      .collect()
    val kept = decisions.filter(_.getBoolean(1)).map(_.getString(0)).distinct
    lastManifestPrune.set(s"${kept.length}/${decisions.length}")
    val base =
      if (kept.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(kept.toIndexedSeq: _*)
    base.filter(ranges.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _))
  }
}
