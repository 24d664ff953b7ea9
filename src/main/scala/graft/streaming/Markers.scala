package graft.streaming

import org.apache.spark.sql.SparkSession

/**
 * Long-valued marker files for the streaming sinks' replay protocol —
 * the ONE implementation of the parse and the atomic publish (the
 * sinks previously carried three hand-rolled copies, which is exactly
 * how a fix to one drifts past the others).
 *
 *  - [[read]] returns -1 for a missing, empty, or garbled marker: "no
 *    value durably recorded". The worst a crash-truncated marker can
 *    cost is one replayed (idempotent) application — never a wedged
 *    stream throwing NumberFormatException on every batch.
 *  - [[write]] is write-temp-then-rename (the `Layout.atomicSwap`
 *    discipline): a crash mid-write leaves only the temp file, so a
 *    visible marker is always a complete value.
 */
private[streaming] object Markers {

  def read(spark: SparkSession, path: String): Long = {
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

  /** True when `dir` holds a COMPLETE job commit (`_SUCCESS` present,
    * written last by the committer). Recovery paths must gate their
    * published-dir proofs on this, not bare `exists` or
    * has-a-data-file:
    *  - a crash mid-overwrite can leave the dir present but EMPTY —
    *    an unguarded `spark.read.parquet` then throws on every replay
    *    (a wedged stream, where the pre-proof code's unconditional
    *    overwrite used to self-heal);
    *  - worse, it can leave a PARTIAL subset of part files — if the
    *    committed subset happens to hold only rows the proof's sample
    *    filter excludes (null-vector / blank-text survivors, which
    *    publish but are never indexed), an is-the-sample-empty proof
    *    would falsely read "append was a no-op", finalize the batch
    *    marker, and make the partial dir the batch's PERMANENT output.
    * `_SUCCESS`-gating makes both windows fall through to the
    * recompute path, which is safe there by construction (a partial
    * publish can only be left by a crashed replay that was itself on
    * the provably-unappended recompute path) and rewrites the dir. */
  def isCommitted(fs: org.apache.hadoop.fs.FileSystem,
                  dir: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))

  /** The recovery proofs above DEPEND on `_SUCCESS` being emitted —
    * with `mapreduce.fileoutputcommitter.marksuccessfuljobs=false`
    * (or a committer that strips it) `isCommitted` would read every
    * completed publish as incomplete and the sinks would silently
    * recompute against a grown index on replay: the transitive-chain
    * divergence the proof exists to prevent. The sinks call this
    * guard per batch, failing FAST with the reason instead. */
  def requireSuccessMarkers(spark: SparkSession): Unit =
    require(spark.sparkContext.hadoopConfiguration.getBoolean(
      "mapreduce.fileoutputcommitter.marksuccessfuljobs", true),
      "the streaming sinks' crash-recovery proof requires _SUCCESS " +
        "markers: set mapreduce.fileoutputcommitter.marksuccessfuljobs" +
        "=true (the default) for this session")

  def write(spark: SparkSession, path: String, v: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(
      p.getParent, s".${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(p, false)
    require(fs.rename(tmp, p), s"failed to publish marker $p")
  }
}
