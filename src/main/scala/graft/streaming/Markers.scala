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

  /** True when `dir` exists and holds at least one visible data file.
    * Recovery paths must gate their published-dir reads on this, not
    * bare `exists`: a crash mid-overwrite can leave the directory
    * present but empty (metadata deleted, no committed part files),
    * and `spark.read.parquet` on such a dir throws "unable to infer
    * schema" on EVERY subsequent replay — a wedged stream, where the
    * pre-proof code's unconditional overwrite used to self-heal. */
  def hasDataFile(fs: org.apache.hadoop.fs.FileSystem,
                  dir: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(dir) && fs.listStatus(dir).exists { s =>
      s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith(".")
    }

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
