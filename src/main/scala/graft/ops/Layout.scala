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
}
