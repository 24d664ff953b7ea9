package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed point-in-interval (range) join.
 *
 * Spark has no native range-join strategy: a bare
 * `p >= lo AND p <= hi` join condition has no equi-key, so Catalyst
 * falls back to BroadcastNestedLoopJoin — every point compared against
 * every interval, O(|P|·|I|), a scale killer beyond toy sizes.
 *
 * The standard fix (Spark's own range-join hints on Databricks, Flink's
 * interval join, postgres GiST) is interval BINNING, which this
 * implements with stock operators so Catalyst/AQE still drive the
 * physical plan:
 *
 *  1. every interval is replicated onto each fixed-width bin it
 *     overlaps (`sequence(floor(lo/w), floor(hi/w))` + explode);
 *  2. every point belongs to exactly ONE bin (`floor(p/w)`) — so the
 *     bin equi-join yields each matching pair at most once, no
 *     post-join dedup;
 *  3. the true range predicate rides in the join condition as a
 *     residual, evaluated during the hash-join probe, never
 *     materializing false candidates.
 *
 * The join is a plain equi-join on the bin key: AQE broadcasts small
 * interval sides, shuffles big ones, and handles bin skew with its
 * skew-join splitting. Replication factor per interval is
 * `span/binWidth + 1`, so `binWidth` should be on the order of the
 * typical interval span: too small explodes the interval side, too
 * large funnels everything into few bins. [[binnedAuto]] measures the
 * data and picks that for the caller.
 *
 * Null points/bounds drop (null never compares true); NaN points drop
 * (Spark orders NaN greatest, so `NaN <= hi` is false); inverted
 * intervals (lo > hi) are empty by definition and are filtered before
 * replication.
 */
object RangeJoin {

  /** Range join with an explicit bin width (caller knows the span
    * distribution). Output: all columns of `points` then `intervals`,
    * one row per (point, interval) pair with
    * `lo <= point <= hi` — column names must not collide. */
  def binned(points: DataFrame, pointCol: String,
             intervals: DataFrame, loCol: String, hiCol: String,
             binWidth: Double): DataFrame = {
    require(binWidth > 0 && !binWidth.isNaN && !binWidth.isInfinite,
      s"binWidth must be a positive finite number, got $binWidth")
    require(!points.columns.contains("__bin") &&
      !intervals.columns.contains("__bin"),
      "__bin is reserved by RangeJoin")
    val iv = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    val pt = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    pt.join(iv,
        pt("__bin") === iv("__bin") &&
          col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /**
   * Interval-OVERLAP join (both sides are intervals): pairs where
   * `lLo <= rHi AND rLo <= lHi` — span-conflict detection, shift
   * overlap, contamination-span reconciliation. Same binning scheme
   * as [[binned]], but since BOTH sides replicate across bins a pair
   * can meet in several bins; each pair is emitted exactly once via
   * the FIRST-SHARED-BIN rule — only the bin containing
   * `greatest(lLo, rLo)` emits (that bin is covered by both intervals
   * whenever they overlap, and is unique) — so no post-join dedup
   * shuffle. Catalyst sees a plain equi-join on the bin key; the
   * overlap predicate and bin-ownership check ride as residuals in
   * the hash-join probe. Inverted/null intervals drop.
   */
  def overlapBinned(left: DataFrame, lLo: String, lHi: String,
                    right: DataFrame, rLo: String, rHi: String,
                    binWidth: Double): DataFrame = {
    require(binWidth > 0 && !binWidth.isNaN && !binWidth.isInfinite,
      s"binWidth must be a positive finite number, got $binWidth")
    val reserved = Seq("__bin", "__binr")
    require(reserved.forall(c => !left.columns.contains(c) &&
      !right.columns.contains(c)), "__bin/__binr are reserved")
    def rep(df: DataFrame, lo: String, hi: String, binCol: String) = df
      .filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
      .withColumn(binCol, explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    val l = rep(left, lLo, lHi, "__bin")
    val r = rep(right, rLo, rHi, "__binr")
    l.join(r,
        col("__bin") === col("__binr") &&
          col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
          col("__bin") ===
            floor(greatest(col(lLo), col(rLo)) / binWidth).cast("long"))
      .drop("__bin", "__binr")
  }

  /** Range join that measures the interval spans first and derives the
    * bin width from them (average span, clamped to a sane floor) — one
    * driver-bounded aggregate, then [[binned]]. Empty or degenerate
    * interval sets fall back to width 1. */
  def binnedAuto(points: DataFrame, pointCol: String,
                 intervals: DataFrame, loCol: String, hiCol: String)
      : DataFrame = {
    val row = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .agg(avg(col(hiCol) - col(loCol))).head()
    val avgSpan = if (row.isNullAt(0)) 1.0 else row.getDouble(0)
    val w = if (avgSpan.isNaN || avgSpan <= 0) 1.0 else avgSpan
    binned(points, pointCol, intervals, loCol, hiCol, w)
  }
}
