package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series regularization: resample an event stream onto a fixed
 * bucket grid and forward-fill the gaps — the feature-engineering step
 * that turns irregular event logs into model-ready regular series
 * (and the batch face of what a streaming job would do with a
 * session/tumbling window + state).
 */
object Timeseries {

  /**
   * Per-key fixed-width resample + forward fill.
   *
   * Buckets are `unix_micros(ts) div bucketMicros` (integer floor
   * division — same arithmetic as DuckDB's `//`, no float boundary
   * drift); per (key, bucket) the value column aggregates as an exact
   * DECIMAL sum plus an event count. Each key's grid spans its own
   * [min, max] observed bucket (`sequence` + explode — spine size is
   * span/bucket, callers pick `bucketMicros` accordingly); empty
   * buckets materialize with n_events = 0 and carry the most recent
   * non-empty bucket's total (`last(..., ignoreNulls)` over ONE
   * key-partitioned window). A key's first bucket is observed by
   * construction, so the fill never reads before the series starts.
   *
   * Scale: one map-side-combined aggregate on (key, bucket), one
   * bounds aggregate over it (key-cardinality rows), one left join
   * back on (key, bucket), one keyed window — everything partitions by
   * key; no global sort, no driver funnel.
   *
   * Output: (keyCol, bucket_start_us, n_events, total_ffill).
   */
  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive: $bucketMicros")
    val ob = df
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(keyCol),
        expr(s"unix_micros(`$tsCol`) div ${bucketMicros}L").as("b"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("total"))
    val spine = ob.groupBy(col(keyCol))
      .agg(min(col("b")).as("lo"), max(col("b")).as("hi"))
      .select(col(keyCol), explode(sequence(col("lo"), col("hi"))).as("b"))
    val fill = Window.partitionBy(col(keyCol)).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(ob, Seq(keyCol, "b"), "left")
      .select(col(keyCol),
        (col("b") * bucketMicros).as("bucket_start_us"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("total"), ignoreNulls = true).over(fill).as("total_ffill"))
  }
}
