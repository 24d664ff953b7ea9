package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Grouped ranking: the "best k examples per bucket" selection a
 * curation pipeline runs per domain/language/source before manual
 * review or mixture construction.
 */
object Ranking {

  /**
   * Top-k rows per group under an explicit ordering. Callers must pass
   * a total order (append a unique id as the last sort key) or the
   * selection is nondeterministic — that contract is the whole
   * difference between an audit artifact and a flaky one.
   *
   * Scale: one keyed window (rank within group) — Spark sorts within
   * hash partitions of the group key, no global sort. For k ≪ group
   * size the filter is evaluated streaming over the sorted run, so
   * nothing materializes beyond the partition sort. Skewed groups cost
   * what their sort costs; there is no cross-group barrier.
   *
   * Output: input columns + `rank` (1-based within group).
   */
  def groupedTopK(df: DataFrame, groupCols: Seq[String],
                  order: Seq[Column], k: Int): DataFrame = {
    require(groupCols.nonEmpty && order.nonEmpty && k >= 1)
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
