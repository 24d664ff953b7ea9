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

  /**
   * Deterministic EXACT-k-per-group subsample — the corpus-assembly
   * "take k documents per source, reproducibly". [[groupedTopK]]
   * under a content-hash order (`md5(id)`, id tiebreak = total
   * order): like [[graft.ops.TextAnalysis.sampleByHash]] the picked
   * subset is stable across runs, row order, and cluster size — but
   * with an exact count per group instead of a rate. The hash order
   * also makes budgets NESTED: the k=1000 pick is a strict prefix of
   * the k=2000 pick, so raising a group's budget between corpus
   * builds only ADDS rows. Groups smaller than k pass through whole.
   *
   * Scale: one keyed window per group-hash partition, no global
   * sort; a hot group costs its partition sort (row_number evaluates
   * streaming over the sorted run — nothing beyond the sort
   * materializes). Output: input columns + `rank` (1..k).
   */
  def hashSampleK(df: DataFrame, groupCols: Seq[String], idCol: String,
                  k: Int): DataFrame =
    groupedTopK(df, groupCols,
      Seq(md5(col(idCol).cast("string")).asc, col(idCol).asc), k)

  /**
   * Deterministic weighted sampling WITHOUT replacement — k rows where
   * each row's inclusion probability is proportional to its weight
   * (sample long documents / high-quality sources more often), via
   * Efraimidis–Spirakis (IPL 2006): every row gets an independent
   * uniform u and the k largest u^(1/w) win. Ordering by u^(1/w) is
   * ordering by ln(u)/w (exp/ln are monotone), so the score is the
   * numerically-tamer ln(u)/w.
   *
   * `u` is content-derived — `(first 8 md5 hex digits + 0.5) / 2^32`,
   * the same hash-uniform trick as [[graft.ops.TextAnalysis
   * .sampleByHash]] — so the sample is reproducible across runs, row
   * order, and cluster size, with no RNG seed plumbing. The score is
   * rounded to 6 decimals with an id tiebreak (the cross-engine float
   * discipline: an engine's last-ulp `ln` difference cannot flip the
   * selection).
   *
   * Scale: one narrow scoring pass + TakeOrdered(k) — per-partition
   * top-k heaps merged on the driver, no global sort, no shuffle of
   * the data. Weights must be positive.
   *
   * Output: input columns + `score`, ordered score desc / id asc.
   */
  def weightedSampleK(df: DataFrame, idCol: String, weightCol: Column,
                      k: Int): DataFrame = {
    require(k >= 1)
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8),
      16, 10).cast("double") + 0.5) / lit(4294967296.0)
    val score = round(log(u) / weightCol, 6)
    df.withColumn("score", score)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * Robust per-group outlier flags via median absolute deviation —
   * the z-score's heavy-tail-safe sibling (a single 1e9 value drags a
   * mean/stddev fence to uselessness; the median/MAD fence doesn't
   * move). Per group g:
   *
   *   med = median(x),  mad = median(|x − med|)
   *   robust_z = (x − med) / (1.4826·mad)      (1.4826 ≈ 1/Φ⁻¹(3/4),
   *                                             the normal-consistency
   *                                             constant)
   *   is_outlier = mad > 0 AND |robust_z| > k
   *
   * A zero MAD (≥ half the group identical) flags nothing and leaves
   * `robust_z` NULL — a degenerate group should page a human via the
   * distribution audit, not flag half its rows.
   *
   * Scale: two keyed EXACT-percentile aggregates (Spark's `percentile`
   * sketches per partition and merges — no global sort) plus two
   * broadcast-size joins back (group-cardinality rows). Same
   * cross-engine contract as the winsorize gate: `percentile` ↔
   * `quantile_cont` linear interpolation, the fence comparison a
   * mirrored IEEE tree (1.4826 enters as the same double literal on
   * both engines).
   *
   * Output: input columns + (med, mad, robust_z, is_outlier).
   */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double = 3.5): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val base = df.filter(col(valueCol).isNotNull)
    val med = base.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val withMed = base.join(broadcast(med), Seq(groupCol))
    val mad = withMed
      .groupBy(col(groupCol))
      .agg(expr(s"percentile(abs($valueCol - med), 0.5)").as("mad"))
    withMed.join(broadcast(mad), Seq(groupCol))
      .withColumn("robust_z",
        when(col("mad") > 0.0,
          round((col(valueCol) - col("med")) /
            (lit(1.4826) * col("mad")), 6)))
      .withColumn("is_outlier",
        col("mad") > 0.0 && abs(col("robust_z")) > k)
  }
}
