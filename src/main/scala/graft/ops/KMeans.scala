package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic Lloyd k-means over an embedding column — the
 * clustering primitive behind semantic dedup, IVF coarse quantizers
 * and corpus topic bucketing, defined so tightly that the assignment
 * is reproducible bit-for-bit on any engine:
 *
 *  - init: the vectors of the k smallest ids (no RNG, no seed
 *    plumbing — same contract as the repo's content-hash sampling);
 *  - distance: squared L2 accumulated as a SEQUENTIAL left fold over
 *    dimensions starting at 0.0 (`functions.aggregate`), so the IEEE
 *    sum tree is fixed, not partition-dependent;
 *  - assignment: argmin with ties broken by smallest centroid id
 *    (one keyed window, deterministic at any layout);
 *  - update: per-dimension mean over 2^-20-quantized values —
 *    `floor(v · 2^20)` is EXACT double arithmetic (power-of-two
 *    multiply) into an order-free integer sum, and the mean unwinds
 *    as two IEEE divisions; no decimal rounding whose tie behavior
 *    could differ between engines. An emptied cluster keeps its
 *    previous centroid.
 *
 * Scale: each iteration is one broadcast crossJoin (k rows) + one
 * keyed window + one map-side-combined aggregate of k·d cells; the
 * driver only ever holds k·d doubles (budget-bounded, like the other
 * driver finishes in this repo).
 */
object KMeans {

  /** Run `iters` update rounds then a final assignment.
    * Output: (idCol, cluster, dist) — dist is the squared L2 to the
    * final centroid. */
  def fit(df: DataFrame, idCol: String, vecCol: String,
          k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 0, s"bad k=$k iters=$iters")
    val spark = df.sparkSession
    var cents: Seq[(Int, Seq[Double])] = df.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect().toSeq.zipWithIndex
      .map { case (r, i) =>
        (i, r.getSeq[Any](0).map(v => anyToDouble(v))) }
    require(cents.nonEmpty, "empty input")
    var it = 0
    while (it < iters) {
      val assigned = assignOnce(df, idCol, vecCol, cents, spark)
      val rows = assigned
        .select(col("__c"), posexplode(col(vecCol)).as(Seq("__i", "__v")))
        .groupBy(col("__c"), col("__i"))
        .agg(((sum(floor(col("__v").cast("double") * lit(1048576.0)))
          .cast("double") / count(lit(1)).cast("double"))
          / lit(1048576.0)).as("__m"))
        .collect()
      val means = rows.groupBy(_.getInt(0)).map { case (c, rs) =>
        c -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
      cents = cents.map { case (c, prev) => (c, means.getOrElse(c, prev)) }
      it += 1
    }
    assignOnce(df, idCol, vecCol, cents, spark)
      .select(col(idCol), col("__c").as("cluster"), col("__dist").as("dist"))
  }

  private def anyToDouble(v: Any): Double = v match {
    case f: Float => f.toDouble
    case d: Double => d
    case n: Number => n.doubleValue()
  }

  private def assignOnce(df: DataFrame, idCol: String, vecCol: String,
                         cents: Seq[(Int, Seq[Double])],
                         spark: SparkSession): DataFrame = {
    import spark.implicits._
    val cdf = cents.toDF("__c", "__cv")
    val vecD = transform(col(vecCol), x => x.cast("double"))
    val dist = aggregate(
      zip_with(vecD, col("__cv"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__dist").asc, col("__c").asc)
    df.crossJoin(broadcast(cdf))
      .withColumn("__dist", dist)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
