package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Trigram

/**
 * Trigram fuzzy KNN matching with one-to-one greedy assignment (J6,
 * SURVEY.md §2.3 / §7.4-3).
 *
 * Reference (lib/voter_file/csv_driver/fuzzy_merger.rb): for each still-
 * unmatched source row, find the nearest target by pg_trgm distance
 * `s.col <-> t.col` (correlated ORDER BY .. LIMIT 1, :48-68), accept if
 * distance < 0.5 (:5), per fuzzy column in declaration order; each target
 * is usable at most once — claimed targets are DELETEd from the candidate
 * table (:38-46,63-67), which also removes targets taken by earlier exact
 * stages. Result is order-dependent in Postgres; our rebuild is the
 * deterministic greedy matching by (distance, source id, target pk).
 *
 * Spark-first design — two scale decisions:
 *
 *  1. CANDIDATE GENERATION is an inverted-index join, not a cross join
 *     and not a per-row KNN: explode each side into its distinct padded
 *     trigrams, join on the trigram (this plays the role of the
 *     reference's gist_trgm_ops index), count shared trigrams per
 *     (source, target) pair, and compute the EXACT pg_trgm similarity
 *     algebraically: sim = shared / (|A| + |B| - shared). One shuffle on
 *     trigram + one aggregation; no UDF in the pairwise hot path, and
 *     pairs below the threshold never materialize past the aggregation.
 *
 *  2. ASSIGNMENT is an iterative driver loop over the (small, filtered)
 *     candidate-pair table: repeatedly take each source's best pair,
 *     resolve target conflicts by keeping the globally best pair per
 *     target, remove assigned sources and targets, loop until stable.
 *     The loop converges quickly because each round assigns every
 *     conflict-free best pair; only pairs (not base tables) are
 *     re-scanned per round.
 */
object Fuzzy {

  /** pg_trgm acceptance bound (fuzzy_merger.rb:5): distance < 0.5. */
  val DefaultLimit = 0.5

  /** Very frequent trigrams generate candidate pairs quadratically (the
    * classic skew problem of token-blocking); drop trigrams occurring in
    * more than this many distinct values on either side. A pair sharing
    * ONLY ultra-common trigrams cannot reach similarity 0.5 in practice;
    * bound is configurable for exactness-sensitive callers. */
  val DefaultMaxTrigramFreq: Long = 100000L

  private def explodeTrigrams(df: DataFrame, idCol: String, strCol: String) = {
    val tri = udf((s: String) =>
      if (s == null) Array.empty[String]
      else {
        val set = Trigram.trigrams(s)
        val arr = new Array[String](set.size())
        set.toArray(arr)
        arr
      })
    df.select(col(idCol), col(strCol))
      .filter(col(strCol).isNotNull)
      .withColumn("__tris", tri(col(strCol)))
      .withColumn("__n", size(col("__tris")))
      .filter(col("__n") > 0)
      .select(col(idCol), explode(col("__tris")).as("__tri"), col("__n"))
  }

  /**
   * All (sourceId, targetId, distance) pairs with distance < limit,
   * via the trigram inverted-index join.
   */
  def candidatePairs(
      source: DataFrame, sourceId: String, sourceCol: String,
      target: DataFrame, targetId: String, targetCol: String,
      limit: Double = DefaultLimit,
      maxTrigramFreq: Long = DefaultMaxTrigramFreq): DataFrame = {
    // materialized: each side feeds both the frequency cap and the
    // inverted-index join — without a barrier the trigram explosion
    // would be recomputed per consumer
    val sTri = explodeTrigrams(source, sourceId, sourceCol)
      .withColumnRenamed("__n", "__sn").persist()
    val tTri = explodeTrigrams(target, targetId, targetCol)
      .withColumnRenamed("__n", "__tn").persist()

    // frequency cap against quadratic blow-up on ultra-common trigrams
    val freqOk = sTri.groupBy("__tri").count()
      .join(tTri.groupBy("__tri").count()
        .withColumnRenamed("count", "tcount"), Seq("__tri"))
      .filter(col("count") <= maxTrigramFreq && col("tcount") <= maxTrigramFreq)
      .select("__tri")

    sTri
      .hint("shuffle_hash") // partition the inverted-index join by trigram
      .join(freqOk, Seq("__tri"))
      .join(tTri, Seq("__tri"))
      .groupBy(col(sourceId), col(targetId))
      .agg(
        count(lit(1)).as("__shared"),
        first(col("__sn")).as("__sn"),
        first(col("__tn")).as("__tn"))
      .withColumn("__sim",
        col("__shared").cast("double") /
          (col("__sn") + col("__tn") - col("__shared")))
      .withColumn("distance", lit(1.0) - col("__sim"))
      .filter(col("distance") < limit)
      .select(col(sourceId), col(targetId), col("distance"))
  }

  /**
   * Deterministic greedy one-to-one assignment over candidate pairs.
   * Returns (sourceId, targetId, distance) with each source and each
   * target appearing at most once; pairs chosen nearest-first with
   * (distance, sourceId, targetId) as the total order.
   */
  def greedyAssign(pairs: DataFrame, sourceId: String, targetId: String,
                   maxRounds: Int = 200): DataFrame = {
    val spark = pairs.sparkSession
    // localCheckpoint (eager) per round: truncates the logical plan so
    // the iterative loop cannot grow an unbounded lineage (driver OOM),
    // and each round only re-scans the materialized pair set.
    var remaining = pairs.localCheckpoint()
    val rounds = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      val bySource = Window.partitionBy(col(sourceId))
        .orderBy(col("distance").asc, col(targetId).asc)
      val best = remaining
        .withColumn("__rs", row_number().over(bySource))
        .filter(col("__rs") === 1).drop("__rs")
      val byTarget = Window.partitionBy(col(targetId))
        .orderBy(col("distance").asc, col(sourceId).asc)
      val winners = best
        .withColumn("__rt", row_number().over(byTarget))
        .filter(col("__rt") === 1).drop("__rt")
        .localCheckpoint()
      if (winners.isEmpty) done = true
      else {
        rounds += winners
        val next = remaining
          .join(winners.select(col(sourceId)), Seq(sourceId), "left_anti")
          .join(winners.select(col(targetId)), Seq(targetId), "left_anti")
          .localCheckpoint()
        remaining = next
        if (next.isEmpty) done = true
      }
      round += 1
    }
    if (rounds.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], pairs.schema)
    else rounds.reduce(_ unionByName _)
  }

  /**
   * Full fuzzy phase: for each fuzzy column in order, match remaining
   * unmatched sources against still-unclaimed targets. `matched` is the
   * exact-phase output (with Matcher.TargetId / Matcher.MatchGroup);
   * returns it with fuzzy assignments folded in (tagged with group
   * indices following the exact groups).
   */
  def fuzzyMatch(matched: DataFrame, target: DataFrame, targetPk: String,
                 fuzzyColumns: Seq[String], nExactGroups: Int,
                 limit: Double = DefaultLimit): DataFrame = {
    import Matcher.{SourceId, TargetId, MatchGroup}
    var current = matched
    fuzzyColumns.zipWithIndex.foreach { case (fcol, i) =>
      val unmatchedSrc = current.filter(col(TargetId).isNull)
      // targets already claimed by ANY stage are out (fuzzy_merger.rb:38-46)
      val claimed = current.filter(col(TargetId).isNotNull)
        .select(col(TargetId).as(targetPk)).distinct()
      val available = target.join(claimed, Seq(targetPk), "left_anti")
      val pairs = candidatePairs(
        unmatchedSrc.select(col(SourceId), col(fcol)), SourceId, fcol,
        available.select(col(targetPk), col(fcol)), targetPk, fcol,
        limit)
      val assignment = greedyAssign(pairs, SourceId, targetPk)
        .select(col(SourceId),
          col(targetPk).as("__fuzzy_tid"),
          lit(nExactGroups + 1 + i).as("__fuzzy_grp"))
      current = current.join(assignment, Seq(SourceId), "left")
        .withColumn(TargetId, coalesce(col(TargetId), col("__fuzzy_tid")))
        .withColumn(MatchGroup,
          coalesce(col(MatchGroup), col("__fuzzy_grp")))
        .drop("__fuzzy_tid", "__fuzzy_grp")
    }
    current
  }
}
