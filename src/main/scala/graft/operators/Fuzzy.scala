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

  /** One side at or below this many rows switches candidate generation
    * to a broadcast cross-kernel (exact same pair distances, no
    * inverted-index shuffle). Trigram universes are tiny — a few
    * thousand distinct trigrams cover a language — so posting lists on
    * short-string corpora are fat and the index join degenerates the
    * same way small-vocabulary prefix filtering does. */
  val DefaultBroadcastLimit: Long = 100000L

  /** Sorted distinct 64-bit hashes of a value's padded trigrams — the
    * shared per-row prep for both candidate paths. */
  private val triHashes = udf((s: String) => {
    if (s == null) Array.empty[Long]
    else {
      val set = Trigram.trigrams(s)
      val hs = new Array[Long](set.size())
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { hs(i) = graft.functions.FastHash.hash64(it.next()); i += 1 }
      java.util.Arrays.sort(hs)
      var out = 0
      i = 0
      while (i < hs.length) {
        if (out == 0 || hs(i) != hs(out - 1)) { hs(out) = hs(i); out += 1 }
        i += 1
      }
      java.util.Arrays.copyOf(hs, out)
    }
  })

  /** Flat postings-list index over the broadcast (source) side — the
    * in-memory equivalent of the reference's gist/gin trigram index,
    * built once and probed per streamed row. Primitive arrays only, so
    * the broadcast payload is compact and probe loops stay allocation-
    * free. `keys` are the sorted distinct trigram hashes (frequency-cap
    * survivors); postings for `keys(i)` are
    * `postings(postStart(i) until postStart(i+1))`, each a source
    * ordinal into `ids`/`setSizes`. */
  private final class TrigramIndex(
      val ids: Array[Any], val setSizes: Array[Int],
      val keys: Array[Long], val postStart: Array[Int],
      val postings: Array[Int]) extends Serializable

  private def buildIndex(rows: Array[(Any, Array[Long], Int)],
                         excluded: Array[Long]): TrigramIndex = {
    val n = rows.length
    val ids = new Array[Any](n)
    val setSizes = new Array[Int](n)
    var total = 0
    rows.foreach(r => total += r._2.length)
    // sort all (hash, ordinal) occurrences once, then slice runs
    val occ = new Array[Long](total) // hash in high bits unusable (full 64-bit hash) — sort pairs instead
    val ord = new Array[Int](total)
    var k = 0
    var i = 0
    while (i < n) {
      val (id, hs, sz) = rows(i)
      ids(i) = id
      setSizes(i) = sz
      var j = 0
      while (j < hs.length) { occ(k) = hs(j); ord(k) = i; k += 1; j += 1 }
      i += 1
    }
    // indirect sort by hash (stable within a hash is irrelevant: counts
    // are order-free); excluded (over-cap) hashes are skipped below
    val perm = Array.range(0, total).sortBy(occ(_))
    val keysB = Array.newBuilder[Long]
    val startB = Array.newBuilder[Int]
    val postB = new Array[Int](total)
    var out = 0
    var p = 0
    while (p < total) {
      val h = occ(perm(p))
      var q = p
      while (q < total && occ(perm(q)) == h) q += 1
      if (excluded.length == 0 ||
        java.util.Arrays.binarySearch(excluded, h) < 0) {
        keysB += h
        startB += out
        var r = p
        while (r < q) { postB(out) = ord(perm(r)); out += 1; r += 1 }
      }
      p = q
    }
    startB += out
    new TrigramIndex(ids, setSizes, keysB.result(), startB.result(),
      java.util.Arrays.copyOf(postB, out))
  }

  private def prepTrigrams(df: DataFrame, idCol: String, strCol: String,
                           nCol: String) =
    df.select(col(idCol), col(strCol))
      .filter(col(strCol).isNotNull)
      .withColumn("__sh", triHashes(col(strCol)))
      .withColumn(nCol, size(col("__sh")))
      .filter(col(nCol) > 0)
      .select(col(idCol), col("__sh"), col(nCol))

  /**
   * All (sourceId, targetId, distance) pairs with distance < limit.
   * sim = shared/(|A| + |B| − shared) over the padded-trigram sets —
   * the exact pg_trgm formula, computed algebraically.
   *
   * Small source sides broadcast and compare directly (one merge-
   * intersection kernel per pair, streamed side repartitioned so the
   * pair work spreads across cores); large ones go through the
   * inverted-index join on trigram hashes with a frequency cap against
   * ultra-common-trigram blow-up.
   */
  /** Cross-path pair budget: the broadcast nested loop runs |S|·|T|
    * kernels with no pruning, so a small source against a huge target
    * must still take the index path. */
  val DefaultMaxCrossPairs: Long = 500000000L

  def candidatePairs(
      source: DataFrame, sourceId: String, sourceCol: String,
      target: DataFrame, targetId: String, targetCol: String,
      limit: Double = DefaultLimit,
      maxTrigramFreq: Long = DefaultMaxTrigramFreq,
      broadcastLimit: Long = DefaultBroadcastLimit,
      maxCrossPairs: Long = DefaultMaxCrossPairs): DataFrame = {
    // materialized: each side feeds multiple consumers (count probe /
    // frequency cap / join) — without a barrier the trigram prep would
    // be recomputed per consumer
    val sPrep = prepTrigrams(source, sourceId, sourceCol, "__sn").persist()
    val tPrep = prepTrigrams(target, targetId, targetCol, "__tn").persist()
    val nPart = source.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt

    val sCount = sPrep.count()
    lazy val tCount = tPrep.count()
    if (sCount <= broadcastLimit && sCount * tCount <= maxCrossPairs) {
      // result parity with the index path: its frequency cap drops
      // ultra-common trigrams from the shared counts, so collect the
      // (few) over-cap trigram hashes and skip them in the kernel too
      val overCap: Array[Long] =
        // a trigram's doc-frequency is bounded by the side's row count,
        // so corpora smaller than the cap provably have nothing over it
        if (maxTrigramFreq >= math.max(sCount, tCount)) Array.emptyLongArray
        else {
          val sOver = sPrep.select(explode(col("__sh")).as("__h"))
            .groupBy("__h").count().filter(col("count") > maxTrigramFreq)
          val tOver = tPrep.select(explode(col("__sh")).as("__h"))
            .groupBy("__h").count().filter(col("count") > maxTrigramFreq)
          val arr = sOver.select("__h").union(tOver.select("__h")).distinct()
            .collect().map(_.getLong(0))
          java.util.Arrays.sort(arr)
          arr
        }
      // GIN-style probe, not a nested loop: a |S|·|T| merge-intersection
      // cross-kernel costs |pairs|·setSize regardless of overlap; the
      // postings probe costs one increment per actually-shared
      // (trigram, source, target) co-occurrence — an order of magnitude
      // less on realistic text — and only candidates sharing >=1
      // surviving trigram are ever touched (exactly pg_trgm's % operator
      // through its gin index). Counts (hence distances) are identical
      // to the merge-intersection by construction.
      val spark = source.sparkSession
      val idx = buildIndex(
        sPrep.collect().map(r =>
          (r.get(0), r.getSeq[Long](1).toArray, r.getInt(2))),
        overCap)
      val bIdx = spark.sparkContext.broadcast(idx)
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(sourceId,
          source.schema(sourceId).dataType),
        org.apache.spark.sql.types.StructField(targetId,
          target.schema(targetId).dataType),
        org.apache.spark.sql.types.StructField("distance",
          org.apache.spark.sql.types.DoubleType, nullable = false)))
      val pairsRdd = tPrep
        // spread the streamed side: a persisted DF this small often sits
        // in one partition, which would serialize the probe work
        .repartition(nPart)
        .rdd.mapPartitions { it =>
          val ix = bIdx.value
          val nSrc = ix.ids.length
          val counts = new Array[Int](nSrc)
          val touched = new Array[Int](nSrc)
          it.flatMap { row =>
            val tid = row.get(0)
            val sh = row.getSeq[Long](1)
            val tn = row.getInt(2)
            var nTouched = 0
            val shIt = sh.iterator
            while (shIt.hasNext) {
              val h = shIt.next()
              val ki = java.util.Arrays.binarySearch(ix.keys, h)
              if (ki >= 0) {
                var p = ix.postStart(ki)
                val end = ix.postStart(ki + 1)
                while (p < end) {
                  val s = ix.postings(p)
                  if (counts(s) == 0) { touched(nTouched) = s; nTouched += 1 }
                  counts(s) += 1
                  p += 1
                }
              }
            }
            val acc = Seq.newBuilder[org.apache.spark.sql.Row]
            var t = 0
            while (t < nTouched) {
              val s = touched(t)
              val shared = counts(s)
              counts(s) = 0
              // EXACT expression order of the index path: sim first,
              // then distance, compared against limit — `sim > 1-limit`
              // is not IEEE-equivalent at the boundary
              val sim = shared.toDouble / (ix.setSizes(s) + tn - shared)
              val dist = 1.0 - sim
              if (dist < limit)
                acc += org.apache.spark.sql.Row(ix.ids(s), tid, dist)
              t += 1
            }
            acc.result()
          }
        }
      spark.createDataFrame(pairsRdd, outSchema)
    } else {
      val sTri = sPrep.select(col(sourceId),
        explode(col("__sh")).as("__h"), col("__sn"))
      val tTri = tPrep.select(col(targetId),
        explode(col("__sh")).as("__h"), col("__tn"))

      // frequency cap against quadratic blow-up on ultra-common trigrams
      val freqOk = sTri.groupBy("__h").count()
        .join(tTri.groupBy("__h").count()
          .withColumnRenamed("count", "tcount"), Seq("__h"))
        .filter(col("count") <= maxTrigramFreq && col("tcount") <= maxTrigramFreq)
        .select("__h")

      sTri
        .hint("shuffle_hash") // partition the inverted-index join by trigram
        .join(freqOk, Seq("__h"))
        .join(tTri, Seq("__h"))
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
  }

  /** Pair sets at or below this size are assigned on the driver with
    * the literal sequential greedy (one collect of the already
    * distance-filtered pairs) instead of iterative distributed rounds —
    * the assignment is identical, the job count is not. */
  val DefaultDriverAssignLimit: Long = 1000000L

  /**
   * Deterministic greedy one-to-one assignment over candidate pairs:
   * EXACTLY the matching produced by scanning pairs in ascending
   * (distance, sourceId, targetId) order and accepting every pair whose
   * source and target are both still free.
   *
   * Distributed construction: rounds of LOCAL-MINIMUM pairs — a pair
   * that ranks first for BOTH its source and its target over all
   * remaining pairs is necessarily accepted by the sequential greedy
   * (no earlier pair can touch either endpoint), so each round assigns
   * all such pairs and drops their endpoints; induction on the global
   * order gives exact equivalence. Note the weaker proposal scheme
   * (per-source best, conflicts resolved per target AMONG PROPOSALS) is
   * NOT equivalent: a target's true-best source may propose elsewhere,
   * letting a farther pair win — e.g. pairs (s1,t1,.1),(s2,t1,.2),
   * (s2,t2,.3),(s3,t2,.4) would assign s3→t2 where greedy assigns
   * s2→t2.
   *
   * Small filtered pair sets (the common case — candidates are already
   * thresholded) skip the loop: one sorted collect and a linear scan on
   * the driver compute the same matching in one job.
   */
  /** Diagnostic mirror of [[Clusters.lastFinishMode]]: "driver-scan" or
    * "distributed-rounds" for the last greedyAssign on this JVM. */
  private[graft] val lastAssignMode =
    new java.util.concurrent.atomic.AtomicReference[String]("")

  def greedyAssign(pairs: DataFrame, sourceId: String, targetId: String,
                   maxRounds: Int = 200,
                   driverLimit: Long = DefaultDriverAssignLimit): DataFrame = {
    val spark = pairs.sparkSession
    // localCheckpoint (eager): truncates the logical plan (the loop
    // cannot grow an unbounded lineage) and materializes the pair set
    // once so the count probe and the rounds re-scan, not recompute.
    var remaining = pairs.localCheckpoint()
    val nPairs = remaining.count()
    lastAssignMode.set(
      if (nPairs <= driverLimit) "driver-scan" else "distributed-rounds")
    if (nPairs <= driverLimit) {
      val ordered = remaining
        .orderBy(col("distance").asc, col(sourceId).asc, col(targetId).asc)
        .collect()
      val usedS = new java.util.HashSet[Any]
      val usedT = new java.util.HashSet[Any]
      val out = new java.util.ArrayList[org.apache.spark.sql.Row]
      val si = remaining.schema.fieldIndex(sourceId)
      val ti = remaining.schema.fieldIndex(targetId)
      ordered.foreach { r =>
        if (!usedS.contains(r.get(si)) && !usedT.contains(r.get(ti))) {
          usedS.add(r.get(si))
          usedT.add(r.get(ti))
          out.add(r)
        }
      }
      spark.createDataFrame(out, pairs.schema)
    } else {
      val rounds = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      var round = 0
      var done = false
      while (!done && round < maxRounds) {
        val bySource = Window.partitionBy(col(sourceId))
          .orderBy(col("distance").asc, col(targetId).asc)
        val byTarget = Window.partitionBy(col(targetId))
          .orderBy(col("distance").asc, col(sourceId).asc)
        val winners = remaining
          .withColumn("__rs", row_number().over(bySource))
          .withColumn("__rt", row_number().over(byTarget))
          .filter(col("__rs") === 1 && col("__rt") === 1)
          .drop("__rs", "__rt")
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
