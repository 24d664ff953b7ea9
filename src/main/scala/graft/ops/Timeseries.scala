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

  /**
   * Per-key fixed-width resample + LINEAR interpolation — the gap-fill
   * for quantities that drift between observations (sensor readings,
   * rates) where [[resampleFfill]]'s step function misstates the
   * trend. Same grid/aggregate/spine construction as the ffill
   * variant; an empty bucket b strictly between observed buckets
   * b0 < b < b1 takes
   *
   *   v(b) = v0 + (v1 − v0) · (b − b0)/(b1 − b0)
   *
   * with v0/v1 the neighboring observed bucket totals. A key's first
   * and last buckets are observed by construction, so every gap is
   * interior and the interpolation is total. All inputs to the IEEE
   * arithmetic are engine-identical (DECIMAL-summed totals cast to
   * double, long bucket indices), and the expression tree is mirrored
   * verbatim in the oracle — engine-exact without a rounding grid.
   *
   * Scale: identical to [[resampleFfill]] except the fill reads TWO
   * frames of the same keyed window sort (trailing last + leading
   * first, both ignoreNulls) — still one sort per key partition, no
   * self-join, no global window.
   *
   * Output: (keyCol, bucket_start_us, n_events, total_interp).
   */
  def interpolate(df: DataFrame, keyCol: String, tsCol: String,
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
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col("b"))
    val back = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = byKey.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obB = when(col("total").isNotNull, col("b"))
    spine.join(ob, Seq(keyCol, "b"), "left")
      .select(col(keyCol), col("b"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("total"),
        last(col("total"), ignoreNulls = true).over(back).as("__v0"),
        last(obB, ignoreNulls = true).over(back).as("__b0"),
        first(col("total"), ignoreNulls = true).over(fwd).as("__v1"),
        first(obB, ignoreNulls = true).over(fwd).as("__b1"))
      .select(col(keyCol),
        (col("b") * bucketMicros).as("bucket_start_us"),
        col("n_events"),
        when(col("total").isNotNull, col("total"))
          .otherwise(col("__v0") + (col("__v1") - col("__v0")) *
            ((col("b") - col("__b0")).cast("double") /
              (col("__b1") - col("__b0")).cast("double")))
          .as("total_interp"))
  }

  /**
   * Cohort retention: assign each key to the bucket of its first
   * activity, then count how many of that cohort are still active at
   * each bucket offset — the curve a data pipeline reports for user or
   * domain liveness. Buckets are integer floor-division of event-time
   * micros (no calendar drift, same arithmetic as DuckDB `//` on the
   * positive epoch range).
   *
   * Retention is `n_active / cohort_size` as one double division of
   * exact integers — bit-identical across engines.
   *
   * Scale: distinct on (key, bucket) collapses event volume to
   * activity cardinality first; everything after is keyed aggregates
   * plus one join on the cohort bucket (cohort cardinality ≪ data —
   * broadcast under AQE). No window, no global sort.
   *
   * Output: (cohort_start_us, bucket_offset, n_users, retention).
   */
  def cohortRetention(df: DataFrame, keyCol: String, tsCol: String,
                      bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive: $bucketMicros")
    val active = df
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol),
        expr(s"unix_micros(`$tsCol`) div ${bucketMicros}L").as("b"))
      .distinct()
    val first = active.groupBy(col(keyCol)).agg(min(col("b")).as("cb"))
    val g = active.join(first, keyCol)
      .groupBy(col("cb"), (col("b") - col("cb")).as("bucket_offset"))
      .agg(count(lit(1)).as("n_users"))
    val size = first.groupBy(col("cb")).agg(count(lit(1)).as("cohort_size"))
    g.join(size, "cb")
      .select((col("cb") * bucketMicros).as("cohort_start_us"),
        col("bucket_offset"), col("n_users"),
        (col("n_users").cast("double") / col("cohort_size").cast("double"))
          .as("retention"))
  }

  /**
   * Per-key rolling time-window aggregate: for every row, the count
   * and exact DECIMAL-summed value of the key's rows in the trailing
   * `windowMicros` (inclusive range frame `[t - windowMicros, t]`,
   * peer rows included — identical RANGE semantics in Spark and
   * DuckDB, so the frame is value-defined and deterministic under
   * duplicate timestamps).
   *
   * Scale: ONE keyed range window, no self-join — Spark evaluates it
   * as a single sort within key partitions; a time-range self-join
   * would shuffle the fact table twice and explode skewed keys.
   *
   * Output: input id columns + (ts_us, n_win, sum_win).
   */
  def rollingAgg(df: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String, windowMicros: Long,
                 idCols: Seq[String]): DataFrame = {
    require(windowMicros > 0, s"windowMicros must be positive: $windowMicros")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("ts_us"))
      .rangeBetween(-windowMicros, Window.currentRow)
    df.filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select((idCols.map(col) :+ col(keyCol) :+
        unix_micros(col(tsCol)).as("ts_us") :+
        col(valueCol).cast("decimal(18,6)").as("_v")): _*)
      .select((idCols.map(col) :+ col(keyCol) :+ col("ts_us") :+
        count(lit(1)).over(w).as("n_win") :+
        sum(col("_v")).over(w).cast("double").as("sum_win")): _*)
  }

  /**
   * Rolling z-score anomaly flags — the monitoring face of
   * [[rollingAgg]]: each row scores against the mean/σ of its key's
   * trailing `windowMicros` (inclusive RANGE frame, peers included),
   * flagged when `|z| > k` with at least `minN` points in the window.
   *
   * One keyed RANGE window computes n/Σx/Σx² (the sums as exact
   * DECIMALs — order-free, so the layout cannot move a flag), then the
   * z chain is one mirrored IEEE expression tree:
   * `mean = Σx/n`, `var = max(Σx²/n − mean², 0)` (the float-
   * cancellation guard), `z = round((x − mean)/σ, 6)`; σ = 0 (a
   * constant window) scores z = 0. The CURRENT row is part of its own
   * window — the standard self-inclusive control-chart convention
   * (exclude-self needs no second window: shrink `k` instead).
   *
   * Scale: identical surface to [[rollingAgg]] — one sort per key
   * partition, no self-join, no global window.
   *
   * Output: idCols + (keyCol, ts_us, value, n_win, z, is_anomaly).
   */
  def rollingAnomalies(df: DataFrame, keyCol: String, tsCol: String,
                       valueCol: String, windowMicros: Long,
                       k: Double = 3.0, minN: Int = 5,
                       idCols: Seq[String] = Nil): DataFrame = {
    require(windowMicros > 0, s"windowMicros must be positive: $windowMicros")
    require(k > 0 && minN >= 2, s"need k > 0 and minN >= 2: $k, $minN")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("ts_us"))
      .rangeBetween(-windowMicros, Window.currentRow)
    val base = df
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull &&
        col(valueCol).isNotNull)
      .select((idCols.map(col) :+ col(keyCol) :+
        unix_micros(col(tsCol)).as("ts_us") :+
        col(valueCol).cast("double").as("value") :+
        col(valueCol).cast("decimal(18,6)").as("__v")): _*)
      .select((idCols.map(col) :+ col(keyCol) :+ col("ts_us") :+
        col("value") :+
        count(lit(1)).over(w).as("n_win") :+
        sum(col("__v")).over(w).as("__s") :+
        sum(col("__v") * col("__v")).over(w).as("__sq")): _*)
    val mean = col("__s").cast("double") / col("n_win")
    val varr = greatest(
      col("__sq").cast("double") / col("n_win") - mean * mean, lit(0.0))
    val std = sqrt(varr)
    val z = when(std > 0,
      round((col("value") - mean) / std, 6)).otherwise(lit(0.0))
    base.select((idCols.map(col) :+ col(keyCol) :+ col("ts_us") :+
      col("value") :+ col("n_win") :+ z.as("z") :+
      when(col("n_win") >= minN && abs(z) > k, lit(1))
        .otherwise(lit(0)).as("is_anomaly")): _*)
  }

  /**
   * First-order Markov transition matrix over per-key event sequences:
   * for each ordered pair of consecutive event types within a key,
   * the transition count and the row-normalized probability — the
   * user-journey summary behind funnel design, anomaly detection
   * (impossible transitions), and sequence-model sanity checks.
   *
   * Ordering within a key is (ts, tieCol) — the tie column makes the
   * sequence total and the output deterministic under duplicate
   * timestamps. `lead` runs over ONE key-partitioned window (bounded
   * per key, the sessionize shape — never global); the counts are a
   * map-side-combined aggregate and the normalizer joins back on the
   * source type (type-cardinality rows, broadcast under AQE).
   * Probability is one IEEE long/long division — engine-exact.
   *
   * Output: (src, dst, n, p).
   */
  def transitionMatrix(df: DataFrame, keyCol: String, typeCol: String,
                       tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val steps = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(keyCol), col(typeCol).as("src"),
        lead(col(typeCol), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
    val counts = steps.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("src")).agg(sum(col("n")).as("__tn"))
    counts.join(totals, Seq("src"))
      .select(col("src"), col("dst"), col("n"),
        round(col("n") / col("__tn"), 6).as("p"))
  }

  /**
   * Per-key interval union (the classic gaps-and-islands merge):
   * overlapping or TOUCHING [start, end) spans collapse to one row —
   * the cleanup pass behind contamination spans, redaction ranges,
   * session windows, and any other "union these ranges" need.
   * Degenerate spans (end ≤ start) are dropped up front.
   *
   * Implementation is a DISTRIBUTED SWEEP LINE, not a per-key window:
   * `Window.partitionBy(key)` holds each key's entire span set in one
   * task, so a bounded-cardinality key (a handful of redaction
   * categories, a fixed shard count) funnels at 100 TB — the defect
   * class the r12 plan audit closed for ranks, surfaced HERE by the
   * r13 empirical audit (the gate's mod-50 key measured 10× group
   * bloat on the sf0.01→sf0.1 step). Instead each span becomes two
   * events (+1 at start, −1 at end); in (key, pos, starts-first)
   * order the GLOBAL running sum of deltas equals the per-key
   * open-span count with no per-key reset (each key's deltas are
   * zero-sum, and a key's first event is always a start), an island
   * opens exactly where that count rises from 0, and island ids are
   * the running count of openings. Both running values come from one
   * range-partitioned, partition-sorted layout via seeded
   * per-partition scans (the [[Packing.withPrefixSum]] construction:
   * persist the layout, collect ≤nParts per-partition totals, stream
   * each partition with its base) — every task holds ~events/nParts
   * regardless of key skew, and the only other shuffle is the
   * map-side-combined island aggregate on a data-scale key.
   *
   * Tied starts always intersect each other, so the MERGED output is
   * a pure function of the span SET — tie order within a partition
   * can relabel island ids but never change the grouped rows (ids are
   * dropped at output). The event union coerces start/end bounds to
   * one common type internally (mixed DATE/TIMESTAMP inputs compare
   * in the wider type), but the OUTPUT bounds are cast back to the
   * input column types, so the schema matches the old min(start)/
   * max(end) formulation for every input (r13 ADVICE: the sweep
   * rewrite must not be a silent schema change for external callers).
   *
   * Output: (keyCol, startCol, endCol, n_spans) — one row per merged
   * island.
   *
   * Cache contract: the event layout persists because the returned
   * plan reads it; [[Packing.releaseCaches]] frees it once results
   * are consumed (end-of-life for the plan, ENFORCED — the seed
   * broadcasts are destroyed with the caches, see there).
   */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
                     endCol: String): DataFrame = {
    val spark = df.sparkSession
    val base = df.filter(col(keyCol).isNotNull && col(startCol).isNotNull &&
      col(endCol).isNotNull && col(endCol) > col(startCol))
    val events = base
      .select(col(keyCol), explode(array(
        struct(col(startCol).as("__pos"), lit(1).as("__d")),
        struct(col(endCol).as("__pos"), lit(-1).as("__d")))).as("__ev"))
      .select(col(keyCol), col("__ev.__pos").as("__pos"),
        col("__ev.__d").as("__d"))
    val nParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // starts sort BEFORE ends at equal pos (__d desc), so touching
    // spans never see the count hit zero between them
    val order = Seq(col(keyCol).asc, col("__pos").asc, col("__d").desc)
    val ranged = events
      .repartitionByRange(nParts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    Packing.registerCache(ranged)
    val pIdx = ranged.schema.fieldIndex("__pid")
    val dIdx = ranged.schema.fieldIndex("__d")
    val kIdx = ranged.schema.fieldIndex(keyCol)
    val posIdx = ranged.schema.fieldIndex("__pos")
    // pass 1: per-partition delta totals -> open-span count seeds
    val sums = ranged.groupBy(col("__pid"))
      .agg(sum(col("__d")).as("__s")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val cBase = new Array[Long](nParts + 1)
    (0 until nParts).foreach(i =>
      cBase(i + 1) = cBase(i) + sums.getOrElse(i, 0L))
    val bcC = Packing.registerBroadcast(spark.sparkContext.broadcast(cBase))
    // pass 2: per-partition opening counts GIVEN the seeds -> island
    // id bases (openings need the running count, so they can only be
    // counted once the count seeds exist)
    import spark.implicits._
    val opens = ranged.mapPartitions { it =>
      val cb = bcC.value
      val acc = scala.collection.mutable.LinkedHashMap[Int, Long]()
      var cur = -1
      var c = 0L
      it.foreach { r =>
        val pid = r.getInt(pIdx)
        if (pid != cur) { cur = pid; c = cb(pid); acc.getOrElseUpdate(pid, 0L) }
        val d = r.getInt(dIdx)
        if (d == 1 && c == 0L) acc(pid) += 1L
        c += d
      }
      acc.iterator
    }.collect().toMap
    val iBase = new Array[Long](nParts + 1)
    (0 until nParts).foreach(i =>
      iBase(i + 1) = iBase(i) + opens.getOrElse(i, 0L))
    val bcI = Packing.registerBroadcast(spark.sparkContext.broadcast(iBase))
    // pass 3: stamp island ids (globally unique — openings never occur
    // strictly inside an island, and a key's first event is an
    // opening, so ids cannot leak across keys)
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      ranged.schema(keyCol), ranged.schema("__pos"), ranged.schema("__d"),
      org.apache.spark.sql.types.StructField("__island",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val stamped = ranged.mapPartitions { it =>
      val cb = bcC.value
      val ib = bcI.value
      // seam-validated like [[Packing.withPrefixSum]]: each finished
      // partition's running delta count and island count must close
      // exactly on the next baked-in seeds, or the persisted layout
      // those seeds were collected from has been re-materialized
      // (clearCache + re-evaluation, changed source) — throw instead
      // of stamping islands against a stale layout
      new scala.collection.AbstractIterator[org.apache.spark.sql.Row] {
        private var cur = -1
        private var c = 0L
        private var isl = 0L
        private var sealed_ = false
        private def seam(): Unit =
          if (cur >= 0 && (c != cb(cur + 1) || isl != ib(cur + 1)))
            throw new IllegalStateException(
              s"range-layout drift: partition $cur closed at " +
                s"(count=$c, islands=$isl), seeds expect " +
                s"(${cb(cur + 1)}, ${ib(cur + 1)}) — rebuild the plan " +
                "(see Packing.withPrefixSum)")
        def hasNext: Boolean = {
          val h = it.hasNext
          if (!h && !sealed_) { sealed_ = true; seam() }
          h
        }
        def next(): org.apache.spark.sql.Row = {
          val r = it.next()
          val pid = r.getInt(pIdx)
          if (pid != cur) { seam(); cur = pid; c = cb(pid); isl = ib(pid) }
          val d = r.getInt(dIdx)
          if (d == 1 && c == 0L) isl += 1L
          c += d
          org.apache.spark.sql.Row(r.get(kIdx), r.get(posIdx), d, isl)
        }
      }
    }(org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema))
    // an island's first event is its opening and its last the close
    // that returns the count to zero, so min/max pos are the bounds;
    // n_spans counts the start events
    // a merged start is always some input start (and end some input
    // end), so the cast back to the INPUT column type is lossless —
    // it only undoes the union's widening
    val startType = df.schema(startCol).dataType
    val endType = df.schema(endCol).dataType
    stamped
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col("__pos")).as(startCol), max(col("__pos")).as(endCol),
        sum(when(col("__d") === 1, 1L).otherwise(0L)).as("n_spans"))
      .select(col(keyCol), col(startCol).cast(startType).as(startCol),
        col(endCol).cast(endType).as(endCol), col("n_spans"))
  }
}
