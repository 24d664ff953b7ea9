package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/**
 * Structured Streaming surface (beyond-parity extension — the reference
 * is batch-only, SURVEY.md §2.9; this is the streaming ingest a
 * large-scale pipeline needs on top of it).
 *
 * Batch/stream parity by construction: the transformations are defined
 * once over an untyped DataFrame and work identically under
 * `spark.read` and `spark.readStream` — the specs assert that a
 * streamed run over the events fixture produces exactly the batch
 * answer (memory sink + processAllAvailable).
 */
object EventStream {

  /** The events table schema as the streaming reader needs it. The
    * fixture has shipped ts as both TIMESTAMP(NANOS) (→ long ns under
    * nanosAsLong) and plain TIMESTAMP(MICROS); this is the CURRENT
    * layout — streaming readers that must not trust it should infer
    * from the file footer instead ([[rawSchemaFor]]), which is what
    * [[runToMemory]] does. */
  val RawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Footer-inferred schema of a parquet events path — the file stream
    * source demands an explicit schema, and inferring it from the batch
    * reader (one footer read, driver-side) keeps the stream robust to
    * fixture-layout changes instead of hard-coding one. */
  def rawSchemaFor(spark: SparkSession, path: String): StructType =
    spark.read.parquet(path).schema

  /** Normalize ts to a session-zoned microsecond timestamp whatever
    * the raw layout resolved to: long nanoseconds (legacy
    * TIMESTAMP(NANOS) under nanosAsLong — truncating div, exactly like
    * DuckDB), TIMESTAMP_NTZ micros (cast; wall-clock-identical under
    * the UTC session), or already a timestamp (pass through). */
  def normalize(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** Tumbling-window per-type aggregate with a watermark for state
    * eviction (append-mode capable). */
  def windowedCounts(events: DataFrame,
                     windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total_value"))

  /**
   * Tumbling-window DDSketch quantile histogram — the streaming face
   * of [[graft.operators.Audits.quantileHistogram]]: per event-time
   * window, the (qb, cnt) bucket table whose counts are order-free
   * long sums. Because a DDSketch IS its bucket counts, this is just a
   * windowed aggregate — append-capable under the watermark with NO
   * custom state, and the emitted rows are immediately mergeable with
   * any other histogram of the same α (union + sum = exact sketch
   * union). Downstream, [[graft.operators.Audits.rollupQuantiles]]
   * with `window_start` as a dim decodes per-window quantiles — the
   * "p99 per window from a stream" shape with exactly-bounded state
   * (windows in flight × bucket grid).
   */
  def windowedQuantileHistogram(events: DataFrame,
                                valueCol: String = "value",
                                windowLen: String = "6 hours",
                                watermark: String = "12 hours",
                                alpha: Double = 0.02): DataFrame =
    events
      .filter(col(valueCol).isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen),
        graft.operators.Audits.ddBucket(col(valueCol), alpha).as("qb"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"),
        col("qb"), col("cnt"))

  /**
   * Batch sessionization — the oracle-checkable face of the stateful
   * streaming sessionization below: a session is a maximal run of a
   * user's events with inter-event gaps <= `gapMinutes`. One window
   * pass (lag → new-session flag → running sum = session index) and
   * one aggregate; both shuffles key on user_id, value totals go
   * through DECIMAL (exact, order-independent). Timestamps are
   * returned as epoch micros so engine timestamp types never enter
   * the comparison.
   */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    // NULLS LAST to match SQL-default ordering (Spark asc is NULLS
    // FIRST, DuckDB/ANSI default is NULLS LAST — a null-ts event must
    // sort to the same place in both engines or session assignment
    // diverges)
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").asc_nulls_last, col("event_id").asc)
    val running = byUser.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .withColumn("__new_session",
        when(lag(col("ts"), 1).over(byUser).isNull ||
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)) > gapUs,
          lit(1)).otherwise(lit(0)))
      .withColumn("session_idx", sum(col("__new_session")).over(running))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
  }

  /** Per-user session state for flatMapGroupsWithState. */
  case class SessionState(count: Long, totalValue: Double, lastTs: Long)
  case class SessionUpdate(user_id: Long, events_in_session: Long,
                           session_value: Double, closed: Boolean)

  /**
   * Stateful sessionization: a user's session closes after `gapMs` of
   * inactivity (processing-time timeout in streams; explicit close in
   * the batch-equivalent test path). Custom state via
   * flatMapGroupsWithState — the KeyValueGroupedDataset route the
   * reference has no analogue for.
   */
  def sessionize(events: DataFrame, gapMs: Long = 30 * 60 * 1000L)
      : DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types.TimestampType
    // normalize ts to epoch MICROSECONDS whatever the input form:
    // a TimestampType cast to long yields SECONDS (off by 1e6 for the
    // gap math), so convert explicitly
    val tsMicros = events.schema("ts").dataType match {
      case TimestampType => unix_micros(col("ts"))
      case _             => col("ts").cast("long")
    }
    val typed = events
      .select(col("user_id").cast("long"), tsMicros.as("tsus"),
        col("value").cast("double"))
      .as[(Long, Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Double)],
         state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_._2)
          var st = state.getOption.getOrElse(SessionState(0L, 0.0, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionUpdate]
          sorted.foreach { case (_, ts, v) =>
            val tsMs = ts / 1000
            if (st.count > 0 && tsMs - st.lastTs / 1000 > gapMs) {
              out += SessionUpdate(user, st.count, st.totalValue, closed = true)
              st = SessionState(0L, 0.0, Long.MinValue)
            }
            st = SessionState(st.count + 1, st.totalValue + v, ts)
          }
          state.update(st)
          out.iterator
      }.toDF()
  }

  /**
   * Streaming exact dedup — the streaming face of
   * `TextDedup.exactDedup`: keep the first event per content key,
   * dropping replays/duplicates as they arrive. Keyed on a content
   * digest (xxhash64 over the selected columns), with a watermark bounding the
   * dedup state exactly like the batch pipeline bounds its shuffle:
   * duplicates separated by more than the watermark horizon are the
   * retention trade-off, stated rather than hidden. Under `spark.read`
   * the dedup is global; under `spark.readStream` it is stateful. Both
   * keep exactly one row per key (key-set parity asserted in
   * StreamingSpec), but the SURVIVOR may differ: batch keeps
   * min(ts, event_id), while the streaming path keeps the first row to
   * ARRIVE — out-of-order arrival within the watermark can select a
   * later-timestamped survivor.
   */
  def dedupEvents(events: DataFrame,
                  keyCols: Seq[String] = Seq("user_id", "event_type", "value"),
                  watermark: String = "2 hours"): DataFrame = {
    // Null handling BEFORE hashing: Spark's hash expressions skip
    // null children entirely (the seed passes through unchanged), so
    // hashing raw columns would let rows with different null layouts
    // collide onto one key and be dropped as duplicates. A string
    // sentinel would itself collide with a column whose actual value
    // IS the sentinel, so each key column contributes TWO never-null
    // hash inputs: an is-null flag and the empty-coalesced value.
    val keyed = events.withColumn("__content_key",
      xxhash64(keyCols.flatMap(c => Seq(
        isnull(col(c)),
        coalesce(col(c).cast("string"), lit("")))): _*))
    val deduped =
      if (keyed.isStreaming)
        keyed.withWatermark("ts", watermark)
          .dropDuplicatesWithinWatermark("__content_key")
      else
        // batch equivalence: first row per key by (ts, event_id) —
        // NULLS LAST like sessionizeBatch, so the survivor choice
        // matches ANSI/DuckDB default ordering
        keyed.withColumn("__rn",
          row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("__content_key"))
              .orderBy(col("ts").asc_nulls_last, col("event_id").asc)))
          .filter(col("__rn") === 1)
          .drop("__rn")
    deduped.drop("__content_key")
  }

  /**
   * Event-sequence (funnel) join: for every lead event, the follow
   * events of the SAME key that happen within `(lead.ts, lead.ts +
   * maxDelay]`-style bounds — here inclusive `[ts, ts + maxDelay]`,
   * excluding the event itself. The classic "A followed by B within T"
   * primitive behind funnels, attribution, and co-occurrence mining.
   *
   * Batch and stream share this one definition. Under `readStream`
   * this is a genuine stream-stream inner join: the time-range
   * predicate gives Spark the state-eviction bound and `watermark`
   * caps late data — without the range condition the join state would
   * grow forever (StreamingSpec asserts replay parity against the
   * batch answer).
   *
   * Scale: an equi-join on the key with the time range as a residual —
   * a hash join, never a nested loop; output is bounded by events per
   * key within the delay horizon.
   *
   * Output: (keyCol, lead_id, follow_id, lead_type, follow_type,
   * delay_us).
   */
  def followWithin(lead: DataFrame, follow: DataFrame,
                   keyCol: String = "user_id", tsCol: String = "ts",
                   idCol: String = "event_id", typeCol: String = "event_type",
                   maxDelay: String = "1 hour",
                   watermark: String = "2 hours"): DataFrame = {
    def wm(df: DataFrame) =
      if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    val l = wm(lead).select(col(keyCol).as("__k"), col(tsCol).as("__lts"),
      col(idCol).as("lead_id"), col(typeCol).as("lead_type"))
    val r = wm(follow).select(col(keyCol).as("__rk"), col(tsCol).as("__rts"),
      col(idCol).as("follow_id"), col(typeCol).as("follow_type"))
    l.join(r,
        col("__k") === col("__rk") &&
          col("__rts") >= col("__lts") &&
          col("__rts") <= col("__lts") + expr(s"INTERVAL $maxDelay") &&
          col("lead_id") =!= col("follow_id"))
      .select(col("__k").as(keyCol), col("lead_id"), col("follow_id"),
        col("lead_type"), col("follow_type"),
        (unix_micros(col("__rts")) - unix_micros(col("__lts")))
          .as("delay_us"))
  }

  /**
   * Stream-static enrichment join — the standard "attach dimension
   * attributes to the event stream" step, one code path for batch and
   * readStream. The dimension is broadcast (small side by contract);
   * in streaming mode Spark re-resolves the static side per
   * micro-batch, so no state store and no watermark are involved.
   * Left join: events with no dimension row pass through with nulls
   * (an enrichment must never drop facts).
   */
  def enrichStatic(events: DataFrame, dim: DataFrame,
                   key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Run a streaming query over parquet input into a memory sink and
    * block until all available data is processed (test/demo harness). */
  def runToMemory(spark: SparkSession, inputDir: String, queryName: String,
                  transform: DataFrame => DataFrame,
                  mode: OutputMode = OutputMode.Complete()): StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.streaming.schemaInference", "false")
    // the file stream source requires a directory; stage a single-file
    // input behind a symlink
    val in = new java.io.File(inputDir)
    val dir =
      if (in.isDirectory) in.getAbsolutePath
      else {
        val d = java.nio.file.Files.createTempDirectory("graft_stream")
        java.nio.file.Files.createSymbolicLink(
          d.resolve(in.getName), in.toPath.toAbsolutePath)
        d.toString
      }
    val stream = spark.readStream
      .schema(rawSchemaFor(spark, inputDir))
      .parquet(dir)
    val q = transform(normalize(stream)).writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q
  }
}
