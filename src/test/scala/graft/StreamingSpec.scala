package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  test("streamed windowed counts equal the batch answer") {
    val q = EventStream.runToMemory(spark,
      s"$sf0001/events.parquet", "stream_counts",
      df => EventStream.windowedCounts(df))
    try {
      val streamed = spark.table("stream_counts")
      val batchRaw = spark.read
        .schema(EventStream.RawSchema)
        .parquet(s"$sf0001/events.parquet")
      val batch = EventStream.windowedCounts(
        EventStream.normalize(batchRaw))
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).isEmpty &&
        batch.exceptAll(streamed).isEmpty)
    } finally q.stop()
  }

  test("streamed windowed quantile histogram equals the batch sketch") {
    val q = EventStream.runToMemory(spark,
      s"$sf0001/events.parquet", "stream_qhist",
      df => EventStream.windowedQuantileHistogram(df))
    try {
      val streamed = spark.table("stream_qhist")
      val batch = EventStream.windowedQuantileHistogram(
        EventStream.normalize(spark.read
          .schema(EventStream.RawSchema)
          .parquet(s"$sf0001/events.parquet")))
      assert(streamed.count() > 0)
      // bucket-count parity: the stream emits the SAME mergeable
      // sketch table the batch pass computes — so per-window quantiles
      // decoded downstream are identical by construction
      assert(streamed.exceptAll(batch).isEmpty &&
        batch.exceptAll(streamed).isEmpty)
      val decoded = graft.operators.Audits.rollupQuantiles(
        streamed.select(unix_micros(col("window_start"))
          .as("win_start_us"), col("qb"), col("cnt")),
        Seq("win_start_us"), Seq(0.5))
      assert(decoded.count() > 0)
    } finally q.stop()
  }

  test("streaming dedup drops replayed events to the batch-distinct answer") {
    // stage the events file TWICE (a replayed ingest) — the streaming
    // dedup must land on exactly the batch-distinct key set
    val dir = java.nio.file.Files.createTempDirectory("graft_replay")
    val src = spark.read.schema(EventStream.RawSchema)
      .parquet(s"$sf0001/events.parquet")
    src.write.mode("append").parquet(dir.toString)
    src.write.mode("append").parquet(dir.toString)

    val q = EventStream.runToMemory(spark, dir.toString, "stream_dedup",
      df => EventStream.dedupEvents(df),
      mode = org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      val streamed = spark.table("stream_dedup")
      val batch = EventStream.dedupEvents(
        EventStream.normalize(spark.read
          .schema(EventStream.RawSchema).parquet(dir.toString)))
      assert(streamed.count() > 0)
      assert(streamed.count() == batch.count())
      // identical deduped key sets (first-arrival rows may differ in
      // non-key columns between engines; the key contract is the gate)
      val key = xxhash64(col("user_id"), col("event_type"), col("value"))
      val sKeys = streamed.select(key).distinct()
      val bKeys = batch.select(key).distinct()
      assert(sKeys.exceptAll(bKeys).isEmpty && bKeys.exceptAll(sKeys).isEmpty)
    } finally q.stop()
  }

  test("stream-static enrichment equals the batch join") {
    val dim = spark.read.parquet(s"$sf0001/customer.parquet")
      .select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment"))
    val q = EventStream.runToMemory(spark,
      s"$sf0001/events.parquet", "stream_enrich",
      df => EventStream.enrichStatic(
        df.select(col("user_id"), col("event_id"), col("event_type")),
        dim, "user_id"),
      mode = org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      val streamed = spark.table("stream_enrich")
      val batch = EventStream.enrichStatic(
        EventStream.normalize(spark.read
          .schema(EventStream.RawSchema).parquet(s"$sf0001/events.parquet"))
          .select(col("user_id"), col("event_id"), col("event_type")),
        dim, "user_id")
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).isEmpty &&
        batch.exceptAll(streamed).isEmpty)
    } finally q.stop()
  }

  test("stream-stream funnel join replays to the batch answer") {
    // stage the fixture in a directory (file stream source needs one)
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel")
    spark.read.schema(EventStream.RawSchema)
      .parquet(s"$sf0001/events.parquet")
      .write.mode("append").parquet(dir.toString)
    def stream() = EventStream.normalize(
      spark.readStream.schema(EventStream.RawSchema).parquet(dir.toString))
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
    val q = EventStream
      .followWithin(stream(), stream(), maxDelay = "30 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_follow")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_follow")
      val b = EventStream.normalize(spark.read
        .schema(EventStream.RawSchema).parquet(dir.toString))
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
      val batch = EventStream.followWithin(b, b, maxDelay = "30 minutes")
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).isEmpty &&
        batch.exceptAll(streamed).isEmpty)
    } finally q.stop()
  }

  test("sessionize handles TimestampType ts (unit regression)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val us = 1000000L
    val events = Seq(
      (1L, 0L * us, 1.0), (1L, 60L * us, 2.0),
      (1L, 10000L * 1000L * us, 9.0)
    ).toDF("user_id", "ts", "value")
      .withColumn("ts", timestamp_micros(col("ts"))) // TimestampType input
    val out = EventStream.sessionize(events, gapMs = 30 * 60 * 1000L)
      .as[EventStream.SessionUpdate].collect()
    // with the old cast-to-long (seconds) bug the gap math was off by
    // 1e6 and no session ever closed
    assert(out.length == 1 && out.head.events_in_session == 2)
  }

  test("sessionize closes sessions on inactivity gaps (batch path)") {
    import spark.implicits._
    // 3 events within the gap, then one far later → exactly one closed
    // session of 3 events, and open state for the last one
    val us = 1000000L // 1 second in micros
    val events = Seq(
      (1L, 0L * us, 1.0), (1L, 60L * us, 2.0), (1L, 120L * us, 3.0),
      (1L, 10000L * 1000L * us, 9.0)
    ).toDF("user_id", "ts", "value")
    val out = EventStream.sessionize(events, gapMs = 30 * 60 * 1000L)
      .as[EventStream.SessionUpdate].collect()
    assert(out.length == 1)
    assert(out.head.events_in_session == 3 && out.head.session_value == 6.0)
    assert(out.head.closed)
  }
}
