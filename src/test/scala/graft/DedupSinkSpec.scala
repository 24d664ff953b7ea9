package graft

import org.apache.spark.sql.functions._

import graft.ops.TextDedup
import graft.streaming.DedupSink

class DedupSinkSpec extends SparkSpec {
  import spark.implicits._

  /** ~240-char token doc over a PER-SEED vocabulary (the seed is baked
    * into every token), so different seeds share almost no 5-shingles
    * while a suffix edit keeps jaccard near 1. */
  private def doc(seed: Int): String =
    (0 until 40).map(i => s"t${seed}q${(i * 13) % 41}").mkString(" ")

  test("dedup sink: corpus dups dropped, intra-batch collapsed, " +
    "index grows, replay is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsink").toString
    val idx = s"$dir/idx"
    val corpus = s"$dir/corpus"
    val base = Seq((1L, doc(1)), (2L, doc(2)), (3L, doc(3)))
      .toDF("doc_id", "text")
    TextDedup.saveMinhashIndex(base, "doc_id", "text", idx,
      shingleLen = 5, numHashes = 32, bands = 8)
    val b0 = Seq(
      (100L, doc(1) + " x"), // near-copy of indexed doc 1 → dropped
      (10L, doc(7)), (11L, doc(7) + " y"), // intra-batch pair → 10 survives
      (12L, doc(9))) // novel
      .toDF("doc_id", "text")
    val s0 = DedupSink.applyBatch(spark, idx, corpus, "doc_id", "text",
      jaccardThreshold = 0.8, b0, 0L)
    // the returned frame must survive cache eviction: it is the WRITTEN
    // rows, not a live plan that would re-probe the already-grown index
    spark.catalog.clearCache()
    assert(s0.select("doc_id").as[Long].collect().toSet == Set(10L, 12L))
    val c0 = spark.read.parquet(corpus)
    assert(c0.columns.contains("ingest_batch")) // lineage for free
    assert(c0.select("doc_id").as[Long].collect().toSet == Set(10L, 12L))
    // the NEXT batch dedups against the grown index: a near-copy of
    // batch-0 survivor 10 must now be recognized as a duplicate
    val b1 = Seq((200L, doc(7) + " z"), (20L, doc(20)))
      .toDF("doc_id", "text")
    val s1 = DedupSink.applyBatch(spark, idx, corpus, "doc_id", "text",
      jaccardThreshold = 0.8, b1, 1L, compactEvery = 2L)
    assert(s1.select("doc_id").as[Long].collect().toSet == Set(20L))
    assert(DedupSink.lastAppliedBatch(spark, idx) == 1L)
    // compactEvery=2 fired on batch 1: band dirs fold to one file each
    // and the dedup answers are unchanged by contract — the replay and
    // grown-index assertions below run against the compacted index
    val bandFiles = spark.read.parquet(s"$idx/bands")
      .select(input_file_name().as("f"), col("band"))
      .distinct().groupBy(col("band")).count()
      .as[(Int, Long)].collect()
    assert(bandFiles.nonEmpty && bandFiles.forall(_._2 == 1L),
      s"compaction left multiple files per band: ${bandFiles.toSeq}")
    // replay of batch 0 (failure redelivery): nothing applied twice,
    // and the call returns the originally-written survivors
    val r = DedupSink.applyBatch(spark, idx, corpus, "doc_id", "text",
      jaccardThreshold = 0.8, b0, 0L)
    assert(r.select("doc_id").as[Long].collect().toSet == Set(10L, 12L))
    assert(spark.read.parquet(corpus).select("doc_id")
      .as[Long].collect().toSet == Set(10L, 12L, 20L))
  }

  test("streamed dedup-ingest matches the batch-driven answer") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsinkq").toString
    val idx = s"$dir/idx"
    val corpus = s"$dir/corpus"
    val input = s"$dir/in"
    TextDedup.saveMinhashIndex(
      Seq((1L, doc(1))).toDF("doc_id", "text"), "doc_id", "text", idx,
      shingleLen = 5, numHashes = 32, bands = 8)
    val batch = Seq(
      (100L, doc(1) + " q"), // dup of the seeded corpus
      (30L, doc(30)), (31L, doc(30) + " r"), // intra-batch pair
      (40L, doc(40)))
      .toDF("doc_id", "text")
    batch.write.mode("overwrite").parquet(input)
    val q = DedupSink.start(
      spark.readStream.schema(batch.schema).parquet(input),
      idx, corpus, "doc_id", "text", jaccardThreshold = 0.8,
      checkpointDir = s"$dir/ckpt")
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(corpus).select("doc_id")
      .as[Long].collect().toSet == Set(30L, 40L))
    // a second stream over the same checkpoint re-delivers nothing
    val q2 = DedupSink.start(
      spark.readStream.schema(batch.schema).parquet(input),
      idx, corpus, "doc_id", "text", jaccardThreshold = 0.8,
      checkpointDir = s"$dir/ckpt")
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(corpus).select("doc_id")
      .as[Long].collect().toSet == Set(30L, 40L))
  }
}
