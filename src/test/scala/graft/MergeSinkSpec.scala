package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators._
import graft.streaming.MergeSink

class MergeSinkSpec extends SparkSpec {
  import spark.implicits._

  private def spec = MergeSpec(
    matchSpec = MatchSpec(
      groups = Seq(ExactGroup.onColumns("c_custkey")),
      targetPk = "c_custkey"),
    mergeExpressions = Map("c_acctbal" -> "$T + $S"),
    insertExpressions = Map("c_mktsegment" -> "'NEW'"))

  private def srcFrame(rows: Seq[(Long, String, Double)]): DataFrame =
    rows.toDF("c_custkey", "c_name", "c_acctbal")
      .withColumn("c_nationkey", lit(1))
      .withColumn("c_mktsegment", lit("NEW"))
      .withColumn("working_source_id", $"c_custkey")

  private def seedTarget(path: String): Unit =
    Seq((1L, "Alice", 100.0, 5, "RETAIL"), (2L, "Bob", 200.0, 6, "RETAIL"))
      .toDF("c_custkey", "c_name", "c_acctbal", "c_nationkey", "c_mktsegment")
      .write.mode("overwrite").parquet(path)

  private def store(path: String) =
    spark.read.parquet(path)
      .select($"c_custkey", $"c_name", $"c_acctbal", $"c_mktsegment")
      .as[(Long, String, Double, String)].collect().sortBy(_._1).toSeq

  test("applyBatch merges, promotes atomically, and replays are no-ops") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val target = s"$dir/store"
    seedTarget(target)
    // batch 0: update key 1 (+50), insert key 9
    MergeSink.applyBatch(spark, target, spec,
      srcFrame(Seq((1L, "Alice2", 50.0), (9L, "Nina", 10.0))), 0L)
    val afterB0 = store(target)
    assert(MergeSink.lastAppliedBatch(spark, target) == 0L)
    assert(afterB0.exists(r => r._1 == 1L && r._2 == "Alice2" &&
      r._3 == 150.0))
    assert(afterB0.exists(r => r._2 == "Nina" && r._4 == "NEW"))
    assert(afterB0.size == 3)
    // batch 1: update key 2
    MergeSink.applyBatch(spark, target, spec,
      srcFrame(Seq((2L, "Bob2", 25.0))), 1L)
    val afterB1 = store(target)
    assert(afterB1.exists(r => r._1 == 2L && r._3 == 225.0))
    // REPLAY batch 0 (failure recovery re-delivers it): store unchanged
    MergeSink.applyBatch(spark, target, spec,
      srcFrame(Seq((1L, "Alice2", 50.0), (9L, "Nina", 10.0))), 0L)
    assert(store(target) == afterB1)
    assert(MergeSink.lastAppliedBatch(spark, target) == 1L)
  }

  test("streamed merge equals the batch merge of the same source") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sinkq").toString
    val target = s"$dir/store"
    val input = s"$dir/in"
    seedTarget(target)
    val source = srcFrame(Seq((1L, "Alice2", 50.0), (9L, "Nina", 10.0)))
    source.write.mode("overwrite").parquet(input)
    val q = MergeSink.start(
      spark.readStream.schema(source.schema).parquet(input),
      target, s"$dir/ckpt", spec)
    try q.processAllAvailable() finally q.stop()
    // batch-path oracle: the same merge applied once
    val expected = {
      val t = Seq((1L, "Alice", 100.0, 5, "RETAIL"),
        (2L, "Bob", 200.0, 6, "RETAIL"))
        .toDF("c_custkey", "c_name", "c_acctbal", "c_nationkey", "c_mktsegment")
      Merger.merge(source, t, spec).newTarget
        .select($"c_custkey", $"c_name", $"c_acctbal", $"c_mktsegment")
        .as[(Long, String, Double, String)].collect().sortBy(_._1).toSeq
    }
    assert(store(target) == expected)
    // a SECOND stream over the same checkpoint re-lists nothing new and
    // the store stays put
    val q2 = MergeSink.start(
      spark.readStream.schema(source.schema).parquet(input),
      target, s"$dir/ckpt", spec)
    try q2.processAllAvailable() finally q2.stop()
    assert(store(target) == expected)
  }
}
