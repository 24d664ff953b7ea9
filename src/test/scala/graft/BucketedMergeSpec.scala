package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/**
 * The bucketing co-location story for repeated merges: with source and
 * target both bucketed on the match key (same bucket count), the
 * match equi-join must read buckets directly — NO shuffle exchange on
 * the join key in the physical plan. This is the difference between
 * "every nightly import shuffles 100 TB" and "every nightly import
 * reads co-located buckets".
 */
class BucketedMergeSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed source-target equi-join plans without a shuffle") {
    val gw = new Gateway(spark)
    try {
      val target = (1L to 500L).map(i => (i, s"name$i", i * 1.0))
        .toDF("id", "name", "score")
      val source = (400L to 900L).map(i => (i, s"name$i", i * 2.0))
        .toDF("id", "name", "score")
      val bt = gw.saveBucketed(target, "bucketed_target", "id")
      val bs = gw.saveBucketed(source, "bucketed_source", "id")

      val joined = bs.as("s").join(bt.as("t"), Seq("id"))
        .select(col("id"), col("s.score").as("s_score"),
          col("t.score").as("t_score"))
      val shuffles = joined.queryExecution.sparkPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"bucketed-bucketed equi-join still shuffles:\n${joined.queryExecution.sparkPlan}")
      // and the join result is correct
      assert(joined.count() == 101)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bucketed_target")
      spark.sql("DROP TABLE IF EXISTS bucketed_source")
      gw.cleanUp()
    }
  }

  test("bucketed target feeds the real merge path") {
    val gw = new Gateway(spark)
    try {
      val target = (1L to 100L).map(i => (i, s"k${i % 20}", i * 1.0))
        .toDF("id", "k", "v")
      val bt = gw.saveBucketed(target, "bucketed_merge_target", "k")
      val source = (1L to 30L).map(i => (100L + i, s"k${i % 25}", i * 2.0))
        .toDF("working_source_id", "k", "v")
      val spec = operators.MergeSpec(matchSpec =
        operators.MatchSpec(Seq(operators.ExactGroup.onColumns("k")),
          targetPk = "id"))
      val res = operators.Merger.merge(source, bt, spec)
      // row conservation: target + unmatched source rows
      val unmatched = res.matched.filter(col("working_target_id").isNull).count()
      assert(res.newTarget.count() == 100 + unmatched)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bucketed_merge_target")
      gw.cleanUp()
    }
  }
}
