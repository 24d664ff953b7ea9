package graft

import org.apache.spark.sql.functions._

import graft.ops.ThetaSketch

/** KMV / theta distinct-count sketches: exactness below k, exact
  * min-set composition under union, layout invariance, estimator
  * accuracy at sketch scale, and the intersection face HLL cannot
  * answer. */
class ThetaSketchSpec extends SparkSpec {
  import spark.implicits._

  test("below k the sketch is exact: estimates and intersections are " +
    "true counts") {
    val a = (1L to 40L).map(("a", _)).toDF("g", "v")
    val b = (21L to 70L).map(("b", _)).toDF("g", "v")
    val sa = ThetaSketch.sketch(a, Seq("g"), "v", k = 64)
    val sb = ThetaSketch.sketch(b, Seq("g"), "v", k = 64)
    assert(sa.select(ThetaSketch.estimate(col("theta_ks"), 64))
      .as[Double].head() == 40.0)
    assert(sb.select(ThetaSketch.estimate(col("theta_ks"), 64))
      .as[Double].head() == 50.0)
    val i = ThetaSketch.intersect(sa, sb, Seq("g"), 64)
      .select(col("common_below_theta"), col("est_intersection"))
      .as[(Int, Double)].head()
    assert(i == ((20, 20.0)), s"exact intersection diverged: $i")
  }

  test("union rollup equals the sketch of the unioned value set, " +
    "bit for bit (min-sets compose)") {
    val df = spark.range(5000L).select(
      (col("id") % 4).cast("string").as("g"),
      ((col("id") * 2654435761L) % 1000L).as("v"))
    val fine = ThetaSketch.sketch(df, Seq("g"), "v", k = 32)
    val merged = ThetaSketch.rollup(fine, Nil, 32)
      .select(col("theta_ks")).as[Seq[Long]].head()
    val direct = ThetaSketch.sketch(df, Nil, "v", k = 32)
      .select(col("theta_ks")).as[Seq[Long]].head()
    assert(merged == direct, "KMV union must equal the unioned sketch")
  }

  test("layout invariance: the sketch is a pure function of the " +
    "value set") {
    val df = spark.range(20000L).select(lit("g").as("g"),
      ((col("id") * 40503L) % 7000L).as("v"))
    val s1 = ThetaSketch.sketch(df.repartition(3), Seq("g"), "v", 128)
      .select(col("theta_ks")).as[Seq[Long]].head()
    val s2 = ThetaSketch.sketch(df.repartition(17, col("v")), Seq("g"),
        "v", 128)
      .select(col("theta_ks")).as[Seq[Long]].head()
    assert(s1 == s2)
  }

  test("estimator accuracy at sketch scale: distinct and planted " +
    "overlap within KMV error bounds") {
    // two groups of 20k values overlapping in exactly 5k
    val a = spark.range(20000L).select(lit("a").as("g"), col("id").as("v"))
    val b = spark.range(15000L, 35000L).select(lit("b").as("g"),
      col("id").as("v"))
    val k = 256
    val sa = ThetaSketch.sketch(a, Seq("g"), "v", k)
    val sb = ThetaSketch.sketch(b, Seq("g"), "v", k)
    val estA = sa.select(ThetaSketch.estimate(col("theta_ks"), k))
      .as[Double].head()
    // KMV relative standard error ≈ 1/sqrt(k-2) ≈ 6.3% at k=256;
    // assert within 4 RSE (deterministic — this is a fixed hash draw)
    assert(math.abs(estA - 20000.0) / 20000.0 < 0.25, s"estA=$estA")
    val i = ThetaSketch.intersect(sa, sb, Seq("g"), k)
      .filter(col("a_g") === "a" && col("b_g") === "b")
      .select(col("est_intersection")).as[Double].head()
    assert(math.abs(i - 5000.0) / 5000.0 < 0.35, s"est∩=$i")
  }

  test("null values are ignored, k is validated") {
    val df = Seq(("g", java.lang.Long.valueOf(1L)),
      ("g", null.asInstanceOf[java.lang.Long]),
      ("g", java.lang.Long.valueOf(2L))).toDF("g", "v")
    val est = ThetaSketch.sketch(df, Seq("g"), "v", 8)
      .select(ThetaSketch.estimate(col("theta_ks"), 8)).as[Double].head()
    assert(est == 2.0)
    intercept[IllegalArgumentException] {
      ThetaSketch.sketch(df, Seq("g"), "v", 1)
    }
  }

  test("non-integral value columns are rejected up front (a failed " +
    "long cast would otherwise become a null hash polluting every " +
    "k-min set)") {
    val df = Seq(("g", "not-a-number")).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      ThetaSketch.sketch(df, Seq("g"), "v", 8)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("both sketch paths bound their k-min windows: the empty-group " +
    "partitionBy(lit(1)) folds into a distributed top-k limit, and " +
    "the grouped path rides WindowGroupLimit — never one task holding " +
    "a full distinct set") {
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    val df = spark.range(1000L).selectExpr("id % 7 AS g", "id AS v")
    // empty-group: LimitPushDownThroughWindow folds the constant
    // partition and rewrites the rank filter into TakeOrderedAndProject
    // (per-partition top-k, merged at the driver) BELOW the window, so
    // the window itself sees ≤ k rows
    val total = ThetaSketch.sketch(df, Nil, "v", 32)
      .queryExecution.sparkPlan
    assert(total.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      s"empty-group sketch plan has no distributed top-k below the " +
        s"window:\n$total")
    // grouped: InferWindowGroupLimit caps every task at k rows per
    // group before the window's shuffle
    val grouped = ThetaSketch.sketch(df, Seq("g"), "v", 32)
      .queryExecution.sparkPlan
    assert(grouped.collect { case g: WindowGroupLimitExec => g }.nonEmpty,
      s"grouped sketch plan has no WindowGroupLimit:\n$grouped")
  }
}
