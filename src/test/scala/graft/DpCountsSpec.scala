package graft

import org.apache.spark.sql.functions._

import graft.operators.Audits

/** Geometric-mechanism DP count release: distribution shape of the
  * integer noise, seed/key determinism, layout invariance, and the
  * release contracts. */
class DpCountsSpec extends SparkSpec {
  import spark.implicits._

  test("noise is a deterministic pure function of (key, seed); a new " +
    "seed redraws, a new key redraws, layout never does") {
    val df = spark.range(10000L).select(
      (col("id") % 7).cast("string").as("g"))
    def release(d: org.apache.spark.sql.DataFrame, seed: Long) =
      Audits.dpCounts(d, Seq("g"), seed)
        .select(col("g"), col("noise")).as[(String, Int)]
        .collect().toMap
    val r1 = release(df, 42L)
    val r2 = release(df.repartition(13), 42L)
    assert(r1 == r2, "noise must be layout-invariant")
    val r3 = release(df, 43L)
    assert(r1 != r3, "a different seed must redraw")
    // counts stay exact underneath: noisy_n - noise == n_true
    val rows = Audits.dpCounts(df, Seq("g"), 42L)
      .select(col("n_true"), col("noise"), col("noisy_n"))
      .as[(Long, Int, Long)].collect()
    assert(rows.forall { case (n, e, nn) => nn == n + e })
    assert(rows.forall(_._1 > 0))
  }

  test("noise distribution is the two-sided geometric at alpha = 1/2: " +
    "symmetric, centered, with the right spread") {
    // 50k distinct keys → 50k iid draws of G1 - G2
    val df = spark.range(50000L).select(col("id").cast("string").as("g"))
    val noise = Audits.dpCounts(df, Seq("g"), 7L)
      .select(col("noise")).as[Int].collect()
    val n = noise.length.toDouble
    val mean = noise.sum / n
    // mean 0; Var(G1-G2) = 2·Var(Geom(1/2)) = 2·((1/2)/(1/4)) = 4
    val varc = noise.map(x => (x - mean) * (x - mean)).sum / n
    assert(math.abs(mean) < 0.05, s"mean=$mean")
    assert(varc > 3.2 && varc < 4.8, s"var=$varc")
    // P(noise = 0) = Σ P(G=k)² = Σ 4^-(k+1) = 1/3
    val p0 = noise.count(_ == 0) / n
    assert(math.abs(p0 - 1.0 / 3.0) < 0.02, s"p0=$p0")
    // a coarser alpha (2^-3) concentrates: ~zero far outliers
    val tight = Audits.dpCounts(df, Seq("g"), 7L, alphaLog2 = 3)
      .select(col("noise")).as[Int].collect()
    val varT = tight.map(x => x.toDouble * x).sum / n
    assert(varT < varc / 5, s"alphaLog2=3 var=$varT vs $varc")
  }

  test("multi-column keys hash unambiguously across the boundary") {
    val a = Seq(("ab", "c"), ("x", "y")).toDF("g1", "g2")
    val b = Seq(("a", "bc"), ("x", "y")).toDF("g1", "g2")
    val na = Audits.dpCounts(a, Seq("g1", "g2"), 1L)
      .filter(col("g1") =!= "x").select(col("noise")).as[Int].head()
    val nb = Audits.dpCounts(b, Seq("g1", "g2"), 1L)
      .filter(col("g1") =!= "x").select(col("noise")).as[Int].head()
    // ("ab","c") and ("a","bc") must be DIFFERENT draws — the
    // separator keeps the key space injective (they agree only if the
    // two distinct hashes happen to collide on both fields, which the
    // fixed seed rules out here)
    assert(na != nb || {
      // defensive: if the draws coincide numerically, the HASHES must
      // still differ — recheck via a second seed
      val na2 = Audits.dpCounts(a, Seq("g1", "g2"), 2L)
        .filter(col("g1") =!= "x").select(col("noise")).as[Int].head()
      val nb2 = Audits.dpCounts(b, Seq("g1", "g2"), 2L)
        .filter(col("g1") =!= "x").select(col("noise")).as[Int].head()
      na2 != nb2
    })
  }

  test("contracts: group columns required, alpha bounded") {
    val df = Seq("a").toDF("g")
    intercept[IllegalArgumentException] {
      Audits.dpCounts(df, Nil, 1L)
    }
    intercept[IllegalArgumentException] {
      Audits.dpCounts(df, Seq("g"), 1L, alphaLog2 = 0)
    }
  }
}
