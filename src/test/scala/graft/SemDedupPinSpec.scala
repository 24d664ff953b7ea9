package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{QualityClassifier, Similarity}

/**
 * Guards behind the r11 SemDeDup gate oracles (r10 advice #2 — the
 * q_ann_sink margin-pinning technique applied to the two rows-only
 * SemDeDup gates):
 *
 *  - `q_semdedup` is now a FULL DuckDB recompute (assignment → pairs
 *    → components → survivors) of the seeded refineIterations = 0
 *    pipeline. The only cross-engine float compares are (a) the pair
 *    cosine vs the 0.4 threshold and (b) the per-vector argmax over
 *    seed similarities; both engines fold the same doubles in the
 *    same index order, and this spec pins a fixture MARGIN orders of
 *    magnitude above any fold discrepancy, at both the spec SF and
 *    the driver's correctness SF.
 *  - `q_text_semdedup` is, since r12, ALSO a full DuckDB recompute
 *    (the featurize kernel — Java String.hashCode 31-polynomial +
 *    0x85ebca6b mix + single-assignment float32 slots — replays in
 *    SQL with the fmix64-oracle integer machinery). This spec keeps
 *    re-deriving the sf0.01 dropped set by name as the
 *    fixture-regeneration tripwire, so a corpus change fails HERE
 *    with a reason instead of as an opaque hash mismatch, and keeps
 *    the cosine margins that make cross-engine sum-order ulps unable
 *    to flip a pair or an assignment.
 *  - both pipelines must be LAYOUT-INVARIANT (pure per-row functions
 *    of content once refineIterations = 0): repartitioning the input
 *    must not move a single survivor. The refined (iterations > 0)
 *    variant keeps its float-necessity row: its centroid update is a
 *    partition-order float sum, which is exactly why the GATES pin
 *    iterations to 0.
 */
class SemDedupPinSpec extends SparkSpec {
  import spark.implicits._

  private val bothSfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  /** min |within-cell pair cosine − threshold| and min argmax gap of
    * the seeded assignment — the two float compares the oracle
    * recomputes. */
  private def margins(vecs: DataFrame, idCol: String, nCells: Int,
                      threshold: Double): (Double, Double, Long) = {
    val assigned = Similarity.ivfAssign(vecs, idCol, "embedding", nCells)
    val a = assigned.select(col("cell_id"), col(idCol).as("id_a"),
      Similarity.toDoubleVec(col("embedding")).as("__va"))
    val b = assigned.select(col("cell_id"), col(idCol).as("id_b"),
      Similarity.toDoubleVec(col("embedding")).as("__vb"))
    val pairMargin = a.join(b, Seq("cell_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("c", Similarity.cosine(col("__va"), col("__vb")))
      .filter(!isnan(col("c")))
      .select(min(abs(col("c") - lit(threshold))).as("m"))
      .as[Double].head()
    val seeds = vecs.filter(col("embedding").isNotNull)
      .orderBy(col(idCol).asc).limit(nCells)
      .select(col(idCol).as("cid"),
        Similarity.toDoubleVec(col("embedding")).as("c"))
    val gap = vecs.filter(col("embedding").isNotNull)
      .select(col(idCol),
        Similarity.toDoubleVec(col("embedding")).as("e"))
      .crossJoin(broadcast(seeds))
      .withColumn("cs", Similarity.cosine(col("e"), col("c")))
      .filter(!isnan(col("cs")))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("cs")), asc = false).as("all"))
      .select((col("all").getItem(0) - col("all").getItem(1)).as("gap"))
      .select(min(col("gap")).as("g")).as[Double].head()
    val zeroNorm = vecs.filter(col("embedding").isNotNull)
      .filter(Similarity.norm(
        Similarity.toDoubleVec(col("embedding"))) === 0.0).count()
    assigned.unpersist()
    (pairMargin, gap, zeroNorm)
  }

  test("q_semdedup oracle-recompute margins: pair-cosine and " +
    "assignment-argmax gaps dwarf any fold discrepancy, no zero-norm " +
    "seeds, at BOTH the spec and driver SFs") {
    for (sf <- bothSfs) {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val (pairMargin, gap, zeroNorm) = margins(emb, "vec_id",
        nCells = 16, threshold = 0.4)
      assert(pairMargin > 1e-6,
        s"$sf: pair-cosine margin $pairMargin too thin for a " +
          "cross-engine threshold compare")
      assert(gap > 1e-6,
        s"$sf: assignment gap $gap too thin — a fold-order ulp could " +
          "flip a cell")
      // a zero-norm SEED would be NaN-similar to everything: Spark's
      // NaN-never-wins argmax and the oracle's NaN-sorts-first DESC
      // would then disagree — the one input shape the oracle excludes
      assert(zeroNorm == 0L, s"$sf: $zeroNorm zero-norm embeddings")
    }
  }

  test("q_text_semdedup pin: margins hold, and the sf0.01 dropped set " +
    "IS the oracle's constant list (fixture-regeneration tripwire)") {
    for (sf <- bothSfs) {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val vecs = docs.select(col("doc_id"),
        QualityClassifier.hashedDocVector(col("text")).as("embedding"))
      val (pairMargin, gap, zeroNorm) = margins(vecs, "doc_id",
        nCells = 64, threshold = 0.9)
      assert(pairMargin > 1e-3,
        s"$sf: text pair-cosine margin $pairMargin too thin")
      assert(gap > 1e-6, s"$sf: text assignment gap $gap too thin")
      assert(zeroNorm == 0L, s"$sf: $zeroNorm zero-norm hashed vectors")
    }
    // the oracle constant, re-derived: the gate's exact pipeline at
    // the driver's correctness SF
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val vecs = docs.select(col("doc_id"), col("source"),
      QualityClassifier.hashedDocVector(col("text")).as("embedding"))
    val survivors = Similarity.semDedup(vecs, "doc_id", "embedding",
      nCells = 64, threshold = 0.9, refineIterations = 0)
      .select(col("doc_id")).as[Long].collect().toSet
    val all = docs.select(col("doc_id")).as[Long].collect().toSet
    val dropped = (all -- survivors).toSeq.sorted
    val pinned = Seq(134L, 178L, 185L, 245L, 267L, 290L, 293L, 301L,
      323L, 332L, 374L, 377L, 383L, 387L, 389L, 413L, 420L, 446L,
      450L, 455L, 457L, 462L, 486L)
    assert(dropped == pinned,
      s"sf0.01 dropped set moved: got ${dropped.mkString(",")} — the " +
        "corpus fixture changed; the q_text_semdedup oracle recomputes " +
        "independently, but re-derive THIS pin so the tripwire names " +
        "the new set")
    spark.catalog.clearCache()
  }

  test("q_simsearch_ivf oracle-recompute margins: the probe-cell " +
    "boundary (4th vs 5th) and the adjacent candidate-cosine gaps " +
    "through rank 4 dwarf the engines' mean-fold ulps, at both SFs") {
    for (sf <- bothSfs) {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val queries = emb.filter(col("vec_id") % 20 === 0)
      val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding", 16)
      // cell means exactly as the operator computes them (double
      // elementwise mean of members)
      val mexp = assigned
        .select(col("cell_id"),
          posexplode(Similarity.toDoubleVec(col("embedding")))
            .as(Seq("i", "x")))
        .groupBy(col("cell_id"), col("i"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cell_id"))
        .agg(sort_array(collect_list(struct(col("i"), col("m"))))
          .as("pairs"))
        .select(col("cell_id"),
          expr("transform(pairs, p -> p.m)").as("c"))
      val sims = queries
        .select(col("vec_id"),
          Similarity.toDoubleVec(col("embedding")).as("e"))
        .crossJoin(broadcast(mexp))
        .withColumn("cs", Similarity.cosine(col("e"), col("c")))
        .filter(!isnan(col("cs")))
      // the probe selection's decisive compare: 4th-best vs 5th-best
      // cell similarity per query (nProbe = 4 at the gate)
      val probeGap = sims.groupBy(col("vec_id"))
        .agg(sort_array(collect_list(col("cs")), asc = false).as("all"))
        .select((col("all").getItem(3) - col("all").getItem(4)).as("g"))
        .select(min(col("g")).as("g")).as[Double].head()
      assert(probeGap > 1e-6,
        s"$sf: probe-cell boundary gap $probeGap too thin — an " +
          "engine-side mean-fold ulp could flip a probed cell")
      // the ranking's decisive compares: adjacent NONZERO cosine gaps
      // among each query's top-5 in-cell candidates (zero gaps are
      // exact float ties — both engines break those on id)
      val wProbe = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id"))
        .orderBy(col("cs").desc, col("cell_id").asc)
      val probed = sims.withColumn("rn", row_number().over(wProbe))
        .filter(col("rn") <= 4)
        .select(col("vec_id").as("qid"), col("cell_id"))
      val cand = probed
        .join(assigned.select(col("cell_id"), col("vec_id").as("cid"),
          Similarity.toDoubleVec(col("embedding")).as("cv")),
          Seq("cell_id"))
        .filter(col("qid") =!= col("cid"))
        .join(queries.select(col("vec_id").as("qid"),
          Similarity.toDoubleVec(col("embedding")).as("qv")), Seq("qid"))
        .withColumn("cs", Similarity.cosine(col("qv"), col("cv")))
        .filter(!isnan(col("cs")))
      val wRank = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("cs").desc, col("cid").asc)
      val rankGap = cand.withColumn("rn", row_number().over(wRank))
        .filter(col("rn") <= 5)
        .groupBy(col("qid"))
        .agg(sort_array(collect_list(col("cs")), asc = false).as("all"))
        .select(expr(
          """aggregate(
            |  filter(transform(sequence(0, size(all) - 2),
            |    i -> all[i] - all[i+1]), g -> g > 0D),
            |  CAST(1.0 AS DOUBLE), (acc, g) -> least(acc, g))"""
            .stripMargin).as("g"))
        .select(min(col("g")).as("g")).as[Double].head()
      assert(rankGap > 1e-6,
        s"$sf: rank-boundary gap $rankGap too thin for a cross-engine " +
          "ordering")
      assigned.unpersist()
      spark.catalog.clearCache()
    }
  }

  test("seeded (refineIterations = 0) SemDeDup is layout-invariant: " +
    "repartitioning moves no survivor, in both gate pipelines") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def survEmb(df: DataFrame): Set[Long] =
      Similarity.semDedup(df, "vec_id", "embedding",
        nCells = 16, threshold = 0.4, refineIterations = 0)
        .select(col("vec_id")).as[Long].collect().toSet
    assert(survEmb(emb) == survEmb(emb.repartition(7)))
    spark.catalog.clearCache()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val vecs = docs.select(col("doc_id"),
      QualityClassifier.hashedDocVector(col("text")).as("embedding"))
    def survTxt(df: DataFrame): Set[Long] =
      Similarity.semDedup(df, "doc_id", "embedding",
        nCells = 64, threshold = 0.9, refineIterations = 0)
        .select(col("doc_id")).as[Long].collect().toSet
    assert(survTxt(vecs) == survTxt(vecs.repartition(7)))
    spark.catalog.clearCache()
  }
}
