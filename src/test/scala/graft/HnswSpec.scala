package graft

import org.apache.spark.sql.functions._

import graft.ops.{Hnsw, Similarity}

/**
 * Sharded HNSW (graft.ops.Hnsw): approximate candidate generation +
 * exact cosine re-rank. The contract under test:
 *  - recall is a parameter (efSearch), and at the GATE's parameters it
 *    is exactly 1.0 on the fixture — that pin is what lets q_hnsw_topk
 *    share the brute-force oracle;
 *  - determinism: the graph is a pure function of corpus CONTENT
 *    (hash levels, sorted-id insertion, id tiebreaks), so any input
 *    layout produces identical output;
 *  - scores ride the same exact kernel as bruteForceTopK, so a recall
 *    miss can only omit a row, never mis-rank or mis-score one.
 */
class HnswSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random unit-ish vectors: dims from a hash
    * mix of (id, dim) — content-stable across runs and layouts. */
  private def synthVectors(n: Int, dim: Int) =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        d => ((pmod(xxhash64(col("id"), d), lit(1000L)).cast("float") -
          500.0f) / 500.0f).cast("float")).as("embedding"))

  test("gate-parameter recall pin: q_hnsw_topk's candidates cover the " +
    "true top-3, output equals bruteForceTopK row for row") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val q = emb.filter(col("vec_id") % 20 === 0)
      val hnsw = Hnsw.topK(emb, q, "vec_id", "embedding", k = 3,
        m = 8, efConstruction = 48, efSearch = 48, nShards = 4)
        .as[(Long, Long, Int, Double)].collect().toSet
      val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding",
        k = 3).as[(Long, Long, Int, Double)].collect().toSet
      assert(hnsw == brute, s"$sf: HNSW at gate parameters must be exact")
    }
  }

  test("layout invariance: the graph is a function of corpus content, " +
    "not partitioning") {
    val corpus = synthVectors(400, 16)
    val q = synthVectors(400, 16).filter(col("vec_id") % 40 === 0)
    val a = Hnsw.topK(corpus, q, "vec_id", "embedding", k = 5,
      m = 6, efConstruction = 24, efSearch = 24, nShards = 3)
      .as[(Long, Long, Int, Double)].collect().toSet
    val b = Hnsw.topK(corpus.repartition(13), q.coalesce(1), "vec_id",
      "embedding", k = 5, m = 6, efConstruction = 24, efSearch = 24,
      nShards = 3)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("recall@10 >= 0.9 on synthetic vectors at default parameters, " +
    "and every returned row is exactly scored") {
    val corpus = synthVectors(2000, 16)
    val q = synthVectors(2000, 16).filter(col("vec_id") % 100 === 0)
    val hnsw = Hnsw.topK(corpus, q, "vec_id", "embedding", k = 10,
      nShards = 4).as[(Long, Long, Int, Double)].collect()
    val brute = Similarity.bruteForceTopK(corpus, q, "vec_id",
      "embedding", k = 10).as[(Long, Long, Int, Double)].collect()
    val bruteSet = brute.map(r => (r._1, r._2)).toSet
    val hit = hnsw.count(r => bruteSet.contains((r._1, r._2)))
    assert(hit.toDouble / brute.length >= 0.9,
      s"recall ${hit.toDouble / brute.length} below 0.9")
    // exactness of what IS returned: every overlapping (query,
    // neighbor) pair carries the identical exact cosine
    val bruteScore = brute.map(r => (r._1, r._2) -> r._4).toMap
    hnsw.filter(r => bruteSet.contains((r._1, r._2))).foreach { r =>
      assert(bruteScore((r._1, r._2)) == r._4,
        s"score drift on ${(r._1, r._2)}")
    }
  }

  test("a planted exact twin is always rank 1") {
    val corpus = synthVectors(500, 16)
    // queries are scaled copies of corpus vectors 7, 131, 442
    val q = corpus.filter(col("vec_id").isin(7L, 131L, 442L))
      .select((col("vec_id") + 10000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val got = Hnsw.topK(corpus, q, "vec_id", "embedding", k = 1,
      nShards = 4)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10007L -> 7L, 10131L -> 131L, 10442L -> 442L))
  }

  test("degenerate inputs: tiny corpus serves k > corpus, null vectors " +
    "drop, single shard works") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (3L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val q = Seq((9L, Seq(1.0f, 0.1f))).toDF("vec_id", "embedding")
    val got = Hnsw.topK(corpus, q, "vec_id", "embedding", k = 5,
      nShards = 1).as[(Long, Long, Int, Double)].collect().sortBy(_._3)
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((9L, 1L, 1), (9L, 2L, 2)))
  }

  test("dimension mismatches fail LOUDLY instead of silently scoring a " +
    "prefix (r10 advice): corpus row vs query dim, and mixed queries") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)), (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.5f, 0.5f))) // corrupt: 2-dim among 3-dim
      .toDF("vec_id", "embedding")
    val q3 = Seq((9L, Seq(1.0f, 0.1f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[org.apache.spark.SparkException] {
      Hnsw.topK(corpus, q3, "vec_id", "embedding", k = 2, nShards = 1)
        .collect()
    }
    assert(e.getMessage.contains("hnsw insert") ||
      Option(e.getCause).exists(_.getMessage.contains("hnsw insert")),
      s"expected the insert dim check, got: ${e.getMessage.take(300)}")
    // mixed QUERY dimensionalities are refused on the driver, before
    // any shard builds
    val qMixed = Seq((9L, Seq(1.0f, 0.1f, 0.0f)), (10L, Seq(1.0f, 0.1f)))
      .toDF("vec_id", "embedding")
    val good = corpus.filter(col("vec_id") =!= 3L)
    val e2 = intercept[IllegalArgumentException] {
      Hnsw.topK(good, qMixed, "vec_id", "embedding", k = 2, nShards = 1)
    }
    assert(e2.getMessage.contains("mixed dimensionalities"))
  }
}
