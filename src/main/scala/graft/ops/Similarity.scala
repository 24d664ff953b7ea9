package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`) —
 * training-data-pipeline extension (BASELINE.json north-star).
 *
 * The vector math runs in JIT-compiled Scala UDF kernels with
 * sequential (index-order) accumulation: bit-deterministic,
 * oracle-comparable, and much faster than the equivalent
 * aggregate/zip_with expressions (higher-order functions are
 * CodegenFallback — interpreted per element).
 *
 * Scale design: brute force is the correctness baseline (broadcast the
 * query side — cost |Q|·N, embarrassingly parallel, zero shuffle on the
 * corpus side). The scale path is IVF: a coarse quantizer assigns every
 * vector to its nearest centroid (one narrow pass), queries probe only
 * `nProbe` cells — the corpus join is pruned to the probed cells' rows.
 * Cosine LSH (random hyperplane signs) gives a hash-bucket route for
 * near-dup-style lookups.
 */
object Similarity {

  /** Widen array<float> → array<double> (deterministic element cast). */
  def toDoubleVec(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product — same IEEE op order as the SQL
    * oracle's list fold, so results are bit-identical across engines.
    * JIT'd UDF kernel: the aggregate/zip_with expression formulation is
    * interpreted per element (higher-order functions are
    * CodegenFallback) and an order of magnitude slower in the
    * query-corpus hot loop. */
  private val dotKernel = udf((a: Array[Double], b: Array[Double]) => {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  })

  /** cosine = dot/(sqrt(na)*sqrt(nb)), each sum accumulated in index
    * order exactly like the oracle SQL. */
  private val cosineKernel = udf((a: Array[Double], b: Array[Double]) => {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i) * b(i)
      na += a(i) * a(i)
      nb += b(i) * b(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  })

  def dot(a: Column, b: Column): Column = dotKernel(a, b)

  def norm(a: Column): Column = sqrt(dotKernel(a, a))

  def cosine(a: Column, b: Column): Column = cosineKernel(a, b)

  /**
   * Brute-force cosine top-k: for each query vector, the k nearest
   * corpus vectors (self-pairs excluded). Query side is broadcast; rank
   * ties break on corpus id for determinism.
   * Returns (query_id, neighbor_id, rank, cosine).
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      toDoubleVec(col(vecCol)).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      toDoubleVec(col(vecCol)).as("__cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /**
   * IVF (inverted-file) coarse quantization: centroids are the first
   * `nCells` corpus vectors by id — a deterministic pseudo-k-means
   * seeding (good enough for cell routing; a Lloyd refinement can be
   * layered on without changing the plan shape).
   * Returns the corpus tagged with `cell_id`.
   */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
                nCells: Int): DataFrame = {
    val cells = corpus.orderBy(col(idCol).asc).limit(nCells)
      .select(col(idCol).as("cell_id"), toDoubleVec(col(vecCol)).as("__centroid"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__csim").desc, col("cell_id").asc)
    corpus
      .withColumn("__v", toDoubleVec(col(vecCol)))
      .join(broadcast(cells), lit(true))
      .withColumn("__csim", cosine(col("__v"), col("__centroid")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__csim", "__centroid", "__v")
      // materialize: ivfTopK reads the assignment twice (centroid
      // extraction + cell-pruned scan); without a barrier the whole
      // cross-join assignment would run per consumer
      .persist()
  }

  /**
   * Lloyd refinement of an IVF assignment: recompute each cell's
   * centroid as the mean of its members (distributed: explode to
   * (cell, dim, value), average per (cell, dim), reassemble), then
   * reassign every vector to its nearest refined centroid. Each
   * iteration is two shuffles (the mean aggregation and the
   * window-resolved reassignment); centroids stay broadcast-size.
   * Returns the corpus re-tagged with `cell_id` (cell ids become dense
   * ranks of the refined centroids, deterministic).
   */
  def ivfRefine(corpusWithCells: DataFrame, idCol: String, vecCol: String,
                iterations: Int = 1): DataFrame = {
    var current = corpusWithCells
    (0 until iterations).foreach { _ =>
      val centroids = current
        .select(col("cell_id"),
          posexplode(toDoubleVec(col(vecCol))).as(Seq("__dim", "__x")))
        .groupBy(col("cell_id"), col("__dim"))
        .agg(avg(col("__x")).as("__mean"))
        .groupBy(col("cell_id"))
        .agg(array_sort(collect_list(struct(col("__dim"), col("__mean"))))
          .as("__pairs"))
        .select(col("cell_id"),
          transform(col("__pairs"), p => p.getField("__mean"))
            .as("__centroid"))
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("__csim").desc, col("__new_cell").asc)
      current = current.drop("cell_id")
        .withColumn("__v", toDoubleVec(col(vecCol)))
        .join(broadcast(centroids.withColumnRenamed("cell_id", "__new_cell")),
          lit(true))
        .withColumn("__csim", cosine(col("__v"), col("__centroid")))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .withColumnRenamed("__new_cell", "cell_id")
        .drop("__rn", "__csim", "__centroid", "__v")
        .persist()
    }
    current
  }

  /**
   * IVF top-k: probe the `nProbe` nearest cells per query, then exact
   * cosine only within probed cells. At scale the corpus is
   * pre-partitioned by cell_id, so a probe touches nProbe/nCells of the
   * data. Approximate: recall measured against bruteForceTopK in tests.
   */
  def ivfTopK(corpusWithCells: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nCells: Int, nProbe: Int): DataFrame = {
    // probe centers = per-cell mean vectors — correct for both the seed
    // assignment and a Lloyd-refined one (where the seed member may
    // have migrated out of its own cell)
    val cells = corpusWithCells
      .select(col("cell_id"),
        posexplode(toDoubleVec(col(vecCol))).as(Seq("__dim", "__x")))
      .groupBy(col("cell_id"), col("__dim"))
      .agg(avg(col("__x")).as("__mean"))
      .groupBy(col("cell_id"))
      .agg(array_sort(collect_list(struct(col("__dim"), col("__mean"))))
        .as("__pairs"))
      .select(col("cell_id").as("__probe_cell"),
        transform(col("__pairs"), p => p.getField("__mean"))
          .as("__centroid"))
    val q = queries.select(col(idCol).as("query_id"),
      toDoubleVec(col(vecCol)).as("__qv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__psim").desc, col("__probe_cell").asc)
    val probes = q.join(broadcast(cells), lit(true))
      .withColumn("__psim", cosine(col("__qv"), col("__centroid")))
      .withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= nProbe)
      .select(col("query_id"), col("__qv"), col("__probe_cell"))
    val c = corpusWithCells.select(col(idCol).as("neighbor_id"),
      col("cell_id"), toDoubleVec(col(vecCol)).as("__cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.join(broadcast(probes), col("cell_id") === col("__probe_cell") &&
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /**
   * Embedding-cosine near-duplicate pairs, EXACT: all (id_a < id_b)
   * pairs with cosine ≥ threshold — the correctness baseline for the
   * LSH scale path below. Physical plan: tiled block-pair compare
   * (the Afrati–Ullman replication scheme shared with the dense
   * Jaccard/simhash paths) — norms precomputed once per vector, one
   * sequential-fold dot kernel per pair, no per-pair array widening.
   * The accumulation order matches the SQL oracle's list folds
   * bit-for-bit (dot and each squared norm are independent sequential
   * sums; cosine = dot / (√na·√nb)). Non-integral id types fall back
   * to a broadcast nested-loop join over the same kernel.
   */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, blocks: Int = 32): DataFrame = {
    val idIntegral = corpus.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    if (!idIntegral) {
      val a = corpus.select(col(idCol).as("id_a"),
        toDoubleVec(col(vecCol)).as("__va"))
      val b = corpus.select(col(idCol).as("id_b"),
        toDoubleVec(col(vecCol)).as("__vb"))
      a.join(broadcast(b), col("id_a") < col("id_b"))
        .withColumn("cosine", cosine(col("__va"), col("__vb")))
        .filter(col("cosine") >= threshold)
        .select(col("id_a"), col("id_b"), col("cosine"))
    } else {
      val spark = corpus.sparkSession
      import spark.implicits._
      val orig = corpus.schema(idCol).dataType
      val b = blocks
      val t = threshold
      val docs = corpus
        .filter(col(vecCol).isNotNull)
        .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
          pmod(hash(col(idCol)), lit(b)).as("blk"))
        .as[(Long, Array[Float], Int)]
      val expanded = docs.flatMap { case (id, v, blk) =>
        // norm once per vector — same sequential fold as the per-pair form
        var na = 0.0
        var i = 0
        while (i < v.length) { na += v(i).toDouble * v(i).toDouble; i += 1 }
        val nrm = math.sqrt(na)
        (0 until b).iterator.map { o =>
          (math.min(blk, o) * b + math.max(blk, o), blk, id, nrm, v)
        }
      }
      val pairs = expanded.groupByKey(_._1).flatMapGroups { (pk, it) =>
        val lo = pk / b
        val hi = pk % b
        val las = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Array[Float])]
        val has = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Array[Float])]
        it.foreach { case (_, blk, id, nrm, v) =>
          if (blk == lo) las += ((id, nrm, v)) else has += ((id, nrm, v))
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        def compare(a: (Long, Double, Array[Float]), c: (Long, Double, Array[Float])): Unit = {
          val (ida, nrmA, va) = a
          val (idb, nrmB, vb) = c
          var dot = 0.0
          var i = 0
          val n = math.min(va.length, vb.length)
          while (i < n) { dot += va(i).toDouble * vb(i).toDouble; i += 1 }
          val cos = dot / (nrmA * nrmB)
          if (cos >= t) {
            if (ida < idb) out += ((ida, idb, cos)) else out += ((idb, ida, cos))
          }
        }
        if (lo == hi) {
          var i = 0
          while (i < las.length) {
            var j = i + 1
            while (j < las.length) { compare(las(i), las(j)); j += 1 }
            i += 1
          }
        } else {
          var i = 0
          while (i < las.length) {
            var j = 0
            while (j < has.length) { compare(las(i), has(j)); j += 1 }
            i += 1
          }
        }
        out.iterator
      }.toDF("id_a", "id_b", "cosine")
      pairs.select(col("id_a").cast(orig).as("id_a"),
        col("id_b").cast(orig).as("id_b"), col("cosine"))
    }
  }

  /**
   * All-tables random-hyperplane signature kernel: one JIT'd pass per
   * vector computing nTables × nBits sign bits (vs one interpreted
   * array-cast + one UDF dot PER PLANE — 128 expression evals per row
   * at 16×8). The plane matrix is closure-captured (nTables·nBits·dim
   * doubles — a few KB, shipped once per executor with the task
   * closure).
   */
  private def lshSignaturesKernel(dim: Int, nBits: Int, nTables: Int,
                                  seed: Long) = {
    val planes = Array.tabulate(nTables) { t =>
      val rnd = new scala.util.Random(seed + t)
      Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
    }
    udf((v: Array[Float]) => {
      val out = new Array[Long](nTables)
      var t = 0
      while (t < nTables) {
        val table = planes(t)
        var sig = 0L
        var b = 0
        while (b < nBits) {
          val plane = table(b)
          var s = 0.0
          var i = 0
          val n = math.min(v.length, plane.length)
          while (i < n) { s += v(i) * plane(i); i += 1 }
          if (s > 0) sig |= 1L << b
          b += 1
        }
        out(t) = sig
        t += 1
      }
      out
    })
  }

  /** Candidate pairs sharing any sign-LSH bucket (the prune stage of
    * [[cosineNearDupPairsLsh]], exposed so specs can assert candidate
    * volume ≪ n²/2 — an LSH whose buckets don't prune silently degrades
    * to brute force with extra steps). */
  def cosineLshCandidates(corpus: DataFrame, idCol: String, vecCol: String,
                          dim: Int, nBits: Int = 16,
                          nTables: Int = 8, seed: Long = 42L): DataFrame = {
    val kernel = lshSignaturesKernel(dim, nBits, nTables, seed)
    val withBuckets = corpus.select(col(idCol),
      posexplode(kernel(col(vecCol))).as(Seq("__t", "__b")))
      .persist()
    withBuckets.as("a")
      .hint("shuffle_hash")
      .join(withBuckets.as("b"),
        col("a.__t") === col("b.__t") && col("a.__b") === col("b.__b") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /**
   * Embedding-cosine near-dup, LSH-bucketed scale path: candidates are
   * pairs sharing a random-hyperplane sign bucket (probability rises
   * with cosine: P(bit agrees) = 1 − θ/π per plane), verified exactly.
   * Probabilistic recall — measured against [[cosineNearDupPairs]] in
   * the specs; bucket count/width trade recall vs candidate volume.
   * Defaults (16 bits × 8 tables): a random orthogonal-ish pair
   * collides with probability ≈ 8·2⁻¹⁶ ≈ 10⁻⁴ (buckets genuinely
   * prune), while a 0.95-cosine near-dup still collides in ≥ 1 table
   * with probability ≈ 0.98.
   */
  def cosineNearDupPairsLsh(corpus: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, dim: Int, nBits: Int = 16,
                            nTables: Int = 8): DataFrame = {
    val candidates =
      cosineLshCandidates(corpus, idCol, vecCol, dim, nBits, nTables)
    val vecs = corpus.select(col(idCol), toDoubleVec(col(vecCol)).as("__v"))
    candidates
      .join(vecs.withColumnRenamed(idCol, "id_a")
        .withColumnRenamed("__v", "__va"), Seq("id_a"))
      .join(vecs.withColumnRenamed(idCol, "id_b")
        .withColumnRenamed("__v", "__vb"), Seq("id_b"))
      .withColumn("cosine", cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /**
   * Random-hyperplane cosine LSH signature (nBits sign bits packed into
   * a long): vectors in the same bucket are cosine-close with high
   * probability. Hyperplane components are deterministic pseudo-gaussians
   * derived from (bit, dim) via a seeded generator.
   */
  def cosineLshSignature(vec: Column, dim: Int, nBits: Int = 16,
                         seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
    val bits = planes.zipWithIndex.map { case (plane, b) =>
      val planeCol = array(plane.map(lit(_)).toIndexedSeq: _*)
      when(dot(toDoubleVec(vec), planeCol) > 0, shiftleft(lit(1L), b))
        .otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
