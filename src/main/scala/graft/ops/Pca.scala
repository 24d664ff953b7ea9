package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Distributed PCA / whitening over an embedding column — the
 * preprocessing half of the embedding-pipeline family ([[Similarity]]
 * consumes its output): center, rotate onto the top-k principal
 * directions, optionally scale each to unit variance. Standard prep
 * before semantic dedup or ANN (whitened cosines stop being dominated
 * by the few high-variance directions every encoder produces).
 *
 * Scale shape: training is ONE `treeAggregate` over the corpus
 * (map-side partial moment sums, log-depth combine — the
 * [[QualityClassifier]] epoch shape); the driver holds dim + dim²/2
 * accumulators (a 32-dim embedding: ~560 longs), never rows. The
 * eigensolve runs on the driver over the dim×dim covariance — dim is
 * model-sized, not data-sized. Projection is a narrow per-row kernel
 * under a broadcast model.
 *
 * Determinism: float sums depend on combine order, so a naive double
 * accumulation would make the model jitter across partition layouts.
 * Moments accumulate as `floor(x·2^20)`-quantized LONGS instead —
 * integer addition is order-free and exact, so the covariance, the
 * eigensolve, and every projection are bit-identical on any cluster
 * size (the round-6 float-parity playbook, applied to training). The
 * 2^-20 quantization bias is ~1e-6 relative — far below encoder noise.
 * Long headroom: |x|≲100-scale embeddings at 1e11 rows stay under
 * 2^63 with Q=2^20.
 */
object Pca {

  /** Trained model: `components` is k rows × dim (orthonormal, each
    * sign-canonicalized so its largest-magnitude entry is positive);
    * `eigenvalues` descending, aligned with the rows. */
  final case class Model(dim: Int, n: Long, mean: Array[Double],
                         eigenvalues: Array[Double],
                         components: Array[Array[Double]])

  private val Q = (1L << 20).toDouble

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvectors as columns), unsorted. Deterministic —
    * fixed sweep order, fixed thresholds. O(dim³) per sweep on the
    * driver; dim is embedding width (~32-1024), not data. */
  private[graft] def jacobiEigen(sym: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = sym.length
    val a = sym.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var sweep = 0
    while (sweep < 64 && off() > 1e-22) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // stable tan of the rotation angle; signum(0) would kill
            // the rotation entirely, so branch on the sign explicitly
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1))
              else 1.0 / (theta - math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            val tau = s / (1.0 + c)
            a(p)(p) -= t * apq
            a(q)(q) += t * apq
            a(p)(q) = 0.0
            a(q)(p) = 0.0
            var i = 0
            while (i < n) {
              if (i != p && i != q) {
                val aip = a(i)(p); val aiq = a(i)(q)
                a(i)(p) = aip - s * (aiq + tau * aip)
                a(p)(i) = a(i)(p)
                a(i)(q) = aiq + s * (aip - tau * aiq)
                a(q)(i) = a(i)(q)
              }
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = vip - s * (viq + tau * vip)
              v(i)(q) = viq + s * (vip - tau * viq)
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /**
   * Fit a k-component PCA on `vecCol` (array&lt;float&gt;). One
   * treeAggregate pass; null vectors skipped; ragged widths rejected.
   */
  def train(df: DataFrame, vecCol: String, k: Int): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.filter(col(vecCol).isNotNull)
      .select(col(vecCol)).as[Array[Float]]
    val head = vecs.take(1)
    require(head.nonEmpty, "no non-null vectors to train on")
    val dim = head(0).length
    require(k >= 1 && k <= dim, s"k must be in [1, $dim]: $k")
    val tri = dim * (dim + 1) / 2
    // acc = [n, s_0..s_{dim-1}, m_00, m_01.., m_11..] all quantized longs
    val acc = vecs.rdd.treeAggregate(new Array[Long](1 + dim + tri))(
      seqOp = (g, x) => {
        require(x.length == dim,
          s"ragged vector width ${x.length} != $dim in '$vecCol'")
        g(0) += 1L
        var i = 0
        while (i < dim) {
          val xi = x(i).toDouble
          g(1 + i) += math.floor(xi * Q).toLong
          var j = i
          var t = 1 + dim + i * dim - i * (i - 1) / 2
          while (j < dim) {
            g(t) += math.floor(xi * x(j).toDouble * Q).toLong
            j += 1; t += 1
          }
          i += 1
        }
        g
      },
      combOp = (a, b) => {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      })
    val n = acc(0)
    require(n > 0, "no non-null vectors to train on")
    val mean = Array.tabulate(dim)(i => acc(1 + i).toDouble / (Q * n))
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var j = i
      var t = 1 + dim + i * dim - i * (i - 1) / 2
      while (j < dim) {
        val e = acc(t).toDouble / (Q * n) - mean(i) * mean(j)
        cov(i)(j) = e
        cov(j)(i) = e
        j += 1; t += 1
      }
      i += 1
    }
    val (eig, vects) = jacobiEigen(cov)
    // sort descending by eigenvalue (index tiebreak keeps it total),
    // take k columns, canonicalize each sign
    val order = (0 until dim).sortBy(c => (-eig(c), c)).take(k)
    val components = order.map { c =>
      val comp = Array.tabulate(dim)(r => vects(r)(c))
      var big = 0
      var r = 1
      while (r < dim) {
        if (math.abs(comp(r)) > math.abs(comp(big))) big = r
        r += 1
      }
      if (comp(big) < 0) { r = 0; while (r < dim) { comp(r) = -comp(r); r += 1 } }
      comp
    }.toArray
    Model(dim, n, mean, order.map(eig(_)).toArray, components)
  }

  /**
   * Project onto the model's components: `pc_j = comp_j · (x − mean)`,
   * with `whiten` dividing by sqrt(max(eigenvalue, eps)) for unit
   * variance per direction. Narrow per-row kernel (broadcast model, no
   * shuffle); emits scalar `pc0..pc{k-1}` DOUBLE columns — flat
   * columns compose with every downstream gate and writer (array
   * outputs don't sort in pandas-shaped checkers).
   */
  def project(df: DataFrame, idCol: String, vecCol: String, model: Model,
              whiten: Boolean = false, eps: Double = 1e-9): DataFrame = {
    val spark = df.sparkSession
    val bm = spark.sparkContext.broadcast(model)
    val k = model.components.length
    val kernel = udf((x: Array[Float]) => {
      if (x == null) null
      else {
        val m = bm.value
        val out = new Array[Double](m.components.length)
        var j = 0
        while (j < m.components.length) {
          val comp = m.components(j)
          var s = 0.0
          var i = 0
          while (i < m.dim) { s += comp(i) * (x(i) - m.mean(i)); i += 1 }
          out(j) =
            if (whiten) s / math.sqrt(math.max(m.eigenvalues(j), eps))
            else s
          j += 1
        }
        out
      }
    })
    df.withColumn("__pc", kernel(col(vecCol)))
      .select(col(idCol) +: (0 until k).map(j =>
        col("__pc").getItem(j).as(s"pc$j")): _*)
  }
}
