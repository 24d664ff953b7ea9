package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Trainable document-quality classifier — the learned counterpart to
 * [[TextAnalysis.qualityScore]]'s heuristics, in the fastText shape
 * every pretraining pipeline ends up with: bag of hashed token
 * uni+bigrams, length-normalized, logistic regression on top.
 *
 * Spark-first training at corpus scale: full-batch gradient descent
 * where each epoch is ONE `treeAggregate` over the featurized corpus
 * (map-side partial gradients, log-depth combine — the same physical
 * shape MLlib's own linear models use). The driver holds only the
 * dense weight vector (`dim + 1` doubles, default 256 KB) and
 * re-broadcasts it each epoch; nothing else leaves the executors.
 * Featurization is a JIT'd kernel returning a sparse (indices, values)
 * pair per document.
 *
 * Determinism (since r11): the per-epoch gradient accumulates
 * QUANTIZED LONGS (2^-20 resolution per example), so the combine is
 * exact integer addition — order-free — and the trained weights are
 * bit-identical across runs, partition layouts and cluster sizes
 * (spec-pinned). That is what upgrades the driver gate from rows-only
 * to an outcome-pinned oracle; MLlib's float reductions, by contrast,
 * drift in the last ulps per run.
 */
object QualityClassifier {

  /** Trained model: `weights(dim)` is the bias term. */
  final case class Model(dim: Int, weights: Array[Double]) {
    require(weights.length == dim + 1, "weights must be dim + 1 (bias last)")
  }

  /** Hash a token (or joined bigram) into [0, dim). Murmur-style mix of
    * String.hashCode — stable across JVMs because String.hashCode is
    * specified. */
  private def bucket(s: String, dim: Int): Int = {
    var h = s.hashCode
    h ^= (h >>> 16); h *= 0x85ebca6b; h ^= (h >>> 13)
    val m = h % dim
    if (m < 0) m + dim else m
  }

  /** Sparse hashed uni+bigram features, L1-normalized by total feature
    * count (docs of different lengths live on the same scale). */
  private[graft] def featurize(text: String, dim: Int): (Array[Int], Array[Double]) = {
    if (text == null) return (Array.empty, Array.empty)
    val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) return (Array.empty, Array.empty)
    val counts = new java.util.TreeMap[Int, Double]()
    var n = 0
    def add(s: String): Unit = {
      counts.merge(bucket(s, dim), 1.0, (a, b) => a + b)
      n += 1
    }
    toks.foreach(add)
    var i = 0
    while (i + 1 < toks.length) { add(toks(i) + " " + toks(i + 1)); i += 1 }
    val idx = new Array[Int](counts.size)
    val v = new Array[Double](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      idx(j) = e.getKey
      v(j) = e.getValue / n
      j += 1
    }
    (idx, v)
  }

  private def sigmoid(z: Double): Double =
    // StrictMath, not math: the JLS lets Math.exp differ by an ulp
    // across architectures/JVM builds (intrinsics), and the r11
    // outcome pin needs the trained weights to be a platform-
    // unconditional function of the data — StrictMath is fdlibm
    // bit-for-bit everywhere. Cost: exp is a tiny slice of the
    // feature dot products this kernel is dominated by.
    if (z >= 0) 1.0 / (1.0 + StrictMath.exp(-z))
    else { val e = StrictMath.exp(z); e / (1.0 + e) }

  private def margin(w: Array[Double], dim: Int,
                     idx: Array[Int], v: Array[Double]): Double = {
    var z = w(dim) // bias
    var i = 0
    while (i < idx.length) { z += w(idx(i)) * v(i); i += 1 }
    z
  }

  /**
   * Full-batch logistic regression: `labelCol` must be 0/1 (weak labels
   * from heuristics, a curated seed set, or an upstream model). One
   * treeAggregate per epoch; rows with no features still train the
   * bias. With `balanced` (default), examples are weighted by inverse
   * class frequency — heuristic weak labels are usually lopsided, and
   * an unweighted full-batch fit just converges to the majority class.
   */
  def train(df: DataFrame, textCol: String, labelCol: String,
            dim: Int = 1 << 15, epochs: Int = 30, lr: Double = 2.0,
            l2: Double = 1e-6, balanced: Boolean = true): Model = {
    require(dim > 0 && epochs > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val data = df
      .select(col(textCol).cast("string"), col(labelCol).cast("double"))
      .as[(String, java.lang.Double)]
      .map { case (t, y) =>
        // fail fast with a readable message instead of the encoder's
        // opaque null-in-non-nullable-field error mid-epoch
        require(y != null,
          s"label column '$labelCol' contains nulls; labels must be 0/1")
        // a label outside {0,1} would silently corrupt both the
        // gradient and the class-balance weighting (nPos uses >= 0.5)
        require(y.doubleValue == 0.0 || y.doubleValue == 1.0,
          s"label column '$labelCol' contains $y; labels must be 0/1")
        val (i, v) = featurize(t, dim)
        (i, v, y.doubleValue)
      }
      .persist() // featurize once, read every epoch
    val n = data.count().toDouble
    require(n > 0, "training set is empty")
    val nPos = data.filter(_._3 >= 0.5).count().toDouble
    // inverse-frequency example weights, mean weight 1 over the corpus
    val (wPos, wNeg) =
      if (!balanced || nPos == 0 || nPos == n) (1.0, 1.0)
      else (n / (2.0 * nPos), n / (2.0 * (n - nPos)))
    val w = new Array[Double](dim + 1)
    try {
      (0 until epochs).foreach { _ =>
        val bw = spark.sparkContext.broadcast(w.clone())
        // QUANTIZED-LONG gradient accumulation (r11, the
        // Pca.train/pqTrain discipline): each example's contribution
        // quantizes to a long at 2^-20 resolution and the epoch
        // gradient is an exact integer sum — order-free, so the
        // trained weights are bit-identical across partition layouts
        // and cluster sizes (spec-pinned), which upgrades the gate
        // from rows-only to an outcome-pinned oracle. Per-example
        // magnitudes are bounded by the class weight (≤ n/2 in the
        // degenerate one-positive case; ~1 when balanced), so the
        // long budget covers ~2^43 balanced examples per feature —
        // far beyond any epoch's share.
        val grad = data.rdd.treeAggregate(new Array[Long](dim + 1))(
          seqOp = (g, row) => {
            val (idx, v, y) = row
            val cw = if (y >= 0.5) wPos else wNeg
            val err = cw * (sigmoid(margin(bw.value, dim, idx, v)) - y)
            var i = 0
            while (i < idx.length) {
              g(idx(i)) += math.rint(err * v(i) * QuantScale).toLong
              i += 1
            }
            g(dim) += math.rint(err * QuantScale).toLong
            g
          },
          combOp = (a, b) => {
            var i = 0
            while (i < a.length) { a(i) += b(i); i += 1 }
            a
          })
        var i = 0
        while (i < w.length) {
          w(i) -= lr * (grad(i).toDouble / (QuantScale * n) + l2 * w(i))
          i += 1
        }
        bw.destroy()
      }
    } finally data.unpersist()
    Model(dim, w)
  }

  /** Gradient quantization scale: 2^20 ≈ 1e-6 resolution per example —
    * noise orders of magnitude below the learning signal (specs assert
    * separability unchanged), in exchange for an order-free epoch
    * gradient. */
  private val QuantScale: Double = (1L << 20).toDouble

  /**
   * Deterministic hashed document vector — feature-hash the L1-
   * normalized uni+bigram bag into a dense `dim`-float vector, then
   * L2-normalize. Gives any text corpus an `Array[Float]` column
   * compatible with the whole [[Similarity]] stack (semDedup, ANN,
   * LSH) without an external embedding model: hashed sparse vectors
   * preserve cosine in expectation (feature-hashing kernel
   * approximation, Weinberger et al. 2009). Narrow pass, no shuffle;
   * identical output at any cluster size.
   */
  def hashedDocVector(text: Column, dim: Int = 256): Column = {
    require(dim > 0)
    val kernel = udf((t: String) => {
      val (idx, v) = featurize(t, dim)
      val out = new Array[Float](dim)
      var i = 0
      while (i < idx.length) { out(idx(i)) += v(i).toFloat; i += 1 }
      var ss = 0.0
      i = 0
      while (i < dim) { ss += out(i).toDouble * out(i); i += 1 }
      if (ss > 0) {
        val inv = (1.0 / math.sqrt(ss)).toFloat
        i = 0
        while (i < dim) { out(i) *= inv; i += 1 }
      }
      out
    })
    kernel(text)
  }

  /** Score a corpus under a trained model: adds `quality_prob`
    * (P(label=1)) and `quality_pred` (≥ 0.5). Broadcast weights, one
    * narrow pass. */
  def score(df: DataFrame, idCol: String, textCol: String,
            model: Model): DataFrame = {
    val spark = df.sparkSession
    val bw = spark.sparkContext.broadcast(model.weights)
    val dim = model.dim
    val kernel = udf((t: String) => {
      val (idx, v) = featurize(t, dim)
      sigmoid(margin(bw.value, dim, idx, v))
    })
    df.withColumn("quality_prob", kernel(col(textCol)))
      .withColumn("quality_pred",
        (col("quality_prob") >= 0.5).cast("int"))
      .select(col(idCol), col("quality_prob"), col("quality_pred"))
  }
}
