package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Tabular feature engineering for model-training pipelines: market-
 * basket co-occurrence rules and smoothed categorical target encoding
 * — the classical signals a curation pipeline derives from the same
 * star schema it audits.
 */
object Features {

  /**
   * Frequent-pair association rules (the A-priori k=2 core): for every
   * unordered item pair co-occurring in at least `minPairCount`
   * baskets, the support/confidence/lift triple.
   *
   *   support    = n_ab / N
   *   conf(a→b)  = n_ab / n_a      (and the b→a mirror)
   *   lift       = n_ab · N / (n_a · n_b)
   *
   * Scale shape: baskets collapse to DISTINCT items first, pair
   * generation is one self-join on the basket key with `a < b` (pair
   * fan-out is basket-size²), and `maxBasketSize` EXCLUDES
   * pathological mega-baskets before the join — the standard basket
   * cap, because one 100k-item basket is 5e9 pairs and no rule mined
   * from it means anything; the cap is part of the operator's
   * semantics and the oracle applies the same one. Counts are
   * map-side-combined aggregates; item counts join back at item
   * cardinality (broadcast under AQE).
   *
   * Ratios are double chains over exact longs, rounded to 6 (one
   * division each — engine-exact under the mirrored tree).
   *
   * Output: (item_a, item_b, n_ab, n_a, n_b, support, conf_ab,
   * conf_ba, lift), item_a < item_b.
   */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
                    minPairCount: Long = 2L,
                    maxBasketSize: Int = 1000): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1: $minPairCount")
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2: $maxBasketSize")
    val items = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val kept = items
      .join(items.groupBy(col("__b")).agg(count(lit(1)).as("__bs"))
        .filter(col("__bs") <= maxBasketSize).select(col("__b")),
        Seq("__b"), "left_semi")
    val nBaskets = kept.select(col("__b")).distinct()
      .agg(count(lit(1)).as("__n"))
    val itemCounts = kept.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
    val pairCounts = kept
      .join(kept.select(col("__b"), col("__i").as("__j")), Seq("__b"))
      .filter(col("__i") < col("__j"))
      .groupBy(col("__i"), col("__j"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    pairCounts
      .join(itemCounts.select(col("__i"), col("__c").as("n_a")), Seq("__i"))
      .join(itemCounts.select(col("__i").as("__j"), col("__c").as("n_b")),
        Seq("__j"))
      .crossJoin(broadcast(nBaskets))
      .select(col("__i").as("item_a"), col("__j").as("item_b"),
        col("n_ab"), col("n_a"), col("n_b"),
        round(col("n_ab").cast("double") / col("__n"), 6).as("support"),
        round(col("n_ab").cast("double") / col("n_a"), 6).as("conf_ab"),
        round(col("n_ab").cast("double") / col("n_b"), 6).as("conf_ba"),
        round(col("n_ab").cast("double") * col("__n") /
          (col("n_a").cast("double") * col("n_b")), 6).as("lift"))
  }

  /**
   * Smoothed categorical target encoding (the empirical-Bayes m-
   * estimate): each category's feature value is its target mean shrunk
   * toward the global prior,
   *
   *   enc(c) = (Σ_c y + m·prior) / (n_c + m),   prior = Σ y / N
   *
   * — the standard high-cardinality categorical featurizer (rare
   * categories read ≈ prior, frequent ones ≈ their own mean). One
   * map-side-combined aggregate per category plus one broadcast scalar;
   * no vocabulary state beyond the output relation itself.
   *
   * Cross-engine float discipline: target sums are exact DECIMAL(18,6)
   * (order-free — layout cannot move an encoding), the prior is one
   * double division of those exact inputs, and the encoding chain is
   * the mirrored IEEE tree rounded to 6.
   *
   * Output: (catCol, n, enc).
   */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
                   m: Double = 10.0): DataFrame = {
    require(m >= 0, s"smoothing m must be >= 0: $m")
    val base = df.filter(col(targetCol).isNotNull)
      .select(col(catCol), col(targetCol).cast("decimal(18,6)").as("__y"))
    val global = base.agg(
      sum(col("__y")).cast("double").as("__gs"),
      count(lit(1)).as("__gn"))
    val prior = col("__gs") / col("__gn")
    base.groupBy(col(catCol))
      .agg(count(lit(1)).as("n"), sum(col("__y")).cast("double").as("__s"))
      .crossJoin(broadcast(global))
      .select(col(catCol), col("n"),
        round((col("__s") + lit(m) * prior) / (col("n") + lit(m)), 6)
          .as("enc"))
  }
}
