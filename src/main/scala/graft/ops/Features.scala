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

  /**
   * Multi-annotator label consolidation — the first step of every
   * human-feedback data pipeline: each item was labeled by several
   * annotators, and training wants ONE label per item plus how
   * contested it was. The winner is the most-voted label, ties broken
   * by the SMALLEST label, so the result is a pure function of the
   * vote multiset (annotator identity only contributes a vote).
   *
   * Scale shape: two map-side-combined aggregates — (item, label) vote
   * counts, then a per-item `min_by` over `struct(-votes, label)`
   * (the Merger.bestPerTarget hot-key rewrite: an item labeled by
   * millions of raters reduces in parallel; a row_number window would
   * funnel it into one task). No window, no collect.
   *
   * `agreement` = winner votes / total votes — one IEEE division over
   * exact longs, engine-exact.
   *
   * Output: (itemCol, label, votes, total, n_labels, agreement).
   */
  def majorityVote(df: DataFrame, itemCol: String, annotatorCol: String,
                   labelCol: String): DataFrame = {
    val votes = df
      .filter(col(itemCol).isNotNull && col(annotatorCol).isNotNull &&
        col(labelCol).isNotNull)
      .groupBy(col(itemCol), col(labelCol).as("__l"))
      .agg(count(lit(1)).as("__c"))
    votes.groupBy(col(itemCol))
      .agg(
        min_by(col("__l"), struct((-col("__c")).as("__nc"), col("__l")))
          .as("label"),
        max(col("__c")).as("votes"),
        sum(col("__c")).as("total"),
        count(lit(1)).as("n_labels"))
      .select(col(itemCol), col("label"), col("votes"), col("total"),
        col("n_labels"),
        round(col("votes").cast("double") / col("total"), 6).as("agreement"))
  }

  /**
   * Fleiss' kappa — chance-corrected inter-annotator agreement over an
   * (item, annotator, label) rating table, the go/no-go statistic for
   * an annotation batch (Fleiss 1971, generalized to a variable number
   * of ratings per item):
   *
   *   P_i  = Σ_j n_ij(n_ij−1) / (n_i(n_i−1))   agreement inside item i
   *   P̄   = mean over items with n_i ≥ 2
   *   p_j  = Σ_i n_ij / Σ_i n_i                category prevalence
   *   P̄_e = Σ_j p_j²                           chance agreement
   *   κ    = (P̄ − P̄_e) / (1 − P̄_e)
   *
   * Scale shape: (item, label) counts and per-item/per-category sums
   * are map-side-combined aggregates; only CATEGORY-cardinality and
   * single-row scalars cross a broadcast — items never leave the
   * cluster. Single-category batches (P̄_e = 1) return NULL kappa
   * (agreement is undefined, not perfect).
   *
   * Population note (deliberate, mirrored by the oracle): p_j is taken
   * over ALL ratings — including items with a single rating — while P̄
   * can only average items with n_i ≥ 2. On heavily single-rated
   * batches the two terms therefore describe different item
   * populations and the chance term skews; that is Fleiss' classical
   * formulation's own limit, and [[krippendorffAlpha]] below is the
   * missing-data-correct statistic to reach for in that regime.
   *
   * Cross-engine float discipline: all counts exact longs; each P_i /
   * p_j² is one mirrored double tree rounded to 12 and summed as
   * DECIMAL(38,12) (order-free), and the final κ is a mirrored
   * double chain rounded to 9.
   *
   * Output: one row (n_items, n_categories, n_ratings, p_bar, p_e,
   * kappa).
   */
  def fleissKappa(df: DataFrame, itemCol: String, annotatorCol: String,
                  labelCol: String): DataFrame = {
    val nij = df
      .filter(col(itemCol).isNotNull && col(annotatorCol).isNotNull &&
        col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("__i"), col(labelCol).as("__j"))
      .agg(count(lit(1)).as("__c"))
    // per-item agreement: Σ c(c−1) / (n(n−1)) for items with n ≥ 2
    val perItem = nij.groupBy(col("__i"))
      .agg(sum(col("__c") * (col("__c") - 1)).as("__num"),
        sum(col("__c")).as("__n"))
      .filter(col("__n") >= 2)
      .select(round(col("__num").cast("double") /
        (col("__n") * (col("__n") - 1)).cast("double"), 12)
        .cast("decimal(38,12)").as("__pi"))
    val pbar = perItem.agg(
      (sum(col("__pi")).cast("double") / count(lit(1))).as("__pbar"),
      count(lit(1)).as("n_items"))
    // category prevalence over ALL ratings (single-rating items count)
    val totals = nij.agg(sum(col("__c")).as("__nt"),
      count(lit(1)).as("__ncells"))
    val pe = nij.groupBy(col("__j")).agg(sum(col("__c")).as("__cj"))
      .crossJoin(broadcast(totals.select(col("__nt"))))
      .select(round(
        (col("__cj").cast("double") / col("__nt")) *
          (col("__cj").cast("double") / col("__nt")), 12)
        .cast("decimal(38,12)").as("__pj2"))
      .agg(sum(col("__pj2")).cast("double").as("__pe"),
        count(lit(1)).as("n_categories"))
    val counts = df
      .filter(col(itemCol).isNotNull && col(annotatorCol).isNotNull &&
        col(labelCol).isNotNull)
      .agg(count(lit(1)).as("n_ratings"))
    broadcast(pbar).crossJoin(broadcast(pe)).crossJoin(broadcast(counts))
      .select(col("n_items"), col("n_categories"), col("n_ratings"),
        round(col("__pbar"), 9).as("p_bar"),
        round(col("__pe"), 9).as("p_e"),
        when(col("__pe") >= 1.0, lit(null).cast("double"))
          .otherwise(round((col("__pbar") - col("__pe")) /
            (lit(1.0) - col("__pe")), 9)).as("kappa"))
  }

  /**
   * Per-annotator accuracy against the consolidated label — the rater
   * quality score that drives re-training, weighting, or removal of
   * annotators (the operational follow-up to [[fleissKappa]]: kappa
   * says THE BATCH disagrees, this says WHO). Each rating is compared
   * to its item's [[majorityVote]] winner; an annotator's own vote
   * counts toward the majority it is judged against (the standard
   * convention — leave-one-out is a different, noisier statistic).
   * Items with a single rating still count (the lone rater trivially
   * agrees) — filter upstream if that biases a tiny batch.
   *
   * Scale shape: one majority pass (min_by aggregates, hub-item
   * safe), one item-keyed join of the ratings against the
   * item-cardinality majority relation, one annotator-keyed count
   * aggregate. Accuracy is one IEEE division over exact longs.
   *
   * Output: (annotatorCol, n_rated, n_agree, accuracy).
   */
  def annotatorAccuracy(df: DataFrame, itemCol: String,
                        annotatorCol: String,
                        labelCol: String): DataFrame = {
    val maj = majorityVote(df, itemCol, annotatorCol, labelCol)
      .select(col(itemCol), col("label").as("__maj"))
    df
      .filter(col(itemCol).isNotNull && col(annotatorCol).isNotNull &&
        col(labelCol).isNotNull)
      .join(maj, Seq(itemCol))
      .groupBy(col(annotatorCol))
      .agg(count(lit(1)).as("n_rated"),
        count(when(col(labelCol) === col("__maj"), lit(1))).as("n_agree"))
      .select(col(annotatorCol), col("n_rated"), col("n_agree"),
        round(col("n_agree").cast("double") / col("n_rated"), 6)
          .as("accuracy"))
  }

  /**
   * Krippendorff's alpha (nominal metric) — the agreement statistic
   * that tolerates MISSING ratings, which real annotation batches
   * always have ([[fleissKappa]] silently treats a unit's absent
   * raters as nonexistent; alpha is built for it). Computed through
   * the coincidence-matrix identities (Krippendorff 2004):
   *
   *   Σ_c o_cc = Σ_u Σ_c n_uc(n_uc−1)/(n_u−1)   over units with n_u ≥ 2
   *   D_o = 1 − Σ_c o_cc / n          n = Σ_u n_u  (pairable ratings)
   *   D_e = 1 − Σ_c n_c(n_c−1) / (n(n−1))        n_c = Σ_u n_uc
   *   α   = 1 − D_o / D_e
   *
   * Units with a single rating contribute nothing (no pair to agree
   * on) and are excluded from n and the marginals — the standard
   * treatment. D_e = 0 (one category) returns NULL alpha.
   *
   * Scale shape: (unit, label) counts, per-unit sums, and category
   * marginals are all map-side-combined aggregates; only category-
   * cardinality rows and single-row scalars cross a broadcast.
   *
   * Cross-engine float discipline: per-unit coincidence terms are
   * rationals — rounded to 12 and summed as DECIMAL(38,12); marginal
   * products n_c(n_c−1) stay exact via DECIMAL(19,0) casts (a long
   * multiply would overflow silently at ~3e9 ratings per category —
   * the joinFanout lesson); D_o/D_e/α are mirrored double chains
   * rounded to 9.
   *
   * Output: one row (n_units, n_categories, n_pairable, d_o, d_e,
   * alpha).
   */
  def krippendorffAlpha(df: DataFrame, itemCol: String,
                        annotatorCol: String,
                        labelCol: String): DataFrame = {
    val nuc = df
      .filter(col(itemCol).isNotNull && col(annotatorCol).isNotNull &&
        col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("__i"), col(labelCol).as("__c"))
      .agg(count(lit(1)).as("__n"))
    val perUnit = nuc.groupBy(col("__i"))
      .agg(sum(col("__n")).as("__nu"),
        sum(col("__n") * (col("__n") - 1)).as("__num"))
      .filter(col("__nu") >= 2)
      .select(col("__i"), col("__nu"),
        round(col("__num").cast("double") /
          (col("__nu") - 1).cast("double"), 12)
          .cast("decimal(38,12)").as("__occ"))
    val pairable = nuc.join(perUnit.select(col("__i")), Seq("__i"),
      "left_semi")
    val se = pairable.groupBy(col("__c")).agg(sum(col("__n")).as("__nc"))
      .agg(sum(col("__nc").cast("decimal(19,0)") *
        (col("__nc") - 1).cast("decimal(19,0)")).as("__se"),
        count(lit(1)).as("n_categories"))
    val tot = perUnit.agg(count(lit(1)).as("n_units"),
      sum(col("__nu")).as("n_pairable"),
      sum(col("__occ")).cast("double").as("__so"))
    val dO = lit(1.0) - col("__so") / col("n_pairable")
    val dE = lit(1.0) - col("__se").cast("double") /
      (col("n_pairable").cast("double") * (col("n_pairable") - 1))
    broadcast(tot).crossJoin(broadcast(se))
      .select(col("n_units"), col("n_categories"), col("n_pairable"),
        round(dO, 9).as("d_o"), round(dE, 9).as("d_e"),
        when(dE > 0.0, round(lit(1.0) - dO / dE, 9)).as("alpha"))
  }

  /**
   * Ranked lists → pairwise preferences — the preference-pair
   * constructor for DPO/reward-model training and the input shape of
   * [[bradleyTerry]]: within each group (a prompt, a query, an
   * annotator's ranking session), every item pair with a strict score
   * gap emits one (winner, loser, margin) row. Ties emit nothing (no
   * preference signal); an item rated twice in a group keeps its MAX
   * score (one candidate, its best showing).
   *
   * Scale shape: the (group, item) collapse and the group-size counts
   * are map-side-combined aggregates; pair generation is one
   * self-join on the group key with fan-out group-size², so
   * `maxGroupSize` EXCLUDES pathological mega-groups before the join
   * (the [[frequentPairs]] basket-cap convention — a 100k-candidate
   * group is 5e9 pairs and trains nothing).
   *
   * Output: (groupCol, winner, loser, margin), margin = score_w −
   * score_l (one IEEE subtraction, engine-exact).
   */
  def preferencePairs(df: DataFrame, groupCol: String, itemCol: String,
                      scoreCol: String,
                      maxGroupSize: Int = 1000): DataFrame = {
    require(maxGroupSize >= 2, s"maxGroupSize must be >= 2: $maxGroupSize")
    val items = df
      .filter(col(groupCol).isNotNull && col(itemCol).isNotNull &&
        col(scoreCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), col(itemCol).as("__i"))
      .agg(max(col(scoreCol).cast("double")).as("__s"))
    val kept = items
      .join(items.groupBy(col("__g")).agg(count(lit(1)).as("__gs"))
        .filter(col("__gs") <= maxGroupSize).select(col("__g")),
        Seq("__g"), "left_semi")
    kept
      .join(kept.select(col("__g"), col("__i").as("__j"),
        col("__s").as("__t")), Seq("__g"))
      .filter(col("__s") > col("__t"))
      .select(col("__g").as(groupCol), col("__i").as("winner"),
        col("__j").as("loser"), (col("__s") - col("__t")).as("margin"))
  }

  /**
   * Head-to-head win rates with Wilson lower bounds — the model-vs-
   * model scoreboard read straight off a preference corpus: per
   * unordered item pair, how often did `item_a` (the smaller id) win,
   * and what is the 95%-style LOWER bound on that rate (Wilson 1927 —
   * the ranking-grade statistic: a 3-0 record stops outranking a
   * 300-80 one once uncertainty is priced in):
   *
   *   lb = (p̂ + z²/2n − z·√((p̂(1−p̂) + z²/4n)/n)) / (1 + z²/n)
   *
   * Scale: one pair-count aggregate plus one unordered fold — both
   * map-side-combined; the output is the observed-pair relation.
   *
   * Cross-engine exactness: counts exact longs; p̂ is one IEEE
   * division; the Wilson chain is a mirrored tree of +,·,/ and one
   * `sqrt` (correctly rounded by IEEE — the temperatureMixtureRates
   * argument), with z entering as the same literal on both engines
   * and z² formed as z·z, never a decimal constant. Rounded to 9.
   *
   * Output: (item_a, item_b, wins_a, wins_b, n, win_rate_a,
   * wilson_lb_a), item_a < item_b.
   */
  def winRates(pairs: DataFrame, winnerCol: String, loserCol: String,
               z: Double = 1.96): DataFrame = {
    require(z > 0, s"z must be positive: $z")
    val w = pairs
      .filter(col(winnerCol).isNotNull && col(loserCol).isNotNull &&
        col(winnerCol) =!= col(loserCol))
      .groupBy(col(winnerCol).as("__wi"), col(loserCol).as("__wj"))
      .agg(count(lit(1)).as("__w"))
    val und = w
      .select(least(col("__wi"), col("__wj")).as("item_a"),
        greatest(col("__wi"), col("__wj")).as("item_b"),
        when(col("__wi") < col("__wj"), col("__w")).otherwise(lit(0L))
          .as("__wa"),
        when(col("__wi") > col("__wj"), col("__w")).otherwise(lit(0L))
          .as("__wb"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(sum(col("__wa")).as("wins_a"), sum(col("__wb")).as("wins_b"))
    val n = col("wins_a") + col("wins_b")
    val p = col("wins_a").cast("double") / n
    val zc = lit(z)
    val z2 = zc * zc
    val lb = (p + z2 / (lit(2) * n) -
      zc * sqrt((p * (lit(1.0) - p) + z2 / (lit(4) * n)) / n)) /
      (lit(1.0) + z2 / n)
    und.select(col("item_a"), col("item_b"), col("wins_a"), col("wins_b"),
      n.as("n"), round(p, 9).as("win_rate_a"),
      round(lb, 9).as("wilson_lb_a"))
  }

  /**
   * Bradley-Terry strength scores from pairwise preferences — the
   * reward-modeling primitive: a preference corpus is (winner, loser)
   * comparisons, and training wants a per-item latent strength p with
   * P(i beats j) = p_i / (p_i + p_j). Fitted by the Zermelo/MM
   * iteration (Hunter 2004, "MM algorithms for generalized Bradley-
   * Terry models"):
   *
   *   p'_i = W_i / Σ_{j : n_ij > 0} n_ij / (p_i + p_j)
   *
   * with W_i = total wins of i and n_ij = games between i and j, then
   * L1-normalized each round (Σ p = 1 pins the scale the likelihood
   * leaves free). A FIXED iteration count makes the result a pure
   * bounded-round function the oracle can unroll — and keeps items
   * that never lose finite (their MLE diverges at convergence).
   *
   * `pseudo` adds half-win smoothing per observed pair in BOTH
   * directions (the Arena-style pseudocount): W̃_i = W_i + pseudo ·
   * #opponents and ñ_ij = n_ij + 2·pseudo. Besides the usual
   * regularization this keeps every strength strictly positive — a
   * zero-win item would otherwise hit p = 0 and put a 0/0 in its
   * opponents' next denominator, where IEEE-vs-decimal
   * divide-by-zero semantics diverge across engines.
   *
   * Scale shape: comparisons collapse to aggregated pair counts first
   * (the data-scale reduction — a trillion comparisons become at most
   * item² pair rows, in practice the sparse observed pairs); each
   * round's two strength lookups are `SkewJoin.salted` inner joins
   * (strengths are unique per item, so salted inner ≡ the plain
   * equi-join row-for-row) — NOT a `repartition(i)` cache: an arena
   * champion compared against every other item owns half the
   * symmetric games table, and hash-partitioning by item funnels its
   * whole row block into one task (stress scenario 8's
   * bradley-terry-champion leg pins this at 1.5M straight wins).
   * Per-item denominators are map-side-combined sums, and only the
   * single normalization scalar crosses a broadcast.
   *
   * Cross-engine float discipline: per-pair terms round to 12 and sum
   * as DECIMAL(38,12) (order-free); raw strengths and the normalizer
   * are mirrored double chains; published strengths round to 9.
   *
   * Output: (item, wins, games, strength) — every item appearing in
   * any comparison.
   */
  def bradleyTerry(pairs: DataFrame, winnerCol: String, loserCol: String,
                   iterations: Int = 2, pseudo: Double = 0.5): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    require(pseudo > 0, s"pseudo must be > 0: $pseudo")
    val w = pairs
      .filter(col(winnerCol).isNotNull && col(loserCol).isNotNull &&
        col(winnerCol) =!= col(loserCol))
      .groupBy(col(winnerCol).as("__wi"), col(loserCol).as("__wj"))
      .agg(count(lit(1)).as("__w"))
    // symmetric games: n_ij as seen from each side (i, j, n)
    val games = w.select(col("__wi").as("i"), col("__wj").as("j"), col("__w"))
      .unionAll(w.select(col("__wj").as("i"), col("__wi").as("j"), col("__w")))
      .groupBy(col("i"), col("j")).agg(sum(col("__w")).as("n"))
      .persist()
    val wins = w.groupBy(col("__wi").as("i")).agg(sum(col("__w")).as("wins"))
    val base = games.groupBy(col("i"))
      .agg(sum(col("n")).as("games"), count(lit(1)).as("__nopp"))
      .join(wins, Seq("i"), "left")
      .select(col("i"), coalesce(col("wins"), lit(0L)).as("wins"),
        col("games"),
        (coalesce(col("wins"), lit(0L)).cast("double") +
          lit(pseudo) * col("__nopp")).as("__wsm"))
      .persist()
    var p = base.select(col("i"), lit(1.0).as("p"))
    (1 to iterations).foreach { _ =>
      val denom = graft.operators.SkewJoin.salted(
        graft.operators.SkewJoin.salted(
          games, p.select(col("i"), col("p").as("__pi")),
          Seq("i"), saltFactor = 8),
        p.select(col("i").as("j"), col("p").as("__pj")),
        Seq("j"), saltFactor = 8)
        .select(col("i"),
          round((col("n") + lit(2 * pseudo)) / (col("__pi") + col("__pj")), 12)
            .cast("decimal(38,12)").as("__t"))
        .groupBy(col("i")).agg(sum(col("__t")).cast("double").as("__d"))
      // raw strengths PERSIST for the round (the normalizer broadcast
      // and the output both read them), and the round output is
      // materialized via localCheckpoint, not persist+count: the round
      // plan embeds the previous round's tree twice through the two
      // strength lookups and again through the normalizer, so an
      // uncheckpointed loop's analyzer tree grows exponentially (the
      // Graphs.hits lesson — measured as pure driver time)
      val raw = base.join(denom, Seq("i"))
        .select(col("i"), (col("__wsm") / col("__d")).as("__raw"))
        .persist()
      val norm = raw.agg(
        sum(round(col("__raw"), 12).cast("decimal(38,12)"))
          .cast("double").as("__s"))
      val next = raw.crossJoin(broadcast(norm))
        .select(col("i"), round(col("__raw") / col("__s"), 9).as("p"))
        .localCheckpoint()
      raw.unpersist()
      p = next
    }
    val out = base.join(p, Seq("i"))
      .select(col("i").as("item"), col("wins"), col("games"),
        col("p").as("strength"))
      .persist()
    out.count()
    games.unpersist()
    base.unpersist()
    out
  }
}
