package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fellegi–Sunter probabilistic record linkage — the probabilistic face
 * of the reference's staged matcher (record_matcher.rb:16-30,
 * fuzzy_merger.rb:1-12). The reference encodes linkage judgement as a
 * hand-ordered cascade of exact groups plus one trigram distance bound;
 * the published generalization (Fellegi & Sunter 1969, the model behind
 * Splink / fastLink) scores every blocked candidate pair by the log2
 * Bayes factor its field agreements imply and lets ONE threshold govern
 * accept/reject:
 *
 *   weight(pair) = Σ_k  log2(m_k / u_k)              if field k agrees
 *                       log2((1-m_k) / (1-u_k))      if it disagrees
 *                       0                            if either side null
 *
 * where m_k = P(agree_k | match) and u_k = P(agree_k | non-match).
 * A missing value carries no evidence (the standard convention), so
 * sparse fields degrade gracefully instead of torpedoing the score.
 *
 * Spark-first shape, 100 TB posture:
 *  - candidate generation is a plain blocked equi-join — Catalyst/AQE
 *    owns broadcast-vs-shuffle and skew splitting, exactly like the
 *    exact-match family ([[Matcher.matchRecords]]);
 *  - scoring is a narrow codegen pass: the per-field weights are
 *    computed ONCE on the driver from (m, u) and injected as DECIMAL
 *    literals, so the per-pair work is a CASE chain + exact decimal
 *    adds (order-free, layout-invariant — the float-parity playbook);
 *  - [[bestLinks]] resolves one-target-per-source with the merge
 *    family's `min_by(struct(-weight, tie))` AGGREGATE, not a window:
 *    a hot source id partial-aggregates map-side instead of funneling
 *    one task ([[Merger]] round-5 rewrite, [[graft.ops.Graphs]]
 *    round-7 rewrite);
 *  - [[emFit]] is the unsupervised trainer: one aggregate job per EM
 *    iteration, responsibilities rounded to 9 decimals and summed as
 *    DECIMAL (exact ⇒ the fitted model is bit-identical on any
 *    partition layout); the driver holds only O(#fields) scalars.
 */
object ProbLink {

  /** One compared field: `agree(sourceCol, targetCol)` must evaluate to
    * a nullable boolean (null = missing ⇒ no evidence).
    *
    * `tfAdjust = true` replaces the field's single agreement weight
    * with a term-frequency-adjusted one (Splink's TF adjustment):
    * agreeing on a value carried by a fraction p of the TARGET rows is
    * evidence log2(m / max(p, tfFloor)) — agreeing on "SMITH" means
    * far less than agreeing on "ZYZMANSKI". The disagreement weight
    * stays the field-level log2((1-m)/(1-u)). The value-frequency
    * table is target-derived, value-cardinality-sized, and broadcast.
    */
  final case class LinkField(name: String, m: Double, u: Double,
                             sourceCol: String, targetCol: String,
                             agree: (Column, Column) => Column,
                             tfAdjust: Boolean = false,
                             tfFloor: Double = 1e-6) {
    require(m > 0 && m < 1, s"m out of (0,1): $m")
    require(u > 0 && u < 1, s"u out of (0,1): $u")
    require(tfFloor > 0 && tfFloor < 1, s"tfFloor out of (0,1): $tfFloor")
  }

  /** Fitted parameters of one field after [[emFit]]. */
  final case class FieldFit(name: String, m: Double, u: Double)

  /** EM output: P(match) prior and per-field (m, u). */
  final case class EmResult(lambda: Double, fields: Seq[FieldFit])

  /** (agreement, disagreement) log2 weights for (m, u), rounded to 6
    * decimals — rounded on the DRIVER so the executor-side arithmetic
    * (and any SQL oracle embedding the same literals) is exact decimal
    * addition with no cross-engine transcendental drift. */
  def weights(m: Double, u: Double): (BigDecimal, BigDecimal) = {
    def log2(x: Double): Double = math.log(x) / math.log(2.0)
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_EVEN)
    (r6(log2(m / u)), r6(log2((1 - m) / (1 - u))))
  }

  /**
   * Score all blocked candidate pairs. Output: the id columns, one
   * `agree_<field>` boolean per field, `match_weight` (DECIMAL(28,6),
   * exact) and `match_prob` (double, the logistic of
   * `priorLogOdds + weight` — derived per-row, for human consumption;
   * cross-engine gates should compare the exact weight).
   *
   * `blockKeys` are (sourceCol, targetCol) equi-keys; blocking is the
   * caller's recall/cost dial exactly as in the reference's match
   * groups. Both inputs are projected to the compared columns only
   * before the join, so the shuffle carries nothing it doesn't need.
   */
  def scorePairs(source: DataFrame, sourceId: String,
                 target: DataFrame, targetId: String,
                 blockKeys: Seq[(String, String)],
                 fields: Seq[LinkField],
                 priorLogOdds: Double = 0.0): DataFrame = {
    require(blockKeys.nonEmpty, "at least one blocking key required")
    require(fields.nonEmpty, "at least one compared field required")
    // fan the source side out across the cores BEFORE the blocked join:
    // the target is broadcast-sized here, so the join inherits the
    // source scan's partitioning — on a single-split input that leaves
    // pair generation + per-pair comparators (levenshtein, CASE chains)
    // in one serial task (graft.ops.Dispatch.fanOut scaladoc)
    val s = graft.ops.Dispatch.fanOut(source.select(
      (col(sourceId).as("__sid")) +:
        blockKeys.zipWithIndex.map { case ((sc, _), i) => col(sc).as(s"__bk$i") } ++:
        fields.map(f => col(f.sourceCol).as(s"__s_${f.name}")): _*), col("__sid"))
    // the target fans out too: when the SOURCE is the broadcast-sized
    // side (the EM sample shape), the target inherits the stream role
    // and ITS single-split scan becomes the serial probe side
    val t = graft.ops.Dispatch.fanOut(target.select(
      (col(targetId).as("__tid")) +:
        blockKeys.zipWithIndex.map { case ((_, tc), i) => col(tc).as(s"__bk$i") } ++:
        fields.map(f => col(f.targetCol).as(s"__t_${f.name}")): _*), col("__tid"))
    val joinedBase = s.join(t, blockKeys.indices.map(i => s"__bk$i"))
    // TF-adjusted fields join a broadcast (value, share-of-target)
    // table on the target-side value; p rides the pair for the
    // agreement branch of the weight
    val joined = fields.filter(_.tfAdjust).foldLeft(joinedBase) { (acc, f) =>
      val freq = target
        .filter(col(f.targetCol).isNotNull)
        .groupBy(col(f.targetCol).as(s"__t_${f.name}"))
        .agg(count(lit(1)).as("__c"))
      val tot = freq.agg(sum(col("__c")).as("__n"))
      val shares = freq.crossJoin(tot)
        .select(col(s"__t_${f.name}"),
          (col("__c").cast("double") / col("__n").cast("double"))
            .as(s"__tf_${f.name}"))
      acc.join(broadcast(shares), Seq(s"__t_${f.name}"), "left")
    }
    val agreeCols = fields.map { f =>
      f.agree(col(s"__s_${f.name}"), col(s"__t_${f.name}")).as(s"agree_${f.name}")
    }
    val zero = lit(BigDecimal(0).bigDecimal).cast("decimal(28,6)")
    val weightSum = fields.map { f =>
      val (wa, wd) = weights(f.m, f.u)
      val a = col(s"agree_${f.name}")
      val agreeW: Column =
        if (!f.tfAdjust) lit(wa.bigDecimal).cast("decimal(28,6)")
        else
          // in-engine log2 + round(6): the BM25-idf parity convention
          // (same IEEE expression tree on both engines)
          round(log2(lit(f.m) /
            greatest(col(s"__tf_${f.name}"), lit(f.tfFloor))), 6)
            .cast("decimal(28,6)")
      when(a.isNull, zero)
        .when(a, agreeW)
        .otherwise(lit(wd.bigDecimal).cast("decimal(28,6)"))
    }.reduce(_ + _).cast("decimal(28,6)")
    joined
      .select((col("__sid").as(sourceId) +: col("__tid").as(targetId) +:
        agreeCols :+ weightSum.as("match_weight")): _*)
      .withColumn("match_prob",
        lit(1.0) / (lit(1.0) +
          pow(lit(2.0), -(lit(priorLogOdds) + col("match_weight").cast("double")))))
  }

  /** One ordered agreement level of a [[GradedField]]: the first level
    * whose predicate holds wins. `m`/`u` are P(level | match) and
    * P(level | non-match); across the declared levels plus the
    * implicit catch-all they must each sum to 1, so the catch-all's
    * probabilities are `1 - Σm` / `1 - Σu`. */
  final case class LinkLevel(name: String,
                             m: Double, u: Double,
                             predicate: (Column, Column) => Column)

  /** A multi-level comparison (the full Fellegi–Sunter/Splink model —
    * "exact name" carries more evidence than "name within 1 edit",
    * which carries more than "else"): ordered levels, first match
    * wins, the catch-all level is implicit. */
  final case class GradedField(name: String, sourceCol: String,
                               targetCol: String,
                               levels: Seq[LinkLevel]) {
    require(levels.nonEmpty, s"$name: at least one level")
    private val sm = levels.map(_.m).sum
    private val su = levels.map(_.u).sum
    require(sm > 0 && sm < 1 && su > 0 && su < 1,
      s"$name: level m/u sums must leave room for the catch-all " +
        s"(got Σm=$sm, Σu=$su)")
    /** Catch-all (m, u). */
    def elseM: Double = 1 - sm
    def elseU: Double = 1 - su
  }

  /** Per-level log2 weights of a graded field (declared levels in
    * order, then the catch-all), rounded to 6 on the driver exactly
    * like [[weights]]. */
  def gradedWeights(f: GradedField): Seq[BigDecimal] = {
    def log2(x: Double): Double = math.log(x) / math.log(2.0)
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_EVEN)
    f.levels.map(l => r6(log2(l.m / l.u))) :+ r6(log2(f.elseM / f.elseU))
  }

  /**
   * [[scorePairs]] with multi-level comparisons: output carries one
   * `level_<field>` int per field (0-based declared level, #levels =
   * catch-all, null = missing value ⇒ no evidence) and the same exact
   * DECIMAL `match_weight`. Same plan shape — blocked equi-join plus a
   * narrow codegen CASE chain over driver-rounded literals.
   */
  def scorePairsGraded(source: DataFrame, sourceId: String,
                       target: DataFrame, targetId: String,
                       blockKeys: Seq[(String, String)],
                       fields: Seq[GradedField],
                       priorLogOdds: Double = 0.0): DataFrame = {
    require(blockKeys.nonEmpty, "at least one blocking key required")
    require(fields.nonEmpty, "at least one compared field required")
    // same serial-probe-side fan-out as scorePairs (see there)
    val s = graft.ops.Dispatch.fanOut(source.select(
      (col(sourceId).as("__sid")) +:
        blockKeys.zipWithIndex.map { case ((sc, _), i) => col(sc).as(s"__bk$i") } ++:
        fields.map(f => col(f.sourceCol).as(s"__s_${f.name}")): _*), col("__sid"))
    // the target fans out too: when the SOURCE is the broadcast-sized
    // side (the EM sample shape), the target inherits the stream role
    // and ITS single-split scan becomes the serial probe side
    val t = graft.ops.Dispatch.fanOut(target.select(
      (col(targetId).as("__tid")) +:
        blockKeys.zipWithIndex.map { case ((_, tc), i) => col(tc).as(s"__bk$i") } ++:
        fields.map(f => col(f.targetCol).as(s"__t_${f.name}")): _*), col("__tid"))
    val joined = s.join(t, blockKeys.indices.map(i => s"__bk$i"))
    val levelCols = fields.map { f =>
      val sc = col(s"__s_${f.name}")
      val tc = col(s"__t_${f.name}")
      val base = when(sc.isNull || tc.isNull, lit(null).cast("int"))
      f.levels.zipWithIndex
        .foldLeft(base) { case (acc, (l, i)) =>
          acc.when(l.predicate(sc, tc), lit(i))
        }
        .otherwise(lit(f.levels.size))
        .as(s"level_${f.name}")
    }
    val zero = lit(BigDecimal(0).bigDecimal).cast("decimal(28,6)")
    val weightSum = fields.map { f =>
      val ws = gradedWeights(f)
      val lv = col(s"level_${f.name}")
      val base = when(lv.isNull, zero)
      ws.zipWithIndex.foldLeft(base) { case (acc, (w, i)) =>
        acc.when(lv === i, lit(w.bigDecimal).cast("decimal(28,6)"))
      }.otherwise(zero)
    }.reduce(_ + _).cast("decimal(28,6)")
    joined
      .select((col("__sid").as(sourceId) +: col("__tid").as(targetId) +:
        levelCols): _*)
      .withColumn("match_weight", weightSum)
      .withColumn("match_prob",
        lit(1.0) / (lit(1.0) +
          pow(lit(2.0), -(lit(priorLogOdds) + col("match_weight").cast("double")))))
  }

  /**
   * One best target per source: max weight, ties to the smallest
   * target id — as a partial-aggregating `min_by`, never a window
   * (hot-source-key safe). Pairs below `minWeight` are discarded
   * first, so an unlinkable source row yields no output row (the
   * caller's anti-join face, as in [[Merger]] insert-remaining).
   */
  def bestLinks(scored: DataFrame, sourceId: String, targetId: String,
                minWeight: BigDecimal): DataFrame =
    scored
      .filter(col("match_weight") >=
        lit(minWeight.bigDecimal).cast("decimal(28,6)"))
      .groupBy(col(sourceId))
      .agg(min_by(
        struct(col(targetId), col("match_weight")),
        struct((-col("match_weight")).as("__nw"), col(targetId))).as("__best"))
      .select(col(sourceId), col(s"__best.$targetId").as(targetId),
        col("__best.match_weight").as("match_weight"))

  /**
   * Unsupervised (m, u, λ) estimation by EM over the agreement
   * patterns (Winkler 1988's application of EM to the FS model; what
   * Splink's `estimate_parameters_using_expectation_maximisation`
   * does). Input is any frame carrying `agree_<field>` booleans —
   * [[scorePairs]] output works as-is.
   *
   * E-step responsibilities are computed per-row from the CURRENT
   * driver-side params (pure IEEE, layout-independent), rounded to 9
   * decimals and aggregated as DECIMAL(38,9) — exact, order-free sums,
   * so the fitted model is bit-identical across partition layouts and
   * cluster sizes. One job per iteration; the aggregate row carries
   * 2 + 4·|fields| scalars (model-sized driver state, like
   * [[graft.ops.QualityClassifier]]'s gradient).
   *
   * Null agreements are excluded from that field's m/u update (no
   * evidence in, no parameter mass out) but still contribute to λ.
   */
  /**
   * Blocking-rule profiler (Splink's pre-flight `count_comparisons`):
   * the EXACT pair count each candidate blocking rule would generate,
   * with the hottest block — computed entirely from per-key counts
   * (Σ cnt_s·cnt_t over matching keys, the [[graft.operators.Audits
   * .joinFanout]] arithmetic), so no candidate pair is materialized.
   * This is the dial a linkage job turns FIRST at 100 TB: a rule
   * whose estimate is 10^13 never runs; one with 10^8 does.
   *
   * `rules` maps rule name → (sourceCol, targetCol) equi-keys.
   * Output: one row per rule — (rule, est_pairs, matched_keys,
   * max_block_pairs), DECIMAL(38,0) exact.
   */
  def blockingProfile(source: DataFrame, target: DataFrame,
                      rules: Seq[(String, Seq[(String, String)])]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    rules.map { case (name, keys) =>
      require(keys.nonEmpty, s"rule $name has no keys")
      val sc = source
        .filter(keys.map { case (k, _) => col(k).isNotNull }.reduce(_ && _))
        .groupBy(keys.zipWithIndex.map { case ((k, _), i) =>
          col(k).as(s"__k$i") }: _*)
        .agg(count(lit(1)).as("__sc"))
      val tc = target
        .filter(keys.map { case (_, k) => col(k).isNotNull }.reduce(_ && _))
        .groupBy(keys.zipWithIndex.map { case ((_, k), i) =>
          col(k).as(s"__k$i") }: _*)
        .agg(count(lit(1)).as("__tc"))
      val prod = col("__sc").cast("decimal(38,0)") *
        col("__tc").cast("decimal(38,0)")
      sc.join(tc, keys.indices.map(i => s"__k$i"))
        .agg(
          coalesce(sum(prod), lit(0).cast("decimal(38,0)")).as("est_pairs"),
          count(lit(1)).as("matched_keys"),
          coalesce(max(prod), lit(0).cast("decimal(38,0)"))
            .as("max_block_pairs"))
        .select(lit(name).as("rule"), col("est_pairs"),
          col("matched_keys"), col("max_block_pairs"))
    }.reduce(_ unionByName _)
  }

  /** Graded EM output: per field, (m, u) per level (declared levels
    * in order, catch-all last; each column sums to 1). */
  final case class GradedFit(name: String, levels: Seq[(Double, Double)])
  final case class EmGradedResult(lambda: Double, fields: Seq[GradedFit])

  /**
   * EM for the multi-level model: estimate λ and per-(field, level)
   * (m, u) from `level_<field>` columns ([[scorePairsGraded]] output).
   * Same discipline as [[emFit]] — responsibilities rounded to 9
   * decimals, DECIMAL sums (bit-identical fit at any layout), one
   * aggregate job per iteration, O(Σ levels) driver state. Null levels
   * carry no evidence and are excluded from that field's update.
   * Level probabilities are floored at 1e-6 and renormalized per field
   * each M-step (a level nobody hits must not zero out the product).
   */
  def emFitGraded(pairs: DataFrame, fields: Seq[(String, Int)],
                  iterations: Int,
                  initLambda: Double = 0.1): EmGradedResult = {
    require(fields.nonEmpty, "no fields")
    require(fields.forall(_._2 >= 2), "each field needs >= 2 levels")
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    var lambda = initLambda
    // init: matches concentrate on level 0, non-matches on the last
    var m = fields.map { case (_, k) =>
      Array.tabulate(k)(i => if (i == 0) 0.7 else 0.3 / (k - 1))
    }.toArray
    var u = fields.map { case (_, k) =>
      Array.tabulate(k)(i => if (i == k - 1) 0.7 else 0.3 / (k - 1))
    }.toArray
    val cached = pairs.select(
      fields.map { case (n, _) => col(s"level_$n") }: _*).persist()
    try {
      (1 to iterations).foreach { _ =>
        def prodExpr(params: Array[Array[Double]]): Column =
          fields.zipWithIndex.map { case ((n, k), fi) =>
            val lv = col(s"level_$n")
            (0 until k).foldLeft(when(lv.isNull, lit(1.0))) {
              case (acc, li) => acc.when(lv === li, lit(params(fi)(li)))
            }.otherwise(lit(1.0))
          }.reduce(_ * _)
        val num = lit(lambda) * prodExpr(m)
        val den = num + lit(1.0 - lambda) * prodExpr(u)
        val r = round(num / den, 9).cast("decimal(38,9)")
        val withR = cached.withColumn("__r", r)
        val one = lit(BigDecimal(1).bigDecimal).cast("decimal(38,9)")
        val aggs =
          Seq(count(lit(1)).as("n"), sum(col("__r")).as("sr")) ++
            fields.flatMap { case (n, k) =>
              val lv = col(s"level_$n")
              Seq(
                sum(when(lv.isNotNull, col("__r")).otherwise(lit(0)))
                  .as(s"srN_$n"),
                sum(when(lv.isNotNull, one - col("__r")).otherwise(lit(0)))
                  .as(s"scN_$n")) ++
                (0 until k).flatMap { li =>
                  Seq(
                    sum(when(lv === li, col("__r")).otherwise(lit(0)))
                      .as(s"srL_${n}_$li"),
                    sum(when(lv === li, one - col("__r")).otherwise(lit(0)))
                      .as(s"scL_${n}_$li"))
                }
            }
        val row = withR.agg(aggs.head, aggs.tail: _*).collect()(0)
        require(row.getAs[Long]("n") > 0,
          "emFitGraded: no pairs to estimate from")
        def d(name: String): Double = {
          val v = row.getAs[java.math.BigDecimal](name)
          if (v == null) 0.0 else v.doubleValue()
        }
        def clampNorm(xs: Array[Double]): Array[Double] = {
          val c = xs.map(x => math.max(1e-6, x))
          val s = c.sum
          c.map(_ / s)
        }
        lambda = math.max(1e-6, math.min(1 - 1e-6,
          d("sr") / row.getAs[Long]("n").toDouble))
        m = fields.zipWithIndex.map { case ((n, k), fi) =>
          val den = d(s"srN_$n")
          if (den == 0) m(fi)
          else clampNorm(Array.tabulate(k)(li => d(s"srL_${n}_$li") / den))
        }.toArray
        u = fields.zipWithIndex.map { case ((n, k), fi) =>
          val den = d(s"scN_$n")
          if (den == 0) u(fi)
          else clampNorm(Array.tabulate(k)(li => d(s"scL_${n}_$li") / den))
        }.toArray
      }
    } finally cached.unpersist()
    EmGradedResult(lambda,
      fields.zipWithIndex.map { case ((n, k), fi) =>
        GradedFit(n, (0 until k).map(li => (m(fi)(li), u(fi)(li))))
      })
  }

  def emFit(pairs: DataFrame, fieldNames: Seq[String], iterations: Int,
            initM: Double = 0.9, initU: Double = 0.1,
            initLambda: Double = 0.1): EmResult = {
    require(fieldNames.nonEmpty, "no fields")
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    def clamp(x: Double): Double = math.max(1e-6, math.min(1 - 1e-6, x))
    var lambda = initLambda
    var m = fieldNames.map(_ => initM).toArray
    var u = fieldNames.map(_ => initU).toArray
    val cached = pairs.select(
      fieldNames.map(n => col(s"agree_$n")): _*).persist()
    try {
      (1 to iterations).foreach { _ =>
        // E-step: r = λ·Πm-terms / (λ·Πm-terms + (1-λ)·Πu-terms),
        // null fields contribute factor 1 to both products
        def prodExpr(params: Array[Double]): Column =
          fieldNames.zipWithIndex.map { case (n, i) =>
            val a = col(s"agree_$n")
            when(a.isNull, lit(1.0))
              .when(a, lit(params(i)))
              .otherwise(lit(1.0 - params(i)))
          }.reduce(_ * _)
        val num = lit(lambda) * prodExpr(m)
        val den = num + lit(1.0 - lambda) * prodExpr(u)
        val r = round(num / den, 9).cast("decimal(38,9)")
        val withR = cached.withColumn("__r", r)
        // M-step sufficient statistics in one aggregate
        val aggs =
          Seq(count(lit(1)).as("n"), sum(col("__r")).as("sr")) ++
            fieldNames.flatMap { n =>
              val a = col(s"agree_$n")
              val one = lit(BigDecimal(1).bigDecimal).cast("decimal(38,9)")
              Seq(
                sum(when(a === true, col("__r")).otherwise(lit(0))).as(s"srA_$n"),
                sum(when(a.isNotNull, col("__r")).otherwise(lit(0))).as(s"srN_$n"),
                sum(when(a === true, one - col("__r")).otherwise(lit(0))).as(s"scA_$n"),
                sum(when(a.isNotNull, one - col("__r")).otherwise(lit(0))).as(s"scN_$n"))
            }
        val row = withR.agg(aggs.head, aggs.tail: _*).collect()(0)
        require(row.getAs[Long]("n") > 0,
          "emFit: no pairs to estimate from")
        val n = row.getAs[Long]("n").toDouble
        def d(name: String): Double = {
          val v = row.getAs[java.math.BigDecimal](name)
          if (v == null) 0.0 else v.doubleValue()
        }
        lambda = clamp(d("sr") / n)
        m = fieldNames.map { nm =>
          val den = d(s"srN_$nm"); clamp(if (den == 0) 0.5 else d(s"srA_$nm") / den)
        }.toArray
        u = fieldNames.map { nm =>
          val den = d(s"scN_$nm"); clamp(if (den == 0) 0.5 else d(s"scA_$nm") / den)
        }.toArray
      }
    } finally cached.unpersist()
    EmResult(lambda,
      fieldNames.zipWithIndex.map { case (n, i) => FieldFit(n, m(i), u(i)) })
  }
}
