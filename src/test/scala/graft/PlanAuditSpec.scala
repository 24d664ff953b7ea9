package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/**
 * Physical-plan audit over the driver query inventory — the scale
 * anti-patterns the engine must never reintroduce, asserted on real
 * plans rather than trusted from scaladoc:
 *
 *  - no WindowExec without a partition spec (a global window funnels
 *    the whole relation through ONE task — the round-1 insert-pk bug);
 *  - no CartesianProductExec (a broadcast nested-loop from an
 *    intentional small-side cross is fine; a partitioned cartesian is
 *    always a mistake at scale);
 *  - filters reach the parquet scans (PushedFilters non-empty where a
 *    query filters a base table);
 *  - column pruning reaches the scans (a 3-column aggregate must not
 *    read a 16-column table).
 */
class PlanAuditSpec extends SparkSpec {

  private def plansOf(name: String): Seq[SparkPlan] = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    Seq(df.queryExecution.sparkPlan)
  }

  private def collectAll[A](p: SparkPlan)(f: PartialFunction[SparkPlan, A]): Seq[A] =
    p.collect(f) ++ p.subqueries.flatMap(collectAll(_)(f))

  // queries whose construction runs driver-side actions are still fine
  // to plan-audit: builders execute, the returned DF is what we check
  private lazy val allNames = SparkEntry.queries.keys.toSeq.sorted

  test("the scaling harness audits only real gate names") {
    val unknown = graft.tools.Scaling.DefaultQueries
      .filterNot(SparkEntry.queries.contains)
    assert(unknown.isEmpty, s"Scaling references unknown gates: $unknown")
  }

  test("no query plan contains an unpartitioned window (unless its " +
    "input is limit-bounded)") {
    allNames.foreach { name =>
      plansOf(name).foreach { plan =>
        val bad = collectAll(plan) {
          case w: WindowExec
            if w.partitionSpec.isEmpty && !limitBounded(w) => w
        }
        if (bad.nonEmpty)
          fail(s"$name has a global (unpartitioned) window:\n${bad.head}")
      }
    }
  }

  /** A window whose INPUT is already capped by a rank/row limit is
    * scale-safe regardless of its partition key: WindowGroupLimitExec
    * caps every task at k rows before the window's shuffle, and
    * LimitPushDownThroughWindow folds `row_number <= k` into a
    * TakeOrderedAndProject / limit below the window (ThetaSketch's
    * empty-group path compiles to exactly that). */
  private def limitBounded(w: WindowExec): Boolean =
    w.collectFirst {
      case g: org.apache.spark.sql.execution.window.WindowGroupLimitExec => g
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      case l: org.apache.spark.sql.execution.GlobalLimitExec => l
      case l: org.apache.spark.sql.execution.LocalLimitExec => l
      case c: org.apache.spark.sql.execution.CollectLimitExec => c
    }.isDefined

  // ------------------------------------------------------------------
  // The empirical bounded-window audit (r13, replacing r12's declared
  // BoundedCardinalityKeys name list — the list caught q_ntile and
  // q_percent_rank only because their keys happened to be on it; a
  // funnel on an UNLISTED bounded key slipped through, and this audit
  // promptly found one: q_merge_intervals' per-key gaps-and-islands
  // window over a mod-50 key, since rewritten as a distributed sweep).
  //
  // Judgment is MEASURED, not declared: a window is scale-safe iff its
  // average partition size stays ~constant as the data grows — growing
  // keys (user_id, doc_id) absorb new rows into new groups, while a
  // bounded key's groups each swallow the growth and become one-task
  // row sets at 100 TB. The same criterion covers unbounded-state
  // AGGREGATES (collect_list/collect_set buffer every group row), so
  // the audit judges both node kinds with one ruler. Concretely, for
  // every suspect not structurally limit-bounded, measure (child rows,
  // grouping-key groups) on sf0.001 and sf0.01:
  //  - child rows < RowsFloor at sf0.01 → safe (the input itself is
  //    fixture-bounded — e.g. a bounded-key aggregate beneath, the old
  //    boundedAggInput exemption, now measured instead of declared);
  //  - avg group size bloat across the 10× step < Bloat1 → safe
  //    (measured safe plans sit at ≤1.01×);
  //  - otherwise ESCALATE to the sf0.01→sf0.1 step: a true funnel
  //    keeps growing linearly (q_merge_intervals measured 10.0×),
  //    while a group whose CONTENT is capped by construction
  //    saturates (q_stream_quantiles' per-window DDSketch bucket set
  //    is bounded by the sketch grid: 7.1× on the first step decayed
  //    to 2.5× on the second, en route to its asymptote). Flag iff
  //    the second-step bloat ≥ Bloat2.
  // ------------------------------------------------------------------
  private val RowsFloor = 512L
  private val Bloat1 = 1.8
  private val Bloat2 = 4.0
  private val sf001 = "/root/testdata/sf0.01"
  private val sf01 = "/root/testdata/sf0.1"

  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.aggregate.{CollectList, CollectSet}
  import org.apache.spark.sql.catalyst.plans.logical.{
    Aggregate, GlobalLimit, LocalLimit, LogicalPlan, Window => LWindow, WindowGroupLimit}
  import org.apache.spark.sql.graftshim.PlanProbe

  private def limitBoundedL(child: LogicalPlan): Boolean =
    child.collectFirst {
      case g: WindowGroupLimit => g
      case l: GlobalLimit => l
      case l: LocalLimit => l
    }.isDefined

  /** A funnel suspect: a plan node whose per-group STATE is
    * group-sized — a partitioned window (WindowExec materializes a
    * window partition per task) or an aggregate carrying an
    * unbounded-state function (collect_list/collect_set accumulate
    * every group row in one buffer; sum/count/min_by are O(1) and
    * percentile sketches are resolution-bounded, so only the Collect
    * family qualifies). Both funnel identically under a bounded key:
    * one task/buffer holding a data-scale row set. */
  private case class Suspect(kind: String, keys: Seq[Expression],
                             child: LogicalPlan) {
    def describeKeys: String = keys.map(_.sql).mkString(", ")
  }

  /** The suspects the measured audit must judge, from the OPTIMIZED
    * logical plan (where InferWindowGroupLimit /
    * LimitPushDownThroughWindow have already run). Structurally
    * limit-bounded inputs are exempt: a WindowGroupLimit beneath caps
    * every group at k rows before the shuffle, a Limit caps the total.
    * Unpartitioned windows are the separate structural test above;
    * ungrouped collects stay IN scope (keys = Nil measures as one
    * group). */
  private def suspectsOf(df: org.apache.spark.sql.DataFrame): Seq[Suspect] =
    df.queryExecution.optimizedPlan.collectWithSubqueries {
      case w: LWindow if w.partitionSpec.nonEmpty && !limitBoundedL(w.child) =>
        Suspect("window", w.partitionSpec, w.child)
      case a: Aggregate
        if a.aggregateExpressions.exists(_.exists(e =>
          e.isInstanceOf[CollectList] || e.isInstanceOf[CollectSet]))
          && !limitBoundedL(a.child) =>
        // NOT Collect[_]: CollectTopK is heap-bounded by construction
        Suspect("collect-agg", a.groupingExpressions, a.child)
    }

  // (rows, groups) measurements are cached by canonicalized
  // (keys, child) so shared operators measure once per suite
  private val measureCache =
    scala.collection.mutable.HashMap[String, (Long, Long)]()

  private def measure(s: Suspect): (Long, Long) = {
    val key = s.keys.map(_.canonicalized).mkString(",") + "|" +
      s.child.canonicalized.toString
    measureCache.getOrElseUpdate(key, {
      val rows = PlanProbe.ofRows(spark, s.child).count()
      val groups =
        if (s.keys.isEmpty) 1L
        else PlanProbe
          .ofRows(spark, PlanProbe.distinctOf(s.keys, s.child)).count()
      (rows, groups)
    })
  }

  private def avg(rg: (Long, Long)): Double =
    if (rg._2 == 0) 0.0 else rg._1.toDouble / rg._2

  /** Run the measured audit over one query builder; returns offender
    * descriptions (empty = scale-safe). */
  // node kinds the inventory actually exercised — guards the matcher
  // against silently rotting to vacuous coverage
  private val seenKinds = scala.collection.mutable.HashSet[String]()

  private def funnelBloat(build: String => org.apache.spark.sql.DataFrame,
                          label: String): Seq[String] = {
    val small = suspectsOf(build(sf0001))
    small.foreach(s => seenKinds += s.kind)
    if (small.isEmpty) return Nil
    val big = suspectsOf(build(sf001))
    assert(big.size == small.size,
      s"$label: suspect count differs across fixtures " +
        s"(${small.size} at sf0.001 vs ${big.size} at sf0.01) — the " +
        "audit matches nodes positionally and needs a stable plan")
    lazy val xl = suspectsOf(build(sf01))
    small.zip(big).zipWithIndex.flatMap { case ((ss, sb), i) =>
      val (rb, gb) = measure(sb)
      if (rb < RowsFloor) None
      else {
        val bloat1 = { val a = avg(measure(ss)); if (a == 0) Double.MaxValue
          else avg((rb, gb)) / a }
        if (bloat1 < Bloat1) None
        else {
          assert(xl.size == small.size,
            s"$label: suspect count differs at sf0.1")
          val bloat2 = { val a = avg((rb, gb)); if (a == 0) Double.MaxValue
            else avg(measure(xl(i))) / a }
          if (bloat2 < Bloat2) None
          else Some(f"$label ${ss.kind}[$i] keys=[${ss.describeKeys}]: " +
            f"avg group size grew $bloat1%.2fx on sf0.001->sf0.01 and " +
            f"$bloat2%.2fx on sf0.01->sf0.1 (rows=$rb, groups=$gb at " +
            "sf0.01) — a bounded-key group is ONE task/buffer holding " +
            "a data-scale row set")
        }
      }
    }
  }

  test("measured: no window's or collect-aggregate's average group " +
    "size grows with the data (the empirical funnel audit — r13, " +
    "catches bounded keys whatever they are named)") {
    val offenders = allNames.flatMap { name =>
      funnelBloat(dir => SparkEntry.queries(name)(spark, dir), name)
    }
    if (offenders.nonEmpty)
      fail(s"${offenders.size} node(s) measured as funnels:\n" +
        offenders.mkString("\n\n"))
    assert(Set("window", "collect-agg").subsetOf(seenKinds.toSet),
      s"matcher coverage rotted — kinds seen: $seenKinds (the " +
        "inventory contains both partitioned windows and collect " +
        "aggregates; an empty kind means the matcher stopped seeing " +
        "them, not that they left the plans)")
  }

  test("measured audit flags a planted funnel on a key no declared " +
    "list has ever named") {
    import org.apache.spark.sql.expressions.{Window => W}
    def planted(dir: String) = {
      val w = W.partitionBy(col("zebra_bucket")).orderBy(col("l_orderkey"))
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select((col("l_partkey") % 7).as("zebra_bucket"),
          col("l_orderkey"), col("l_quantity"))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rn") > 1) // no rank-limit: nothing to group-cap
    }
    val off = funnelBloat(planted, "planted")
    assert(off.nonEmpty, "a 7-value key over a growing table must flag")
    // and the same shape over a GROWING key must pass
    def safe(dir: String) = {
      val w = W.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rn") > 1)
    }
    assert(funnelBloat(safe, "safe").isEmpty,
      "a data-growing key must not flag")
    // and a rank-limited window is structurally exempt before any
    // measurement, even on a bounded key
    def limited(dir: String) = {
      val w = W.partitionBy(col("zebra_bucket")).orderBy(col("l_orderkey"))
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select((col("l_partkey") % 7).as("zebra_bucket"), col("l_orderkey"))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rn") <= 3)
    }
    assert(suspectsOf(limited(sf0001)).isEmpty,
      "row_number<=k must compile to a WindowGroupLimit exemption")
    // the same funnel in AGGREGATE form: a collect_list over a bounded
    // key is one buffer swallowing a data-scale group — the audit
    // judges it with the same ruler (and this proves the aggregate
    // matcher actually matches)
    def plantedAgg(dir: String) =
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select((col("l_partkey") % 7).as("zebra_bucket"),
          col("l_orderkey"))
        .groupBy(col("zebra_bucket"))
        .agg(org.apache.spark.sql.functions
          .collect_list(col("l_orderkey")).as("ids"))
    val aggOff = funnelBloat(plantedAgg, "planted-agg")
    assert(aggOff.nonEmpty && aggOff.head.contains("collect-agg"),
      s"a bounded-key collect_list must flag as a funnel: $aggOff")
  }

  test("no query plan contains a partitioned cartesian product") {
    allNames.foreach { name =>
      plansOf(name).foreach { plan =>
        val bad = collectAll(plan) { case c: CartesianProductExec => c }
        assert(bad.isEmpty, s"$name has a CartesianProductExec")
      }
    }
  }

  test("no query plan contains a global sort over a base relation") {
    // orderBy().limit() folds to TakeOrderedAndProject (fine); a bare
    // global SortExec in a batch query is a full-relation range shuffle
    allNames.foreach { name =>
      plansOf(name).foreach { plan =>
        val bad = collectAll(plan) { case s: SortExec if s.global => s }
        assert(bad.isEmpty, s"$name has a global SortExec")
      }
    }
  }

  test("conform pushes its row filters into the events scan") {
    val plan = plansOf("q_conform").head
    val scans = collectAll(plan) { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "[]"))
    assert(pushed.exists(_ != "[]"),
      s"q_conform scan has no pushed filters: $pushed")
  }

  test("aggregates prune base-table columns at the scan") {
    val plan = plansOf("q_group_records").head
    val scans = collectAll(plan) { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    // lineitem has 16 columns; the query needs exactly 3
    assert(scans.forall(_.output.length <= 3),
      s"q_group_records reads ${scans.map(_.output.length)} columns")
  }

  test("metadata-only multimodal query never reads payload bytes") {
    val plan = plansOf("q_multimodal_meta").head
    val scans = collectAll(plan) { case s: FileSourceScanExec => s }
    assert(scans.forall(!_.output.map(_.name).contains("payload")))
  }

  test("dimension joins in the match family broadcast the small side") {
    val plan = plansOf("q_match_aux").head
    val s = plan.toString
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastExchange"),
      "q_match_aux does not broadcast its dimension tables at sf0.001")
  }

  test("narrow per-row passes compile to zero exchanges") {
    // z-order keying, scrape cleaning and BMP resize are pure per-row
    // transforms: ANY exchange in their plan is a regression
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    Seq("q_zorder", "q_clean_text", "q_multimodal_resize").foreach { name =>
      val bad = collectAll(plansOf(name).head) {
        case e: ShuffleExchangeExec => e
      }
      assert(bad.isEmpty, s"$name shuffles: ${bad.size} exchanges")
    }
  }

  test("stream-static enrichment broadcasts the dimension") {
    val s = plansOf("q_enrich").head.toString
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastExchange"),
      "q_enrich does not broadcast the customer dimension")
  }

  test("bloom prefilter runs on the probe side below the join") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val plan = plansOf("q_bloom_join").head
    val joins = collectAll(plan) {
      case j: BroadcastHashJoinExec => j: SparkPlan
      case j: ShuffledHashJoinExec => j: SparkPlan
      case j: SortMergeJoinExec => j: SparkPlan
    }
    assert(joins.nonEmpty, "q_bloom_join lost its join")
    // the UDF filter must appear strictly below the join (prefilter,
    // not post-filter): search the join's children for a Filter whose
    // condition mentions the bloom UDF
    val below = joins.flatMap(_.children).flatMap(c => collectAll(c) {
      case f: FilterExec if f.condition.toString.contains("UDF") => f
    })
    assert(below.nonEmpty, "bloom UDF filter is not below the join")
  }

  test("query inventory source has no silently-shadowed duplicate keys") {
    // Map literals dedupe duplicate keys silently (last wins): adding a
    // second "q_x" entry replaces the first with NO failure anywhere —
    // the gate count just stays flat. Parse the source to catch it.
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    val cut = src.indexOf("def oracleSql")
    def keys(s: String) =
      "\"(q_\\w+)\" ->".r.findAllMatchIn(s).map(_.group(1)).toSeq
    val qKeys = keys(src.substring(0, cut))
    val oKeys = keys(src.substring(cut))
    for ((ks, what) <- Seq((qKeys, "queries"), (oKeys, "oracleSql"))) {
      val dups = ks.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
      assert(dups.isEmpty, s"duplicate $what keys shadow earlier entries: $dups")
    }
    assert(oKeys.toSet.subsetOf(qKeys.toSet),
      s"oracle entries without a query: ${oKeys.toSet -- qKeys.toSet}")
  }
}
