package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan}
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

  // the r11 blind spot: the unpartitioned-window check passes ANY
  // partitionBy textually — including `partitionBy(lit(1))` and a
  // bounded-cardinality column like `lang`, both of which funnel data-
  // scale row sets into one-task window partitions exactly like a
  // global window (the curriculumInterleave `weak`). A window over a
  // constant or bounded key is only scale-safe when an adjacent
  // rank-limit lets Spark rewrite it into per-partition top-k
  // (WindowGroupLimitExec caps every task at k rows BEFORE the
  // window's shuffle). Cardinality can't be read off a plan, so the
  // bounded-key list is declared: fixture columns whose value set is
  // fixed by the schema, not the data volume.
  private val BoundedCardinalityKeys = Set(
    "lang", "language", "domain", "event_type", "l_returnflag",
    "l_linestatus", "o_orderstatus", "o_orderpriority", "l_shipmode",
    "r_name", "n_name", "face", "label", "tier", "qb")

  private def boundedKey(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e.foldable || (e.references.nonEmpty &&
      e.references.forall(a =>
        BoundedCardinalityKeys.contains(a.name.toLowerCase)))

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

  /** A window is also safe when its INPUT was already collapsed by an
    * aggregate keyed entirely on bounded-cardinality columns: the
    * window then runs over a bounded table (≤ product of the bounded
    * keys' value sets — q_quantile_rollup's per-(lang, qb) counts),
    * and the data-scale reduction happened in the shuffle-parallel,
    * map-side-combined aggregate, not the window. */
  private def boundedAggInput(w: WindowExec): Boolean =
    w.children.exists(_.collectFirst {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
        if a.groupingExpressions.nonEmpty &&
          a.groupingExpressions.forall(g =>
            g.references.nonEmpty && g.references.forall(r =>
              BoundedCardinalityKeys.contains(r.name.toLowerCase))) => a
    }.isDefined)

  test("every window partitioned only by constants or bounded-" +
    "cardinality keys is limit-bounded or aggregate-bounded (r12: " +
    "the audit that would have caught the r11 curriculum funnel, and " +
    "did catch q_ntile and q_percent_rank)") {
    val offenders = allNames.flatMap { name =>
      plansOf(name).flatMap { plan =>
        collectAll(plan) {
          case w: WindowExec
            if w.partitionSpec.nonEmpty &&
              w.partitionSpec.forall(boundedKey) && !limitBounded(w) &&
              !boundedAggInput(w) =>
            s"$name:\n$w"
        }
      }
    }
    if (offenders.nonEmpty)
      fail(s"${offenders.size} window(s) partition by a constant/" +
        s"bounded-cardinality key with no group-limit — each window " +
        s"partition is ONE task holding a data-scale row set:\n" +
        offenders.mkString("\n\n"))
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
