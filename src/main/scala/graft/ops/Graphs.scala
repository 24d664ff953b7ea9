package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Graph centrality over edge lists (the domain/URL-authority signal a
 * web-corpus quality pipeline weights documents by — the same shape
 * CommonCrawl publishes as host-level centrality ranks).
 */
object Graphs {

  /**
   * Fixed-iteration PageRank on a (multi)edge list — the practical
   * non-normalized variant: ranks start at 1, dangling mass is not
   * redistributed, parallel edges count once each.
   *
   *   r'(v) = base + damping · Σ_{(u,v) ∈ E} r(u) / outdeg(u)
   *
   * Distributed shape per iteration: one join of the degree-annotated
   * edge list with the current ranks on src (the edge side is
   * persisted ONCE for all iterations), one map-side-combined sum on
   * dst, one left join back onto the node set — no driver funnel, no
   * global collect; each iteration's rank is persisted and the
   * previous one released, the standard iterative-dataflow pattern
   * (same as Clusters' star rounds).
   *
   * Cross-engine float discipline (why this is oracle-exact): each
   * edge contribution rounds to 12 decimals and sums as
   * DECIMAL(20,12) (order-free), and each new rank rounds to 7
   * decimals — so per-iteration drift can never accumulate past the
   * rounding grid. `base`/`damping` enter as double literals on both
   * engines.
   *
   * Returns (node, rank); the returned frame is persisted (caller may
   * unpersist after consuming).
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 3, damping: Double = 0.85,
               base: Double = 0.15): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    rankLoop(e, extraNodes = None, initRank = lit(1.0),
      restartTerm = lit(base), damping = damping, iterations = iterations)
  }

  /** The ONE power-iteration loop under [[pageRank]] and
    * [[personalizedPageRank]] — identical persist/partition/decimal
    * discipline for both, so a fix here cannot silently diverge
    * between them. `initRank`/`restartTerm` are expressions over
    * `node`; `extraNodes` joins off-edge seeds into the node set. */
  private def rankLoop(e: DataFrame, extraNodes: Option[DataFrame],
                       initRank: Column, restartTerm: Column,
                       damping: Double, iterations: Int): DataFrame = {
    // loop invariants are persisted PRE-PARTITIONED on their join keys:
    // InMemoryRelation keeps the hash partitioning, so each iteration's
    // edge×rank join and nodes×contrib join read the cache co-located
    // instead of re-shuffling the (large) edge side every round
    val nodes0 = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
    val nodes = extraNodes.fold(nodes0)(nodes0.unionAll).distinct()
      .repartition(col("node")).persist()
    val eDeg = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
      .repartition(col("src"))
      .persist()
    var rank = nodes.select(col("node"), initRank.as("rank"))
    var prev: DataFrame = null
    (1 to iterations).foreach { _ =>
      val contrib = eDeg
        .join(rank.withColumnRenamed("node", "__rn"),
          col("src") === col("__rn"))
        .select(col("dst"),
          round(col("rank") / col("deg"), 12)
            .cast("decimal(20,12)").as("m"))
        .groupBy(col("dst")).agg(sum(col("m")).as("m"))
      val next = nodes
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          round(restartTerm + lit(damping) *
            coalesce(col("m").cast("double"), lit(0.0)), 7).as("rank"))
        .persist()
      next.count() // materialize before releasing the previous iteration
      if (prev != null) prev.unpersist()
      prev = next
      rank = next
    }
    nodes.unpersist()
    eDeg.unpersist()
    rank
  }

  /**
   * Personalized PageRank — random walk with restart onto a trusted
   * seed set (the TrustRank construction: authority relative to known-
   * good hosts, the standard link-spam demotion signal; the distance
   * face of the same idea is [[shortestPaths]]):
   *
   *   r0(v) = e(v);  r'(v) = (1−d)·e(v) + d · Σ_{(u,v) ∈ E} r(u)/outdeg(u)
   *
   * where e(v) = 1/|seeds| on the seed set, 0 elsewhere. Same
   * practical conventions as [[pageRank]] (dangling mass not
   * redistributed, parallel edges count once each) and the same
   * iterative-dataflow shape: persisted pre-partitioned edge/node
   * invariants, one co-located join + one map-side-combined DECIMAL
   * sum per round. Same float discipline too (contributions round-12
   * into DECIMAL(20,12), ranks round-7; e and 1−d enter as driver-
   * computed literals on both engines), so it is oracle-exact.
   *
   * Returns (node, rank) over the graph's node set; the returned
   * frame is persisted (caller may unpersist after consuming).
   */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: Seq[Long], iterations: Int = 3,
                           damping: Double = 0.85): DataFrame = {
    require(seeds.nonEmpty, "at least one seed node")
    require(iterations >= 1, "iterations must be >= 1")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    // distinct seeds: e sums to 1 over the seed SET (a caller-repeated
    // seed must not silently shrink everyone's restart mass); seeds
    // join the node set so an off-graph seed still carries its share
    // (the shortestPaths convention) instead of zeroing every rank
    val s = seeds.distinct
    val eVal = BigDecimal(1.0 / s.size)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val restart = 1.0 - damping
    val eInd = when(col("node").isin(s: _*), lit(eVal))
      .otherwise(lit(0.0))
    rankLoop(e, extraNodes = Some(s.toDF("node")), initRank = eInd,
      restartTerm = lit(restart) * eInd, damping = damping,
      iterations = iterations)
  }

  /**
   * HITS hubs-and-authorities (Kleinberg 1999) — the link-analysis
   * complement to [[pageRank]]: an *authority* is pointed at by good
   * hubs, a *hub* points at good authorities. The directory-vs-content
   * decomposition a web-corpus pipeline reads alongside centrality
   * (a link farm scores high-hub/low-authority; organic references
   * the reverse). Fixed synchronous iterations, each
   *
   *   a'(v) = Σ_{u→v} h(u),   h'(u) = Σ_{u→v} a'(v)
   *
   * L1-normalized after every update (Σ a = Σ h = 1; the classic
   * presentation normalizes L2, but an L1 scalar is one exact
   * DECIMAL sum both engines share, and the ranking is identical).
   * Parallel edges collapse (the graph is made simple), self-loops
   * kept — a self-link is a real hub-to-authority endorsement in the
   * model.
   *
   * Scale shape: the deduplicated edge list persists ONCE,
   * UNPARTITIONED, and each half-round's score lookup is a
   * `SkewJoin.salted` inner join (scores are unique per node, so
   * salted inner ≡ the plain equi-join row-for-row). Deliberately NOT
   * the [[pageRank]] `repartition(src)` discipline: HITS joins on a
   * RAW endpoint both ways, and hash-partitioning the edges by an
   * endpoint puts a web hub's entire edge list into one partition —
   * the repartition exchange itself is the funnel (stress scenario
   * 8's hits-hub leg demonstrates it at 1.5M degree; AQE's skew split
   * never fires on a few-MB hot partition). After the salted join the
   * per-node sums are map-side-combined DECIMAL aggregates, then one
   * left join onto the node set and one broadcast normalization
   * scalar.
   *
   * Cross-engine float discipline: contributions round to 12 and sum
   * as DECIMAL(38,12); normalized scores round to 9; the normalizer
   * is itself a round-12 DECIMAL sum — so per-iteration drift can
   * never exceed the rounding grid (the [[pageRank]] convention).
   *
   * Output: (node, hub, authority) over every node of the simple
   * graph; persisted, caller may unpersist.
   */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iterations: Int = 2): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .persist()
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct()
      .repartition(col("node"))
      .persist()
    // node cardinality, counted once: it sizes the per-half-round
    // score lookup's dispatch (broadcast under SkewJoin's row bound,
    // salted shuffle above it) — 4 half-rounds of edge-cache shuffle
    // + 8x score replication bought back for one count job
    val nNodes = nodes.count()
    // one normalized score pass: joinKey is the edge end carrying the
    // summed score, outKey the end receiving it. Salted lookup: the
    // hub's edges spread over saltFactor reducers instead of one.
    // The per-node sums PERSIST for the round: both the normalizer and
    // the output read them, and without the cache each branch would
    // recompute the salted edge join (measured 2× the gate's cost).
    // The normalizer aggregates the PRE-join sums — nodes absent from
    // `raw` carry 0 and add nothing to the DECIMAL sum, so it equals
    // the all-nodes sum the oracle computes, without the node join.
    def update(score: DataFrame, joinKey: String,
               outKey: String): (DataFrame, DataFrame) = {
      val raw = graft.operators.SkewJoin.saltedAuto(
        e, score.select(col("node").as(joinKey), col("s")),
        Seq(joinKey), saltFactor = 8, dimRowsAtMost = nNodes)
        .select(col(outKey),
          round(col("s"), 12).cast("decimal(38,12)").as("__m"))
        .groupBy(col(outKey))
        .agg(sum(col("__m")).cast("double").as("__raw"))
        .persist()
      val norm = raw.agg(
        sum(round(col("__raw"), 12).cast("decimal(38,12)"))
          .cast("double").as("__s"))
      val scored = nodes
        .join(raw, col("node") === col(outKey), "left")
        .crossJoin(broadcast(norm))
        .select(col("node"),
          round(coalesce(col("__raw"), lit(0.0)) / col("__s"), 9).as("s"))
      (scored, raw)
    }
    // Each round's score frame is materialized via localCheckpoint,
    // NOT persist+count: the round plan embeds the previous round's
    // tree TWICE (once under the join, once inside the broadcast
    // normalizer), so an uncheckpointed loop quadruples the analyzer's
    // tree per half-round — measured 59 s of pure driver plan
    // processing at 600k edges vs 9 s checkpointed, with identical
    // results. The checkpoint truncates the lineage to the
    // materialized partitions (the iterative-dataflow sibling of the
    // rankLoop's persist discipline, needed here because HITS plans
    // are self-referencing through the normalizer).
    var h = nodes.select(col("node"), lit(1.0).as("s"))
    var a: DataFrame = null
    (1 to iterations).foreach { _ =>
      val (aNext0, rawA) = update(h, joinKey = "src", outKey = "dst")
      val aNext = aNext0.localCheckpoint()
      rawA.unpersist()
      val (hNext0, rawH) = update(aNext, joinKey = "dst", outKey = "src")
      val hNext = hNext0.localCheckpoint()
      rawH.unpersist()
      a = aNext
      h = hNext
    }
    val out = h.withColumnRenamed("s", "hub")
      .join(a.select(col("node"), col("s").as("authority")), Seq("node"))
      .persist()
    out.count()
    nodes.unpersist()
    e.unpersist()
    out
  }

  /**
   * Synchronous label propagation (community detection / weak-label
   * spreading), fixed iteration count, fully deterministic: labels
   * start as the node's own id, each round every node takes the label
   * with the highest (edge-multiplicity-weighted) count among its
   * neighbors, ties broken by the SMALLEST label — so the result is a
   * pure function of the multigraph, independent of partitioning.
   * Synchronous LPA can oscillate on bipartite structures; a fixed
   * small iteration count is the standard remedy and is what the
   * oracle unrolls.
   *
   * Scale: per round one keyed join (edges × labels on the neighbor
   * id) + one keyed aggregate + one keyed window. Same persist/
   * materialize/release discipline as [[pageRank]].
   *
   * Output: (node, label).
   */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iterations: Int = 2): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e0 = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
    // pre-partitioned on the join key (see pageRank): every round's
    // edge×label join reads the cached edges co-located
    val e = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("v"))
      .persist()
    var labels = e.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    var prev: DataFrame = null
    (1 to iterations).foreach { _ =>
      val counts = e
        .join(labels.withColumnRenamed("node", "__n"), col("v") === col("__n"))
        .groupBy(col("u"), col("label")).agg(count(lit(1)).as("__c"))
      // Per-node argmax (most frequent label, smallest label on ties)
      // as a min_by AGGREGATE, not a row_number window: a window
      // partition cannot be split, so a web-graph hub with millions of
      // distinct neighbor labels would funnel into one task; an
      // aggregate gets map-side partial combine and the hot key
      // reduces in parallel (same rewrite as Merger.bestPerTarget).
      // min of struct(-count, label) = max count, then min label —
      // lexicographic struct order keeps the tiebreak generic over
      // any orderable label type.
      val next = counts
        .groupBy(col("u"))
        .agg(min_by(col("label"),
          struct((-col("__c")).as("__nc"), col("label"))).as("label"))
        .select(col("u").as("node"), col("label"))
        .persist()
      next.count() // materialize before releasing the previous round
      if (prev != null) prev.unpersist()
      prev = next
      labels = next
    }
    e.unpersist()
    labels
  }

  /**
   * Exact per-node triangle counts on an undirected (multi)edge list —
   * the clustering-coefficient / community-density signal a web-graph
   * quality pipeline reads per host (spam farms are triangle-sparse;
   * organic link neighborhoods are triangle-dense).
   *
   * Semantics: the input is canonicalized to a SIMPLE undirected graph
   * (self-loops dropped, parallel/reversed duplicates collapse), and
   * each triangle {a,b,c} contributes 1 to each of its three corners.
   * Nodes in no triangle are absent from the output.
   *
   * Scale shape (the MapReduce triangle-counting result of Suri &
   * Vassilvitskii 2011, "Counting Triangles and the Curse of the Last
   * Reducer"): edges are ORIENTED from the endpoint with lower
   * (degree, id) to the higher, which bounds every node's out-degree
   * by O(sqrt(m)) — a 10M-degree web hub emits wedges from its
   * (small-out-degree) neighbors instead of pairing its own neighbor
   * list quadratically in one task. Wedge generation is then one
   * equi-join of the oriented list with itself on the middle vertex,
   * and triangle closure one left-semi equi-join back against the
   * oriented list; each triangle materializes exactly once (its
   * orientation-order is unique). Per-corner counts are a map-side-
   * combined aggregate over the exploded corners — no window, no
   * driver collect. The triangle SET is orientation-independent, so
   * the oracle can use the simpler id-order orientation and match
   * hash-exactly.
   *
   * Output: (node, triangles); the returned frame is persisted
   * (caller may unpersist after consuming), same contract as
   * [[pageRank]].
   */
  /**
   * Single-source (multi-source) shortest-path distances — unweighted
   * BFS over a directed edge list, the k-hop reachability primitive a
   * link-graph pipeline uses for "how far is this host from a trusted
   * seed set" (TrustRank-style distance features) and for bounded-hop
   * neighborhood extraction.
   *
   * Semantics: `dist(v)` = length of the shortest directed path from
   * any node in `sources` to `v`, computed to at most `maxIter` hops;
   * nodes unreached within the horizon are absent. Seeds themselves
   * have dist 0 (even seeds absent from the edge list). Parallel
   * edges collapse (BFS is multiplicity-blind).
   *
   * Scale shape: classic frontier-expansion iterative dataflow. The
   * deduplicated edge list is persisted PRE-PARTITIONED on src (see
   * [[pageRank]]); each hop is one co-located frontier×edges join, a
   * map-side-combined min aggregate on dst (hub-safe — no window), and
   * one anti-join against the settled set to keep only first-reached
   * nodes, so total work is O(E·depth) worst case and each frontier
   * only carries NEW nodes (monotone BFS, the Pregel frontier
   * discipline). Early exit on an empty frontier — the settled result
   * is already the fixpoint, so stopping early cannot change it.
   *
   * Oracle-exact: distances are integers; DuckDB reproduces them with
   * a depth-bounded recursive CTE (`UNION` dedup bounds expansion at
   * V×maxIter rows) and takes min per node.
   *
   * Output: (node, dist). The returned frame is persisted (caller may
   * unpersist after consuming), same contract as [[pageRank]].
   */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
                    sources: Seq[Long], maxIter: Int = 4): DataFrame = {
    require(sources.nonEmpty, "at least one source node")
    require(maxIter >= 1, "maxIter must be >= 1")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .repartition(col("src"))
      .persist()
    var settled = sources.distinct.toDF("node")
      .select(col("node"), lit(0L).as("dist"))
      .persist()
    settled.count()
    val pieces = scala.collection.mutable.ArrayBuffer(settled)
    var frontier = settled
    var hop = 1
    var done = false
    while (hop <= maxIter && !done) {
      val next = frontier
        .join(e, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg(min(col("dist") + lit(1L)).as("__nd"))
        .join(settled.select(col("node").as("__s")),
          col("dst") === col("__s"), "left_anti")
        .select(col("dst").as("node"), col("__nd").as("dist"))
        .persist()
      if (next.count() == 0L) { next.unpersist(); done = true }
      else {
        pieces += next
        settled = settled.unionAll(next)
        frontier = next
        hop += 1
      }
    }
    val out = pieces.map(p => p: DataFrame).reduce(_ unionAll _).persist()
    out.count()
    pieces.foreach(_.unpersist())
    e.unpersist()
    out
  }

  /**
   * Weighted shortest-path distances, bounded Bellman-Ford: after
   * `rounds` synchronous relaxations, `dist(v)` is the minimum-cost
   * path from any seed using at most `rounds` edges (the classic BF
   * invariant — an explicit, oracle-checkable semantics rather than
   * run-to-convergence). The weighted sibling of [[shortestPaths]]
   * for link costs / latency graphs; negative weights are rejected
   * (min over bounded-hop paths is still well-defined, but a negative
   * cycle makes "shortest" meaningless at convergence and no corpus
   * graph has negative link costs).
   *
   * Scale shape: parallel edges collapse to their min weight first
   * (one map-side-combined aggregate), the edge list persists
   * PRE-PARTITIONED on src, and each round is one co-located
   * dist×edges join plus one min aggregate over (settled ∪ relaxed) —
   * no window, no frontier bookkeeping (unlike BFS, a settled node's
   * distance can still improve, so every round relaxes every edge:
   * O(E·rounds) total, the textbook distributed BF).
   *
   * Output: (node, dist) for seeds and every node reachable within
   * the hop bound; persisted, caller may unpersist.
   */
  def weightedShortestPaths(edges: DataFrame, srcCol: String,
                            dstCol: String, weightCol: String,
                            sources: Seq[Long],
                            rounds: Int = 4): DataFrame = {
    require(sources.nonEmpty, "at least one source node")
    require(rounds >= 1, "rounds must be >= 1")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        col(weightCol).cast("long").as("w"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("w").isNotNull)
      .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
      .repartition(col("src"))
      .persist()
    val negs = e.filter(col("w") < 0).limit(1).collect()
    require(negs.isEmpty, s"negative edge weight: ${negs.headOption}")
    var dist = sources.distinct.toDF("node")
      .select(col("node"), lit(0L).as("dist"))
      .persist()
    dist.count()
    var prev = dist
    (1 to rounds).foreach { _ =>
      val relaxed = dist
        .join(e, col("node") === col("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      val next = dist.unionAll(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .persist()
      next.count()
      if (prev ne next) prev.unpersist()
      prev = next
      dist = next
    }
    e.unpersist()
    dist
  }

  /**
   * Bounded k-core peeling — the dense-subgraph extraction a link-graph
   * pipeline uses to find tightly-knit communities (and, inverted, to
   * flag low-engagement fringe hosts): repeatedly drop every node whose
   * degree in the CURRENT subgraph is < k. After `maxRounds` synchronous
   * peel rounds the survivors are exactly the nodes the bounded
   * iteration keeps (the classic monotone-peel invariant — once the
   * round drops nothing the fixpoint is reached, so early exit cannot
   * change the result, mirroring [[shortestPaths]]).
   *
   * Semantics: the input canonicalizes to a SIMPLE undirected graph
   * (self-loops dropped, parallel/reversed duplicates collapse — the
   * [[triangleCount]] convention). Output is (node, deg) where `deg` is
   * the node's degree in the edge set left after the bounded peel
   * (nodes the peel isolated are absent — they'd fall next round
   * anyway); at convergence all degrees are ≥ k (the k-core), before
   * convergence they are the bounded-round state the oracle unrolls.
   *
   * Scale shape: each round is ONE map-side-combined degree aggregate
   * over the exploded endpoints plus two left-semi joins inducing the
   * surviving edge set — no window, no driver collect; a web-scale hub
   * reduces its degree count in parallel. Edges persist per round and
   * release after the next round materializes (the [[pageRank]] loop
   * discipline). Total work O(E·rounds).
   *
   * Output: (node, deg); persisted, caller may unpersist.
   */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
            k: Int, maxRounds: Int = 8): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxRounds >= 1, "maxRounds must be >= 1")
    var e = edges
      .select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .filter(col("__s").isNotNull && col("__d").isNotNull &&
        col("__s") =!= col("__d"))
      .select(least(col("__s"), col("__d")).as("a"),
        greatest(col("__s"), col("__d")).as("b"))
      .distinct()
      .persist()
    var nEdges = e.count()
    var round = 0
    var done = nEdges == 0L
    var deg: DataFrame = degrees(e)
    while (round < maxRounds && !done) {
      // survivors persist for the round: BOTH joins read them, and
      // without the cache each branch would recompute the full degree
      // aggregate (node-cardinality rows — cheap to hold, costly to
      // recompute twice per round at corpus scale)
      val keep = deg.filter(col("deg") >= k).select(col("node")).persist()
      // SALTED inner joins, not plain semi-joins: a web hub's edges all
      // carry the same endpoint key, and when the planner picks a
      // shuffle join (AQE's skew split only fires on sort-merge above
      // its size thresholds — a few-MB hot partition stays whole) the
      // hub's whole edge list funnels into one task. `keep` is
      // distinct on the key, so the salted inner join is row-for-row
      // the semi-join; stress scenario 8 pins the no-funnel behavior.
      val induced = graft.operators.SkewJoin.salted(
        graft.operators.SkewJoin.salted(
          e, keep.select(col("node").as("a")), Seq("a"), saltFactor = 8),
        keep.select(col("node").as("b")), Seq("b"), saltFactor = 8)
        .select(col("a"), col("b"))
        .persist()
      val n = induced.count()
      keep.unpersist()
      if (n == nEdges) { induced.unpersist(); done = true }
      else {
        e.unpersist()
        e = induced
        nEdges = n
        deg = degrees(e)
        round += 1
        done = nEdges == 0L
      }
    }
    val out = deg.persist()
    out.count()
    e.unpersist()
    out
  }

  /** Degree per endpoint of a simple undirected edge list (a, b) — one
    * map-side-combined aggregate over the exploded corners. */
  private def degrees(e: DataFrame): DataFrame =
    e.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

  /**
   * Local clustering coefficient — per-node neighborhood density on
   * the simple undirected graph, the standard organic-vs-spam link
   * texture signal ([[triangleCount]]'s per-node normalization):
   *
   *   cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)),  0 when deg(v) < 2
   *
   * Both inputs are exact integers (triangles via the degree-oriented
   * wedge join, degree via one aggregate), and the final value is ONE
   * IEEE long/long division — engine-exact with no rounding grid
   * needed (the q_transitions convention). Every node of the simple
   * graph appears, triangle-free nodes with tri = 0.
   *
   * Output: (node, deg, triangles, coeff); persisted, caller may
   * unpersist.
   */
  def clusteringCoefficient(edges: DataFrame, srcCol: String,
                            dstCol: String): DataFrame = {
    val und = edges
      .select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .filter(col("__s").isNotNull && col("__d").isNotNull &&
        col("__s") =!= col("__d"))
      .select(least(col("__s"), col("__d")).as("a"),
        greatest(col("__s"), col("__d")).as("b"))
      .distinct()
      .persist()
    und.count() // materialize: read by both the degree and triangle legs
    val tri = triangleCount(und, "a", "b")
    val out = degrees(und)
      .join(tri.withColumnRenamed("node", "__tn"),
        col("node") === col("__tn"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("deg") < 2, lit(0.0))
          .otherwise(lit(2.0) * coalesce(col("triangles"), lit(0L)) /
            (col("deg") * (col("deg") - lit(1L)))).as("coeff"))
      .persist()
    out.count()
    tri.unpersist()
    und.unpersist()
    out
  }

  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .filter(col("__s").isNotNull && col("__d").isNotNull &&
        col("__s") =!= col("__d"))
      .select(least(col("__s"), col("__d")).as("a"),
        greatest(col("__s"), col("__d")).as("b"))
      .distinct()
    // total order (degree, id): orient a->b iff a precedes b under it.
    // The degree lookups are SALTED joins (the kCore rationale): every
    // edge of a 10M-degree hub carries the same endpoint key, and a
    // shuffle-join plan would funnel them into one task — deg is
    // unique per node, so salted inner ≡ the plain join row-for-row.
    val deg = und.select(col("a").as("n")).unionAll(und.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val oriented = graft.operators.SkewJoin.salted(
      graft.operators.SkewJoin.salted(
        und, deg.select(col("n").as("a"), col("d").as("da")),
        Seq("a"), saltFactor = 8),
      deg.select(col("n").as("b"), col("d").as("db")),
      Seq("b"), saltFactor = 8)
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("x"), col("b").as("y")))
          .otherwise(struct(col("b").as("x"), col("a").as("y"))).as("e"))
      .select(col("e.x").as("x"), col("e.y").as("y"))
      .persist()
    oriented.count() // materialize once; read three times below
    val wedges = oriented
      .join(oriented.select(col("x").as("y"), col("y").as("z")), "y")
    val triangles = wedges
      .join(oriented.select(col("x"), col("y").as("z")), Seq("x", "z"), "left_semi")
    val counts = triangles
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
      .persist()
    counts.count() // materialize before releasing the oriented list
    oriented.unpersist()
    counts
  }
}
