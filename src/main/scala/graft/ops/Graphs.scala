package graft.ops

import org.apache.spark.sql.DataFrame
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
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct().persist()
    val eDeg = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
      .persist()
    var rank = nodes.select(col("node"), lit(1.0).as("rank"))
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
          round(lit(base) + lit(damping) *
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
}
