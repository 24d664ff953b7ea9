package graft

import org.apache.spark.sql.functions._

import graft.ops.Clusters

/** Connected-components clustering: algorithm vs a brute-force
  * union-find oracle on adversarial and random graphs. */
class ClustersSpec extends SparkSpec {

  // brute-force union-find ground truth
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // min-id representative regardless of union order
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.values.flatMap(ns => { val m = ns.min; ns.map(_ -> m) }).toMap
  }

  // driverFinishLimit = 0 forces the distributed star rounds — the
  // path under test; the adaptive driver finish is covered separately
  private def run(edges: Seq[(Long, Long)],
                  driverFinishLimit: Long = 0L): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("id_a", "id_b")
    Clusters.connectedComponents(df, "id_a", "id_b",
        driverFinishLimit = driverFinishLimit)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("path graph (adversarial diameter) collapses to one min-rooted cluster") {
    val n = 200L
    val path = (0L until n - 1).map(i => (i, i + 1))
    val got = run(scala.util.Random.shuffle(path))
    assert(got.size == n)
    assert(got.values.forall(_ == 0L))
  }

  test("disjoint stars, chains and cliques match union-find") {
    val edges = Seq[(Long, Long)](
      (10, 11), (10, 12), (10, 13),            // star rooted at 10
      (20, 21), (21, 22), (22, 23),            // chain
      (30, 31), (30, 32), (31, 32),            // clique
      (40, 41), (41, 40),                      // duplicate + reversed
      (50, 50),                                // self-loop-only → singleton
      (60, 61)
    )
    val got = run(edges)
    val want = ufComponents(edges.filter(e => e._1 != e._2)) + (50L -> 50L)
    assert(got == want)
  }

  test("self-loop-only nodes are singleton clusters; mixed nodes not duplicated") {
    import spark.implicits._
    // node 2 has both a real edge and a self loop — must appear ONCE
    // with its component min; node 5 only self-loops — singleton
    val pairs = Seq((1L, 2L), (2L, 2L), (5L, 5L)).toDF("id_a", "id_b")
    val out = Clusters.connectedComponents(pairs, "id_a", "id_b")
    assert(out.count() == 3)
    assert(out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 5L -> 5L))
    // string surrogate path honors the same contract
    val sPairs = Seq(("a", "b"), ("z", "z")).toDF("id_a", "id_b")
    assert(Clusters.connectedComponents(sPairs, "id_a", "id_b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap ==
      Map("a" -> "a", "b" -> "a", "z" -> "z"))
  }

  test("random graphs match union-find (property)") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val n = 60
      val edges = (1 to 80).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      assert(run(edges) == ufComponents(edges))
    }
  }

  test("adaptive driver finish equals the distributed result") {
    val rnd = new scala.util.Random(11)
    val edges = (1 to 120).map(_ =>
      (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong)).filter(e => e._1 != e._2)
    assert(run(edges, driverFinishLimit = 1L << 20) == ufComponents(edges))
    // and with a limit small enough that star rounds run first
    assert(run(edges, driverFinishLimit = 10L) == ufComponents(edges))
  }

  test("empty pair set yields empty assignment") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Clusters.connectedComponents(empty, "id_a", "id_b").count() == 0)
  }

  test("dedupByPairs keeps min representative plus unpaired rows; dropped is the complement") {
    import spark.implicits._
    val docs = (0L to 9L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 3L), (3L, 5L), (7L, 8L)).toDF("id_a", "id_b")
    val kept = Clusters.dedupByPairs(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L, 2L, 4L, 6L, 7L, 9L))
    val dropped = Clusters.droppedByPairs(docs, "doc_id", pairs)
      .select(col("doc_id"), col("cluster_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dropped == Map(3L -> 1L, 5L -> 1L, 8L -> 7L))
  }

  test("string ids cluster via the order-preserving surrogate path") {
    import spark.implicits._
    val pairs = Seq(("doc-b", "doc-c"), ("doc-c", "doc-a"), ("x", "y"))
      .toDF("id_a", "id_b")
    val got = Clusters.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // representative = lexicographic min of the component
    assert(got == Map("doc-a" -> "doc-a", "doc-b" -> "doc-a",
      "doc-c" -> "doc-a", "x" -> "x", "y" -> "x"))
    assert(Clusters.connectedComponents(pairs, "id_a", "id_b")
      .schema("id").dataType == org.apache.spark.sql.types.StringType)
  }

  test("id type is preserved (int ids)") {
    import spark.implicits._
    val pairs = Seq((1, 2), (2, 3)).toDF("id_a", "id_b")
    val out = Clusters.connectedComponents(pairs, "id_a", "id_b")
    assert(out.schema("id").dataType == org.apache.spark.sql.types.IntegerType)
    assert(out.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap ==
      Map(1 -> 1, 2 -> 1, 3 -> 1))
  }
}
