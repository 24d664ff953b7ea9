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

  test("incremental components equal the full recompute (batch folds in)") {
    import spark.implicits._
    // old graph: {1,2,3} and {10,11}, singleton-by-self-loop 50;
    // batch: bridges 3-10 (merges the two old components), adds a
    // fresh component {20,21}, and leaves 50 untouched
    val old = Seq((1L, 2L), (2L, 3L), (10L, 11L), (50L, 50L))
    val batch = Seq((3L, 10L), (20L, 21L))
    def cc(pairs: Seq[(Long, Long)]) =
      Clusters.connectedComponents(pairs.toDF("id_a", "id_b"),
        "id_a", "id_b").as[(Long, Long)].collect().toMap
    val assign = Clusters.connectedComponents(old.toDF("id_a", "id_b"),
      "id_a", "id_b")
    val inc = Clusters.incrementalComponents(assign,
      batch.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val full = cc(old ++ batch)
    assert(inc == full, s"incremental $inc vs full $full")
    assert(inc(11L) == 1L && inc(50L) == 50L && inc(21L) == 20L)
    // second generation: incremental-of-incremental still exact
    val inc2 = Clusters.incrementalComponents(
      Clusters.incrementalComponents(assign, batch.toDF("id_a", "id_b"),
        "id_a", "id_b"),
      Seq((21L, 50L)).toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(inc2 == cc(old ++ batch ++ Seq((21L, 50L))))
    assert(inc2(50L) == 20L)
  }

  test("frequent pairs: counts, rules, basket cap; target encode shrinks") {
    import spark.implicits._
    import graft.ops.Features
    // baskets: b1{x,y,z}, b2{x,y}, b3{x,z}, b4 mega (cap-excluded)
    val rows = Seq((1L, "x"), (1L, "y"), (1L, "z"), (1L, "x"), // dup row
      (2L, "x"), (2L, "y"), (3L, "x"), (3L, "z")) ++
      (1 to 50).map(i => (9L, s"m$i"))
    val out = Features.frequentPairs(rows.toDF("b", "i"), "b", "i",
      minPairCount = 1, maxBasketSize = 10)
      .as[(String, String, Long, Long, Long, Double, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // N=3 kept baskets; x in 3, y in 2, z in 2; xy in 2, xz in 2, yz in 1
    val xy = out(("x", "y"))
    assert(xy._3 == 2L && xy._4 == 3L && xy._5 == 2L)
    assert(xy._6 == math.rint(2.0 / 3.0 * 1e6) / 1e6 ||
      math.abs(xy._6 - 0.666667) < 1e-9)
    assert(xy._7 == math.rint(2.0 / 3.0 * 1e6) / 1e6 ||
      math.abs(xy._7 - 0.666667) < 1e-9)
    assert(xy._8 == 1.0) // 2/2
    assert(xy._9 == 1.0) // 2*3/(3*2)
    assert(out(("y", "z"))._3 == 1L)
    // the mega basket contributed nothing
    assert(!out.keys.exists { case (a, b) =>
      a.startsWith("m") || b.startsWith("m") })
    // minPairCount filters the yz pair
    val filtered = Features.frequentPairs(rows.toDF("b", "i"), "b", "i",
      minPairCount = 2, maxBasketSize = 10)
      .as[(String, String, Long, Long, Long, Double, Double, Double, Double)]
      .collect().map(r => (r._1, r._2)).toSet
    assert(filtered == Set(("x", "y"), ("x", "z")))

    // target encoding: cat a has mean 10 over 2 rows, b has 40 over 1;
    // prior = 20; m=2 → enc(a) = (20 + 2*20)/(2+2) = 15,
    // enc(b) = (40 + 2*20)/(1+2) = 26.666667
    val te = Features.targetEncode(
      Seq(("a", 10.0), ("a", 10.0), ("b", 40.0)).toDF("cat", "y"),
      "cat", "y", m = 2.0)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(te("a") == (("a", 2L, 15.0)))
    assert(te("b")._3 == 26.666667)
  }

  test("majorityVote: winner, smallest-label tie-break, agreement") {
    import spark.implicits._
    import graft.ops.Features
    val ratings = Seq[(java.lang.Long, java.lang.Long, String)](
      // item 1: b wins 2-1
      (1L, 10L, "b"), (1L, 11L, "b"), (1L, 12L, "a"),
      // item 2: a/b tie 2-2 -> smallest label a
      (2L, 10L, "b"), (2L, 11L, "a"), (2L, 12L, "b"), (2L, 13L, "a"),
      // item 3: unanimous
      (3L, 10L, "c"),
      // nulls drop
      (4L, 10L, null), (null, 10L, "a"))
      .toDF("item", "annot", "label")
    val out = Features.majorityVote(ratings, "item", "annot", "label")
      .as[(Long, String, Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, "b", 2L, 3L, 2L, 0.666667)))
    assert(out(2L) == ((2L, "a", 2L, 4L, 2L, 0.5)))
    assert(out(3L) == ((3L, "c", 1L, 1L, 1L, 1.0)))
    assert(!out.contains(4L))
  }

  test("fleissKappa: Fleiss 1971 worked example; degenerate cases") {
    import spark.implicits._
    import graft.ops.Features
    // the classic 10-subject / 14-rater / 5-category table
    // (Fleiss 1971, table 1): published kappa = 0.210
    val table = Seq(
      Seq(0, 0, 0, 0, 14), Seq(0, 2, 6, 4, 2), Seq(0, 0, 3, 5, 6),
      Seq(0, 3, 9, 2, 0), Seq(2, 2, 8, 1, 1), Seq(7, 7, 0, 0, 0),
      Seq(3, 2, 6, 3, 0), Seq(2, 5, 3, 2, 2), Seq(6, 5, 2, 1, 0),
      Seq(0, 2, 2, 3, 7))
    val rows = for {
      (cats, i) <- table.zipWithIndex
      (c, j) <- cats.zipWithIndex
      r <- 0 until c
    } yield (i.toLong, (j * 100 + r).toLong, s"cat$j")
    val out = Features.fleissKappa(rows.toDF("item", "annot", "label"),
      "item", "annot", "label")
      .as[(Long, Long, Long, Double, Double, Double)].collect()(0)
    assert(out._1 == 10L && out._2 == 5L && out._3 == 140L)
    assert(math.abs(out._4 - 0.378021978) < 1e-6) // P-bar = 688/1820
    assert(math.abs(out._5 - 0.212755102) < 1e-6) // P-e
    assert(math.abs(out._6 - 0.209930700) < 1e-5) // kappa (pub. 0.210)
    // single category: P_e = 1 -> kappa undefined (null), not 1.0
    val one = Features.fleissKappa(
      Seq((1L, 1L, "x"), (1L, 2L, "x"), (2L, 1L, "x"), (2L, 2L, "x"))
        .toDF("item", "annot", "label"), "item", "annot", "label")
    assert(one.collect()(0).isNullAt(5))
  }

  test("krippendorffAlpha: reference formula, missing data, degenerates") {
    import spark.implicits._
    import graft.ops.Features
    // in-test reference computation (coincidence-matrix identities)
    def ref(rows: Seq[(Long, Long, String)]): (Long, Long, Long, Double) = {
      val byUnit = rows.groupBy(_._1).map { case (_, rs) =>
        rs.groupBy(_._3).map(_._2.size.toLong).toSeq
      }.filter(_.sum >= 2).toSeq
      val n = byUnit.map(_.sum).sum
      val so = byUnit.map(cs =>
        cs.map(c => c * (c - 1)).sum.toDouble / (cs.sum - 1)).sum
      val pairUnits = rows.groupBy(_._1)
        .filter(_._2.size >= 2)
      val nc = pairUnits.values.flatten.groupBy(_._3)
        .map(_._2.size.toLong)
      val se = nc.map(c => c * (c - 1)).sum
      val dO = 1.0 - so / n
      val dE = 1.0 - se.toDouble / (n.toDouble * (n - 1))
      (pairUnits.size.toLong, nc.size.toLong, n, 1.0 - dO / dE)
    }
    // missing data: unit 3 rated once (excluded), varied raters/unit
    val rows = Seq(
      (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "b"),
      (2L, 1L, "b"), (2L, 2L, "b"),
      (3L, 1L, "a"),
      (4L, 1L, "a"), (4L, 2L, "a"), (4L, 3L, "a"), (4L, 4L, "c"))
    val out = Features.krippendorffAlpha(rows.toDF("item", "annot", "label"),
      "item", "annot", "label")
      .as[(Long, Long, Long, Double, Double, Double)].collect()(0)
    val (units, cats, n, alpha) = ref(rows)
    assert(out._1 == units && out._2 == cats && out._3 == n)
    assert(math.abs(out._6 - alpha) < 1e-6)
    // perfect agreement -> alpha 1
    val perfect = Seq((1L, 1L, "x"), (1L, 2L, "x"),
      (2L, 1L, "y"), (2L, 2L, "y"))
    val p = Features.krippendorffAlpha(
      perfect.toDF("item", "annot", "label"), "item", "annot", "label")
      .collect()(0)
    assert(p.getDouble(5) == 1.0)
    // one category -> D_e = 0 -> alpha NULL
    val mono = Seq((1L, 1L, "x"), (1L, 2L, "x"))
    assert(Features.krippendorffAlpha(
      mono.toDF("item", "annot", "label"), "item", "annot", "label")
      .collect()(0).isNullAt(5))
  }

  test("preferencePairs: strict gaps only, max-score dedup, group cap") {
    import spark.implicits._
    import graft.ops.Features
    val df = Seq(
      // group 1: a=3, b=2, c=2 -> (a,b),(a,c); b/c tie emits nothing
      (1L, "a", 3.0), (1L, "b", 2.0), (1L, "c", 2.0),
      // group 1: duplicate a row with lower score collapses to max 3
      (1L, "a", 1.0),
      // group 2: single item -> no pairs
      (2L, "z", 5.0))
      .toDF("g", "item", "score")
    val out = Features.preferencePairs(df, "g", "item", "score")
      .as[(Long, String, String, Double)].collect().toSet
    assert(out == Set((1L, "a", "b", 1.0), (1L, "a", "c", 1.0)))
    // a mega group is excluded before the self-join
    val mega = (0 until 50).map(i => (9L, s"i$i", i.toDouble))
    val capped = Features.preferencePairs(
      (df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        ++ mega).toSeq.toDF("g", "item", "score"),
      "g", "item", "score", maxGroupSize = 10)
      .as[(Long, String, String, Double)].collect()
    assert(!capped.exists(_._1 == 9L) && capped.length == 2)
  }

  test("winRates: orientation, counts, Wilson bound vs direct formula") {
    import spark.implicits._
    import graft.ops.Features
    // B beats A 3x, A beats B 1x -> pair (A,B): wins_a=1, wins_b=3
    val pr = Seq(("B", "A"), ("B", "A"), ("B", "A"), ("A", "B"))
      .toDF("w", "l")
    val out = Features.winRates(pr, "w", "l")
      .as[(String, String, Long, Long, Long, Double, Double)].collect()
    assert(out.length == 1)
    val r = out(0)
    assert((r._1, r._2, r._3, r._4, r._5) == (("A", "B", 1L, 3L, 4L)))
    assert(r._6 == 0.25)
    val z = 1.96; val z2 = z * z; val n = 4.0; val p = 0.25
    val lb = (p + z2 / (2 * n) -
      z * math.sqrt((p * (1.0 - p) + z2 / (4 * n)) / n)) / (1.0 + z2 / n)
    assert(r._7 == math.rint(lb * 1e9) / 1e9 || math.abs(r._7 - lb) < 1e-9)
    // the lower bound prices uncertainty: below the raw rate
    assert(r._7 < r._6 && r._7 > 0.0)
  }

  test("bradleyTerry: transitive order, symmetry, smoothing floor") {
    import spark.implicits._
    import graft.ops.Features
    // A beats B 3-0, B beats C 3-0, A beats C 3-0
    val pr = Seq.fill(3)(("A", "B")) ++ Seq.fill(3)(("B", "C")) ++
      Seq.fill(3)(("A", "C"))
    val out = Features.bradleyTerry(pr.toDF("w", "l"), "w", "l",
      iterations = 2)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("A")._2 == 6L && out("A")._3 == 6L)
    assert(out("B")._2 == 3L && out("B")._3 == 6L)
    assert(out("C")._2 == 0L && out("C")._3 == 6L)
    assert(out("A")._4 > out("B")._4 && out("B")._4 > out("C")._4)
    // zero-win item keeps a strictly positive (smoothed) strength
    assert(out("C")._4 > 0.0)
    // L1-normalized
    assert(math.abs(out.values.map(_._4).sum - 1.0) < 1e-6)
    // perfectly symmetric record -> equal strengths 0.5 each
    val sym = Features.bradleyTerry(
      Seq(("X", "Y"), ("Y", "X"), ("X", "Y"), ("Y", "X")).toDF("w", "l"),
      "w", "l", iterations = 2)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(sym("X") == 0.5 && sym("Y") == 0.5)
    // layout invariance: same result from a different partitioning
    val re = Features.bradleyTerry(pr.toDF("w", "l").repartition(7),
      "w", "l", iterations = 2)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(re == out)
  }
}
