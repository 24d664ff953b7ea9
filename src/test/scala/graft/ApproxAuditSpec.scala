package graft

import org.apache.spark.sql.functions._

import graft.operators.Audits
import graft.ops.TextAnalysis
import graft.sources.ShardWriter

/** The scale-path audit (sketches) and the shard-export sink. */
class ApproxAuditSpec extends SparkSpec {

  private lazy val lineitem = spark.read.parquet(s"$sf0001/lineitem.parquet")
  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("approx profile distinct estimates land within the stated rsd") {
    val prof = Audits.approxProfile(lineitem,
      Seq("l_orderkey", "l_shipdate", "l_quantity"), rsd = 0.05).head()
    def exact(c: String): Long =
      lineitem.select(col(c)).distinct().count()
    Seq("l_orderkey", "l_shipdate", "l_quantity").foreach { c =>
      val est = prof.getAs[Long](s"${c}__approx_distinct").toDouble
      val ex = exact(c).toDouble
      assert(math.abs(est - ex) / ex <= 0.15, // 3x rsd headroom
        s"$c: approx $est vs exact $ex")
    }
  }

  test("approx percentiles bracket the exact medians") {
    val prof = Audits.approxProfile(lineitem, Seq("l_quantity")).head()
    val ps = prof.getSeq[Double](prof.fieldIndex("l_quantity__percentiles"))
    val exact = lineitem.stat.approxQuantile("l_quantity",
      Array(0.25, 0.5, 0.75), 0.0) // relativeError 0 = exact
    ps.zip(exact).foreach { case (approx, ex) =>
      assert(math.abs(approx - ex) <= math.max(1.0, ex * 0.05),
        s"percentile approx $approx vs exact $ex")
    }
  }

  test("shard export partitions by split, bounds files, and round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val withSplit = docs.withColumn("split",
      TextAnalysis.assignSplit(col("doc_id"), 0.8, 0.1))
    ShardWriter.writeShards(withSplit, dir, "split", "doc_id",
      shardsPerSplit = 4, maxRecordsPerFile = 50)

    // nested (split, shard) partition directories exist
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs.contains("split=train"))
    val shardDirs = new java.io.File(s"$dir/split=train")
      .listFiles().filter(_.isDirectory)
    assert(shardDirs.nonEmpty && shardDirs.forall(_.getName.startsWith("shard=")))

    // every data file respects the record bound
    val trainFiles = shardDirs.flatMap(
      _.listFiles().filter(_.getName.endsWith(".parquet")))
    assert(trainFiles.nonEmpty)
    trainFiles.foreach { f =>
      val n = spark.read.parquet(f.getAbsolutePath).count()
      assert(n <= 50, s"${f.getName} has $n rows > maxRecordsPerFile")
    }

    // shard-directory membership is a pure function of the id
    val withShard = spark.read.parquet(dir)
      .select(col("doc_id"), col("shard").cast("int").as("shard"))
    val expected = withSplit.select(col("doc_id"),
      pmod(hash(col("doc_id")), lit(4)).as("shard"))
    assert(withShard.exceptAll(expected).isEmpty &&
      expected.exceptAll(withShard).isEmpty)

    // exact round trip of rows (ids and split labels)
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    val orig = withSplit.select("doc_id", "split")
    assert(back.select("doc_id", "split").exceptAll(orig).isEmpty &&
      orig.exceptAll(back.select("doc_id", "split")).isEmpty)
  }

  test("distinct sketches: mergeable, order-invariant, parquet-persistable") {
    import graft.operators.Audits
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = (0 until 20000).map { i =>
      (if (i % 2 == 0) "a" else "b", (i % 3000).toLong)
    }
    val df = rows.toDF("grp", "uid")
    val whole = Audits.distinctSketches(df, Seq("grp"), "uid")
    val est = Audits.rollupSketches(whole, Seq("grp"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // within the HLL error bound of the exact distinct (1500 per group)
    est.values.foreach(e =>
      assert(math.abs(e - 1500) < 1500 * 0.05, s"estimate $e vs 1500"))
    // union of the halves == sketching the whole (register-exact)
    val h1 = Audits.distinctSketches(
      df.filter($"uid" % 2 === 0), Seq("grp"), "uid")
    val h2 = Audits.distinctSketches(
      df.filter($"uid" % 2 =!= 0), Seq("grp"), "uid")
    val merged = Audits.rollupSketches(h1.unionByName(h2), Seq("grp"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(merged == est)
    // row order / partition layout cannot change the registers
    val shuffled = Audits.rollupSketches(
      Audits.distinctSketches(df.repartition(13), Seq("grp"), "uid"),
      Seq("grp")).as[(String, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(shuffled == est)
    // persist the sketch table, roll up from the files
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sketches").toString
    whole.write.mode("overwrite").parquet(dir)
    val fromDisk = Audits.rollupSketches(
      spark.read.parquet(dir), Seq("grp"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(fromDisk == est)
    // grand total from the PERSISTED per-group sketches
    val total = Audits.rollupSketches(spark.read.parquet(dir), Nil)
      .as[(Long, Long)].collect().head
    assert(total._1 == 20000 && math.abs(total._2 - 3000) < 3000 * 0.05)
    // empty input: a sketch table with no rows rolls up to no rows
    // (grouped) — the caller sees absence, not a fabricated zero
    val empty = Audits.distinctSketches(
      df.filter($"uid" < 0), Seq("grp"), "uid")
    assert(Audits.rollupSketches(empty, Seq("grp")).count() == 0)
  }

  test("quantile histograms: exact merge, α bound, sign buckets, layout") {
    import spark.implicits._
    val alpha = 0.02
    // skewed positives: 1..4000 with a heavy tail
    val rows = (1 to 4000).map(i =>
      (if (i % 2 == 0) "a" else "b", (i.toLong * i) % 9973 + 1))
    val df = rows.toDF("grp", "v")
    val whole = Audits.quantileHistogram(df, Seq("grp"), "v", alpha)
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    def rollMap(h: org.apache.spark.sql.DataFrame) =
      Audits.rollupQuantiles(h, Seq("grp"), qs, alpha)
        .as[(String, Double, Long, Double)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val est = rollMap(whole)
    // every estimate within α relative error of the EXACT quantile
    // (the walk picks the ⌈q·n⌉-th value's bucket; midpoint decode is
    // within α of anything in the bucket)
    for (grp <- Seq("a", "b"); q <- qs) {
      val vals = rows.filter(_._1 == grp).map(_._2).sorted
      val exact = vals(math.max(1, math.ceil(q * vals.size).toInt) - 1)
      val (n, e) = est((grp, q))
      assert(n == vals.size)
      assert(math.abs(e - exact) / exact <= alpha + 1e-9,
        s"$grp q=$q: $e vs exact $exact")
    }
    // histogram-of-halves merges EXACTLY to the whole (long-sum union,
    // not estimate arithmetic) and layout cannot change anything
    val h1 = Audits.quantileHistogram(
      df.filter($"v" % 2 === 0), Seq("grp"), "v", alpha)
    val h2 = Audits.quantileHistogram(
      df.filter($"v" % 2 =!= 0), Seq("grp"), "v", alpha)
    assert(rollMap(h1.unionByName(h2)) == est)
    assert(rollMap(Audits.quantileHistogram(
      df.repartition(13), Seq("grp"), "v", alpha)) == est)
    // zero and negative values keep the bucket order: the median of a
    // symmetric {-100..100} set is the zero bucket, q→0/1 hit the ends
    val sym = (-100L to 100L).map(v => ("s", v)).toDF("grp", "v")
    val symEst = rollMap(Audits.quantileHistogram(sym, Seq("grp"), "v", alpha))
      .map { case ((_, q), (_, e)) => q -> e }
    assert(symEst(0.5) == 0.0, symEst.toString)
    assert(symEst(0.1) < 0 && symEst(0.99) > 0)
    // exact 0.99-quantile of -100..100 is the 199th value = 98
    assert(math.abs(symEst(0.99) - 98.0) / 98.0 <= alpha + 1e-9)
    // the histogram is a plain parquet artifact: roll up from disk
    val dir = java.nio.file.Files
      .createTempDirectory("graft_qhist").toString
    whole.write.mode("overwrite").parquet(dir)
    assert(rollMap(spark.read.parquet(dir)) == est)
    // grand total from the persisted per-group table
    val tot = Audits.rollupQuantiles(
      spark.read.parquet(dir), Nil, Seq(0.5), alpha)
      .as[(Double, Long, Double)].collect().head
    assert(tot._2 == 4000)
  }

  test("expectation suite: one pass, every rule kind, exact counts") {
    import spark.implicits._
    import Audits.Expect._
    val df = Seq(
      (Some(1L), "click", Some(5.0), "a@x.io"),
      (Some(1L), "view", Some(-2.0), "bad"),
      (None, "  ", None, null),
      (Some(3L), "Purchase9", Some(999.0), "c@y.io")
    ).toDF("id", "kind", "v", "email")
    val r = Audits.expectations(df, Seq(
      NotNull("id"), NonBlank("kind"), Unique(Seq("id")),
      Between("v", 0.0, 500.0), Matches("kind", "^[a-z_]+$"),
      InSet("kind", Seq("click", "view")),
      Holds("email_at", col("email").contains("@"))))
      .as[(String, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(r("not_null:id") == ((4L, 1L, 0)))
    assert(r("non_blank:kind") == ((4L, 1L, 0)))
    // ids {1,1,null,3}: 3 distinct tuples (null groups), 1 extra row
    assert(r("unique:id") == ((4L, 1L, 0)))
    assert(r("between:v") == ((4L, 2L, 0))) // -2 and 999; null exempt
    assert(r("matches:kind") == ((4L, 2L, 0))) // "  " and "Purchase9"
    assert(r("in_set:kind") == ((4L, 2L, 0)))
    // null email: predicate null → coalesce(false) → violation
    assert(r("holds:email_at") == ((4L, 2L, 0)))
    // a clean table passes everything
    val ok = Audits.expectations(
      Seq((1L, "click"), (2L, "view")).toDF("id", "kind"),
      Seq(NotNull("id"), Unique(Seq("id")), InSet("kind",
        Seq("click", "view"))))
      .as[(String, Long, Long, Int)].collect()
    assert(ok.forall(t => t._3 == 0L && t._4 == 1))
    // the suite is ONE aggregate: no join/window in the plan
    val plan = Audits.expectations(df, Seq(NotNull("id"),
      Unique(Seq("id")))).queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan)
  }

  test("cms sketches: upper bound, exact merge, rollup, layout") {
    import spark.implicits._
    val rows = (1 to 200).flatMap(i =>
      Seq.fill(i % 7 + 1)((i.toLong, if (i % 2 == 0) "a" else "b")))
    val df = rows.toDF("k", "g")
    val cms = Audits.cmsHistogram(df, Seq("g"), "k", depth = 4, width = 64)
    val total = Audits.rollupCms(cms, Nil)
    val truth = rows.groupBy(_._1).map { case (k, v) => k.toString -> v.size }
    val est = Audits.cmsEstimate(total, truth.keys.toSeq.sorted,
      width = 64).as[(String, Long)].collect().toMap
    // CMS is a one-sided bound: est >= truth, always
    truth.foreach { case (k, n) => assert(est(k) >= n, s"$k: ${est(k)} < $n") }
    // wide sketch ⇒ exact counts (no collisions among 5 keys)
    val cmsWide = Audits.cmsHistogram(
      df.filter(col("k") <= 5), Seq("g"), "k", depth = 4, width = 4096)
    val estW = Audits.cmsEstimate(Audits.rollupCms(cmsWide, Nil),
      Seq("1", "2", "3", "4", "5"), width = 4096)
      .as[(String, Long)].collect().toMap
    (1 to 5).foreach(i => assert(estW(i.toString) == truth(i.toString)))
    // exact mergeability: sketch parts, sum counters == sketch whole
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select(col("j"), col("bucket"), col("cnt"))
        .as[(Int, Long, Long)].collect().toSet
    val parts = Audits.rollupCms(
      Audits.cmsHistogram(df.filter(col("k") % 2 === 0), Seq("g"), "k",
        width = 64)
        .unionByName(Audits.cmsHistogram(df.filter(col("k") % 2 === 1),
          Seq("g"), "k", width = 64)), Nil)
    assert(canon(parts) == canon(total))
    // absent probe key reads the collision floor (>= 0), never fails
    assert(Audits.cmsEstimate(total, Seq("no_such_key"), width = 64)
      .as[(String, Long)].collect().head._2 >= 0L)
    // layout invariance
    val est2 = Audits.cmsEstimate(
      Audits.rollupCms(Audits.cmsHistogram(df.repartition(7), Seq("g"),
        "k", depth = 4, width = 64), Nil), truth.keys.toSeq.sorted,
      width = 64).as[(String, Long)].collect().toMap
    assert(est2 == est)
  }
}
