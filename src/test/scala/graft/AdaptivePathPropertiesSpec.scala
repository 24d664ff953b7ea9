package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Fuzzy, Merger}
import graft.ops.TextDedup

/**
 * Property checks for the round-2 adaptive/dual-path operators: each
 * pair of physical strategies must be OBSERVATIONALLY IDENTICAL — the
 * dispatch is a plan decision, never a semantics decision. Generators
 * are sampled with deterministic seeds (scalatestplus isn't on the
 * offline classpath).
 */
class AdaptivePathPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val Rounds = 5

  // random docs over a parameterized alphabet: small alphabets produce
  // small shingle vocabularies (dense path), large ones big (prefix path)
  private def genDocs(alphabet: Int): Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(8, 40)
    docs <- Gen.listOfN(n,
      Gen.listOfN(60, Gen.choose(0, alphabet - 1)).map(
        _.map(i => ('a' + i % 26).toChar).mkString))
  } yield docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }

  test("jaccard dense and prefix paths agree across random corpora") {
    (1 to Rounds).foreach { r =>
      val alphabet = if (r % 2 == 0) 4 else 26
      val df = sample(genDocs(alphabet), r).toDF("id", "t")
      val t = 0.3 + 0.1 * (r % 3)
      val dense = TextDedup.ngramJaccardPairs(df, "id", "t",
        shingleLen = 3, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      val prefix = TextDedup.ngramJaccardPairs(df, "id", "t",
        shingleLen = 3, threshold = t, denseVocabLimit = 0)
        .as[(Long, Long, Double)].collect().toSet
      assert(dense == prefix, s"round $r (alphabet=$alphabet, t=$t)")
    }
  }

  test("simhash dense and piece paths agree across random corpora") {
    (1 to Rounds).foreach { r =>
      val df = sample(genDocs(6), 100 + r)
        .map { case (i, d) => (i, d.grouped(4).mkString(" ")) }
        .toDF("id", "t")
      val dense = TextDedup.simhashPairs(df, "id", "t", maxHamming = 10)
        .as[(Long, Long, Int)].collect().toSet
      val pieces = TextDedup.simhashPairs(df, "id", "t", maxHamming = 10,
        denseLimit = 0)
        .as[(Long, Long, Int)].collect().toSet
      assert(dense == pieces, s"round $r")
    }
  }

  private val genPairs: Gen[Seq[(Long, Long, Double)]] = for {
    n <- Gen.choose(5, 120)
    ps <- Gen.listOfN(n, for {
      s <- Gen.choose(0L, 25L)
      t <- Gen.choose(100L, 125L)
      d <- Gen.choose(1, 9)
    } yield (s, t, d / 10.0))
  } yield ps.distinct

  test("greedy assignment: driver scan and distributed rounds agree") {
    (1 to Rounds).foreach { r =>
      val pairs = sample(genPairs, 200 + r).toDF("sid", "tid", "distance")
      val a = Fuzzy.greedyAssign(pairs, "sid", "tid")
        .as[(Long, Long, Double)].collect().toSet
      val b = Fuzzy.greedyAssign(pairs, "sid", "tid", driverLimit = 0L)
        .as[(Long, Long, Double)].collect().toSet
      assert(a == b, s"round $r")
      // one-to-one
      assert(a.map(_._1).size == a.size && a.map(_._2).size == a.size)
    }
  }

  test("distributed rank equals the global row_number by order column") {
    (1 to Rounds).foreach { r =>
      val rows = sample(Gen.listOfN(200, Gen.choose(0L, 1000000L)), 300 + r)
        .distinct.map(Tuple1(_))
      val df = rows.toDF("working_source_id")
      val ranked = Merger.withDistributedRank(
        df, "working_source_id", "rk", base = 10L)
        .select(col("working_source_id"), col("rk"))
        .as[(Long, Long)].collect().toMap
      val expected = df
        .withColumn("rk", lit(10L) +
          row_number().over(Window.orderBy(col("working_source_id"))))
        .as[(Long, Long)].collect().toMap
      assert(ranked == expected, s"round $r")
    }
  }

  test("contamination grid and token-join paths agree") {
    (1 to Rounds).foreach { r =>
      val alphabet = if (r % 2 == 0) 4 else 26
      val all = sample(genDocs(alphabet), 500 + r).toDF("id", "t")
      val test = all.filter(col("id") % 3 === 0)
      val train = all.filter(col("id") % 3 =!= 0)
      val dense = TextDedup.contaminationScores(test, train, "id", "t",
        shingleLen = 3).as[(Long, Double, Boolean)].collect().toSet
      val token = TextDedup.contaminationScores(test, train, "id", "t",
        shingleLen = 3, denseVocabLimit = 0)
        .as[(Long, Double, Boolean)].collect().toSet
      assert(dense == token, s"round $r (alphabet=$alphabet)")
      assert(dense.nonEmpty)
    }
  }

  test("contamination span grid and positional-join paths agree") {
    (1 to Rounds).foreach { r =>
      val alphabet = if (r % 2 == 0) 4 else 26
      val all = sample(genDocs(alphabet), 900 + r).toDF("id", "t")
      val test = all.filter(col("id") % 3 === 0)
      val train = all.filter(col("id") % 3 =!= 0)
      def canonical(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, Long, Long, Double, Long, Long)].collect()
          .map(x => (x._1, x._2, x._3, math.round(x._4 * 1e12), x._5, x._6))
          .toSet
      val dense = canonical(TextDedup.contaminationSpans(test, train, "id", "t",
        shingleLen = 3, threshold = 0.3))
      val token = canonical(TextDedup.contaminationSpans(test, train, "id", "t",
        shingleLen = 3, threshold = 0.3, denseVocabLimit = 0))
      assert(dense == token, s"round $r (alphabet=$alphabet)")
      // a 4-letter alphabet (64-shingle vocab) guarantees heavy overlap;
      // 26 letters makes random cross-doc containment ~0, so only the
      // small-alphabet rounds must be non-trivial
      if (alphabet == 4) assert(dense.nonEmpty, s"round $r produced no pairs")
    }
  }

  test("trigram candidate paths agree across random name sets") {
    (1 to Rounds).foreach { r =>
      val names = sample(genDocs(8), 400 + r)
        .map { case (i, d) => (i, d.take(12)) }
      val src = names.toDF("sid", "s")
      val tgt = names.map { case (i, d) => (i + 1000, d.reverse) }
        .toDF("tid", "t")
      val bc = Fuzzy.candidatePairs(src, "sid", "s", tgt, "tid", "t",
        limit = 0.95)
        .as[(Long, Long, Double)].collect()
        .map(p => (p._1, p._2, math.round(p._3 * 1e12))).toSet
      val inv = Fuzzy.candidatePairs(src, "sid", "s", tgt, "tid", "t",
        limit = 0.95, broadcastLimit = 0L)
        .as[(Long, Long, Double)].collect()
        .map(p => (p._1, p._2, math.round(p._3 * 1e12))).toSet
      assert(bc == inv, s"round $r")
    }
  }

  test("keywordTags agrees with brute-force indexOf on random dictionaries") {
    // a 3-letter alphabet makes pattern self-overlap, shared prefixes,
    // and deep fail-chain transitions the COMMON case rather than a
    // handcrafted corner — each round: random dictionary × random texts
    // vs the definitionally-correct repeated-indexOf scan
    import graft.ops.TextAnalysis
    val genPatterns: Gen[Seq[String]] = for {
      n <- Gen.choose(1, 12)
      ps <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 4)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString)
    } yield ps.distinct
    val genTexts: Gen[Seq[(Long, String)]] = for {
      n <- Gen.choose(2, 25)
      ts <- Gen.listOfN(n, for {
        len <- Gen.choose(0, 60)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', ' '))
      } yield cs.mkString)
    } yield ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    (1 to 8).foreach { r =>
      val kws = sample(genPatterns, 7000 + r)
      val rows = sample(genTexts, 8000 + r)
      val got = TextAnalysis.keywordTags(rows.toDF("id", "t"), "id", "t", kws)
        .as[(Long, String, Int, Int)].collect().toSet
      val want = rows.flatMap { case (id, t) =>
        kws.flatMap { k =>
          val f = t.indexOf(k)
          if (f < 0) None
          else {
            var n = 0
            var i = f
            while (i >= 0) { n += 1; i = t.indexOf(k, i + k.length) }
            Some((id, k, f + 1, n))
          }
        }
      }.toSet
      assert(got == want,
        s"round $r: dictionary=${kws.mkString(",")}")
    }
  }

  test("manifest pruning is invisible: random data, random ranges") {
    // pruning is a plan decision, never a semantics decision — the
    // manifest-pruned read must equal the full-scan filter for ANY
    // data distribution (duplicates, skew, nulls) and ANY range
    // (empty, total, partial, degenerate lo==hi)
    import graft.ops.Layout
    val genRows: Gen[Seq[(Long, java.lang.Long)]] = for {
      n <- Gen.choose(50, 400)
      vs <- Gen.listOfN(n, Gen.frequency(
        9 -> Gen.choose(-1000L, 1000L).map(java.lang.Long.valueOf),
        1 -> Gen.const(null.asInstanceOf[java.lang.Long])))
    } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val genRange: Gen[(Long, Long)] = for {
      a <- Gen.choose(-1200L, 1200L)
      b <- Gen.choose(-1200L, 1200L)
    } yield (math.min(a, b), math.max(a, b))
    (1 to 6).foreach { r =>
      val rows = sample(genRows, 9000 + r)
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_manifest_prop$r").toString
      Layout.writeWithManifest(rows.toDF("id", "v"), Seq("v"), dir,
        numFiles = 1 + r * 2)
      (1 to 4).foreach { q =>
        val (lo, hi) = sample(genRange, 9100 + r * 10 + q)
        val got = Layout.readPruned(spark, dir, "v", lo, hi)
          .as[(Long, Option[Long])].collect().toSet
        val want = spark.read.parquet(dir)
          .filter(col("v") >= lo && col("v") <= hi)
          .as[(Long, Option[Long])].collect().toSet
        assert(got == want, s"round $r range [$lo,$hi]")
      }
    }
  }
}
