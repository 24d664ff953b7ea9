package graft

import org.apache.spark.sql.functions._

import graft.operators.ProbLink
import graft.operators.ProbLink.LinkField

class ProbLinkSpec extends SparkSpec {
  import spark.implicits._

  private val nameField =
    LinkField("name", 0.95, 0.05, "s_name", "t_name",
      (s, t) => levenshtein(s, t) <= 1)
  private val cityField =
    LinkField("city", 0.9, 0.2, "s_city", "t_city", (s, t) => s === t)

  test("weights are the driver-rounded log2 Bayes factors") {
    assert(ProbLink.weights(0.95, 0.05) ==
      (BigDecimal("4.247928"), BigDecimal("-4.247928")))
    // log2(0.1/0.8) = -3 exactly
    assert(ProbLink.weights(0.9, 0.2) ==
      (BigDecimal("2.169925"), BigDecimal("-3.000000")))
  }

  test("scorePairs: agreement pattern -> exact decimal weight; null = no evidence") {
    val src = Seq(
      (1L, 10, "ann smith", "rome"),
      (2L, 10, "bob jones", null.asInstanceOf[String]))
      .toDF("sid", "blk", "s_name", "s_city")
    val tgt = Seq(
      (7L, 10, "ann smith", "rome"),   // agree both vs sid=1
      (8L, 10, "xyz totally", "rome")) // disagree name, agree city
      .toDF("tid", "blk", "t_name", "t_city")
    val out = ProbLink.scorePairs(src, "sid", tgt, "tid",
      Seq(("blk", "blk")), Seq(nameField, cityField))
      .select($"sid", $"tid", $"match_weight".cast("string"), $"match_prob")
      .as[(Long, Long, String, Double)].collect().sortBy(r => (r._1, r._2))
    val byPair = out.map(r => (r._1, r._2) -> r._3).toMap
    assert(byPair((1L, 7L)) == "6.417853")   // 4.247928 + 2.169925
    assert(byPair((1L, 8L)) == "-2.078003")  // -4.247928 + 2.169925
    // null city on sid=2: only the name term contributes
    assert(byPair((2L, 7L)) == "-4.247928")
    assert(byPair((2L, 8L)) == "-4.247928")
    // match_prob is monotone in the weight
    val probs = out.map(r => ((r._1, r._2), r._4)).toMap
    assert(probs((1L, 7L)) > 0.98 && probs((1L, 8L)) < 0.5)
  }

  test("bestLinks: max weight per source, ties to smallest target, threshold drops") {
    val scored = Seq(
      (1L, 7L, "3.500000"), (1L, 8L, "6.000000"),  // 8 wins on weight
      (2L, 4L, "2.000000"), (2L, 3L, "2.000000"),  // tie -> tid 3
      (3L, 9L, "-1.000000"))                       // below threshold
      .toDF("sid", "tid", "w")
      .withColumn("match_weight", $"w".cast("decimal(28,6)")).drop("w")
    val best = ProbLink.bestLinks(scored, "sid", "tid", BigDecimal(0))
      .select($"sid", $"tid").as[(Long, Long)].collect().toMap
    assert(best == Map(1L -> 8L, 2L -> 3L))
  }

  test("emFit recovers planted (m, u, lambda) and is partition-layout invariant") {
    // 100 matches: name agrees 95%, city agrees 90%;
    // 900 non-matches: name agrees 4%, city agrees 20% — planted by
    // index arithmetic, fully deterministic
    val rows = (0 until 1000).map { i =>
      val isMatch = i < 100
      val name = if (isMatch) i % 20 != 0 else i % 25 == 0
      val city = if (isMatch) i % 10 != 0 else i % 5 == 0
      (name, city)
    }
    val pairs = rows.toDF("agree_name", "agree_city")
    val fit = ProbLink.emFit(pairs, Seq("name", "city"), iterations = 20)
    assert(math.abs(fit.lambda - 0.1) < 0.05, s"lambda ${fit.lambda}")
    val m = fit.fields.map(f => f.name -> f.m).toMap
    val u = fit.fields.map(f => f.name -> f.u).toMap
    assert(m("name") > 0.8 && u("name") < 0.1, s"name ${m("name")}/${u("name")}")
    assert(m("city") > 0.7 && u("city") < 0.3, s"city ${m("city")}/${u("city")}")
    // decimal-summed responsibilities => bit-identical across layouts
    val fit3 = ProbLink.emFit(pairs.repartition(3), Seq("name", "city"), 20)
    val fit13 = ProbLink.emFit(pairs.repartition(13), Seq("name", "city"), 20)
    assert(fit3 == fit13 && fit3 == fit)
  }

  test("TF adjustment: rare-value agreement outweighs common-value agreement") {
    // target: 9 rows in "common", 1 in "rare" -> shares 0.9 / 0.1
    val tgt = ((1 to 9).map(i => (i.toLong, 10, "common")) :+
      (99L, 10, "rare")).toDF("tid", "blk", "t_city")
    val src = Seq((1L, 10, "common"), (2L, 10, "rare"))
      .toDF("sid", "blk", "s_city")
    val out = ProbLink.scorePairs(src, "sid", tgt, "tid",
      Seq(("blk", "blk")),
      Seq(LinkField("city", 0.9, 0.2, "s_city", "t_city",
        (s, t) => s === t, tfAdjust = true)))
      .filter($"agree_city")
      .select($"sid", $"match_weight".cast("string"))
      .as[(Long, String)].collect().toMap
    // log2(0.9/0.9) = 0 exactly; log2(0.9/0.1) = 3.169925
    assert(out(1L) == "0.000000")
    assert(out(2L) == "3.169925")
    // disagreement keeps the field-level weight: log2(0.1/0.8) = -3
    val dis = ProbLink.scorePairs(src, "sid", tgt, "tid",
      Seq(("blk", "blk")),
      Seq(LinkField("city", 0.9, 0.2, "s_city", "t_city",
        (s, t) => s === t, tfAdjust = true)))
      .filter(!$"agree_city")
      .select($"match_weight".cast("string")).distinct()
      .as[String].collect().toSeq
    assert(dis == Seq("-3.000000"))
  }

  test("scorePairs blocks on multiple keys (conjunction)") {
    val src = Seq((1L, 10, "x", "ann"), (2L, 10, "y", "bob"))
      .toDF("sid", "zip", "grp", "s_name")
    val tgt = Seq((7L, 10, "x", "ann"), (8L, 10, "z", "ann"),
      (9L, 20, "x", "ann")).toDF("tid", "zip", "grp", "t_name")
    val out = ProbLink.scorePairs(src, "sid", tgt, "tid",
      Seq(("zip", "zip"), ("grp", "grp")),
      Seq(LinkField("name", 0.9, 0.1, "s_name", "t_name",
        (s, t) => s === t)))
      .select($"sid", $"tid").as[(Long, Long)].collect().toSet
    // only (1,7) shares BOTH zip and grp; (1,8) differs in grp,
    // (1,9) in zip, sid=2 matches nothing on both keys
    assert(out == Set((1L, 7L)))
  }

  test("graded comparisons: first matching level wins, exact decimal weights") {
    import graft.operators.ProbLink.{GradedField, LinkLevel}
    val graded = GradedField("name", "s_name", "t_name", Seq(
      LinkLevel("exact", 0.7, 0.02, (s, t) => s === t),
      LinkLevel("close", 0.25, 0.05, (s, t) => levenshtein(s, t) <= 1)))
    // log2(.7/.02)=5.129283, log2(.25/.05)=2.321928, log2(.05/.93)=-4.217231
    val ws = ProbLink.gradedWeights(graded)
    assert(ws.map(_.toString) ==
      Seq("5.129283", "2.321928", "-4.217231"))
    val src = Seq((1L, 10, "ann"), (2L, 10, "bob"),
      (3L, 10, null.asInstanceOf[String])).toDF("sid", "blk", "s_name")
    val tgt = Seq((7L, 10, "ann"), (8L, 10, "anX"), (9L, 10, "zzzzz"))
      .toDF("tid", "blk", "t_name")
    val out = ProbLink.scorePairsGraded(src, "sid", tgt, "tid",
      Seq(("blk", "blk")), Seq(graded))
      .select($"sid", $"tid", $"level_name", $"match_weight".cast("string"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) -1 else r.getInt(2), r.getString(3))).toMap
    assert(out((1L, 7L)) == ((0, "5.129283")))  // exact beats close
    assert(out((1L, 8L)) == ((1, "2.321928")))  // ann vs anX: 1 edit
    assert(out((1L, 9L)) == ((2, "-4.217231"))) // catch-all
    assert(out((3L, 7L)) == ((-1, "0.000000"))) // null: no evidence
    // level probabilities must leave room for the catch-all
    intercept[IllegalArgumentException] {
      GradedField("bad", "a", "b", Seq(
        LinkLevel("x", 0.8, 0.5, (s, t) => s === t),
        LinkLevel("y", 0.2, 0.5, (s, t) => s === t)))
    }
  }

  test("graded EM recovers planted level profiles, layout-invariant") {
    // 200 matches: level 0 80% / level 1 15% / else; 1800 non-matches:
    // level 2 90% / level 1 8% / else — planted by index arithmetic
    val rows = (0 until 2000).map { i =>
      val isMatch = i < 200
      val lv =
        if (isMatch) { if (i % 20 < 16) 0 else if (i % 20 < 19) 1 else 2 }
        else { if (i % 50 < 45) 2 else if (i % 50 < 49) 1 else 0 }
      Tuple1(lv)
    }
    val pairs = rows.toDF("level_name")
    val fit = ProbLink.emFitGraded(pairs, Seq(("name", 3)), iterations = 25)
    // a one-feature categorical mixture is only weakly identifiable, so
    // assert the recovered DIRECTION, not exact probabilities: the
    // latent match class concentrates on exact agreement, the latent
    // non-match class on the catch-all
    val lv = fit.fields.head.levels
    assert(lv(0)._1 > 3 * lv(0)._2, s"level0 ${lv(0)}")
    assert(lv(2)._2 > 2 * lv(2)._1, s"level2 ${lv(2)}")
    // m and u each sum to 1 across levels
    assert(math.abs(lv.map(_._1).sum - 1.0) < 1e-9)
    assert(math.abs(lv.map(_._2).sum - 1.0) < 1e-9)
    val fit7 = ProbLink.emFitGraded(pairs.repartition(7),
      Seq(("name", 3)), iterations = 25)
    assert(fit7 == fit)
  }

  test("blocking profile: exact pair arithmetic per rule") {
    import graft.operators.ProbLink
    val src = Seq((1L, 10, "a"), (2L, 10, "a"), (3L, 20, "b"),
      (4L, 99, "a")).toDF("sid", "zip", "city")
    val tgt = Seq((7L, 10, "a"), (8L, 10, "b"), (9L, 20, "b"))
      .toDF("tid", "zip", "city")
    val out = ProbLink.blockingProfile(src, tgt, Seq(
      ("zip", Seq(("zip", "zip"))),
      ("zip_city", Seq(("zip", "zip"), ("city", "city")))))
      .select($"rule", $"est_pairs".cast("long"), $"matched_keys",
        $"max_block_pairs".cast("long"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // zip 10: 2 src x 2 tgt = 4; zip 20: 1 x 1; zip 99 unmatched
    assert(out("zip") == ((5L, 2L, 4L)))
    // (10,a): 2x1=2; (20,b): 1x1=1; (10,b) src-side absent
    assert(out("zip_city") == ((3L, 2L, 2L)))
  }

  test("emFit: null agreements carry no parameter mass but count toward lambda") {
    val pairs = Seq[(java.lang.Boolean, java.lang.Boolean)](
      (true, null), (true, null), (false, null), (false, null))
      .toDF("agree_name", "agree_city")
    val fit = ProbLink.emFit(pairs, Seq("name", "city"), iterations = 3)
    // the all-null field falls back to 0.5/0.5 (no evidence either way)
    val city = fit.fields.find(_.name == "city").get
    assert(city.m == 0.5 && city.u == 0.5)
  }
}
