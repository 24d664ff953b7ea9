package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** As-of join vs a brute-force per-row reference: backward direction,
  * >= tie visibility, deterministic tiebreak, no-match nulls. */
class AsOfJoinSpec extends SparkSpec {

  test("backward as-of matches brute force incl. ties and no-match rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val left = (1 to 200).map(i =>
      (i.toLong, (i % 7).toLong, rnd.nextInt(50).toLong))         // id, key, ts
    val right = (1 to 120).map(i =>
      (1000L + i, (i % 9).toLong, rnd.nextInt(50).toLong, i * 1.5)) // rid, key, ts, payload

    val l = left.toDF("event_id", "k", "ts")
    val r = right.toDF("rid", "k", "ts", "pv")
      // unique (k, ts): keep max rid's payload, like the gated query
      .groupBy("k", "ts").agg(max("rid").as("p_rid"), max_by(col("pv"), col("rid")).as("p_pv"))

    val got = AsOfJoin.backward(l, r, Seq("k"), "ts", "ts", Seq("p_rid", "p_pv"))
      .collect().map(row => (row.getLong(0),
        Option(row.get(3)).map(_.asInstanceOf[Long]))).toMap

    val rightDeduped = right.groupBy { case (_, k, ts, _) => (k, ts) }
      .map { case ((k, ts), rows) => (rows.map(_._1).max, k, ts) }
    val want = left.map { case (id, k, ts) =>
      val cands = rightDeduped.filter(rr => rr._2 == k && rr._3 <= ts)
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy(rr => (rr._3, rr._1))._1))
    }.toMap
    assert(got == want)
  }

  test("forward as-of matches brute force and mirrors tie visibility") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val left = (1 to 200).map(i =>
      (i.toLong, (i % 7).toLong, rnd.nextInt(50).toLong))
    val right = (1 to 120).map(i =>
      (1000L + i, (i % 9).toLong, rnd.nextInt(50).toLong, i * 1.5))
    val l = left.toDF("event_id", "k", "ts")
    val r = right.toDF("rid", "k", "ts", "pv")
      .groupBy("k", "ts").agg(max("rid").as("p_rid"),
        max_by(col("pv"), col("rid")).as("p_pv"))
    val got = AsOfJoin.forward(l, r, Seq("k"), "ts", "ts",
        Seq("p_rid", "p_pv"))
      .collect().map(row => (row.getLong(0),
        Option(row.get(3)).map(_.asInstanceOf[Long]))).toMap
    val rightDeduped = right.groupBy { case (_, k, ts, _) => (k, ts) }
      .map { case ((k, ts), rows) => (rows.map(_._1).max, k, ts) }
    val want = left.map { case (id, k, ts) =>
      val cands = rightDeduped.filter(rr => rr._2 == k && rr._3 >= ts)
      // nearest following ts; equal-ts candidates resolve like backward
      id -> (if (cands.isEmpty) None
             else Some(cands.minBy(rr => (rr._3, -rr._1))._1))
    }.toMap
    assert(got == want)
    // equal-ts right row is visible forward too, and null-ts left rows
    // match nothing (desc NULLS FIRST guard)
    val le = Seq((1L, 1L, Some(10L)), (2L, 1L, Option.empty[Long]))
      .toDF("event_id", "k", "ts")
    val re = Seq((100L, 1L, 10L, 7.0)).toDF("p_rid", "k", "ts", "p_pv")
      .select($"k", $"ts", $"p_rid", $"p_pv")
    val out = AsOfJoin.forward(le, re, Seq("k"), "ts", "ts",
        Seq("p_rid", "p_pv"))
      .collect().map(row => (row.getLong(0),
        Option(row.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(out == Map(1L -> Some(100L), 2L -> None))
  }

  test("equal-timestamp right row is visible to the left row (>= semantics)") {
    import spark.implicits._
    val l = Seq((1L, 1L, 10L)).toDF("event_id", "k", "ts")
    val r = Seq((100L, 1L, 10L, 5.0)).toDF("p_rid", "k", "ts", "p_pv")
    val out = AsOfJoin.backward(l, r, Seq("k"), "ts", "ts", Seq("p_rid", "p_pv"))
      .collect()
    assert(out.length == 1 && out(0).getLong(3) == 100L && out(0).getDouble(4) == 5.0)
  }

  test("duplicate (key, ts) right rows resolve deterministically without a tiebreak") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (1 to 100).map(i => (i.toLong, (i % 5).toLong, rnd.nextInt(20).toLong))
    // many duplicate (k, ts) right rows with DIFFERENT payloads and no
    // caller tiebreak: the payload-hash disambiguator must pick the same
    // winner on every run, partition count, and input row order
    val right = (1 to 150).map(i =>
      (1000L + i, (i % 5).toLong, rnd.nextInt(20).toLong, rnd.nextDouble()))
    val l = left.toDF("event_id", "k", "ts")

    val runs = Seq(1, 3, 7, 32).map { n =>
      val r = rnd.shuffle(right).toDF("p_rid", "k", "ts", "p_pv").repartition(n)
      AsOfJoin.backward(l.repartition(n), r, Seq("k"), "ts", "ts",
        Seq("p_rid", "p_pv"))
        .collect()
        .map(row => (row.getLong(0),
          (Option(row.get(3)), Option(row.get(4))))).toMap
    }
    assert(runs.forall(_ == runs.head))
    // and the winner is the expected one: among rows of the max eligible
    // ts, the max xxhash64(p_rid, p_pv)
    val hashed = rnd.shuffle(right).toDF("p_rid", "k", "ts", "p_pv")
      .withColumn("h", xxhash64(col("p_rid"), col("p_pv")))
      .as[(Long, Long, Long, Double, Long)].collect()
    val want = left.map { case (id, k, ts) =>
      val cands = hashed.filter(rr => rr._2 == k && rr._3 <= ts)
      id -> (if (cands.isEmpty) (None, None)
             else {
               val w = cands.maxBy(rr => (rr._3, rr._5))
               (Some(w._1), Some(w._4))
             })
    }.toMap
    assert(runs.head == want)
  }

  test("caller tiebreak still takes precedence over the payload hash") {
    import spark.implicits._
    val l = Seq((1L, 1L, 10L)).toDF("event_id", "k", "ts")
    // two right rows tie on (k, ts); tiebreak column orders 200 last
    val r = Seq((100L, 1L, 10L, 9.0, 2L), (200L, 1L, 10L, 1.0, 5L))
      .toDF("p_rid", "k", "ts", "p_pv", "prio")
    val out = AsOfJoin.backward(l, r, Seq("k"), "ts", "ts",
      Seq("p_rid", "p_pv"), tiebreak = Some("prio")).collect()
    assert(out.length == 1 && out(0).getLong(3) == 200L)
  }

  test("payload name collision is rejected") {
    import spark.implicits._
    val l = Seq((1L, 1L, 10L)).toDF("event_id", "k", "ts")
    val r = Seq((100L, 1L, 10L)).toDF("event_id", "k", "ts")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r, Seq("k"), "ts", "ts", Seq("event_id"))
    }
  }
}
