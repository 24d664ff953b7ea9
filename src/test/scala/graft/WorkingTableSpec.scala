package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{WorkingTable, WorkingTableSpec => WtSpec}

class WorkingTableSpec extends SparkSpec {
  import spark.implicits._

  test("conform: map/add/constrain/types") {
    val raw = Seq(("1", "x", "5"), ("2", "y", null), ("3", "", "7"))
      .toDF("id", "tag", "n")
    val spec = new WtSpec()
      .mapColumn("id", sqlType = "INT")
      .mapColumn("doubled", from = "n", as = "$S * 2", sqlType = "INT")
      .addColumn("extra", "BOOLEAN")
      .constrainColumn("tag", "$S <> ''")
      .constrainColumn("n", "$S IS NOT NULL")
    val out = WorkingTable.conform(raw, spec)
    assert(out.schema == StructType(Seq(
      StructField("id", IntegerType),
      StructField("doubled", IntegerType),
      StructField("extra", BooleanType))))
    assert(out.as[(Int, Int, Option[Boolean])].collect().toSet ==
      Set((1, 10, None)))
  }

  test("conform: default type is TEXT and default converter is cast") {
    val raw = Seq(("a", "1")).toDF("s", "i")
    val spec = new WtSpec().mapColumn("s").mapColumn("i", sqlType = "INT")
    val out = WorkingTable.conform(raw, spec)
    assert(out.schema("s").dataType == StringType)
    assert(out.schema("i").dataType == IntegerType)
  }

  test("conform: group_records_by collapses duplicates deterministically") {
    val raw = Seq(("k", "b"), ("k", "a"), ("j", "z")).toDF("k", "v")
    val spec = new WtSpec().mapColumn("k").mapColumn("v")
      .groupRecordsBy("k")
    val out = WorkingTable.conform(raw, spec)
      .as[(String, String)].collect().toMap
    assert(out == Map("k" -> "a", "j" -> "z")) // min representative
  }

  test("correlated update: multi-key, template, unmatched keeps old") {
    val target = Seq((1, 10, "old1"), (2, 20, "old2"), (3, 30, "old3"))
      .toDF("k1", "k2", "v")
    val src = Seq((1, 10, "new1"), (2, 99, "ignored"))
      .toDF("a1", "a2", "nv")
    val out = WorkingTable.mapColumnFromTable(
      target, src, "v", "nv",
      keys = Seq(("k1", "a1"), ("k2", "a2")),
      template = "$T || '+' || $S")
      .as[(Int, Int, String)].collect()
      .map { case (k, _, v) => k -> v }.toMap
    assert(out(1).contains("old1+new1"))
    assert(out(2) == "old2") // k2 mismatch → untouched
    assert(out(3) == "old3")
  }

  test("geocoding prep flags and point struct") {
    val df = Seq(
      ("addr a", Some(1.5), Some(2.5)),
      ("addr b", None, Some(2.5)),
      ("addr c", Some(0.0), Some(1.0)),
      ("", Some(1.0), Some(1.0)),
      (null, None, None)
    ).toDF("address", "residential_lat", "residential_lng")
    val out = WorkingTable.prepareForGeocoding(df, "address")
    val rows = out.select("needs_geocoding", "residential_point_wkt")
      .collect()
    assert(rows(0).getBoolean(0) == false)
    assert(rows(0).getString(1) == "POINT(2.5 1.5)")
    assert(rows(1).getBoolean(0) == true)  // lat null
    assert(rows(2).getBoolean(0) == true)  // lat == 0.0
    assert(rows(3).getBoolean(0) == false) // blank address
    assert(rows(4).getBoolean(0) == false)
  }

  test("geocoding prep adds missing decimal coord columns") {
    val out = WorkingTable.prepareForGeocoding(
      Seq("x").toDF("address"), "address")
    assert(out.schema("residential_lat").dataType.isInstanceOf[DecimalType])
    assert(out.schema("residential_lng").dataType.isInstanceOf[DecimalType])
  }
}
