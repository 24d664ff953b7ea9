package graft

import graft.operators.{DatabaseAudit, WorkingTable}
import org.apache.spark.sql.functions._

class DatabaseAuditSpec extends SparkSpec {
  import spark.implicits._

  test("database audit: coverage, distributions, geocoding stats") {
    val df = Seq(
      ("a", "DEM", Some(1.5)),
      ("b", "REP", None),
      ("", "DEM", Some(0.0)),
      (null, "IND", Some(2.0))
    ).toDF("address", "party", "residential_lat")
    val rep = DatabaseAudit.audit(df,
      coverageColumns = Seq("address", "party"),
      distributionColumns = Seq("party"),
      geocodingAddressColumn = Some("address"))
    assert(rep.rowCount == 4)
    assert(rep.coverage == Map("address" -> 2, "party" -> 4))
    assert(rep.coverageRate("address") == 0.5)
    assert(rep.distributions("party").head == ("DEM", 2L))
    // needs geocoding: non-blank address AND (lat null or 0) → only "b"
    assert(rep.needsGeocodingCount.contains(1L))
  }

  test("database audit over a geocoding-prepped table") {
    val prepped = WorkingTable.prepareForGeocoding(
      spark.read.parquet(s"$sf0001/customer.parquet")
        .withColumn("residential_lat",
          when(col("c_custkey") % 3 === 0, col("c_acctbal"))),
      "c_name")
    val rep = DatabaseAudit.audit(prepped,
      coverageColumns = Seq("c_name", "c_mktsegment"),
      distributionColumns = Seq("c_mktsegment"),
      geocodingAddressColumn = Some("c_name"))
    assert(rep.rowCount == 150)
    assert(rep.coverage("c_name") == 150)
    assert(rep.distributions("c_mktsegment").nonEmpty)
    assert(rep.needsGeocodingCount.exists(_ > 0))
  }
}
