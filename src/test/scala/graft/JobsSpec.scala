package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.{CsvSource, CsvSpec}

/**
 * End-to-end job lifecycle: the reference README's central flow
 * (README.md:64-131 — load a CSV, conform it, match against a target
 * with prioritized groups, merge with per-column routing, audit) run
 * through the public API surface: CsvSource → WorkingTable → ImportJob.
 */
class JobsSpec extends SparkSpec {
  import spark.implicits._

  private def writeCsv(): String = {
    val f = Files.createTempFile("graft_job", ".csv")
    Files.writeString(f,
      """id,first,last,zip,bal
        |1,Ann,Smith,02139,10
        |2,Bob,Jones,10001,20
        |3,Cat,Brown,94110,30
        |bad,row,with,extra,fields,xxx
        |4,Dan,White,60601,40
        |""".stripMargin)
    f.toString
  }

  object TestImport extends ImportJob {
    def source(gw: Gateway): DataFrame = {
      val raw = CsvSource.read(gw.spark,
        CsvSpec(writeCsv(), quote = "\"", removeExpression = Some("ZZZ")))
      val spec = new WorkingTableSpec()
        .mapColumn("working_source_id", from = "id", sqlType = "BIGINT")
        .mapColumn("name", as = "$S || ' ' || last", from = "first")
        .mapColumn("zip")
        .mapColumn("bal", sqlType = "DOUBLE")
        .constrainColumn("id", "$S IS NOT NULL")
      WorkingTable.conform(raw, spec)
    }
    def target(gw: Gateway): DataFrame = Seq(
      (100L, "Ann Smith", "99999", 1.0),
      (101L, "Zoe Gray", "10001", 2.0)
    ).toDF("pk", "name", "zip", "bal")
    def mergeSpec: MergeSpec = MergeSpec(
      matchSpec = MatchSpec(
        groups = Seq(
          ExactGroup.onColumns("name"),        // priority 1: full name
          ExactGroup.onColumns("zip")),        // priority 2: zip
        targetPk = "pk"),
      mergeExpressions = Map("bal" -> "$T + $S"),
      preservedColumns = Seq("zip"))
  }

  test("import job: csv → conform → staged match → merge, with cleanup") {
    val res = TestImport.perform(spark)
    val out = res.newTarget.orderBy("pk").collect()
    // 2 original + 2 unmatched inserts (Cat, Dan); bad row dropped
    assert(out.length == 4)
    val byPk = out.map(r => r.getLong(0) -> r).toMap
    assert(byPk(100L).getDouble(3) == 1.0 + 10.0) // Ann matched by name
    assert(byPk(100L).getString(2) == "99999")    // zip preserved
    assert(byPk(101L).getDouble(3) == 2.0 + 20.0) // Bob matched by zip
    assert(byPk(102L).getString(1) != null)       // fresh pks 102,103
    assert(byPk(103L).getString(1) != null)
  }

  test("import job audit: dry-run rates without mutation") {
    val rep = TestImport.performAudit(spark)
    assert(rep.totalCount == 4)
    assert(rep.groupCounts == Map(1 -> 1, 2 -> 1)) // Ann by name, Bob by zip
    assert(math.abs(rep.matchRate - 0.5) < 1e-9)
  }

  object TestDedup extends DedupJob {
    def table(gw: Gateway): DataFrame = Seq(
      (1L, "k1", 10.0), (2L, "k1", 20.0), (3L, "k2", 30.0)
    ).toDF("id", "k", "v")
    def mergeSpec: MergeSpec = MergeSpec(
      matchSpec = MatchSpec(Seq(ExactGroup.onColumns("k")), targetPk = "id"),
      mergeExpressions = Map("v" -> "$T + $S"))
  }

  test("dedup job + audit") {
    val audit = TestDedup.performAudit(spark)
    assert(audit.reflexiveCount == 0 && audit.symmetricCount == 0)
    assert(audit.groupCounts.values.sum == 1)
    val res = TestDedup.perform(spark)
    assert(res.newTable.count() == 2)
    assert(res.newTable.filter($"id" === 1L).select("v")
      .as[Double].head() == 30.0)
  }
}
