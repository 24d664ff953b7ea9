package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{DedupResult, Deduper, MatchConstraint, MergeAudit, MergeAuditReport, MergeResult, MergeSpec, Merger, DedupAudit, DedupAuditReport}

/**
 * Job lifecycle surface (SURVEY.md §1.1) — the reference's
 * `VoterFile::ImportJob` / `VoterFile::DedupJob` contract
 * (lib/voter_file/import_job.rb:4-34, lib/voter_file/dedup_job.rb:13-31,
 * README.md:10-64): a user subclass supplies the job body; the framework
 * runs it with a driver/session and guaranteed cleanup, and offers a
 * dry-run audit mode (`perform_audit`, import_job.rb:25-34) that runs
 * ONLY the match phase and reports rates.
 *
 * Spark rebuild: jobs receive a [[Gateway]]; `perform` wraps the body in
 * the ensure-cleanup lifecycle (Gateway.withSession); `performAudit`
 * reuses the same specs with the dry-run audit planners — same lineage,
 * no mutation, mirroring AuditMerger (merge_audit.rb:51-58).
 */
trait ImportJob {
  /** The import flow; default = conform-free [[merge]]. Override for a
    * custom flow (pre-repair, multiple loads, correlated updates...). */
  def job(gw: Gateway): MergeResult = merge(gw)

  /** Source/target/spec used by both perform and performAudit; override
    * to share between the real merge and the dry-run audit. */
  def source(gw: Gateway): DataFrame
  def target(gw: Gateway): DataFrame
  def mergeSpec: MergeSpec

  /** Default job body: merge source into target with the spec. */
  def merge(gw: Gateway): MergeResult =
    Merger.merge(source(gw), target(gw), mergeSpec)

  /** Run the import with guaranteed cleanup (import_job.rb:16-23). */
  final def perform(spark: SparkSession): MergeResult =
    Gateway.withSession(spark)(job)

  /** Dry-run: match only, report per-group rates
    * (import_job.rb:25-34, merge_audit.rb:13-34). */
  final def performAudit(spark: SparkSession): MergeAuditReport =
    Gateway.withSession(spark) { gw =>
      MergeAudit.audit(source(gw), target(gw), mergeSpec)
    }
}

trait DedupJob {
  def table(gw: Gateway): DataFrame
  def mergeSpec: MergeSpec
  def orientation: Option[MatchConstraint] = None

  /** Run the dedup with invariants enforced (dedup_job.rb:13-20,
    * dedup_driver.rb:9-36). */
  final def perform(spark: SparkSession): DedupResult =
    Gateway.withSession(spark) { gw =>
      Deduper.dedup(table(gw), mergeSpec, orientation)
    }

  /** Dry-run audit: match counts + invariant counts, no mutation
    * (dedup_audit.rb:12-64). */
  final def performAudit(spark: SparkSession): DedupAuditReport =
    Gateway.withSession(spark) { gw =>
      DedupAudit.audit(table(gw), mergeSpec, orientation)
    }
}
