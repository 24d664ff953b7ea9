package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.types.Template

/**
 * Staged exact-match join with first-match-wins precedence (SURVEY.md
 * §2.3, J1-J5).
 *
 * Reference semantics (lib/voter_file/csv_driver/record_matcher.rb):
 *  - the working source gets `working_source_id SERIAL` and
 *    `working_target_id <pk type>` (record_matcher.rb:37-46);
 *  - exact match groups run in declaration order and each group's UPDATE
 *    only touches still-unmatched rows (`WHERE s.working_target_id IS
 *    NULL`, record_matcher.rb:60-68) — first-match-wins precedence;
 *  - a group is one or more key equalities (single/multi column, or
 *    `{source_key:, target_key:}` FK pairs, record_matcher.rb:16-22),
 *    optional `$S`/`$T` theta constraints (record_matcher.rb:24-26,83-86),
 *    and optional auxiliary join tables (record_matcher.rb:28-30,88-90);
 *  - nested matchers splice their groups in order (record_matcher.rb:48-58).
 *
 * Spark-first design: instead of translating the reference's sequential
 * UPDATE-per-group (k chained scans), each group's candidates are
 * computed as an independent equi-join, unioned, and resolved with ONE
 * window: min (group_idx, target_pk) per source row. Semantically
 * identical to the staged loop (a row matched by group i keeps it over
 * any group j > i) but embarrassingly parallel — at 100 TB the k joins
 * run concurrently against the same cached/broadcast target, and the
 * single window shuffle on working_source_id replaces k full-table
 * UPDATE passes. The multi-candidate nondeterminism of Postgres
 * UPDATE..FROM is resolved deterministically to min(t.pk) (divergence
 * documented, SURVEY §7.4).
 */
final case class KeyPair(sourceKey: String, targetKey: String)

/** `$S`/`$T` theta constraint bound to a column (both sides substitute
  * the same column name unless an explicit target column is given). */
final case class MatchConstraint(column: String, template: String,
                                 targetColumn: Option[String] = None)

/** Auxiliary join table participating in match conditions; `condition`
  * is SQL referencing `t.<col>` and `<alias>.<col>`. */
final case class AuxJoin(df: DataFrame, alias: String, condition: String)

final case class ExactGroup(
    keys: Seq[KeyPair],
    constraints: Seq[MatchConstraint] = Nil,
    auxJoins: Seq[AuxJoin] = Nil)

object ExactGroup {
  /** Same-name single- or multi-column group. */
  def onColumns(cols: String*): ExactGroup =
    ExactGroup(cols.map(c => KeyPair(c, c)))
}

final case class MatchSpec(
    groups: Seq[ExactGroup],
    targetPk: String,
    /** Fuzzy columns matched (in order) after all exact groups. */
    fuzzyColumns: Seq[String] = Nil,
    /** pg_trgm acceptance bound: distance < limit (fuzzy_merger.rb:5). */
    fuzzyLimit: Double = 0.5) {
  /** Splice a nested matcher's groups in order (J5). */
  def withNested(nested: MatchSpec): MatchSpec =
    copy(groups = groups ++ nested.groups)
}

object Matcher {

  val SourceId = "working_source_id"
  val TargetId = "working_target_id"
  val MatchGroup = "working_exact_match_group"

  /** Fuzzy stages are tagged after all exact groups, 1-based like the
    * reference's audit tagging (merge_audit_sql.rb:38-51). */
  def fuzzyGroupIndex(spec: MatchSpec, fuzzyStage: Int): Int =
    spec.groups.size + 1 + fuzzyStage

  /**
   * Ensure the working source id column exists.
   * `monotonically_increasing_id` is unique-not-dense, which is all the
   * reference uses SERIAL for (a join key, record_matcher.rb:43).
   */
  def withSourceId(source: DataFrame): DataFrame =
    if (source.columns.contains(SourceId)) source
    else source.withColumn(SourceId, monotonically_increasing_id())

  /**
   * Run all exact groups; returns the source plus
   * `working_target_id` (nullable) and `working_exact_match_group`
   * (1-based index of the winning group, null if unmatched).
   */
  def matchRecords(sourceWithId: DataFrame, target: DataFrame,
                   spec: MatchSpec): DataFrame = {
    require(sourceWithId.columns.contains(SourceId),
      s"source must carry $SourceId (use Matcher.withSourceId)")
    val s = sourceWithId.as("s")

    val candidateSets: Seq[DataFrame] = spec.groups.zipWithIndex.map {
      case (g, idx) =>
        // pre-join aux tables into the target side (J4)
        val tgt = g.auxJoins.foldLeft(target.as("t")) { (df, aux) =>
          df.join(aux.df.as(aux.alias), expr(aux.condition))
        }
        val keyCond: Column = g.keys
          .map(k => col(s"s.${k.sourceKey}") === col(s"t.${k.targetKey}"))
          .reduce(_ && _)
        val thetaCond: Seq[Column] = g.constraints.map { c =>
          Template.toColumn(c.template, Some(s"s.${c.column}"),
            Some(s"t.${c.targetColumn.getOrElse(c.column)}"))
        }
        val cond = (keyCond +: thetaCond).reduce(_ && _)
        s.join(tgt, cond, "inner")
          .select(
            col(s"s.$SourceId"),
            col(s"t.${spec.targetPk}").as(TargetId),
            lit(idx + 1).as(MatchGroup))
    }

    if (candidateSets.isEmpty)
      return sourceWithId
        .withColumn(TargetId, lit(null).cast(
          target.schema(spec.targetPk).dataType))
        .withColumn(MatchGroup, lit(null).cast("int"))

    val all = candidateSets.reduce(_ unionByName _)
    // first-match-wins + deterministic min-pk tiebreak in one window
    val w = Window.partitionBy(col(SourceId))
      .orderBy(col(MatchGroup).asc, col(TargetId).asc)
    val resolved = all
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")

    sourceWithId.join(resolved, Seq(SourceId), "left")
  }

  /**
   * Self-join invariant counts used by dedup + audits (J8,
   * merge_audit_sql.rb:21-36, enforced dedup_driver.rb:22-28):
   * reflexive = rows matched to themselves; symmetric = pairs where a
   * survivor is itself matched away.
   */
  def reflexiveCount(matched: DataFrame, pk: String): Long =
    matched.filter(col(TargetId).isNotNull && col(TargetId) === col(pk))
      .count()

  def symmetricCount(matched: DataFrame, pk: String): Long =
    matched.as("s1")
      .join(matched.as("s2"),
        col(s"s1.$TargetId") === col(s"s2.$pk") &&
          col(s"s2.$TargetId").isNotNull &&
          col(s"s1.$pk") =!= col(s"s2.$pk"))
      .count()
}
