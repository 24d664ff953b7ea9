package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}

/**
 * Test-facing accessor for executing a LOGICAL sub-plan as its own
 * query — the measurement primitive behind the empirical plan audit
 * (`PlanAuditSpec`): a window's scale-safety depends on how many
 * partition groups its child actually produces relative to its child's
 * row count, which no amount of static plan reading can tell (the r12
 * audit's declared bounded-key NAME list caught two live funnels only
 * because their keys happened to be on it — an unlisted bounded column
 * recreates the class undetected). `Dataset.ofRows` is `private[sql]`,
 * so this one-line bridge lives in the shim package; it adds no
 * behavior beyond re-running the session's analyzer on the sub-plan.
 */
object PlanProbe {

  /** The sub-plan as an executable DataFrame. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  /** `SELECT DISTINCT <exprs> FROM <child>` as a logical plan — used
    * to count a window's partition groups. Non-named expressions are
    * aliased (the grouping itself is on the raw expression). */
  def distinctOf(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                 child: LogicalPlan): LogicalPlan = {
    val named: Seq[NamedExpression] = exprs.zipWithIndex.map {
      case (ne: NamedExpression, _) => ne
      case (e, i) => Alias(e, s"__k$i")()
    }
    Aggregate(exprs, named, child)
  }
}
