package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import graft.plans.AsOfJoin.AsOfJoinPlan

/** Predicate pushdown through [[AsOfJoin.AsOfJoinPlan]] — Catalyst cannot
  * push filters through an unknown binary node, so a 100 TB scan above an
  * as-of join would read everything without this rule.
  *
  * Semantics-preserving moves only:
  *  - predicates over LEFT columns push into the left child (each output
  *    row is one left row — filtering before or after is identical);
  *  - predicates over a left BY-key additionally mirror to the matching
  *    right by-key (they eliminate whole groups on both sides);
  *  - predicates over right/ts columns stay put: dropping right rows
  *    would change WHICH row is "the latest ≤ ts".
  */
object AsOfPushdown extends Rule[LogicalPlan] with PredicateHelper {

  private def mirrorToRight(e: Expression, byMap: Map[Attribute, Attribute]): Option[Expression] = {
    val refs = e.references.toSeq
    if (refs.nonEmpty && refs.forall(a => byMap.keys.exists(_.semanticEquals(a)))) {
      Some(e.transform {
        case a: Attribute =>
          byMap.collectFirst { case (l, r) if l.semanticEquals(a) => r }.getOrElse(a)
      })
    } else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsOfJoinPlan) =>
      val preds = splitConjunctivePredicates(cond)
      val leftSet = a.left.outputSet
      val (pushable, keep) = preds.partition(p =>
        p.deterministic && p.references.subsetOf(leftSet))
      if (pushable.isEmpty) f
      else {
        val byMap = a.leftBy.zip(a.rightBy).toMap
        val rightMirrors = pushable.flatMap(mirrorToRight(_, byMap))
        val newLeft = Filter(pushable.reduce(And), a.left)
        val newRight =
          if (rightMirrors.isEmpty) a.right
          else Filter(rightMirrors.reduce(And), a.right)
        val pushed = a.copy(left = newLeft, right = newRight)
        keep match {
          case Nil => pushed
          case ks => Filter(ks.reduce(And), pushed)
        }
      }
  }

  /** Idempotent registration alongside [[AsOfJoin.register]]. Locks on
    * `spark.experimental` (shared with [[NanosRangePushdown.register]])
    * so concurrent registrations can't lose each other's rule. */
  def register(spark: SparkSession): Unit = spark.experimental.synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[AsOfPushdown.type]))
      spark.experimental.extraOptimizations = cur :+ AsOfPushdown
  }
}
