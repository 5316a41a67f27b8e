package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Derived-predicate pushdown through the nanos→µs truncation.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), surfaced as a raw int64 and
  * truncated to microseconds as `timestamp_micros(ts div 1000)`
  * ([[graft.Tables]]). A range predicate on the truncated column cannot
  * reach the parquet scan — the scan sees an opaque expression over the
  * raw attribute, so at 100 TB every row group is read even for a
  * one-hour dashboard window.
  *
  * This rule ADDS the implied raw-column conjunct next to the original
  * predicate (it never rewrites or removes anything, so it is trivially
  * semantics-preserving): for literal micros `v > 0`,
  *
  *   trunc(n/1000) >= v  ⟹  n >= v·1000
  *   trunc(n/1000) >  v  ⟹  n >  v·1000 + 999
  *   trunc(n/1000) <= v  ⟹  n <= v·1000 + 999
  *   trunc(n/1000) <  v  ⟹  n <  v·1000
  *   trunc(n/1000) =  v  ⟹  n ∈ [v·1000, v·1000 + 999]
  *
  * (`div` is truncating division, so implications are pinned to positive
  * literals — a v=0 bound admits negative nanos and derives nothing.)
  * The added conjunct is a plain comparison on the relation's attribute,
  * which FileSourceStrategy pushes into PushedFilters, restoring
  * row-group pruning. Runs in `extraOptimizations` (after constant
  * folding, so the 1000 divisor and timestamp literals are folded) and
  * is idempotent — already-present derived conjuncts are not re-added.
  */
object NanosRangePushdown extends Rule[LogicalPlan] with PredicateHelper {

  /** Matches `timestamp_micros(a div 1000)` over a raw int64 column. */
  private object MicrosOfNanos {
    def unapply(e: Expression): Option[Attribute] = e match {
      case MicrosToTimestamp(d: IntegralDivide) => d.left match {
        case a: Attribute
          if a.dataType == LongType && d.right.foldable &&
            d.right.eval() == 1000L => Some(a)
        case _ => None
      }
      case _ => None
    }
  }

  /** Guard against v*1000 overflow (year ~294k in µs is far below it). */
  private val MaxV = Long.MaxValue / 1000 - 1

  /** Derived conjuncts for one predicate — returned FLAT (never wrapped
    * in And): the optimizer re-splits conjunctions next iteration, so an
    * And-wrapped pair would evade the semanticEquals idempotency check
    * and the rule would never converge. */
  private def derived(cmp: Expression): Seq[Expression] = cmp match {
    case GreaterThanOrEqual(MicrosOfNanos(a), Literal(v: Long, TimestampType))
        if v > 0 && v < MaxV =>
      Seq(GreaterThanOrEqual(a, Literal(v * 1000L)))
    case GreaterThan(MicrosOfNanos(a), Literal(v: Long, TimestampType))
        if v >= 0 && v < MaxV =>
      Seq(GreaterThan(a, Literal(v * 1000L + 999L)))
    case LessThanOrEqual(MicrosOfNanos(a), Literal(v: Long, TimestampType))
        if v >= 0 && v < MaxV =>
      Seq(LessThanOrEqual(a, Literal(v * 1000L + 999L)))
    case LessThan(MicrosOfNanos(a), Literal(v: Long, TimestampType))
        if v > 0 && v < MaxV =>
      Seq(LessThan(a, Literal(v * 1000L)))
    case EqualTo(MicrosOfNanos(a), Literal(v: Long, TimestampType))
        if v > 0 && v < MaxV =>
      Seq(GreaterThanOrEqual(a, Literal(v * 1000L)),
        LessThanOrEqual(a, Literal(v * 1000L + 999L)))
    // literal-on-left forms normalize to the matches above; the
    // non-Literal guard prevents literal-vs-literal mutual recursion
    case GreaterThanOrEqual(l: Literal, e) if !e.isInstanceOf[Literal] =>
      derived(LessThanOrEqual(e, l))
    case GreaterThan(l: Literal, e) if !e.isInstanceOf[Literal] =>
      derived(LessThan(e, l))
    case LessThanOrEqual(l: Literal, e) if !e.isInstanceOf[Literal] =>
      derived(GreaterThanOrEqual(e, l))
    case LessThan(l: Literal, e) if !e.isInstanceOf[Literal] =>
      derived(GreaterThan(e, l))
    case EqualTo(l: Literal, e) if !e.isInstanceOf[Literal] =>
      derived(EqualTo(e, l))
    case _ => Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      // top-level conjuncts only: a derived conjunct under OR/NOT would
      // not be an implication of the whole condition
      val preds = splitConjunctivePredicates(cond)
      val extra = preds.flatMap(derived)
        .filterNot(d => preds.exists(_.semanticEquals(d)))
      if (extra.isEmpty) f
      else Filter((preds ++ extra).reduce(And), child)
  }

  /** Idempotent session registration (same pattern as [[AsOfPushdown]]).
    * Locks on `spark.experimental`: the read-modify-write of
    * `extraOptimizations` would otherwise race with concurrent
    * registrations on a shared session and silently drop a rule. */
  def register(spark: SparkSession): Unit = spark.experimental.synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[NanosRangePushdown.type]))
      spark.experimental.extraOptimizations = cur :+ NanosRangePushdown
  }
}
