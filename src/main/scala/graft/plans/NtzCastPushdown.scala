package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Derived-predicate pushdown through the TIMESTAMP_NTZ → TIMESTAMP
  * normalization cast — the foreign-session sibling of
  * [[NanosRangePushdown]].
  *
  * Engine sessions read no-UTC parquet micros as instants at the scan
  * ([[graft.GraftSession]]), so their predicates push natively. A
  * FOREIGN session (parquet NTZ inference left on) gets the
  * [[graft.Tables]] cast fallback instead — and a range predicate on
  * the cast column is `cmp(cast(ts), lit)`, which FileSourceStrategy
  * cannot push: at 100 TB every row group is read for a one-hour
  * dashboard window.
  *
  * Under a UTC zone the cast is the IDENTITY on the stored micros, so
  * `cmp(cast(ts), TIMESTAMP v)` implies `cmp(ts, TIMESTAMP_NTZ v')`
  * with v' the same micros — a plain comparison on the relation's
  * attribute, which pushes into PushedFilters and restores row-group
  * pruning. The rule ADDS the implied conjunct (never rewrites — same
  * trivially-semantics-preserving posture as [[NanosRangePushdown]]),
  * fires only when the cast's zone normalizes to UTC, and is idempotent
  * via the semanticEquals dedup. Registered by [[graft.Tables]] next to
  * the cast it serves. */
object NtzCastPushdown extends Rule[LogicalPlan] with PredicateHelper {

  private def isUtc(zone: Option[String]): Boolean = zone.exists { z =>
    try java.time.ZoneId.of(z).normalized() == java.time.ZoneOffset.UTC
    catch { case _: Exception => false }
  }

  /** Matches `cast(a: TIMESTAMP_NTZ as TIMESTAMP)` with a UTC zone. */
  private object UtcCastOfNtz {
    def unapply(e: Expression): Option[Attribute] = e match {
      case c: Cast => c.child match {
        case a: Attribute
          if a.dataType == TimestampNTZType && c.dataType == TimestampType &&
            isUtc(c.timeZoneId) => Some(a)
        case _ => None
      }
      case _ => None
    }
  }

  /** Micros are shared verbatim: TIMESTAMP and TIMESTAMP_NTZ are both
    * long-backed µs, and UTC makes the reinterpretation exact. */
  private def ntzLit(v: Long): Literal = Literal(v, TimestampNTZType)

  private def derived(cmp: Expression): Seq[Expression] = cmp match {
    case GreaterThanOrEqual(UtcCastOfNtz(a), Literal(v: Long, TimestampType)) =>
      Seq(GreaterThanOrEqual(a, ntzLit(v)))
    case GreaterThan(UtcCastOfNtz(a), Literal(v: Long, TimestampType)) =>
      Seq(GreaterThan(a, ntzLit(v)))
    case LessThanOrEqual(UtcCastOfNtz(a), Literal(v: Long, TimestampType)) =>
      Seq(LessThanOrEqual(a, ntzLit(v)))
    case LessThan(UtcCastOfNtz(a), Literal(v: Long, TimestampType)) =>
      Seq(LessThan(a, ntzLit(v)))
    case EqualTo(UtcCastOfNtz(a), Literal(v: Long, TimestampType)) =>
      Seq(EqualTo(a, ntzLit(v)))
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
      // top-level conjuncts only (a derived conjunct under OR/NOT would
      // not be an implication of the whole condition)
      val preds = splitConjunctivePredicates(cond)
      val extra = preds.flatMap(derived)
        .filterNot(d => preds.exists(_.semanticEquals(d)))
      if (extra.isEmpty) f
      else Filter((preds ++ extra).reduce(And), child)
  }

  /** Idempotent session registration (locked — same rationale as
    * [[NanosRangePushdown.register]]). */
  def register(spark: SparkSession): Unit = spark.experimental.synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[NtzCastPushdown.type]))
      spark.experimental.extraOptimizations = cur :+ NtzCastPushdown
  }
}
