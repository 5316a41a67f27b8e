package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Defers expensive scalar projections past a global sort, so the range
  * partitioner's sampling pass doesn't execute them twice.
  *
  * A global `Sort` physically plans as a range-partitioning `Exchange`,
  * and computing range bounds requires a reservoir-sampling pass that
  * iterates EVERY row of the child — the child plan executes twice.
  * When the child is a `Project` carrying heavy per-row work (regexp,
  * JSON path extraction, interpreted higher-order lambdas, UDFs), the
  * whole scalar cost doubles. Measured at the round-14 20× lake
  * (PLANS.md): `get_json_object` over 2M events cost 5.8 s standalone
  * and 13.2 s under `orderBy` — json 2× + sort, reproducibly — and the
  * regex-feature quality classifier paid the same 2× on a 37 s query.
  * This is the canonical "compute derived columns, write sorted/
  * clustered output" ETL shape, so at 100 TB the doubled pass is a
  * cluster-sized waste, not a local curiosity.
  *
  * Rewrite: `Sort(order, Project(slow ++ fast))` →
  * `Project(slow ++ fast.refs, Sort(order, Project(fast ++ inputs(slow))))`
  * — expensive, deterministic aliases NOT referenced by the sort keys
  * move above the sort (same exprIds, so parents still resolve); the
  * slim child keeps everything else plus the raw inputs the deferred
  * expressions need. Row order is preserved (a projection is row-wise),
  * so sorted output files are byte-identical.
  *
  * Trade-off, stated honestly: the shuffle now carries the deferred
  * expressions' INPUTS instead of their outputs. For the expression
  * classes gated here (regexp / JSON / lambdas / UDFs) per-row CPU
  * dwarfs the extra bytes — and the inputs were already scanned and
  * (for the sampling pass) already materialized once regardless. A
  * cheap arithmetic alias never moves: it gains nothing and could only
  * grow the payload.
  *
  * Skips:
  *  - non-global sorts (`sortWithinPartitions` plans no range exchange
  *    — nothing is sampled, nothing executes twice);
  *  - sorts directly under a `Limit` (planned as TakeOrderedAndProject,
  *    which samples nothing; rewriting would break that pattern);
  *  - nondeterministic expressions (moving one across a sort changes
  *    which row gets which value);
  *  - expensive aliases the sort keys reference (they must exist below
  *    the sort).
  */
object DeferExpensiveSortProject extends Rule[LogicalPlan] {

  /** Per-row cost classes worth a second shuffle column: compiled-regex
    * walks, JSON parses, formatter-driven timestamp parse/format,
    * interpreted lambda loops, black-box UDFs. Shared with
    * [[graft.tools.PlanDigest]], which counts gated-class expressions
    * below the range exchange so the plan-golden gate pins this rule's
    * effect (a dropped registration fails `sbt test`, not a lake bench
    * mystery). */
  private[graft] def isExpensive(e: Expression): Boolean = e.exists {
    case _: RegExpReplace | _: RegExpExtractBase | _: RLike => true
    case _: GetJsonObject | _: JsonToStructs | _: StringToMap => true
    case _: StringSplit | _: SplitPart => true
    case _: ToTimestamp | _: DateFormatClass => true
    case _: HigherOrderFunction => true
    case _: ScalaUDF => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Sorts feeding a Limit plan as TakeOrderedAndProject (no range
    // sampling) — leave them alone, including the Limit(Project(Sort))
    // shape TakeOrderedAndProject also matches: rewriting there would
    // stack a second Project between limit and sort, and if
    // CollapseProject declines to merge them (deferred alias referenced
    // more than once) the limit query pays a full global sort it never
    // had. Structural equality is fine here: a false positive only
    // skips an optimization.
    val underLimit: Set[LogicalPlan] = plan.collect {
      case GlobalLimit(_, LocalLimit(_, s: Sort)) => Seq(s)
      case GlobalLimit(_, LocalLimit(_, Project(_, s: Sort))) => Seq(s)
      case LocalLimit(_, s: Sort) => Seq(s)
      case LocalLimit(_, Project(_, s: Sort)) => Seq(s)
    }.flatten.toSet

    plan.transform {
      case s @ Sort(order, true, p @ Project(projectList, child), hint)
          if !underLimit.contains(s) =>
        val orderRefs = AttributeSet(order.flatMap(_.references))
        val (deferred, kept) = projectList.partition {
          case a: Alias =>
            a.deterministic && isExpensive(a.child) &&
              !orderRefs.contains(a.toAttribute)
          case _ => false
        }
        if (deferred.isEmpty) s
        else {
          // slim child: everything the sort and the deferred exprs need,
          // deduped by exprId (an input attr may already pass through)
          val keptIds = AttributeSet(kept.map(_.toAttribute))
          val extraInputs = AttributeSet(deferred.flatMap(_.references))
            .filterNot(keptIds.contains).toSeq
          val slim = Project(kept ++ extraInputs, child)
          // upper project restores the ORIGINAL column order and exprIds
          val upper = projectList.map {
            case a: Alias if deferred.exists(_.exprId == a.exprId) => a
            case ne => ne.toAttribute
          }
          // hint passes through — the 3-arg constructor would silently
          // drop a SortHint carried by the original node (r14 ADVICE)
          Project(upper, Sort(order, global = true, slim, hint))
        }
    }
  }

  /** Idempotent session registration (same pattern as [[AsOfPushdown]]).
    * Locks on `spark.experimental`: the read-modify-write of
    * `extraOptimizations` would otherwise race on a shared session. */
  def register(spark: SparkSession): Unit = spark.experimental.synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[DeferExpensiveSortProject.type]))
      spark.experimental.extraOptimizations = cur :+ DeferExpensiveSortProject
  }
}
