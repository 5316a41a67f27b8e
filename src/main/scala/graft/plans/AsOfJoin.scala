package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftops.PlanApi

/** Native as-of join — the whole-operator custom plan (tier (c) of the
  * extension ladder: LogicalPlan + Strategy + SparkPlan).
  *
  * Semantics: for each left row, attach the single right row with the
  * LARGEST right.ts ≤ left.ts within the same `by` key (left outer:
  * unmatched → nulls) — the time-series join the reference builds manually
  * from two 5-minute-truncated equi-joins
  * (/root/reference/src/bin/crunch.rs:379-440); DuckDB spells it
  * `ASOF LEFT JOIN`.
  *
  * Physical shape (scales like a sort-merge join): both sides hash-
  * partitioned by the `by` key and sorted (by, ts) — Spark's
  * EnsureRequirements inserts the exchanges/sorts — then one streaming
  * merge pass per partition, O(1) state (the last matching right row).
  * No windowing, no per-row probing, no materialized candidate set.
  */
object AsOfJoin {

  final case class AsOfJoinPlan(
      left: LogicalPlan, right: LogicalPlan,
      leftBy: Seq[Attribute], rightBy: Seq[Attribute],
      leftTs: Attribute, rightTs: Attribute) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
      copy(left = newLeft, right = newRight)
  }

  object AsOfStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinPlan(l, r, lb, rb, lts, rts) =>
        AsOfJoinExec(planLater(l), planLater(r), lb, rb, lts, rts) :: Nil
      case _ => Nil
    }
  }

  /** Idempotent session registration (experimental strategies are public
    * API and work on an already-built session; a SparkSessionExtensions
    * `injectPlannerStrategy` would be the spark-submit-time equivalent). */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[AsOfStrategy.type]))
      spark.experimental.extraStrategies = cur :+ AsOfStrategy
    AsOfPushdown.register(spark) // filters must reach the scans (pushdown
    // does not traverse unknown nodes without it)
  }

  /** Public API: `AsOfJoin(left, right, by, leftTs, rightTs)`.
    * Column names on the right that collide with the left must be renamed
    * by the caller (as with any join). */
  def apply(spark: SparkSession, left: DataFrame, right: DataFrame,
      leftBy: Seq[String], rightBy: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    register(spark)
    val lp = PlanApi.analyzedPlan(left)
    val rp = PlanApi.analyzedPlan(right)
    def resolve(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not in ${p.output.map(_.name)}"))
    require(leftBy.nonEmpty && leftBy.size == rightBy.size, "need matching by-keys")
    val (lt, rt) = (resolve(lp, leftTs), resolve(rp, rightTs))
    // the merge reads ts via getLong: only 8-byte-backed types are safe
    // (int/date would zero-extend negatives into huge positives).
    // TIMESTAMP_NTZ qualifies — micros-since-epoch-of-wall-clock in a
    // long, ordered identically — but both sides must agree (an NTZ/LTZ
    // mix would compare wall-clock against instant micros).
    Seq(lt, rt).foreach { a =>
      require(a.dataType == org.apache.spark.sql.types.TimestampType
        || a.dataType == org.apache.spark.sql.types.TimestampNTZType
        || a.dataType == org.apache.spark.sql.types.LongType,
        s"as-of ts column ${a.name} must be TIMESTAMP, TIMESTAMP_NTZ or BIGINT, got ${a.dataType.catalogString}")
    }
    require(lt.dataType == rt.dataType
        || Seq(lt, rt).forall(_.dataType != org.apache.spark.sql.types.TimestampNTZType),
      s"as-of ts columns must not mix TIMESTAMP_NTZ with an instant type: " +
        s"${lt.dataType.catalogString} vs ${rt.dataType.catalogString}")
    PlanApi.ofRows(spark, AsOfJoinPlan(lp, rp,
      leftBy.map(resolve(lp, _)), rightBy.map(resolve(rp, _)), lt, rt))
  }
}

/** Streaming merge implementation. Requires ts to be TimestampType or
  * LongType (8-byte-backed; enforced in [[AsOfJoin.apply]]). */
final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftBy: Seq[Attribute], rightBy: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftBy) :: ClusteredDistribution(rightBy) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftBy :+ leftTs).map(SortOrder(_, Ascending)),
    (rightBy :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftBy :+ leftTs).map(SortOrder(_, Ascending))

  private def tsLong(row: InternalRow, proj: UnsafeProjection): Option[Long] = {
    val r = proj(row)
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lByExprs = leftBy
    val rByExprs = rightBy
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val byTypes = leftBy.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lit, rit) =>
      val lByProj = UnsafeProjection.create(lByExprs, leftOut)
      val rByProj = UnsafeProjection.create(rByExprs, rightOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), leftOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(byTypes)
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow
      val buffered = rit.buffered
      var lastMatch: InternalRow = null
      var lastMatchKey: UnsafeRow = null
      lit.map { l =>
        val lKey = lByProj(l)
        // SQL equi-join semantics (and DuckDB ASOF): a null by-key never
        // matches — RowOrdering would otherwise pair null with null. The
        // right side needs no special case: null-key right rows sort first
        // and are discarded by the c < 0 branch, and c == 0 against a
        // fully-non-null left key implies a fully-non-null right key.
        if (lKey.anyNull) joined(l, nullRight)
        else tsLong(l, lTsProj) match {
          case None => joined(l, nullRight)
          case Some(lTime) =>
            var advancing = true
            while (advancing && buffered.hasNext) {
              val r = buffered.head
              val rKey = rByProj(r)
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) { buffered.next(); () } // earlier key group: discard
              else if (c == 0) {
                tsLong(r, rTsProj) match {
                  case Some(rTime) if rTime <= lTime =>
                    lastMatch = buffered.next().copy()
                    lastMatchKey = rKey.copy()
                  case Some(_) => advancing = false
                  case None => buffered.next(); () // null ts never matches
                }
              } else advancing = false
            }
            if (lastMatch != null && keyOrd.compare(lastMatchKey, lKey) == 0)
              joined(l, lastMatch)
            else joined(l, nullRight)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
