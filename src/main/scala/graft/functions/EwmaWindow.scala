package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** EWMA as a native Catalyst window function — the SQL-parity form of
  * [[graft.operators.Ewma]] (reference semantics:
  * /root/reference/src/bin/crunch.rs:243-270, spec calcs.md:52-63).
  *
  * Declarative running-frame aggregate (ROWS UNBOUNDED PRECEDING..CURRENT):
  * buffer = (state, out);
  *  - non-null input: state' = (1-α)·state + α·input, out' = state';
  *  - null input: state carries unchanged, out' = NULL (a null sample
  *    must not advance the recurrence — the corner case a naive window
  *    formulation gets wrong, SURVEY.md §7.4).
  *
  * Being declarative (pure expressions, no imperative buffer), the whole
  * update participates in codegen like the built-in window functions.
  * Usage: `GraftFunctions.register(spark)` then SQL
  * `ewma(value, 0.05) OVER (PARTITION BY k ORDER BY ts)` or
  * `call_function("ewma", col, lit(alpha)).over(w)`.
  */
case class EwmaWindow(input: Expression, alphaExpr: Expression)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(input, alphaExpr)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ewma"

  private lazy val alpha: Expression = Cast(alphaExpr, DoubleType)
  private lazy val state = AttributeReference("state", DoubleType, nullable = false)()
  private lazy val out = AttributeReference("out", DoubleType, nullable = true)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(state, out)
  override val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal.create(null, DoubleType))

  override lazy val updateExpressions: Seq[Expression] = {
    val inD = Cast(input, DoubleType)
    val next = Add(Multiply(Subtract(Literal(1.0), alpha), state), Multiply(alpha, inD))
    Seq(
      If(IsNull(input), state, next),
      If(IsNull(input), Literal.create(null, DoubleType), next))
  }

  override lazy val evaluateExpression: Expression = out

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(input = newChildren(0), alphaExpr = newChildren(1))
}
