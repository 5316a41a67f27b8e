package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused one-pass int8 quantization of a numeric vector — the codegen
  * replacement (r20) for `Similarity.quantizeInt8`'s three interpreted
  * higher-order traversals (`transform(cast)` + `array_max(transform(abs))`
  * + `transform(floor(x/scale+0.5))`), which Spark evaluates with closure
  * dispatch PER ELEMENT: at sf0.1 the two `embeddingDrift` snapshot scans
  * spent 0.7 s cpu each in that chain (probe log, OPTIMIZATION_r20.md),
  * and at corpus scale the same per-element cost rides every executor.
  *
  * Returns `struct(scale double, qvec array<tinyint>)` with EXACTLY the
  * lambda chain's semantics, pinned case by case:
  *  - scale = greatest(max over non-null |v_i|, 1e-30) / 127.0 — null
  *    elements are SKIPPED by array_max, NaN propagates as greatest,
  *    and a null/empty/all-null vector leaves the max null, so greatest
  *    falls back to 1e-30 (scale is never null);
  *  - qvec_i = cast(floor(v_i / scale + 0.5) as tinyint) with SQL floor
  *    semantics (double → floor → long → byte), null elements preserved;
  *  - a null input vector yields qvec = null (scale still 1e-30/127 —
  *    the lambda chain computes the two columns independently, so the
  *    struct must NOT null as a whole).
  *
  * The generated code calls the static [[VectorInt8.compute]] — one
  * virtual call per ROW with the element loop JIT-compiled, the same
  * escape-from-interpretation trick as [[VectorCosine]] without
  * hand-writing array construction in Janino. */
case class VectorInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = VectorInt8.schema
  override def nullable: Boolean = false
  override def prettyName: String = "vector_int8"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vector_int8 needs array<float|double>, got ${t.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    VectorInt8.compute(v.asInstanceOf[ArrayData], elemIsFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    // NOT nullSafeCodeGen: a null vector must still yield a struct
    // (scale = 1e-30/127, qvec = null) — see the parity contract above
    val arrExpr: String =
      if (child.nullable)
        s"(${c.isNull} ? null : ${c.value})"
      else c.value.code
    val resultCode =
      code"""
        ${c.code}
        InternalRow ${ev.value} = graft.functions.VectorInt8.compute(
          $arrExpr, $elemIsFloat);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorInt8 {
  val schema: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("qvec", ArrayType(ByteType, containsNull = true), nullable = true)))

  /** The fused pass; see the case-by-case parity contract on the class. */
  def compute(a: ArrayData, isFloat: Boolean): InternalRow = {
    if (a == null)
      return InternalRow(1e-30 / 127.0, null)
    val n = a.numElements()
    // pass 1: max of non-null |v| (array_max semantics: nulls skipped,
    // NaN greatest — Math.max propagates NaN identically)
    var m = java.lang.Double.NaN
    var seen = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val ax = java.lang.Math.abs(x)
        m = if (seen) java.lang.Math.max(m, ax) else ax
        seen = true
      }
      i += 1
    }
    // greatest(max, 1e-30): null max (no elements) falls back; NaN wins
    val g = if (!seen) 1e-30
      else if (java.lang.Double.isNaN(m)) m
      else java.lang.Math.max(m, 1e-30)
    val scale = g / 127.0
    val codes = new Array[Any](n)
    i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        // SQL floor: double -> floor -> long -> cast tinyint (low byte)
        codes(i) = java.lang.Math.floor(x / scale + 0.5).toLong.toByte
      }
      i += 1
    }
    InternalRow(scale, new GenericArrayData(codes))
  }
}
