package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass character/token profile of a string — the counts behind the
  * quality-scoring family (`punctRatio`, `meanTokenLen`, `tokenCount`,
  * digit ratio), fused into a single scan of the text.
  *
  * The Column-level formulas each walk the whole string through a
  * compiled regex (`regexp_replace` to count a char class, `split` to
  * count tokens — and `split` also ALLOCATES every token), so a
  * quality projection pays 5-6 full regex traversals plus token-array
  * garbage per row. At multi-KB documents that is the dominant cost of
  * the whole query (round-14 honest bench: the quality family was the
  * top of the lake surface). This expression computes all five counts
  * in one branch-predictable pass with zero allocation beyond the
  * result row, inside whole-stage codegen via a static kernel call.
  *
  * Exact-parity contract with the regex formulations it replaces
  * (asserted column-vs-column in TextProfileSpec):
  *  - `n_chars`   = length(text)                       — code points;
  *  - `n_punct`   = code points matching `[^a-zA-Z0-9 ]` (ASCII
  *                  classes: any non-ASCII code point counts, exactly
  *                  as the regex does);
  *  - `n_digit`   = code points matching `[0-9]`;
  *  - `n_nonws`   = length(regexp_replace(trim(text), "\\s+", "")) —
  *                  non-`\s` code points in the SPACE-trimmed text
  *                  (Spark `trim` strips 0x20 only; Java regex `\s` is
  *                  `[ \t\n\x0B\f\r]`);
  *  - `n_tokens`  = tokenCount(text): 0 when the trimmed text is
  *                  empty, else size(split(trim(text), "\\s+")) — note
  *                  split keeps LEADING/TRAILING empty strings for
  *                  non-space whitespace at the trimmed boundaries
  *                  (limit -1), so this is (number of `\s+` runs) + 1,
  *                  not the number of non-empty tokens.
  *
  * Null text → null row (matches the null propagation of the column
  * formulas it replaces). */
case class TextProfile(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextProfile.schema
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"text_profile needs STRING, got ${child.dataType.catalogString}")
  }
  override def prettyName: String = "text_profile"

  override protected def nullSafeEval(v: Any): Any =
    TextProfile.profile(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextProfile.profile($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextProfile {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("n_nonws", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false)))

  private def isRegexWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  /** The single pass. Iterates CODE POINTS (a supplementary character is
    * one regex match, not two UTF-16 units). Static so generated code
    * makes one monomorphic call per row. */
  def profile(s: UTF8String): InternalRow = {
    val str = s.toString
    val len = str.length
    // space-trim bounds (Spark SQL trim: 0x20 only, unlike String.trim)
    var t0 = 0
    while (t0 < len && str.charAt(t0) == ' ') t0 += 1
    var t1 = len
    while (t1 > t0 && str.charAt(t1 - 1) == ' ') t1 -= 1

    var nChars = 0; var nPunct = 0; var nDigit = 0; var nNonWs = 0
    var wsRuns = 0; var inWs = false; var sawAny = false
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      nChars += 1
      val alnumSpace = cp == ' ' || (cp >= '0' && cp <= '9') ||
        (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')
      if (!alnumSpace) nPunct += 1
      if (cp >= '0' && cp <= '9') nDigit += 1
      if (i >= t0 && i < t1) {
        sawAny = true
        if (isRegexWs(cp)) {
          if (!inWs) wsRuns += 1
          inWs = true
        } else {
          nNonWs += 1
          inWs = false
        }
      }
      i += Character.charCount(cp)
    }
    val nTokens = if (!sawAny) 0 else wsRuns + 1
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nChars, nPunct, nDigit, nNonWs, nTokens))
  }
}
