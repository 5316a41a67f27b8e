package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.SparkSpec

/** Parity gate for the fused one-pass profile: every field must equal
  * the regex formulation it replaced, column-vs-column in the SAME
  * frame, over edge-case strings and randomized text. The quality
  * family's oracle SQL mirrors the regex semantics, so this spec is
  * what licenses swapping the kernel underneath without touching any
  * oracle. */
class TextProfileSpec extends SparkSpec {

  private def prof(t: Column): Column =
    org.apache.spark.sql.graftops.PlanApi.column(
      TextProfile(org.apache.spark.sql.graftops.PlanApi.expression(t)))

  // the regex formulations the kernel replaced (verbatim from pre-fusion
  // TextAnalysis)
  private def regexTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))
  private def regexPunct(text: Column): Column =
    length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))
  private def regexDigit(text: Column): Column =
    length(text) - length(regexp_replace(text, "[0-9]", ""))
  private def regexNonWs(text: Column): Column =
    length(regexp_replace(trim(text), "\\s+", ""))

  private val edgeCases = Seq(
    "", " ", "   ", "a", " a ", "a b", "  a  b  ",
    "\ta b\t",            // tab survives space-trim: split keeps boundary empties
    "\t\t",               // all-tabs after trim: two empty split parts
    "a\nb\r\nc", "ab", "a\fb",
    "tabs\tand  spaces", "1a2b3!", "!!!", "123", "\u00FCmlaut d\u00E9j\u00E0",
    "emoji \uD83D\uDE00 pair",  // supplementary char: one code point
    "\u00A0nbsp\u00A0",   // U+00A0 is neither space nor regex \s
    "x \u0001 y",          // control char: not \s, survives trim
    "trailing space ", " leading", "a  b   c    d")

  test("all five fields match the regex formulations on edge cases") {
    import spark.implicits._
    val df = edgeCases.toDF("t").select(col("t"), prof(col("t")).as("p"))
    val bad = df.select(col("t"),
        col("p.n_chars"), length(col("t")).as("e_chars"),
        col("p.n_punct"), regexPunct(col("t")).as("e_punct"),
        col("p.n_digit"), regexDigit(col("t")).as("e_digit"),
        col("p.n_nonws"), regexNonWs(col("t")).as("e_nonws"),
        col("p.n_tokens"), regexTokenCount(col("t")).as("e_tokens"))
      .filter(col("p.n_chars") =!= col("e_chars") ||
        col("p.n_punct") =!= col("e_punct") ||
        col("p.n_digit") =!= col("e_digit") ||
        col("p.n_nonws") =!= col("e_nonws") ||
        col("p.n_tokens") =!= col("e_tokens"))
      .collect()
    assert(bad.isEmpty, s"kernel/regex divergence:\n${bad.mkString("\n")}")
  }

  test("parity holds on randomized text (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(14)
    val alphabet = "ab1! \t\n.\u00E9\u00A0 "
    val rows = Seq.fill(500)(
      (1 to rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = rows.toDF("t").select(col("t"), prof(col("t")).as("p"))
    val bad = df.filter(col("p.n_chars") =!= length(col("t")) ||
        col("p.n_punct") =!= regexPunct(col("t")) ||
        col("p.n_digit") =!= regexDigit(col("t")) ||
        col("p.n_nonws") =!= regexNonWs(col("t")) ||
        col("p.n_tokens") =!= regexTokenCount(col("t")))
      .collect()
    assert(bad.isEmpty, s"kernel/regex divergence on:\n${bad.take(5).mkString("\n")}")
  }

  test("null text yields a null profile, and tokenCount null-propagates") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, null), (2L, "a b"))
      .toDF("id", "t")
      .select(col("id"), prof(col("t")).as("p"),
        graft.operators.TextAnalysis.tokenCount(col("t")).as("n"))
      .orderBy("id").collect()
    assert(df(0).isNullAt(1) && df(0).isNullAt(2))
    assert(df(1).getStruct(1).getInt(4) == 2 && df(1).getInt(2) == 2)
  }
}
