package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** End-to-end coverage for the `Some(width)` branch of the explode-width
  * regime (r17) — the branch that, before this spec, only ever executed
  * in manual 10M-doc probes. `spark.graft.explode.targetBytes` forces
  * the widened regime deterministically at fixture scale; the contracts
  * pinned here:
  *  - [[Dedup.shinglePosts]] under the wide regime lays its postings out
  *    in exactly the derived width (the hash(id) shuffle at the source)
  *    and persists them DISK_ONLY, not MEMORY_AND_DISK;
  *  - [[TextAnalysis.noveltyProfile]] under the wide regime returns
  *    results identical to the unwidened run (the widening is a layout
  *    decision, never a semantics change) and carries the wide
  *    shingle-key exchange in its physical plan;
  *  - the override conf removed, the same inputs return to the
  *    unwidened branch (plans/goldens stay fixture-identical).
  */
class WidenedRegimeSpec extends graft.SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.Tables(spark, dir, "documents")
    .select(col("doc_id"), col("text"))

  private def withWideRegime[A](targetBytes: Long)(body: => A): A = {
    spark.conf.set("spark.graft.explode.targetBytes", targetBytes.toString)
    try body
    finally spark.conf.unset("spark.graft.explode.targetBytes")
  }

  test("conf override forces Some(width) at fixture scale; removal restores None") {
    val base = docs
    withWideRegime(1024L) {
      val w = graft.GraftSession.explodeWidth(base)
      assert(w.isDefined && w.get > spark.sessionState.conf.numShufflePartitions)
    }
    assert(graft.GraftSession.explodeWidth(base) === None)
  }

  test("wide regime: shinglePosts lays postings out at the derived width, DISK_ONLY") {
    val base = docs
    withWideRegime(4096L) {
      val width = graft.GraftSession.explodeWidth(base)
        .getOrElse(fail("override should force the wide regime"))
      val posts = Dedup.shinglePosts(base, "doc_id", "text", 3, Some(width))
      try {
        // the source repartition(width, id) survives the window, the
        // shingle projection AND the distinct (HashPartitioning(id)
        // satisfies ClusteredDistribution(id, s)) — so the persisted
        // postings carry exactly the widened partition count
        assert(posts.rdd.getNumPartitions === width)
        assert(posts.storageLevel === StorageLevel.DISK_ONLY)
        // and the unwidened layout is genuinely different (session width)
        val narrow = Dedup.shinglePosts(base, "doc_id", "text", 3, None)
        try {
          assert(narrow.storageLevel === StorageLevel.MEMORY_AND_DISK)
          assert(narrow.rdd.getNumPartitions < width)
          // layout only — the postings sets are identical
          assert(posts.except(narrow).isEmpty && narrow.except(posts).isEmpty)
        } finally narrow.unpersist()
      } finally posts.unpersist()
    }
  }

  test("wide regime: noveltyProfile results identical to the unwidened run") {
    val base = docs
    val unwidened = TextAnalysis.noveltyProfile(base, "doc_id", "text").collect()
      .map(r => r.get(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    val widened = withWideRegime(4096L) {
      val out = TextAnalysis.noveltyProfile(base, "doc_id", "text")
      // the plan must actually carry the wide shingle-key exchange —
      // otherwise this test silently degrades to unwidened-vs-unwidened
      val width = graft.GraftSession.explodeWidth(base).get
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains(s"hashpartitioning(s#") ||
             plan.contains(s"hashpartitioning(s "),
        s"expected a shingle-key exchange in:\n$plan")
      assert(plan.contains(width.toString),
        s"expected the widened count $width in the plan:\n$plan")
      out.collect().map(r => r.get(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    }
    assert(widened === unwidened)
  }

  test("wide regime: substringDedup results identical, covered join + reassembly stay wide") {
    val base = docs
    val unwidened = Dedup.substringDedup(base, "doc_id", "text", 5).collect()
      .map(r => r.get(0).toString -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    withWideRegime(8192L) {
      val width = graft.GraftSession.explodeWidth(base, expansion = 16.0)
        .getOrElse(fail("override should force the wide regime"))
      val out = Dedup.substringDedup(base, "doc_id", "text", 5)
      // the posts stream is hash(id, width); the covered set takes ONE
      // explicit hash(id, width) exchange; join and per-id reassembly
      // must reuse that layout — if either fell back to session width,
      // the output partition count betrays it
      assert(out.rdd.getNumPartitions === width,
        "the covered-set join or the reassembly agg lost the widened layout")
      val widened = out.collect()
        .map(r => r.get(0).toString -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
      assert(widened === unwidened)
    }
  }

  test("wide regime: spanDedup results identical, reassembly stays wide") {
    val base = docs
    val unwidened = Dedup.spanDedup(base, "doc_id", "text", 5).collect()
      .map(r => r.get(0).toString -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    withWideRegime(8192L) {
      val width = graft.GraftSession.explodeWidth(base)
        .getOrElse(fail("override should force the wide regime"))
      val out = Dedup.spanDedup(base, "doc_id", "text", 5)
      assert(out.rdd.getNumPartitions === width,
        "the reassembly agg lost the widened layout")
      val widened = out.collect()
        .map(r => r.get(0).toString -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
      assert(widened === unwidened)
    }
  }

  test("wide regime: incrementalSubstringDedup degrades to shuffle joins, results identical") {
    val base = docs
    val corpus = base.filter(col("doc_id") % 2 === 0)
    val batch = base.filter(col("doc_id") % 2 === 1)
    val idx = Dedup.windowFingerprints(corpus, "doc_id", "text", windowWords = 5)
      .persist()
    // pin the join shape to the operator's own hints: at fixture stats
    // Catalyst would auto-broadcast the degrade branch's joins too, and
    // the shape assertion would silently test nothing
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val unforced = Dedup.incrementalSubstringDedup(batch, idx, "doc_id", "text", 5)
      // ingest branch: batch keys broadcast by HINT (threshold is -1)
      val unPlan = unforced.queryExecution.sparkPlan.toString
      assert(unPlan.contains("BroadcastHashJoin"),
        s"ingest branch lost its broadcast hints:\n$unPlan")
      val unRows = unforced.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
      withWideRegime(8192L) {
        val width = graft.GraftSession.explodeWidth(batch, expansion = 16.0)
          .getOrElse(fail("override should force the wide regime"))
        val out = Dedup.incrementalSubstringDedup(batch, idx, "doc_id", "text", 5)
        // degrade branch: NO broadcast of the batch key set anywhere —
        // the corpus-sized index shuffles once on wkey instead of the
        // driver collecting a corpus-sized "batch"'s keys (r18's
        // maxResultSize crash shape)
        val plan = out.queryExecution.sparkPlan.toString
        assert(!plan.contains("BroadcastExchange") && !plan.contains("BroadcastHashJoin"),
          s"degrade branch still broadcasts batch keys:\n$plan")
        // and the reassembly keeps the widened hash(id) layout
        assert(out.rdd.getNumPartitions === width,
          "the covered-set join or the reassembly agg lost the widened layout")
        val rows = out.collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
        assert(rows === unRows)
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
      idx.unpersist()
    }
  }

  test("explodeWidth clamps in BigInt space (huge derived width -> maxWidth, not wraparound)") {
    // targetBytes=1 with a real input makes `derived` exceed Int range
    // once expansion scales it; the clamp must hit maxWidth instead of
    // wrapping negative and silently disabling widening
    val w = graft.GraftSession.explodeWidth(docs, expansion = 1e9,
      targetBytes = 1L, maxWidth = 512)
    assert(w === Some(512))
  }
}
