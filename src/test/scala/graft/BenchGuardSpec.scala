package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Bench's -2 / `refused_by_guard` classification: a real bucket-guard
  * refusal must classify as a designed refusal, and an unrelated error
  * that merely EMBEDS the guard text must not. The positive case drives
  * the REAL guard (raise_error inside a guarded dedup query), so this
  * spec also pins the exception class raise_error actually throws — if
  * a Spark upgrade changes it, this fails instead of every lake bench
  * silently reporting refusals as broken queries. */
class BenchGuardSpec extends SparkSpec {

  test("a real bucket-guard refusal classifies as refusal") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, Seq(1.0, 0.001 * i, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val caught = intercept[Throwable] {
      Dedup.semanticDedupLsh(docs, "vec_id", "embedding",
        dim = 4, numPlanes = 4, minCosine = 0.9,
        maxBucket = Int.MaxValue, bucketGuard = Some(10)).count()
    }
    assert(BenchGuard.isGuardRefusal(caught),
      s"real guard refusal not classified: ${caught.getClass} ${caught.getMessage}")
  }

  test("a refusal thrown through the noop-force write path classifies as refusal") {
    // round 14 moved Bench's forcing from count() to Bench.force (noop
    // sink write) — the write path wraps task failures differently than
    // an action does, and the lake artifacts' -2 classification must
    // survive that wrapping (lake20's dd_semantic/dd_embed_neardup
    // refuse by design through exactly this path)
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, Seq(1.0, 0.001 * i, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val caught = intercept[Throwable] {
      Bench.force(Dedup.semanticDedupLsh(docs, "vec_id", "embedding",
        dim = 4, numPlanes = 4, minCosine = 0.9,
        maxBucket = Int.MaxValue, bucketGuard = Some(10)))
    }
    assert(BenchGuard.isGuardRefusal(caught),
      s"refusal through noop write not classified: ${caught.getClass} ${caught.getMessage}")
  }

  test("a deeply wrapped refusal still classifies; a cyclic chain terminates") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, Seq(1.0, 0.001 * i, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val real = intercept[Throwable] {
      Dedup.semanticDedupLsh(docs, "vec_id", "embedding",
        dim = 4, numPlanes = 4, minCosine = 0.9,
        maxBucket = Int.MaxValue, bucketGuard = Some(10)).count()
    }
    // 40 wrapper layers — deeper than any fixed small depth cap; long
    // Spark wrapper chains must not demote a designed refusal to -1
    val deep = (1 to 40).foldLeft(real)((e, i) => new RuntimeException(s"wrap$i", e))
    assert(BenchGuard.isGuardRefusal(deep))
    // a cause CYCLE (two exceptions each other's cause) must terminate,
    // and an unrelated cycle must classify as broken, not hang
    val a = new RuntimeException("a")
    val b = new RuntimeException("b", a)
    a.initCause(b)
    assert(!BenchGuard.isGuardRefusal(a))
  }

  test("an error that merely embeds the guard text does NOT classify as refusal") {
    // e.g. a codegen dump or analysis tree containing the raise_error literal
    val fake = new RuntimeException(
      s"plan dump: ... raise_error(${Dedup.BucketGuardMarker}: band bucket of 9 docs ...) ...")
    assert(!BenchGuard.isGuardRefusal(fake))
    val wrapped = new RuntimeException("outer", fake)
    assert(!BenchGuard.isGuardRefusal(wrapped))
    assert(!BenchGuard.isGuardRefusal(new RuntimeException("unrelated")))
  }
}
