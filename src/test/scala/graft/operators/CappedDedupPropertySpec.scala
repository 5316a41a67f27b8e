package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen

/** Property evidence for the bucket cap's ONE-SIDED degradation claim:
  * shrinking `maxBucket` (all-pairs → rep-star inside oversized cells)
  * may only LOSE candidate edges, never invent them. At 100 TB the cap
  * is the graceful-degrade contract every near-dup family rides
  * (`Dedup.DefaultMaxBucket`, the `_scaled` registry siblings), so the
  * direction of the approximation must hold on arbitrary corpora, not
  * just the hand-built fixtures:
  *
  *  - verified pairs under a finite cap ⊆ verified pairs under
  *    `maxBucket = Int.MaxValue` (the star pairs are a subset of the
  *    bucket's all-pairs, and verification only filters);
  *  - therefore components can only SPLIT, never merge: the capped
  *    keep-set (one rep per component) is at least as large, and every
  *    exact-mode component maps onto ≥ 1 capped components (no doc
  *    changes groups to a component that exact mode kept apart).
  *
  * Same rolled forAll as BpePropertySpec (offline cache has no
  * scalatestplus bridge); tiny corpora by design — the point is shape
  * coverage: clustered vectors that overflow tiny caps, singletons,
  * antipodes, ties. */
class CappedDedupPropertySpec extends SparkSpec {

  private def forAll[A](gen: Gen[A], cases: Int)(check: A => Unit): Unit =
    (0 until cases).foreach { i =>
      gen(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)).foreach { a =>
        try check(a)
        catch { case e: Throwable => fail(s"failed for input (seed $i): $a", e) }
      }
    }

  // clusters of near-identical dim-4 vectors around a few anchors, plus
  // jitter: anchors land in few sign-bit cells, so tiny caps overflow
  private val corpusGen: Gen[List[(Long, Seq[Double])]] = for {
    nAnchors <- Gen.choose(1, 3)
    anchors <- Gen.listOfN(nAnchors, Gen.listOfN(4, Gen.choose(-1.0, 1.0)))
    n <- Gen.choose(4, 24)
    picks <- Gen.listOfN(n, Gen.choose(0, nAnchors - 1))
    jit <- Gen.listOfN(n, Gen.choose(0.0, 0.05))
  } yield picks.zip(jit).zipWithIndex.map { case ((p, j), i) =>
    (i.toLong, anchors(p).zipWithIndex.map { case (x, d) => x + j * (d + 1) }.toSeq)
  }

  test("finite maxBucket only loses pairs and only splits components (semanticDedupLsh)") {
    import spark.implicits._
    forAll(corpusGen, cases = 5) { docs =>
      val df = docs.toDF("vec_id", "embedding")
      def run(cap: Int) =
        Dedup.semanticDedupLsh(df, "vec_id", "embedding",
          dim = 4, numPlanes = 4, minCosine = 0.9, maxBucket = cap)
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val exact = run(Int.MaxValue)
      val capped = run(3) // tiny cap: clustered cells overflow constantly
      assert(exact.keySet === capped.keySet) // every doc reported once in both
      // components only split: docs sharing a capped component must share
      // the exact component (capped grouping refines exact grouping)
      capped.groupBy(_._2).values.foreach { grp =>
        val exactComps = grp.keys.map(exact).toSet
        assert(exactComps.size === 1,
          s"capped component ${grp.keys.toSeq.sorted} spans exact components $exactComps")
      }
      // and the capped keep-set (#components) is at least the exact one
      assert(capped.values.toSet.size >= exact.values.toSet.size)
    }
  }

  test("banding exchange is REUSED at runtime: the signature pipeline executes once") {
    import spark.implicits._
    // the all-pairs side join + star branch read the same banded subplan;
    // the 100 TB cost model assumes the expensive signature computation
    // executes ONCE into shuffle files. Assert it on the FINAL adaptive
    // plan (collect() first — an unexecuted AdaptiveSparkPlan shows the
    // initial tree, where the three branches print as three pipelines)
    val docs = (1L to 40L).map(i => (i, Seq(1.0, 0.01 * i, 0.5, -0.25))).toDF("vec_id", "embedding")
    val df = Dedup.embeddingNearDupPairs(docs, "vec_id", "embedding",
      dim = 4, minCosine = 0.9, numPlanes = 8, bandBits = 4, maxBucket = 10)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.linesIterator.next().contains("isFinalPlan=true"), p.linesIterator.next())
    assert("ReusedExchange".r.findAllIn(p).size >= 1,
      s"banding subplan no longer reused — signature pipeline would run per branch:\n${p.take(2000)}")
  }

  test("capped embeddingNearDupPairs verified pairs ⊆ exact verified pairs") {
    import spark.implicits._
    forAll(corpusGen, cases = 5) { docs =>
      val df = docs.toDF("vec_id", "embedding")
      def pairs(cap: Int) =
        Dedup.embeddingNearDupPairs(df, "vec_id", "embedding",
          dim = 4, minCosine = 0.9, numPlanes = 8, bandBits = 4, maxBucket = cap)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs(Int.MaxValue)
      val capped = pairs(3)
      assert(capped.subsetOf(exact),
        s"capped invented pairs: ${(capped -- exact).toSeq.sorted}")
    }
  }
}
