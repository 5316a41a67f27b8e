package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Drift-triggered IVF maintenance ([[Similarity.ivfMaintain]]): inject
  * a distribution shift that makes the incumbent coarse quantizer split
  * a cluster across cells, observe the recall drop at nprobe=1, then
  * assert the drift trigger fires and the re-trained quantizer restores
  * recall. */
class IvfMaintenanceSpec extends SparkSpec {

  // unit vectors in the e1-e2 plane at angle deg, padded to dim 4
  private def vec(deg: Double): Seq[Double] = {
    val r = math.toRadians(deg)
    Seq(math.cos(r), math.sin(r), 0.0, 0.0)
  }

  private def corpus(angles: Seq[(Long, Double)]): DataFrame = {
    import spark.implicits._
    angles.map { case (id, a) => (id, vec(a)) }.toDF("vec_id", "embedding")
  }

  // reference snapshot: two clean clusters hugging the axes (0°±4°, 90°±4°)
  private val refAngles: Seq[(Long, Double)] =
    (0 until 20).map(i => (i.toLong, (i % 5) * 2.0 - 4.0)) ++
      (0 until 20).map(i => (20L + i, 90.0 + (i % 5) * 2.0 - 4.0))

  // drifted snapshot: cluster A rotated onto the 45° cell BOUNDARY of the
  // stale (e1, e2) centroids — its members now straddle both cells — and
  // cluster B rotated to 135°. ids 0/1 land in different clusters so
  // ivfTrain's deterministic first-nlist-by-id init seeds both cells
  private val driftAngles: Seq[(Long, Double)] =
    (0 until 20).map { i =>
      val jitter = (i % 9) - 4.0 // 45°±4°, half each side of the boundary
      (i.toLong * 2, 45.0 + jitter)
    } ++ (0 until 20).map(i => (1L + i * 2, 135.0 + (i % 5) * 2.0 - 4.0))

  private def recallAt(k: Int, got: DataFrame, truth: DataFrame): Double = {
    val g = got.select("probe_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val t = truth.select("probe_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(t.nonEmpty)
    (g intersect t).size.toDouble / t.size
  }

  test("drift splits a cluster across stale cells; trigger fires; re-train restores recall") {
    val ref = corpus(refAngles)
    val drifted = corpus(driftAngles)
    val stale = Similarity.ivfTrain(ref, "vec_id", "embedding", nlist = 2, iters = 3)

    // probes: boundary-cluster members at 45°..48° (ids 8/10/12/14 →
    // i=4..7) — their true neighbor sets straddle the stale 45° cell
    // boundary (the 45° tie itself breaks toward cell 0), so nprobe=1
    // against stale centroids must miss the across-boundary neighbors
    val probes = drifted.filter(
      org.apache.spark.sql.functions.expr("vec_id % 2 = 0 AND vec_id >= 8 AND vec_id < 16"))
    val truth = Similarity.bruteTopK(drifted, probes, "vec_id", "embedding", 5)

    val staleHits = Similarity.ivfSearch(drifted, probes, "vec_id", "embedding", 5,
      stale, nprobe = 1)
    val staleRecall = recallAt(5, staleHits, truth)
    assert(staleRecall < 0.9, s"stale centroids should lose recall, got $staleRecall")

    // no-drift pass: same snapshot on both sides → below threshold,
    // incumbent centroids returned untouched
    val calm = Similarity.ivfMaintain(ref, ref, "vec_id", "embedding",
      stale, threshold = 1.0)
    assert(!calm.retrained && calm.maxMeanShift === 0.0 && (calm.centroids eq stale))

    // drifted pass: per-dim int8 mean shift is large (cos 45° ≈ 0.707 vs
    // a reference cluster mean near 1.0 on dim 0) → trigger fires
    val moved = Similarity.ivfMaintain(ref, drifted, "vec_id", "embedding",
      stale, threshold = 1.0)
    assert(moved.retrained, s"drift ${moved.maxMeanShift} should exceed threshold")
    assert(moved.maxMeanShift > calm.maxMeanShift)

    val freshHits = Similarity.ivfSearch(drifted, probes, "vec_id", "embedding", 5,
      moved.centroids, nprobe = 1)
    val freshRecall = recallAt(5, freshHits, truth)
    assert(freshRecall === 1.0,
      s"re-trained centroids should restore recall, got $freshRecall (stale was $staleRecall)")

    // the report form carries the same decision, oracle-checkably
    val report = Similarity.ivfDriftReport(ref, drifted, "vec_id", "embedding", 1.0)
    assert(report.collect().forall(_.getAs[Boolean]("retrain_needed")))
    val calmReport = Similarity.ivfDriftReport(ref, ref, "vec_id", "embedding", 1.0)
    assert(calmReport.collect().forall(!_.getAs[Boolean]("retrain_needed")))
  }

  test("ivfMaintain fails loudly (not NPE) when a snapshot is empty") {
    val ref = corpus(refAngles)
    val empty = ref.filter("vec_id < 0")
    val stale = Seq(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfMaintain(ref, empty, "vec_id", "embedding", stale, threshold = 1.0)
    }
    assert(e.getMessage.contains("drift report is empty"), e.getMessage)
    // the lazy report form stays composable: empty in, empty out, no throw
    assert(Similarity.ivfDriftReport(ref, empty, "vec_id", "embedding", 1.0).count() === 0L)
  }
}
