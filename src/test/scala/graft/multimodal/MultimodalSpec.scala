package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  def docs() = {
    import spark.implicits._
    Seq((1L, "hello world"), (2L, "another document"), (3L, "hello world"))
      .toDF("doc_id", "text")
  }

  test("attachBinary + extractMeta: header, length, digest are deterministic") {
    val meta = Multimodal.extractMeta(
      Multimodal.attachBinary(docs(), "text"), "payload")
      .orderBy("doc_id").collect()
    assert(meta.forall(_.getAs[String]("magic") == "IMG0"))
    assert(meta(0).getAs[Int]("n_bytes") === "hello world".length + 16)
    // identical content → identical digest; different content → different
    assert(meta(0).getAs[String]("digest") === meta(2).getAs[String]("digest"))
    assert(meta(0).getAs[String]("digest") !== meta(1).getAs[String]("digest"))
  }

  test("decode stub runs per-partition and is stable; null payload → zeros") {
    import spark.implicits._
    val withNull = Multimodal.attachBinary(docs(), "text")
      .withColumn("payload",
        when(col("doc_id") === 2, lit(null).cast("binary")).otherwise(col("payload")))
    // decode twice → identical outputs (stub must be deterministic)
    def run() = Multimodal.decode(withNull, "payload")
      .select("doc_id", "width", "height", "n_frames").orderBy("doc_id")
      .collect().map(_.toSeq)
    val d1 = run(); val d2 = run()
    assert(d1 === d2)
    assert(d1(1)(1) === 0) // null payload → zero width
    assert(d1(0)(1).asInstanceOf[Int] > 0)
    assert(d1(0).drop(1) === d1(2).drop(1)) // same content, same dims
  }

  test("frameSample + featureStub: fan-out bounded by n and n_frames; 8-dim features") {
    val decoded = Multimodal.decode(
      Multimodal.extractMeta(Multimodal.attachBinary(docs(), "text"), "payload"), "payload")
    val frames = Multimodal.featureStub(Multimodal.frameSample(decoded, 3))
    val counts = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nFrames = decoded.select("doc_id", "n_frames").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    counts.foreach { case (id, c) => assert(c === math.min(nFrames(id), 3)) }
    val f = frames.select(size(col("features"))).head().getInt(0)
    assert(f === 8)
  }

  test("embedding near-dup: planted duplicate found, no cartesian") {
    import spark.implicits._
    import graft.operators.Dedup
    val base = Array.tabulate(8)(i => math.sin(i + 1).toFloat)
    val nearly = base.clone(); nearly(0) = base(0) + 0.001f
    val far = Array.tabulate(8)(i => math.cos(3 * i + 2).toFloat)
    val df = Seq((1L, base), (2L, nearly), (3L, far)).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding",
      dim = 8, minCosine = 0.99, numPlanes = 8, bandBits = 2)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }
}
