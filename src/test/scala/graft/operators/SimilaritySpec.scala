package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  def vecs() = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),  // close to 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),  // orthogonal to 0
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)), // opposite of 0
      (4L, Array(0.7f, 0.7f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
  }

  test("cosine column: exact values on known vectors") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f))).toDF("a", "b")
    val sims = df.select(Similarity.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(sims(0) === 0.0)
    assert(sims(1) === 1.0)
    assert(sims(2) === -1.0)
  }

  test("quantizeInt8: codes bounded, extreme magnitudes hit ±127, dequant error within scale/2") {
    val out = Similarity.quantizeInt8(vecs(), "vec_id", "embedding").collect()
    out.foreach { r =>
      val scale = r.getDouble(1)
      val q = r.getSeq[Byte](2)
      assert(q.forall(b => b >= -127 && b <= 127))
      // the max-|v| element must land exactly on ±127
      assert(q.exists(b => math.abs(b) == 127))
      assert(scale > 0.0)
    }
    // dequantization: |q*scale - v| <= scale/2 for every element
    val v1 = Array(0.9f, 0.1f, 0.0f, 0.0f)
    val r1 = out.find(_.getLong(0) == 1L).get
    val (s1, q1) = (r1.getDouble(1), r1.getSeq[Byte](2))
    v1.zip(q1).foreach { case (v, q) =>
      assert(math.abs(q * s1 - v) <= s1 / 2 + 1e-12)
    }
  }

  test("int8TopK: quantized ranking agrees with brute force on well-separated vectors") {
    val brute = Similarity.bruteTopK(vecs(), vecs().filter(col("vec_id") === 0), "vec_id", "embedding", 2)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toMap
    val int8 = Similarity.int8TopK(vecs(), vecs().filter(col("vec_id") === 0), "vec_id", "embedding", 2)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toMap
    // top-2 for probe 0 is {1 (near-dup), 4 (45°)} in both spaces —
    // 8-bit codes easily preserve this separation
    assert(int8 === brute)
  }

  test("bruteTopK: correct ranking, self excluded, deterministic ties") {
    val out = Similarity.bruteTopK(vecs(), vecs().filter(col("vec_id") === 0), "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.map(_._1).toSeq === Seq(1L, 4L, 2L)) // by descending cosine
    assert(!out.map(_._1).contains(0L))
  }

  test("lshTopK: no cartesian product; high-sim neighbor recovered") {
    val probes = vecs().filter(col("vec_id") === 0)
    val res = Similarity.lshTopK(vecs(), probes, "vec_id", "embedding",
      k = 3, dim = 4, numPlanes = 8, bandBits = 2)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    val cands = res.collect().map(_.getLong(1)).toSet
    assert(cands.contains(1L)) // the near-identical vector must share a band
  }

  test("ivf recall vs brute force; candidates bounded by probed cells") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val probes = emb.filter(col("vec_id") < 5)
    val brute = Similarity.bruteTopK(emb, probes, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, probes, "vec_id", "embedding", 5,
      nlist = 8, nprobe = 3, iters = 2)
    val plan = ivf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val got = ivf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect got).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall $recall vs brute")
    // determinism: same call twice, same result
    val again = Similarity.ivfTopK(emb, probes, "vec_id", "embedding", 5,
      nlist = 8, nprobe = 3, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === got)
  }

  test("ivf at nlist=256: broadcast-join assignment, no N-wide expression, recall holds") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val probes = emb.filter(col("vec_id") < 5)
    val brute = Similarity.bruteTopK(emb, probes, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, probes, "vec_id", "embedding", 5,
      nlist = 256, nprobe = 32, iters = 1)
    val plan = ivf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("least("), "centroids must live in a broadcast table, not the expression tree")
    val got = ivf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect got).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall $recall vs brute at nlist=256")
  }

  test("clusterProfile: every vector assigned once, counts partition the corpus") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val n = emb.count()
    val prof = Similarity.clusterProfile(emb, "vec_id", "embedding",
      graft.operators.IvfQuantizer.centroids)
    val plan = prof.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"corpus-side shuffle join in:\n$plan")
    val rows = prof.collect()
    assert(rows.map(_.getLong(1)).sum === n) // counts partition the corpus
    assert(rows.map(_.getInt(0)).distinct.length === rows.length)
    assert(rows.forall(r => r.getLong(2) <= r.getLong(3)))
  }

  test("pq: train is deterministic; search recall vs brute; no cartesian; 64x code budget") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val probes = emb.filter(col("vec_id") < 5)
    // training determinism: same call twice, same codebooks bitwise
    val b1 = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, ksub = 16, iters = 2)
    val b2 = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, ksub = 16, iters = 2)
    assert(b1.flatten.map(_.toSeq) === b2.flatten.map(_.toSeq))
    assert(b1.size === 8 && b1.forall(_.size === 16) && b1.head.head.length === 8)
    val brute = Similarity.bruteTopK(emb, probes, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqSearch(emb, probes, "vec_id", "embedding", 5, b1)
    val plan = pq.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val got = pq.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // PQ reconstructions are lossy (16 codewords per 8-dim subspace, a
    // 64x code budget) — recall is the fitness gauge, exactness belongs
    // to the oracle query; same floor as the LSH recall test
    val recall = (brute intersect got).size.toDouble / brute.size
    assert(recall >= 0.2, s"PQ recall $recall vs brute")
    // the shipped pre-trained codebooks match their declared shape
    val shipped = graft.operators.PqCodebooks.books
    assert(shipped.size === 8 && shipped.forall(_.size === 16)
      && shipped.forall(_.forall(_.length === 8)))
  }

  test("rrfFuse: list-exclusive candidates score one term; fusion order and exact scores") {
    import spark.implicits._
    val a = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("probe_id", "cand_id", "rn")
    val b = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("probe_id", "cand_id", "rn")
    val out = Similarity.rrfFuse(a, b, k = 10, rrfK = 60)
      .collect().map(r => r.getLong(1) -> (r.getDouble(4), r.getInt(5))).toMap
    // 11 is in both lists: 1/62 + 1/61; 10 only in a: 1/61; 12 only in b: 1/62
    assert(out(11L) === ((1.0 / 62 + 1.0 / 61, 1)))
    assert(out(10L) === ((1.0 / 61, 2)))
    assert(out(12L) === ((1.0 / 62, 3)))
  }

  test("lexicalTopK: ranks by shared distinct shingles, probe broadcast, self excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),   // probe
      (2L, "the quick brown fox jumps over a sleeping cat"), // 4 shared 3-grams
      (3L, "quick brown fox somewhere in the woods today"),  // 2 shared
      (4L, "nothing in common with anything else at all")    // 0 shared
    ).toDF("doc_id", "text")
    val out = Similarity.lexicalTopK(docs, docs.filter(col("doc_id") === 1), "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out.map(t => (t._2, t._4)).toSet === Set((2L, 1), (3L, 2))) // 4 absent
    assert(out.find(_._2 == 2L).get._3 > out.find(_._2 == 3L).get._3)
    assert(!out.exists(_._2 == 1L)) // self excluded
  }

  test("ivfpq: candidates bounded by probed cells; recall holds; no cartesian") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val probes = emb.filter(col("vec_id") < 5)
    val brute = Similarity.bruteTopK(emb, probes, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = Similarity.ivfPqSearch(emb, probes, "vec_id", "embedding", 5,
      graft.operators.IvfQuantizer.centroids, nprobe = 8,
      graft.operators.PqCodebooks.books)
    val plan = ivfpq.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val got = ivfpq.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // doubly approximate (cell pruning AND lossy reconstructions): the
    // floor is below pure-PQ's, but the index must still be useful
    val recall = (brute intersect got).size.toDouble / brute.size
    assert(recall >= 0.15, s"IVF-PQ recall $recall vs brute")
    // every candidate comes from a probed cell: with nprobe = nlist the
    // result must equal pure PQ search (cell pruning disabled ⇒ same
    // candidate set, same reconstructions)
    val full = Similarity.ivfPqSearch(emb, probes, "vec_id", "embedding", 5,
      graft.operators.IvfQuantizer.centroids,
      nprobe = graft.operators.IvfQuantizer.centroids.size,
      graft.operators.PqCodebooks.books)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val purePq = Similarity.pqSearch(emb, probes, "vec_id", "embedding", 5,
      graft.operators.PqCodebooks.books)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(full === purePq)
  }

  test("ivfPqStore roundtrip: searching the materialized index equals the inline search exactly") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val probes = emb.filter(col("vec_id") < 5)
    val dir = tmpDir("ivfpq_store") + "/index"
    Similarity.ivfPqStore(emb, "vec_id", "embedding",
        graft.operators.IvfQuantizer.centroids, graft.operators.PqCodebooks.books)
      .write.partitionBy("cell").parquet(dir)
    val store = spark.read.parquet(dir)
    // the store holds m small codes per vector, nothing else
    assert(store.columns.sorted.toSeq === Seq("cell", "codes", "id"))
    assert(store.count() === emb.count())
    val stored = Similarity.ivfPqSearchStored(store, probes, "vec_id", "embedding", 5,
        graft.operators.IvfQuantizer.centroids, nprobe = 4,
        graft.operators.PqCodebooks.books)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val inline = Similarity.ivfPqSearch(emb, probes, "vec_id", "embedding", 5,
        graft.operators.IvfQuantizer.centroids, nprobe = 4,
        graft.operators.PqCodebooks.books)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // codes are engine-exact, so the roundtrip must be BIT-identical —
    // scores included, not just candidate sets
    assert(stored === inline)
  }

  test("lsh recall vs brute force on the real embeddings table") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val probes = emb.filter(col("vec_id") < 5)
    val brute = Similarity.bruteTopK(emb, probes, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, probes, "vec_id", "embedding", 5, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.2, s"LSH recall $recall vs brute") // approximate, but not useless
  }

  test("embeddingDrift: exact integer cross-multiplication over int8 codes") {
    import spark.implicits._
    // codes: (1,0)→(127,0), (0.5,0.5)→(127,127), (-1,0)→(-127,0) — the
    // ±0.5-then-floor rounding absorbs the 1-ulp wobble of x/scale
    val a = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val b = Seq((3L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.embeddingDrift(a, b, "vec_id", "embedding")
      .orderBy("dim").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    // dim 0: sum_a=254 n_a=2, sum_b=-127 n_b=1 → cross=254·1−(−127)·2=508
    assert(out(0) === ((254L, 2L, -127L, 1L, 508L, 127.0 - -127.0)))
    // dim 1: sum_a=127, sum_b=0 → cross=127, mean shift 63.5
    assert(out(1) === ((127L, 2L, 0L, 1L, 127L, 63.5)))
    // scale shape enforced: dim-keyed sides meet in a broadcast join
    // (64-row frames), never a sort-merge shuffle join
    val plan = Similarity.embeddingDrift(a, b, "vec_id", "embedding")
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"), s"drift join not broadcast:\n$plan")
  }
}
