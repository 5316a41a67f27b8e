package graft.tools

import org.apache.spark.sql.SparkSession

/** The `dd_semantic` quadratic's documented fix, measured: exact
  * all-pairs-within-cell semantic dedup at increasing cell counts over
  * the SAME corpus. The pinned-oracle query must keep the 16 fixture
  * centroids (its DuckDB oracle embeds them as literals), so this tool
  * is where the "the fix is more cells" claim becomes a number: cells
  * are re-trained on the corpus itself (`Similarity.ivfTrain`), pair
  * volume shrinks ~quadratically in per-cell occupancy, and the dedup
  * result stays an exact within-cell pairing at every k.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... runMain graft.tools.SemanticCells
  * [k ...]` (default 16 64 256). Prints one line per k:
  * `cells=k train=s dedup=s groups=n`. */
object SemanticCells {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env("SPARK_GRAFT_SF_DIR")
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(16, 64, 256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.attach(spark)
    val emb = graft.Tables(spark, sfDir, "embeddings")
    ks.foreach { k =>
      val t0 = System.nanoTime()
      val cents = graft.operators.Similarity.ivfTrain(emb, "vec_id", "embedding", k, iters = 2)
      val t1 = System.nanoTime()
      val out = graft.operators.Dedup.semanticDedup(emb, "vec_id", "embedding",
        cents, minCosine = 0.4, maxBucket = Int.MaxValue,
        bucketGuard = Some(graft.operators.Dedup.ExactPairsBucketGuard))
      val groups = out.select("component").distinct().count()
      val t2 = System.nanoTime()
      println(f"cells=$k train=${(t1 - t0) / 1e9}%.2f dedup=${(t2 - t1) / 1e9}%.2f groups=$groups")
    }
    spark.stop()
  }
}
