package graft.tools

/** Throwaway: dump k-means centroids for the pre-trained IVF oracle. */
object DumpCentroids {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val cents = graft.operators.Similarity.ivfTrain(emb, "vec_id", "embedding",
      nlist = 16, iters = 3)
    println("===CENTROIDS===")
    cents.foreach { a => println(a.mkString("Array(", ", ", "),")) }
    spark.stop()
  }
}
