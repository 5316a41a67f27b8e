package graft.tools

/** Throwaway: dump product-quantization sub-codebooks for the
  * pre-trained PQ oracle ([[graft.operators.PqCodebooks]]). */
object DumpPqCodebooks {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val books = graft.operators.Similarity.pqTrain(emb, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 3)
    println("===PQ_CODEBOOKS===")
    books.zipWithIndex.foreach { case (cws, s) =>
      println(s"    // sub $s")
      println("    Seq(")
      cws.foreach { a => println(a.mkString("      Array(", ", ", "),")) }
      println("    ),")
    }
    spark.stop()
  }
}
