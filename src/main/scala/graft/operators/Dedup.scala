package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline.
  *
  * Scale posture: every variant finds candidate pairs through an
  * equi-join on a derived key (hash, band, shingle) — shuffle-partitioned
  * by that key — never via a cartesian product. Exact verification only
  * runs on candidates.
  */
object Dedup {

  /** Exact duplicate groups by content hash of the raw text. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** Keep-one-per-content-hash projection (survivors). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col(textCol).cast("binary"))).orderBy(col(idCol))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** MinHash signatures: `numHashes` min-values over word `shingleLen`-gram
    * hashes. Seed-varied xxhash64 (built-in, codegen'd).
    *
    * Shape: explode shingles once, then `numHashes` partial-aggregated
    * `min()`s in a single groupBy — one shuffle keyed by doc id, the
    * shingle expression evaluated once per shingle (not once per hash).
    */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int, numHashes: Int): DataFrame = {
    val posts = df.select(col(idCol),
      explode(array_distinct(TextAnalysis.shingles(col(textCol), shingleLen))).as("s"))
    val aggs = (0 until numHashes).map { i =>
      min(xxhash64(concat(col("s"), lit(s"#$i")))).as(s"mh_$i")
    }
    posts.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash-LSH candidate pairs: signatures are split into `bands` bands
    * of `numHashes/bands` rows; docs sharing any band key are candidates.
    * Returns (id_a, id_b) with id_a < id_b, deduplicated.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = minhashSignature(df, idCol, textCol, shingleLen, numHashes)
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        hash((b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh_$i")): _*).as("bkey"))
    }
    val banded = sig
      .withColumn("b", explode(array(bandStructs: _*)))
      .select(col(idCol).as("id"), col("b.band").as("band"), col("b.bkey").as("bkey"))
    val a = banded.withColumnRenamed("id", "id_a")
    val b2 = banded.withColumnRenamed("id", "id_b")
    a.join(b2, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Near-duplicate pairs: LSH candidates verified by exact n-gram Jaccard
    * ≥ `minJaccard` (verification joins only the candidate ids back to the
    * shingle sets — no full cross product). */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, numHashes: Int = 32, bands: Int = 8,
      minJaccard: Double = 0.7): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, shingleLen, numHashes, bands)
    val sets = df.select(col(idCol).as("id"),
      array_distinct(TextAnalysis.shingles(col(textCol), shingleLen)).as("sh"))
    cands
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), Seq("id_a"))
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact all-pairs n-gram Jaccard ≥ threshold via an inverted shingle
    * index (explode → self-equi-join on shingle → per-pair overlap count).
    * Exact counterpart to the LSH approximation; cost bounded by shingle
    * posting-list sizes, not |corpus|².
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    val sets = df.select(col(idCol).as("id"),
      array_distinct(TextAnalysis.shingles(col(textCol), shingleLen)).as("sh"))
    val sizes = sets.select(col("id"), size(col("sh")).as("n"))
    val posts = sets.select(col("id"), explode(col("sh")).as("s"))
    val pairs = posts.withColumnRenamed("id", "id_a")
      .join(posts.withColumnRenamed("id", "id_b"), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), Seq("id_b"))
      .withColumn("jaccard", col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Embedding-cosine near-duplicates: candidates from shared
    * random-hyperplane LSH bands (equi-join, no cross product), verified
    * by exact cosine ≥ `minCosine`. The embedding-space analog of
    * [[minhashNearDupPairs]]. */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, minCosine: Double = 0.95,
      numPlanes: Int = 16, bandBits: Int = 4, seed: Long = 42L): DataFrame = {
    val planes = Similarity.lshSignature(col(vecCol),
      Similarity.hyperplanes(numPlanes, dim, seed))
    val nBands = numPlanes / bandBits
    val banded = df.select(col(idCol).as("id"), col(vecCol).as("vec"), planes.as("sig"))
      .withColumn("b", explode(array((0 until nBands).map { b =>
        struct(lit(b).as("band"),
          concat_ws(",", (0 until bandBits).map(i => col("sig").getItem(b * bandBits + i)): _*).as("bkey"))
      }: _*)))
      .select(col("id"), col("vec"), col("b.band").as("band"), col("b.bkey").as("bkey"))
    val a = banded.select(col("id").as("id_a"), col("vec").as("vec_a"), col("band"), col("bkey"))
    val b2 = banded.select(col("id").as("id_b"), col("vec").as("vec_b"), col("band"), col("bkey"))
    a.join(b2, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "vec_a", "vec_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", Similarity.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** 64-bit SimHash of word tokens: per bit, sum +1/-1 weighted by token
    * hash bit, sign → bit. Computed with built-in bit ops over an exploded
    * token stream (one shuffle on doc id). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(split(TextAnalysis.normalize(col(textCol)), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b_$i")
    }
    val agg = toks.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { i =>
      when(col(s"b_$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, candidates
    * generated by matching any of 4 16-bit chunks (pigeonhole: distance ≤ 3
    * guarantees one exact chunk match). */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sig = simhash(df, idCol, textCol)
    val chunks = (0 until 4).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL).as("ckey"))
    }
    val banded = sig.withColumn("c", explode(array(chunks: _*)))
      .select(col("id"), col("simhash"), col("c.chunk").as("chunk"), col("c.ckey").as("ckey"))
    val a = banded.select(col("id").as("id_a"), col("simhash").as("sig_a"), col("chunk"), col("ckey"))
    val b = banded.select(col("id").as("id_b"), col("simhash").as("sig_b"), col("chunk"), col("ckey"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
