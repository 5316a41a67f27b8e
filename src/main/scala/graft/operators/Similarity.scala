package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity over an `array<float>` embedding column.
  *
  * Two tiers, per the 100 TB posture:
  *  - [[bruteTopK]]: exact cosine top-k of a (small, broadcast) probe set
  *    against the corpus — the correctness baseline. Probes are broadcast
  *    so the corpus is scanned once with no shuffle of the big side.
  *  - [[lshTopK]]: random-hyperplane LSH — corpus and probes are bucketed
  *    by signature band, candidates come only from shared buckets (an
  *    equi-join, shuffle-partitioned by band key), then exact cosine
  *    re-ranks candidates. No cartesian product anywhere in the plan.
  */
object Similarity {

  /** Cosine similarity of two array<float|double> columns — the native
    * codegen'd [[graft.functions.VectorCosine]] expression (one fused
    * loop; the `aggregate`/`zip_with` formulation is interpreted and
    * ~10× slower on the candidate-verification hot path). */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftops.PlanApi
    PlanApi.column(graft.functions.VectorCosine(
      PlanApi.expression(a), PlanApi.expression(b)))
  }

  /** `(idCol, vecCol)` projected to `(outId, outVec)` with the vector
    * normalized to array<double>. The cast is skipped on the element
    * TYPE, never on column names: an array<double> input passes through
    * untouched (the interpreted `transform` lambda is not free), while
    * any other element type — including a float column that happens to
    * already be named `cand_vec` — gets the widening cast. */
  private def normVec(df: DataFrame, idCol: String, vecCol: String,
      outId: String, outVec: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // resolve through the analyzer (case-insensitive, like every other
    // column reference) rather than schema.fieldIndex (case-sensitive)
    val resolved = df.select(col(vecCol)).schema.head.dataType
    val vec = resolved match {
      case ArrayType(DoubleType, _) => col(vecCol)
      case _ => transform(col(vecCol), x => x.cast("double"))
    }
    df.select(col(idCol).as(outId), vec.as(outVec))
  }

  /** Exact top-k cosine neighbors for each probe row.
    * `probes` must be small (it is broadcast). Self-matches (same id) are
    * excluded. Deterministic tie-break on candidate id.
    */
  def bruteTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
    // cosine is interpreted lambda work; a single-file corpus arrives as
    // one split — spread it before the per-pair scoring. Left AQE-
    // coalescable (no explicit count) DELIBERATELY: r20 probed the
    // explicit session-width form and the vector family REGRESSED
    // (+0.1–0.45 s/query) — a few-MB vector frame's per-pair arithmetic
    // doesn't amortize 32-task dispatch; the session coalesce floor
    // (GraftSession.tune, 256k — the shipped value; the probe ran at
    // 64k) already yields byte-proportional parallelism here. Explicit width is reserved for the text-explode
    // family whose per-row cost is ~100× its bytes (see Dedup.wordPosts).
    val c = corpus.repartition(col(idCol))
      .select(col(idCol).as("cand_id"), col(vecCol).as("cand_vec"))
    val scored = c
      .join(broadcast(p), col("cand_id") =!= col("probe_id"))
      .withColumn("sim", cosine(col("probe_vec"), col("cand_vec")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("cand_id"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("cand_id"), col("sim"), col("rn"))
  }

  /** Symmetric per-vector int8 quantization — the vector-compression leg
    * of a 100 TB ANN store: codes are 4× smaller than float32, which is
    * usually the difference between an in-memory index and one that
    * spills. `scale = max|v| / 127` rides alongside the codes for
    * dot-product reconstruction; code `i` is `floor(v_i/scale + 0.5)`
    * — round-half-up spelled as IEEE floor/divide/add, because those
    * are correctly-rounded in every engine while `round()` is not
    * (Registry header rule). COSINE over codes needs no scale at all
    * (it cancels), and integer products summed in doubles are exact —
    * which is what makes the quantized search path fully
    * oracle-checkable, unlike raw float cosine where only matched
    * summation order saves the compare.
    *
    * Returns (id, scale, qvec: array<tinyint>); a zero vector keeps
    * all-zero codes (scale floors at 1e-30, never 0). Pure per-row
    * expressions — quantization runs at scan speed. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // Fused codegen pass (r20): the former higher-order chain
    // (`transform(cast)` + `array_max(transform(abs))` +
    // `transform(floor(x/scale+0.5))`) is evaluated INTERPRETED by Spark
    // with closure dispatch per element — measured as 0.7 s cpu per
    // snapshot scan at sf0.1 in the drift family and the dominant
    // per-row cost of every on-the-fly quantization at scale.
    // [[graft.functions.VectorInt8]] computes the identical scale and
    // codes (the null/NaN/empty cases are pinned on the expression and
    // in VectorInt8Spec) in one JIT-compiled loop; the struct is
    // evaluated once per row (both fields project from the same call —
    // codegen subexpression elimination, the TextProfile pattern).
    //
    // VectorInt8 accepts array<float|double> only; any OTHER numeric
    // element type (array<int> vectors the pre-r20 lambda chain handled
    // via its cast front-end) gets the same widening cast projected in
    // front (r21 ADVICE — keeps the public operator's accepted inputs
    // unchanged; the float/double hot path stays a single fused call).
    import org.apache.spark.sql.graftops.PlanApi
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val resolved = df.select(col(vecCol)).schema.head.dataType
    val vec = resolved match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => col(vecCol)
      case _ => transform(col(vecCol), x => x.cast("double"))
    }
    val q = PlanApi.column(graft.functions.VectorInt8(
      PlanApi.expression(vec)))
    df.select(col(idCol).as("id"), q.as("_q"))
      .select(col("id"), col("_q.scale").as("scale"), col("_q.qvec").as("qvec"))
  }

  /** Exact top-k cosine over int8-quantized vectors — [[bruteTopK]] run
    * on the compressed store, quantizing raw float vectors on the fly
    * (the one-shot shape; [[int8TopKStored]] searches a pre-quantized
    * code table instead). Codes widen to double ONCE per row before the
    * pair join (not per pair), then score through the codegen'd
    * [[cosine]]. Probes broadcast; the corpus-side repartition is a
    * DELIBERATE spread, not an avoidable shuffle — cosine is per-pair
    * arithmetic and a single-file corpus otherwise arrives as one split
    * (same note as [[bruteTopK]]). */
  def int8TopK(corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame =
    int8TopKStored(quantizeInt8(corpus, idCol, vecCol), probes, idCol, vecCol, k)

  /** EMBEDDING-DISTRIBUTION DRIFT between two corpus snapshots — the
    * vector analogue of `TextAnalysis.vocabularyDrift`: has the
    * embedding distribution moved between crawls/model versions?
    * Per-dimension sums of int8 codes ([[quantizeInt8]]) are exact
    * integers, so the cross-multiplied mean comparison
    * `cross_diff = sum_a·n_b − sum_b·n_a` is engine-exact — raw-float
    * means can never hash-match (accumulation-order dependence);
    * `mean_shift` divides only at the very end (two correctly-rounded
    * IEEE divisions + one subtraction over exact integers).
    *
    * Scale shape: quantization rides the scan; posexplode fans out dim×
    * rows but the groupBy key space is the DIMENSION count, so partial
    * aggregation collapses map-side to `dim` rows per partition and
    * per-shard partial sums merge by adding — the same mergeable-summary
    * contract as the sketch trio. Overflow bound: |code| ≤ 127 keeps
    * `sum` exact to ~7·10^16 vectors and `cross_diff` to
    * `sum·n < 2^63` — holds past 10^8 vectors per side at dim 64;
    * revisit with DECIMAL(38) sums beyond that. */
  def embeddingDrift(a: DataFrame, b: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    def sums(df: DataFrame, tag: String) =
      quantizeInt8(df, idCol, vecCol)
        .select(posexplode(col("qvec")).as(Seq("dim", "q")))
        .groupBy("dim")
        .agg(sum(col("q").cast("long")).as(s"sum_$tag"),
          count(lit(1)).as(s"n_$tag"))
    sums(a, "a").join(sums(b, "b"), Seq("dim"))
      .withColumn("cross_diff",
        col("sum_a") * col("n_b") - col("sum_b") * col("n_a"))
      .withColumn("mean_shift",
        col("sum_a").cast("double") / col("n_a")
          - col("sum_b").cast("double") / col("n_b"))
      .select(col("dim"), col("sum_a"), col("n_a"), col("sum_b"), col("n_b"),
        col("cross_diff"), col("mean_shift"))
  }

  /** [[int8TopK]] over an ALREADY-quantized `(id, scale, qvec)` code
    * table ([[quantizeInt8]] output) — the production shape: the store
    * holds 4×-compressed codes, quantization cost was paid once at write
    * time, and only the (small) probe set quantizes at query time.
    * Cosine over codes needs no scale (it cancels), so `scale` is
    * carried by the store purely for dot-product/L2 reconstruction. */
  def int8TopKStored(codes: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    def widen(df: DataFrame, id: String, vec: String) =
      df.select(col("id").as(id),
        transform(col("qvec"), x => x.cast("double")).as(vec))
    // AQE-coalescable by design — see the bruteTopK width note (r20)
    val c = widen(codes, "cand_id", "cand_q").repartition(col("cand_id"))
    val p = widen(quantizeInt8(probes, idCol, vecCol), "probe_id", "probe_q")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("probe_id").orderBy(col("qsim").desc, col("cand_id"))
    c.join(broadcast(p), col("cand_id") =!= col("probe_id"))
      .withColumn("qsim", cosine(col("probe_q"), col("cand_q")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("cand_id"), col("qsim"), col("rn"))
  }

  /** IVF (inverted-file) ANN — the second scale path next to LSH: a
    * coarse k-means quantizer buckets the corpus into `nlist` cells;
    * each probe searches only its `nprobe` nearest cells (equi-join on
    * cell id), then exact cosine re-ranks. At 100 TB the corpus-side
    * assignment is one broadcast-free scan per Lloyd iteration (centroids
    * are driver-side literals), and query cost is bounded by
    * nprobe/nlist of the corpus.
    *
    * Deterministic: centroids initialize from the first `nlist` vectors
    * by id; `iters` Lloyd iterations.
    */
  def ivfTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 3): DataFrame = {
    // ONE regime decision for the in-session training path (r19,
    // measured at 10M vectors / 8 g): every Lloyd iteration's assign
    // step collapses the centroid fan-out with a groupBy(id) that
    // carries the FULL vectors — planned at session width, with the
    // deserialized MEMORY_AND_DISK corpus cache pinning the storage
    // pool, the first iteration died UNABLE_TO_ACQUIRE_MEMORY. Beyond
    // fixture: hash(id, w) at the source serves the assign aggregate of
    // EVERY iteration exchange-free (one corpus shuffle per training,
    // not per iteration — the means aggregate collapses map-side to
    // nlist×dim rows regardless), and the cache goes DISK_ONLY.
    // ivfTrain takes the corpus layout as given, so callers own this
    // decision once; fixture inputs: None, plans byte-identical.
    val width = graft.GraftSession.explodeWidth(corpus, expansion = 8.0)
    val c0 = normVec(corpus, idCol, vecCol, "cand_id", "cand_vec")
    val c = (width match {
        case Some(w) => c0.repartition(w, col("cand_id"))
        case None    => c0
      }).persist(
        if (width.isDefined) org.apache.spark.storage.StorageLevel.DISK_ONLY
        else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val centroids = ivfTrain(c, "cand_id", "cand_vec", nlist, iters)
    ivfSearch(c, probes, idCol, vecCol, k, centroids, nprobe)
  }

  /** Lloyd-iteration k-means coarse quantizer training (the offline half
    * of an IVF index). Deterministic: centroids initialize from the first
    * `nlist` vectors by id, no RNG. The per-iteration collect is bounded
    * (nlist × dim doubles), never the corpus. */
  def ivfTrain(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int): Seq[Array[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // normalization gates on the element TYPE (normVec), never on column
    // names: a float column already named (idCol, vecCol) still widens,
    // so the collect below can't ClassCastException on getSeq[Double]
    val c = normVec(corpus, idCol, vecCol, idCol, vecCol)

    // centroids live in a small broadcast table, NOT in the expression
    // tree: a least()-over-nlist-structs expression stops codegen'ing
    // around nlist≈16 and would be megabytes of plan at nlist=4096. The
    // broadcast nested-loop fan-out collapses map-side (partial min),
    // so the shuffle carries one row per vector regardless of nlist.
    def centDF(cents: Seq[Array[Double]]): DataFrame =
      cents.zipWithIndex.map { case (a, i) => (i, a.toSeq) }.toDF("cell", "centroid")

    // init: first nlist vectors by id (deterministic, no RNG)
    var centroids: Seq[Array[Double]] = c.orderBy(idCol).limit(nlist)
      .select(vecCol).collect().map(_.getSeq[Double](0).toArray).toSeq
    // Lloyd iterations: assign (deterministic cell tie-break), then
    // element-wise mean per cell
    for (_ <- 0 until iters) {
      val assigned = c.crossJoin(broadcast(centDF(centroids)))
        .withColumn("d", -cosine(col(vecCol), col("centroid")))
        .groupBy(col(idCol))
        .agg(first(col(vecCol)).as(vecCol),
          min(struct(col("d"), col("cell"))).getField("cell").as("cell"))
      val means = assigned
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg(col("x")).as("m"))
        .groupBy("cell").agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), transform(col("pm"), p => p.getField("m")).as("centroid"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i)))
    }
    centroids
  }

  /** IVF search with a GIVEN (pre-trained) coarse quantizer — the shape a
    * production index runs: the quantizer is trained once offline and
    * shipped as constants, queries only assign + probe + re-rank. Kept
    * separate from [[ivfTopK]] (which trains in-session) so the trained
    * path is oracle-checkable with centroid literals on both engines. */
  def ivfSearch(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroids: Seq[Array[Double]], nprobe: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // type-gated normalization (see normVec): already-double vectors pass
    // through (ivfTopK hands its cached normalized frame straight in),
    // float vectors widen regardless of what the columns are named
    val c =
      if (corpus.columns.sameElements(Array("cand_id", "cand_vec")))
        normVec(corpus, "cand_id", "cand_vec", "cand_id", "cand_vec")
      else normVec(corpus, idCol, vecCol, "cand_id", "cand_vec")
    def centDF(cents: Seq[Array[Double]]): DataFrame =
      cents.zipWithIndex.map { case (a, i) => (i, a.toSeq) }.toDF("cell", "centroid")
    val cells = c.crossJoin(broadcast(centDF(centroids)))
      .withColumn("d", -cosine(col("cand_vec"), col("centroid")))
      .groupBy(col("cand_id"))
      .agg(first(col("cand_vec")).as("cand_vec"),
        min(struct(col("d"), col("cell"))).getField("cell").as("cell"))
    // probes explode to their nprobe nearest cells (small side: a window
    // top-nprobe over the same broadcast fan-out)
    import org.apache.spark.sql.expressions.Window
    val probeCells = normVec(probes, idCol, vecCol, "probe_id", "probe_vec")
      .crossJoin(broadcast(centDF(centroids)))
      .withColumn("d", -cosine(col("probe_vec"), col("centroid")))
      .withColumn("pr", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("d"), col("cell"))))
      .filter(col("pr") <= nprobe)
      .select("probe_id", "probe_vec", "cell")
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("cand_id"))
    cells.join(probeCells, Seq("cell"))
      .filter(col("cand_id") =!= col("probe_id"))
      .withColumn("sim", cosine(col("probe_vec"), col("cand_vec")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      // raw double sim, NOT round(,6): DuckDB's round() on doubles is
      // approximate near half-ulp boundaries (Registry header rule);
      // the cosine itself is bitwise-identical across engines
      .select(col("probe_id"), col("cand_id"), col("sim"), col("rn"))
  }

  /** Product-quantization codebook training — the compression tier past
    * int8: the vector splits into `m` subvectors of `dim/m` dims, each
    * subvector space gets its own `ksub`-codeword k-means codebook, and a
    * stored vector becomes `m` small code ids (m=8, ksub=16 → 8 nibbles
    * for a 64-float vector, 64× smaller than float32). Offline half of
    * [[pqSearch]], shipped as constants ([[graft.operators.PqCodebooks]]).
    *
    * Deterministic, like [[ivfTrain]]: sub-codebooks initialize from the
    * first `ksub` vectors' slices by id, `iters` Lloyd rounds with L2
    * assignment (the PQ metric — unlike the coarse IVF quantizer, a
    * subvector's MAGNITUDE matters for reconstruction, so cosine would
    * be the wrong fit here) and code-id tie-break. Per-iteration collect
    * is bounded by m × ksub × dsub doubles, never the corpus. */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int): Seq[Seq[Array[Double]]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = normVec(corpus, idCol, vecCol, "id", "vec")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dim = c.select(size(col("vec"))).head().getInt(0)
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m subvectors")
    val dsub = dim / m
    // one row per (id, sub, sv): every Lloyd round trains all m
    // subspaces in ONE distributed pass over this exploded stream
    val sliced = c.select(col("id"), explode(array((0 until m).map { s =>
        struct(lit(s).as("sub"), slice(col("vec"), s * dsub + 1, dsub).as("sv"))
      }: _*)).as("x"))
      .select(col("id"), col("x.sub").as("sub"), col("x.sv").as("sv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val init = c.orderBy("id").limit(ksub).select("vec").collect()
      .map(_.getSeq[Double](0).toArray)
    var books: Seq[Seq[Array[Double]]] = (0 until m).map { s =>
      init.toSeq.map(v => v.slice(s * dsub, (s + 1) * dsub))
    }
    def bookDF(bs: Seq[Seq[Array[Double]]]): DataFrame =
      bs.zipWithIndex.flatMap { case (cws, s) =>
        cws.zipWithIndex.map { case (cw, ci) => (s, ci, cw.toSeq) }
      }.toDF("sub", "code", "cw")
    for (_ <- 0 until iters) {
      val assigned = sliced.join(broadcast(bookDF(books)), Seq("sub"))
        .withColumn("d", expr(
          "aggregate(zip_with(sv, cw, (x, c) -> (x - c) * (x - c)), 0D, (a, x) -> a + x)"))
        .groupBy("id", "sub")
        .agg(first(col("sv")).as("sv"),
          min(struct(col("d"), col("code"))).getField("code").as("code"))
      val means = assigned
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy("sub", "code", "pos").agg(avg(col("x")).as("mn"))
        .groupBy("sub", "code")
        .agg(array_sort(collect_list(struct(col("pos"), col("mn")))).as("pm"))
        .select(col("sub"), col("code"),
          transform(col("pm"), p => p.getField("mn")).as("cw"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray)
        .toMap
      books = books.zipWithIndex.map { case (cws, s) =>
        cws.zipWithIndex.map { case (cw, ci) => means.getOrElse((s, ci), cw) }
      }
    }
    sliced.unpersist()
    c.unpersist()
    books
  }

  /** PQ (asymmetric) top-k search with GIVEN codebooks — the online half:
    * every corpus vector is replaced by its m-codeword RECONSTRUCTION
    * (what a production store keeps as m nibble codes and expands from
    * the broadcast codebooks at scan time), probes stay full-precision,
    * and exact cosine(probe, reconstruction) ranks candidates. Corpus
    * scanned once; codebooks broadcast (m × ksub rows); the per-sub
    * argmin collapses map-side, so the only corpus-sized shuffle carries
    * one (id, m codes) row per vector.
    *
    * Assignment minimizes L2 via `|c|² − 2·sv·c` (the |sv|² term is
    * constant per slot and drops out of the argmin) — `cw2` is folded
    * left-to-right from the same literals in both engines and
    * [[graft.functions.VectorDot]] matches the oracle's list_sum fold,
    * so codes, reconstructions and scores are all engine-exact. */
  def pqSearch(corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int,
      codebooks: Seq[Seq[Array[Double]]]): DataFrame = {
    val c = normVec(corpus, idCol, vecCol, "cand_id", "cand_vec")
    val recon = pqRecon(c, codebooks)
    val p = normVec(probes, idCol, vecCol, "probe_id", "probe_vec")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("cand_id"))
    recon.join(broadcast(p), col("cand_id") =!= col("probe_id"))
      .withColumn("sim", cosine(col("probe_vec"), col("recon")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("cand_id"), col("sim"), col("rn"))
  }

  /** The PQ encode-and-reconstruct subplan shared by [[pqSearch]] and
    * [[ivfPqSearch]]: `(cand_id, cand_vec: array<double>)` →
    * `(cand_id, recon)` where recon concatenates each subvector's
    * nearest codeword. One corpus scan; codebooks broadcast; the per-sub
    * argmin collapses map-side. */
  private def pqRecon(c: DataFrame,
      codebooks: Seq[Seq[Array[Double]]]): DataFrame = {
    val spark = c.sparkSession
    import spark.implicits._
    val m = codebooks.size
    val dsub = codebooks.head.head.length
    val cb = codebooks.zipWithIndex.flatMap { case (cws, s) =>
      cws.zipWithIndex.map { case (cw, ci) =>
        (s, ci, cw.toSeq, cw.foldLeft(0.0)((a, x) => a + x * x))
      }
    }.toDF("sub", "code", "cw", "cw2")
    val sliced = c.select(col("cand_id"), explode(array((0 until m).map { s =>
        struct(lit(s).as("sub"), slice(col("cand_vec"), s * dsub + 1, dsub).as("sv"))
      }: _*)).as("x"))
      .select(col("cand_id"), col("x.sub").as("sub"), col("x.sv").as("sv"))
    import org.apache.spark.sql.graftops.PlanApi
    val dot = PlanApi.column(graft.functions.VectorDot(
      PlanApi.expression(col("sv")), PlanApi.expression(col("cw"))))
    sliced.join(broadcast(cb), Seq("sub"))
      .withColumn("d", col("cw2") - lit(2.0) * dot)
      .groupBy("cand_id", "sub")
      .agg(min(struct(col("d"), col("code"), col("cw"))).getField("cw").as("cw"))
      .groupBy("cand_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("sub"), col("cw")))),
        p => p.getField("cw"))).as("recon"))
  }

  /** IVF-PQ — the composed production ANN index (coarse cells + PQ
    * codes, the FAISS IVFPQ shape): the pre-trained coarse quantizer
    * prunes the search to `nprobe` cells per probe, and candidates rank
    * by cosine against their PQ RECONSTRUCTIONS instead of raw vectors —
    * so query cost is bounded by nprobe/nlist of the corpus AND the
    * store holds only m small codes per vector (64× at m=8/ksub=16).
    * Both quantizers ship as constants, so the whole path — cell
    * assignment, probe expansion, PQ codes, reconstruction scores — is
    * engine-exact and oracle-checked end-to-end. One corpus scan per
    * branch (cells, codes) off a shared lazily-persisted projection;
    * centroids and codebooks broadcast; candidates come from an
    * equi-join on cell id, never a cartesian. */
  def ivfPqSearch(corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroids: Seq[Array[Double]], nprobe: Int,
      codebooks: Seq[Seq[Array[Double]]]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // shared by the cell-assignment and PQ-encode branches — lazy
    // plan-keyed persist (populated on the query's first action)
    val c = normVec(corpus, idCol, vecCol, "cand_id", "cand_vec")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def centDF(cents: Seq[Array[Double]]): DataFrame =
      cents.zipWithIndex.map { case (a, i) => (i, a.toSeq) }.toDF("cell", "centroid")
    val cells = c.crossJoin(broadcast(centDF(centroids)))
      .withColumn("d", -cosine(col("cand_vec"), col("centroid")))
      .groupBy(col("cand_id"))
      .agg(min(struct(col("d"), col("cell"))).getField("cell").as("cell"))
    val recon = pqRecon(c, codebooks)
    import org.apache.spark.sql.expressions.Window
    val probeCells = normVec(probes, idCol, vecCol, "probe_id", "probe_vec")
      .crossJoin(broadcast(centDF(centroids)))
      .withColumn("d", -cosine(col("probe_vec"), col("centroid")))
      .withColumn("pr", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("d"), col("cell"))))
      .filter(col("pr") <= nprobe)
      .select("probe_id", "probe_vec", "cell")
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("cand_id"))
    cells.join(recon, Seq("cand_id"))
      .join(probeCells, Seq("cell"))
      .filter(col("cand_id") =!= col("probe_id"))
      .withColumn("sim", cosine(col("probe_vec"), col("recon")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("cand_id"), col("sim"), col("rn"))
  }

  /** The materialized IVF-PQ INDEX — what a production store persists
    * instead of raw vectors: `(id, cell, codes: array<int>)`, the coarse
    * cell assignment plus the m PQ code ids per vector (m=8/ksub=16 over
    * 64 floats → 8 small ints, 64× smaller than float32). Write this
    * partitioned by `cell` and searches prune to probed cells at the
    * file level. One corpus scan feeding both branches; centroids and
    * codebooks broadcast; codes are engine-exact (same `|c|² − 2·sv·c`
    * argmin as [[pqSearch]]), so a search over the store returns results
    * IDENTICAL to the inline [[ivfPqSearch]] — proven by the
    * `ann_topk_ivfpq_stored` oracle being the inline formulation. */
  def ivfPqStore(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Array[Double]],
      codebooks: Seq[Seq[Array[Double]]]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // ONE regime decision for the build (r19, measured at 10M vectors /
    // 8 g): the codes pipeline — 8 subvector rows per vector into a
    // 256-way codebook fan-out, then two per-id aggregates — planned at
    // session width put millions of agg groups on each task while the
    // DESERIALIZED MEMORY_AND_DISK corpus cache pinned the storage pool;
    // the collect_list agg's sort fallback died UNABLE_TO_ACQUIRE_MEMORY
    // building the ann_topk_ivfpq_stored store. Beyond fixture, ONE
    // hash(id, w) exchange at the source serves the cell argmin, both
    // code aggregates AND the cells⋈codes join exchange-free (the
    // hash(id) subset algebra; co-partition needs the engine's
    // requireAllClusterKeysForCoPartition=false), and the corpus cache
    // goes DISK_ONLY. Fixture inputs: None — plans byte-identical.
    val width = graft.GraftSession.explodeWidth(corpus, expansion = 8.0)
    val c0 = normVec(corpus, idCol, vecCol, "id", "vec")
    val c = (width match {
        case Some(w) => c0.repartition(w, col("id"))
        case None    => c0
      }).persist(
        if (width.isDefined) org.apache.spark.storage.StorageLevel.DISK_ONLY
        else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = centroids.zipWithIndex.map { case (a, i) => (i, a.toSeq) }
      .toDF("cell", "centroid")
    val cells = c.crossJoin(broadcast(cents))
      .withColumn("d", -cosine(col("vec"), col("centroid")))
      .groupBy("id")
      .agg(min(struct(col("d"), col("cell"))).getField("cell").as("cell"))
    val m = codebooks.size
    val dsub = codebooks.head.head.length
    val cb = codebooks.zipWithIndex.flatMap { case (cws, s) =>
      cws.zipWithIndex.map { case (cw, ci) =>
        (s, ci, cw.toSeq, cw.foldLeft(0.0)((a, x) => a + x * x))
      }
    }.toDF("sub", "code", "cw", "cw2")
    import org.apache.spark.sql.graftops.PlanApi
    val dot = PlanApi.column(graft.functions.VectorDot(
      PlanApi.expression(col("sv")), PlanApi.expression(col("cw"))))
    val codes = c.select(col("id"), explode(array((0 until m).map { s =>
        struct(lit(s).as("sub"), slice(col("vec"), s * dsub + 1, dsub).as("sv"))
      }: _*)).as("x"))
      .select(col("id"), col("x.sub").as("sub"), col("x.sv").as("sv"))
      .join(broadcast(cb), Seq("sub"))
      .withColumn("d", col("cw2") - lit(2.0) * dot)
      .groupBy("id", "sub")
      .agg(min(struct(col("d"), col("code"))).getField("code").as("code"))
      .groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
        p => p.getField("code")).as("codes"))
    // materialize the (id, cell, codes) result — 64× smaller than the raw
    // vectors — so the big normalized-corpus cache can be released HERE
    // instead of leaking MEMORY_AND_DISK blocks for the JVM lifetime
    // (direct callers previously paid that leak per build); checkpoint
    // blocks are context-cleaned once the returned frame is unreachable
    val out = cells.join(codes, Seq("id")).localCheckpoint()
    c.unpersist()
    out
  }

  /** IVF-PQ search over a MATERIALIZED [[ivfPqStore]] table — the online
    * production path: candidates reconstruct from their stored codes via
    * the broadcast codebooks (one lookup join on (sub, code) — the store
    * is scanned once and never touches raw vectors), probes stay
    * full-precision, probed cells prune the candidate set, and ranking
    * is exact cosine against the reconstruction — bit-identical to
    * [[ivfPqSearch]] run inline on the raw corpus. */
  def ivfPqSearchStored(store: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroids: Seq[Array[Double]], nprobe: Int,
      codebooks: Seq[Seq[Array[Double]]]): DataFrame = {
    val spark = store.sparkSession
    import spark.implicits._
    val cb = codebooks.zipWithIndex.flatMap { case (cws, s) =>
      cws.zipWithIndex.map { case (cw, ci) => (s, ci, cw.toSeq) }
    }.toDF("sub", "code", "cw")
    val cents = centroids.zipWithIndex.map { case (a, i) => (i, a.toSeq) }
      .toDF("cell", "centroid")
    import org.apache.spark.sql.expressions.Window
    val probeCells = normVec(probes, idCol, vecCol, "probe_id", "probe_vec")
      .crossJoin(broadcast(cents))
      .withColumn("d", -cosine(col("probe_vec"), col("centroid")))
      .withColumn("pr", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("d"), col("cell"))))
      .filter(col("pr") <= nprobe)
      .select("probe_id", "probe_vec", "cell")
    // Probed-cell prune BEFORE reconstruction (r19): the recon pipeline
    // (8-way posexplode, codebook join, per-candidate collect_list) is
    // the expensive part, and joining cells only afterwards meant every
    // cell in the store was reconstructed. The broadcast semi-join on
    // the (≤ probes×nprobe) probed-cell set reaches the SCAN — the store
    // is partitioned by cell, so the documented file-level pruning is
    // now real in the plan, not just in the layout.
    val candStore = store.join(
      broadcast(probeCells.select("cell").distinct()), Seq("cell"), "left_semi")
    // Same width regime as the build — codes inflate ~64× when
    // reconstructed (8 ints -> 64 doubles) — but scaled to the PRUNED
    // stream: the semi-join above keeps ~nprobe/nlist of the store, and
    // deriving the width from the full store's stats would over-split a
    // few probed cells into mostly-empty partitions (per-task overhead,
    // a pointless wide shuffle of a small set). The store estimate ×
    // the probed fraction models what the repartition actually moves.
    // Fixture: None either way (stats below target), branch identical.
    val probedFrac = math.min(1.0, nprobe.toDouble / math.max(1, centroids.length))
    val width = graft.GraftSession.explodeWidth(store, expansion = 64.0 * probedFrac)
    val parted = width match {
      case Some(w) => candStore.repartition(w, col("id"))
      case None    => candStore
    }
    val recon = parted
      .select(col("id").as("cand_id"), col("cell"),
        posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(cb), Seq("sub", "code"))
      .groupBy("cand_id", "cell")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("sub"), col("cw")))),
        p => p.getField("cw"))).as("recon"))
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("cand_id"))
    recon.join(probeCells, Seq("cell"))
      .filter(col("cand_id") =!= col("probe_id"))
      .withColumn("sim", cosine(col("probe_vec"), col("recon")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("cand_id"), col("sim"), col("rn"))
  }

  /** Corpus diversity audit against a pre-trained quantizer: assign every
    * vector to its nearest centroid (same deterministic argmin-cosine +
    * cell tie-break as [[ivfSearch]]) and report per-cluster membership —
    * count plus id range. A heavily skewed profile means the embedding
    * space (or the quantizer) has collapsed; a training-data pipeline
    * checks this before trusting cluster-balanced sampling. Scale shape:
    * centroids broadcast, assignment collapses map-side (partial min), the
    * final aggregate is `nlist` rows — one corpus scan, no corpus shuffle
    * beyond the per-id partial-agg. Empty cells simply don't appear
    * (count 0). */
  def clusterProfile(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Array[Double]]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = normVec(corpus, idCol, vecCol, "id", "vec")
    val centDF = centroids.zipWithIndex.map { case (a, i) => (i, a.toSeq) }
      .toDF("cell", "centroid")
    c.crossJoin(broadcast(centDF))
      .withColumn("d", -cosine(col("vec"), col("centroid")))
      .groupBy(col("id"))
      .agg(min(struct(col("d"), col("cell"))).getField("cell").as("cell"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"), min(col("id")).as("min_id"), max(col("id")).as("max_id"))
  }

  /** Deterministic random hyperplanes: `tables` of `dim` doubles drawn from
    * a fixed-seed RNG (no runtime entropy — plans must be reproducible). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Signature bits column: for each hyperplane, sign(dot(v, h)) —
    * codegen'd [[graft.functions.VectorDot]] per plane. */
  def lshSignature(vec: Column, planes: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graftops.PlanApi
    val bits = planes.map { h =>
      val hCol = array(h.toIndexedSeq.map(lit): _*)
      val dot = PlanApi.column(graft.functions.VectorDot(
        PlanApi.expression(vec), PlanApi.expression(hCol)))
      when(dot >= 0, lit(1)).otherwise(lit(0))
    }
    array(bits.toIndexedSeq: _*)
  }

  /** Approximate top-k: candidates share at least one LSH band with the
    * probe; exact cosine re-rank among candidates. Bands = `numPlanes /
    * bandBits` keys of `bandBits` bits each.
    */
  def lshTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int,
      dim: Int, numPlanes: Int = 16, bandBits: Int = 4, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(numPlanes, dim, seed)
    val nBands = numPlanes / bandBits
    def withBands(df: DataFrame, id: String, vec: String): DataFrame = {
      val sig = lshSignature(col(vec), planes)
      // AQE-coalescable by design — see the bruteTopK width note (r20)
      val banded = df.repartition(col(id)).select(col(id), col(vec), sig.as("sig"))
      // one row per (band, bandKey)
      val bandCols = (0 until nBands).map { b =>
        struct(lit(b).as("band"),
          concat_ws(",", (0 until bandBits).map(i => col("sig").getItem(b * bandBits + i)): _*).as("bkey"))
      }
      banded.withColumn("bands", explode(array(bandCols: _*)))
        .select(col(id), col(vec), col("bands.band").as("band"), col("bands.bkey").as("bkey"))
    }
    val c = withBands(corpus, idCol, vecCol)
      .withColumnRenamed(idCol, "cand_id").withColumnRenamed(vecCol, "cand_vec")
    val p = withBands(probes, idCol, vecCol)
      .withColumnRenamed(idCol, "probe_id").withColumnRenamed(vecCol, "probe_vec")
    val cands = c.join(p, Seq("band", "bkey"))
      .filter(col("cand_id") =!= col("probe_id"))
      .select("probe_id", "probe_vec", "cand_id", "cand_vec")
      .dropDuplicates("probe_id", "cand_id")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("cand_id"))
    cands
      .withColumn("sim", cosine(col("probe_vec"), col("cand_vec")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("cand_id"), col("sim"), col("rn"))
  }

  /** Lexical top-k — rank corpus docs per probe by shared distinct word
    * shingles: the sparse/keyword arm of a hybrid retrieval stack (the
    * role BM25 plays in production; overlap count keeps it engine-exact
    * where idf·log weighting would not be). Probes are the small side
    * and broadcast into the corpus posting stream; the overlap count is
    * a map-side-combined groupBy; ranking is a bounded per-probe
    * window. At corpus scale compose with the inverted-index family's
    * stop-shingle prune ([[Dedup.ngramJaccardPairs]]) for candidate
    * generation — full overlap counting against every doc sharing any
    * shingle is the honest cost of this exact formulation.
    * Returns (probe_id, cand_id, overlap, rn). */
  def lexicalTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      textCol: String, k: Int, shingleLen: Int = 3): DataFrame = {
    val cp = Dedup.shinglePosts(corpus, idCol, textCol, shingleLen)
    val pp = Dedup.shinglePosts(probes, idCol, textCol, shingleLen)
      .select(col("id").as("probe_id"), col("s"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("probe_id").orderBy(col("overlap").desc, col("cand_id"))
    cp.join(broadcast(pp), Seq("s"))
      .filter(col("id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("id").as("cand_id"))
      .agg(count(lit(1)).as("overlap"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("cand_id"), col("overlap"), col("rn"))
  }

  /** Reciprocal-rank fusion — combine two per-probe rankings (each
    * `(probe_id, cand_id, rn)`) into one, scoring every candidate
    * `Σ 1/(rrfK + rank)` over the lists it appears in (Cormack et al.'s
    * k=60 default): THE standard hybrid-retrieval merge, score-scale
    * free, so a cosine arm and an overlap-count arm fuse without
    * calibration. Engine-exact: ranks are integers and each term is one
    * IEEE division, summed in fixed order. Candidates missing from a
    * list contribute 0 (full outer join). Returns
    * (probe_id, cand_id, rn_a, rn_b, score, rn).
    *
    * Scale shape: both inputs are already k-bounded per probe, so the
    * fusion join, scoring, and re-rank all operate on O(probes · k)
    * rows — negligible next to the arms that produced them. */
  def rrfFuse(rankA: DataFrame, rankB: DataFrame, k: Int,
      rrfK: Int = 60): DataFrame = {
    val a = rankA.select(col("probe_id"), col("cand_id"), col("rn").as("rn_a"))
    val b = rankB.select(col("probe_id"), col("cand_id"), col("rn").as("rn_b"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("cand_id"))
    a.join(b, Seq("probe_id", "cand_id"), "full_outer")
      .withColumn("score",
        coalesce(lit(1.0) / (lit(rrfK) + col("rn_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("rn_b")), lit(0.0)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("cand_id"), col("rn_a"), col("rn_b"),
        col("score"), col("rn"))
  }

  /** Outcome of a drift-triggered IVF maintenance pass
    * ([[ivfMaintain]]): the drift magnitudes that drove the decision,
    * whether a re-train ran, and the centroids to search with from now
    * on (the re-trained set, or the incumbent set unchanged). */
  final case class IvfMaintenance(maxMeanShift: Double, avgMeanShift: Double,
      retrained: Boolean, centroids: Seq[Array[Double]])

  /** Per-dimension drift report with the re-cluster decision attached —
    * the oracle-checkable face of [[ivfMaintain]]: [[embeddingDrift]]'s
    * exact integer per-dim comparison between the snapshot the index
    * was trained on (`reference`) and the corpus as it stands now
    * (`current`), plus `retrain_needed` = does ANY dimension's
    * |mean_shift| (int8-code units) exceed `threshold`. One-pass shape
    * ([[driftReportWithDecision]]): the decision and the report rows
    * come out of a SINGLE aggregation over the ≤dim-row drift frame,
    * so the corpus is scanned exactly twice (once per snapshot) with
    * no dependence on exchange reuse.
    *
    * An empty reference/current frame yields an EMPTY report (the
    * inner join has nothing to match) — deliberately lazy, no require:
    * this is a composable query, and the eager maintenance decision
    * that must not run on no evidence is [[ivfMaintain]], which fails
    * loudly instead. */
  def ivfDriftReport(reference: DataFrame, current: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame =
    driftReportWithDecision(
      embeddingDrift(current, reference, idCol, vecCol), threshold)

  /** Attach `retrain_needed` to an [[embeddingDrift]] report in ONE
    * aggregation — the `hllRegisters(withCount)` pattern from
    * ta_hll_distinct: `collect_list(struct(…)) + max(|mean_shift|)`
    * folded into a single global agg over the ≤dim-row drift frame,
    * then exploded back. The earlier `report.crossJoin(broadcast(
    * report.agg(max…)))` embedded the corpus-scale quantize+posexplode
    * subtree TWICE in one plan (4 corpus scans instead of 2 unless
    * ReuseExchange happened to fire — the exact dependence the
    * ta_hll_distinct lesson forbids betting on). The fold's final merge
    * is single-partition, but over at most `dim` partially-aggregated
    * rows — bounded by the embedding width, never the corpus. Exposed
    * so [[ivfMaintain]] and callers holding a pre-computed report share
    * the exact plan shape the `ann_ivf_maintain` golden pins. */
  private[graft] def driftReportWithDecision(report: DataFrame,
      threshold: Double): DataFrame = {
    val cols = Seq("dim", "sum_a", "n_a", "sum_b", "n_b",
      "cross_diff", "mean_shift")
    report
      .agg(collect_list(struct(cols.map(col): _*)).as("rows"),
        (max(abs(col("mean_shift"))) > threshold).as("retrain_needed"))
      .select(explode(col("rows")).as("r"), col("retrain_needed"))
      .select(cols.map(c => col(s"r.$c")) :+ col("retrain_needed"): _*)
  }

  /** Drift-triggered IVF index maintenance — the lifecycle piece of the
    * stored indexes ([[ivfPqStore]], `ann_topk_ivfpq_stored`): a coarse
    * quantizer trained on last month's crawl silently loses recall as
    * the embedding distribution moves (a probe's true neighbors straddle
    * stale cell boundaries), so a production index needs a re-cluster
    * DECISION, not a cron re-train. This composes [[embeddingDrift]]
    * (exact, mergeable, corpus-scan-cheap) with [[ivfTrain]]: when any
    * dimension's |mean_shift| exceeds `threshold`, the quantizer
    * re-trains on `current`; otherwise the incumbent centroids return
    * unchanged and nothing was shuffled beyond the drift aggregation.
    * Callers then rebuild the stored index with the returned centroids
    * iff `retrained`. Recall degradation → restoration is asserted in
    * IvfMaintenanceSpec. */
  def ivfMaintain(reference: DataFrame, current: DataFrame,
      idCol: String, vecCol: String, centroids: Seq[Array[Double]],
      threshold: Double, iters: Int = 3): IvfMaintenance =
    ivfMaintainFromReport(embeddingDrift(current, reference, idCol, vecCol),
      current, idCol, vecCol, centroids, threshold, iters)

  /** [[ivfMaintain]] over a drift report the caller already holds
    * ([[embeddingDrift]] output) — so a pipeline that materialized the
    * oracle-facing report ([[ivfDriftReport]]'s input) does not pay the
    * two corpus scans a second time to reach the decision. The decision
    * aggregate reads the ≤dim-row report frame, nothing larger. */
  def ivfMaintainFromReport(report: DataFrame, current: DataFrame,
      idCol: String, vecCol: String, centroids: Seq[Array[Double]],
      threshold: Double, iters: Int = 3): IvfMaintenance = {
    val agg = report
      .agg(max(abs(col("mean_shift"))).as("mx"),
        avg(abs(col("mean_shift"))).as("av"))
      .head()
    // The drift report inner-joins per-dim stats: an empty reference or
    // current frame (or zero overlapping dims) yields null aggregates.
    // Fail with signal, not a getDouble NPE — a maintenance decision
    // made from no evidence is a bug at the call site.
    require(!agg.isNullAt(0) && !agg.isNullAt(1),
      "ivfMaintain: drift report is empty — reference/current snapshot " +
        "has no rows or no overlapping dimensions; cannot decide retrain")
    val (mx, av) = (agg.getDouble(0), agg.getDouble(1))
    if (mx > threshold)
      IvfMaintenance(mx, av, retrained = true,
        ivfTrain(current, idCol, vecCol, centroids.size, iters))
    else IvfMaintenance(mx, av, retrained = false, centroids)
  }

}
