package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.{Dedup, Ewma, Similarity, TextAnalysis}
import QueryShared._

/** Similarity-search family: brute-force / LSH / IVF / PQ / IVF-PQ /
  * int8 ANN, embedding drift, cluster profiles, hybrid RRF.
  * Entries split from the monolithic Registry verbatim. */
private[queries] object AnnQueries {

  val all: Seq[Q] = Seq(


    Q("ann_topk_brute",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        // raw double sim across the whole ANN family: cosine is per-row
        // arithmetic (sequential fold within one row's arrays), bitwise
        // identical across engines — round(,6) both sides was the exact
        // half-ulp-fragile pattern that produced r3's one red oracle row
        Similarity.bruteTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
          .select(col("probe_id"), col("cand_id"), col("sim"), col("rn"))
          .orderBy("probe_id", "rn")
      },
      Some("""WITH p AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 10),
                   scored AS (
                     SELECT p.probe_id, e.vec_id AS cand_id,
                            list_sum(list_transform(list_zip(p.pv, e.embedding),
                              z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
                            / (sqrt(list_sum(list_transform(p.pv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                               * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
                     FROM p, embeddings e WHERE e.vec_id <> p.probe_id),
                   ranked AS (
                     SELECT probe_id, cand_id, sim,
                            row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, cand_id) AS rn
                     FROM scored)
              SELECT probe_id, cand_id, sim, rn
              FROM ranked WHERE rn <= 5 ORDER BY probe_id, rn""")),


    // Hybrid retrieval: dense (cosine top-20) and sparse (shared-shingle
    // top-20) arms fused by reciprocal-rank fusion (k=60) — the standard
    // calibration-free hybrid-search merge; ranks are integers, each RRF
    // term one IEEE division, so the fused ORDER is engine-exact.
    Q("ann_hybrid_rrf",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        val docs = T(s, d, "documents")
        val dense = Similarity.bruteTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 20)
        val sparse = Similarity.lexicalTopK(docs, docs.filter(col("doc_id") < 5),
          "doc_id", "text", 20)
        Similarity.rrfFuse(dense, sparse, k = 10).orderBy("probe_id", "rn")
      },
      Some("""WITH p AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 5),
                   scored AS (
                     SELECT p.probe_id, e.vec_id AS cand_id,
                            list_sum(list_transform(list_zip(p.pv, e.embedding),
                              z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
                            / (sqrt(list_sum(list_transform(p.pv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                               * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
                     FROM p, embeddings e WHERE e.vec_id <> p.probe_id),
                   ra AS (SELECT probe_id, cand_id, rn FROM (
                            SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, cand_id) AS rn
                            FROM scored) WHERE rn <= 20),
                   d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                         FROM documents),
                   w AS (SELECT doc_id, string_split(t, ' ') AS w FROM d),
                   sh AS (SELECT doc_id,
                            CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                                 ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) END AS s
                          FROM w),
                   posts AS (SELECT doc_id, unnest(s) AS sg FROM sh),
                   ov AS (SELECT pp.doc_id AS probe_id, cp.doc_id AS cand_id, count(*) AS overlap
                          FROM posts pp JOIN posts cp
                            ON cp.sg = pp.sg AND cp.doc_id <> pp.doc_id
                          WHERE pp.doc_id < 5 GROUP BY 1, 2),
                   rb AS (SELECT probe_id, cand_id, rn FROM (
                            SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY overlap DESC, cand_id) AS rn
                            FROM ov) WHERE rn <= 20),
                   fused AS (SELECT coalesce(ra.probe_id, rb.probe_id) AS probe_id,
                                    coalesce(ra.cand_id, rb.cand_id) AS cand_id,
                                    ra.rn AS rn_a, rb.rn AS rn_b,
                                    coalesce(1.0E0 / (60 + ra.rn), 0.0E0)
                                      + coalesce(1.0E0 / (60 + rb.rn), 0.0E0) AS score
                             FROM ra FULL OUTER JOIN rb
                               ON rb.probe_id = ra.probe_id AND rb.cand_id = ra.cand_id),
                   rk AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, cand_id) AS rn
                          FROM fused)
              SELECT probe_id, cand_id, rn_a, rn_b, score, rn
              FROM rk WHERE rn <= 10 ORDER BY probe_id, rn""")),


    // int8 quantization audit: per-vector scale (IEEE max/divide — exact)
    // plus integer code checksums. floor(x/scale + 0.5) spells
    // round-half-up in correctly-rounded ops; round() itself differs
    // across engines near .5 (Registry header rule)
    Q("ann_int8_audit",
      (s, d) => Similarity.quantizeInt8(T(s, d, "embeddings"), "vec_id", "embedding")
        .select(col("id").as("vec_id"), col("scale"),
          expr("CAST(aggregate(qvec, 0L, (a, x) -> a + x) AS BIGINT)").as("q_sum"),
          expr("CAST(aggregate(qvec, 0L, (a, x) -> a + CAST(x AS BIGINT) * x) AS BIGINT)").as("q_norm2"))
        .orderBy("vec_id"),
      Some("""WITH v AS (SELECT vec_id,
                           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
                         FROM embeddings),
                   s AS (SELECT vec_id, vec,
                           greatest(list_max(list_transform(vec, x -> abs(x))), 1e-30) / 127.0 AS scale
                         FROM v),
                   q AS (SELECT vec_id, scale,
                           list_transform(vec, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS qv
                         FROM s)
              SELECT vec_id, scale,
                     CAST(list_sum(qv) AS BIGINT) AS q_sum,
                     CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS q_norm2
              FROM q ORDER BY vec_id""")),


    // Embedding-distribution drift: per-dimension int8-code sums compared
    // across two snapshot halves by integer cross-multiplication — the
    // vector analogue of ta_vocab_drift, and a mergeable per-shard
    // summary at 100 TB (raw-float means could never hash-match)
    Q("ann_embed_drift",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        Similarity.embeddingDrift(
          emb.filter(pmod(col("vec_id"), lit(2)) === 0),
          emb.filter(pmod(col("vec_id"), lit(2)) === 1),
          "vec_id", "embedding").orderBy("dim")
      },
      Some("""WITH v AS (SELECT vec_id,
                           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
                         FROM embeddings),
                   s AS (SELECT vec_id, vec,
                           greatest(list_max(list_transform(vec, x -> abs(x))), 1e-30) / 127.0 AS scale
                         FROM v),
                   q AS (SELECT vec_id, scale,
                           list_transform(vec, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS qv
                         FROM s),
                   e AS (SELECT vec_id, unnest([{'dim': i - 1, 'q': qv[i]}
                                                for i in range(1, len(qv) + 1)], recursive := true)
                         FROM q),
                   sa AS (SELECT dim, CAST(sum(q) AS BIGINT) AS sum_a, count(*) AS n_a
                          FROM e WHERE vec_id % 2 = 0 GROUP BY dim),
                   sb AS (SELECT dim, CAST(sum(q) AS BIGINT) AS sum_b, count(*) AS n_b
                          FROM e WHERE vec_id % 2 = 1 GROUP BY dim)
              SELECT sa.dim, sum_a, n_a, sum_b, n_b,
                     sum_a * n_b - sum_b * n_a AS cross_diff,
                     CAST(sum_a AS DOUBLE) / n_a - CAST(sum_b AS DOUBLE) / n_b AS mean_shift
              FROM sa JOIN sb USING (dim) ORDER BY dim""")),


    // drift-triggered index maintenance decision (Similarity.ivfMaintain's
    // oracle-checkable face): the per-dim drift report plus the re-cluster
    // trigger — does ANY dimension's |mean_shift| exceed the threshold.
    // Same exact-integer drift arithmetic as ann_embed_drift; the flag is
    // one unpartitioned max window over the ≤dim-row report
    Q("ann_ivf_maintain",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        Similarity.ivfDriftReport(
          emb.filter(pmod(col("vec_id"), lit(2)) === 1), // reference snapshot
          emb.filter(pmod(col("vec_id"), lit(2)) === 0), // current corpus
          "vec_id", "embedding", threshold = 0.5).orderBy("dim")
      },
      Some("""WITH v AS (SELECT vec_id,
                           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
                         FROM embeddings),
                   s AS (SELECT vec_id, vec,
                           greatest(list_max(list_transform(vec, x -> abs(x))), 1e-30) / 127.0 AS scale
                         FROM v),
                   q AS (SELECT vec_id, scale,
                           list_transform(vec, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS qv
                         FROM s),
                   e AS (SELECT vec_id, unnest([{'dim': i - 1, 'q': qv[i]}
                                                for i in range(1, len(qv) + 1)], recursive := true)
                         FROM q),
                   sa AS (SELECT dim, CAST(sum(q) AS BIGINT) AS sum_a, count(*) AS n_a
                          FROM e WHERE vec_id % 2 = 0 GROUP BY dim),
                   sb AS (SELECT dim, CAST(sum(q) AS BIGINT) AS sum_b, count(*) AS n_b
                          FROM e WHERE vec_id % 2 = 1 GROUP BY dim),
                   rep AS (SELECT sa.dim, sum_a, n_a, sum_b, n_b,
                             sum_a * n_b - sum_b * n_a AS cross_diff,
                             CAST(sum_a AS DOUBLE) / n_a - CAST(sum_b AS DOUBLE) / n_b AS mean_shift
                           FROM sa JOIN sb USING (dim))
              SELECT dim, sum_a, n_a, sum_b, n_b, cross_diff, mean_shift,
                     max(abs(mean_shift)) OVER () > 0.5E0 AS retrain_needed
              FROM rep ORDER BY dim""")),


    // the decision boundary pinned from BOTH sides (r15 verdict #5).
    // HOT: the current snapshot is deliberately drifted (+3.0 added to
    // every component AFTER the double widening, identically on both
    // engines) so |mean_shift| blows far past the threshold regardless
    // of sf and retrain_needed=true is hash-pinned. The +3 SHIFT moves
    // the mean relative to the per-vector scale (a pure scalar multiply
    // would cancel in quantization and show zero drift). Measured note:
    // the even/odd fixture above ALSO lands true at the driver's sf0.01
    // (max |mean_shift| 13.96 — the halves are not distributionally
    // identical), so the false side needs the _calm entry below, not
    // the split.
    Q("ann_ivf_maintain_hot",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        val drifted = emb.select(col("vec_id"),
          transform(col("embedding"),
            x => x.cast("double") + lit(3.0)).as("embedding"))
        Similarity.ivfDriftReport(
          emb.filter(pmod(col("vec_id"), lit(2)) === 1), // reference snapshot
          drifted.filter(pmod(col("vec_id"), lit(2)) === 0), // drifted current
          "vec_id", "embedding", threshold = 0.5).orderBy("dim")
      },
      Some("""WITH v AS (SELECT vec_id,
                           CASE WHEN vec_id % 2 = 0
                             THEN list_transform(embedding, x -> CAST(x AS DOUBLE) + 3.0)
                             ELSE list_transform(embedding, x -> CAST(x AS DOUBLE)) END AS vec
                         FROM embeddings),
                   s AS (SELECT vec_id, vec,
                           greatest(list_max(list_transform(vec, x -> abs(x))), 1e-30) / 127.0 AS scale
                         FROM v),
                   q AS (SELECT vec_id, scale,
                           list_transform(vec, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS qv
                         FROM s),
                   e AS (SELECT vec_id, unnest([{'dim': i - 1, 'q': qv[i]}
                                                for i in range(1, len(qv) + 1)], recursive := true)
                         FROM q),
                   sa AS (SELECT dim, CAST(sum(q) AS BIGINT) AS sum_a, count(*) AS n_a
                          FROM e WHERE vec_id % 2 = 0 GROUP BY dim),
                   sb AS (SELECT dim, CAST(sum(q) AS BIGINT) AS sum_b, count(*) AS n_b
                          FROM e WHERE vec_id % 2 = 1 GROUP BY dim),
                   rep AS (SELECT sa.dim, sum_a, n_a, sum_b, n_b,
                             sum_a * n_b - sum_b * n_a AS cross_diff,
                             CAST(sum_a AS DOUBLE) / n_a - CAST(sum_b AS DOUBLE) / n_b AS mean_shift
                           FROM sa JOIN sb USING (dim))
              SELECT dim, sum_a, n_a, sum_b, n_b, cross_diff, mean_shift,
                     max(abs(mean_shift)) OVER () > 0.5E0 AS retrain_needed
              FROM rep ORDER BY dim""")),


    // CALM: current == reference (the same even half on both sides), so
    // every per-dim sum matches exactly, mean_shift is an exact 0.0 on
    // every row, and retrain_needed=false is hash-pinned at ANY sf —
    // the production no-op case (index stays, nothing re-trains). This
    // is deliberately snapshot-identity, not a high threshold: a
    // threshold no data could cross would pin the branch vacuously.
    Q("ann_ivf_maintain_calm",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        val even = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
        Similarity.ivfDriftReport(even, even,
          "vec_id", "embedding", threshold = 0.5).orderBy("dim")
      },
      Some("""WITH v AS (SELECT vec_id,
                           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
                         FROM embeddings WHERE vec_id % 2 = 0),
                   s AS (SELECT vec_id, vec,
                           greatest(list_max(list_transform(vec, x -> abs(x))), 1e-30) / 127.0 AS scale
                         FROM v),
                   q AS (SELECT vec_id, scale,
                           list_transform(vec, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS qv
                         FROM s),
                   e AS (SELECT vec_id, unnest([{'dim': i - 1, 'q': qv[i]}
                                                for i in range(1, len(qv) + 1)], recursive := true)
                         FROM q),
                   sd AS (SELECT dim, CAST(sum(q) AS BIGINT) AS sum_a, count(*) AS n_a
                          FROM e GROUP BY dim),
                   rep AS (SELECT dim, sum_a, n_a, sum_a AS sum_b, n_a AS n_b,
                             CAST(0 AS BIGINT) AS cross_diff,
                             0.0E0 AS mean_shift
                           FROM sd)
              SELECT dim, sum_a, n_a, sum_b, n_b, cross_diff, mean_shift,
                     max(abs(mean_shift)) OVER () > 0.5E0 AS retrain_needed
              FROM rep ORDER BY dim""")),


    // top-k over the COMPRESSED store: cosine over int8 codes (scales
    // cancel; integer products sum exactly in doubles, so the score is
    // unconditionally engine-exact — no summation-order dependence)
    Q("ann_topk_int8",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        Similarity.int8TopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
          .orderBy("probe_id", "rn")
      },
      Some("""WITH v AS (SELECT vec_id,
                           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
                         FROM embeddings),
                   s AS (SELECT vec_id, vec,
                           greatest(list_max(list_transform(vec, x -> abs(x))), 1e-30) / 127.0 AS scale
                         FROM v),
                   q AS (SELECT vec_id,
                           list_transform(vec, x -> floor(x / scale + 0.5)) AS qv
                         FROM s),
                   pr AS (SELECT vec_id AS probe_id, qv AS pq FROM q WHERE vec_id < 10),
                   sim AS (SELECT pr.probe_id, c.vec_id AS cand_id,
                             list_sum(list_transform(list_zip(pr.pq, c.qv),
                               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
                             / (sqrt(list_sum(list_transform(pr.pq, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                                * sqrt(list_sum(list_transform(c.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS qsim
                           FROM pr, q c WHERE c.vec_id <> pr.probe_id),
                   ranked AS (SELECT probe_id, cand_id, qsim,
                                row_number() OVER (PARTITION BY probe_id ORDER BY qsim DESC, cand_id) AS rn
                              FROM sim)
              SELECT probe_id, cand_id, qsim, rn
              FROM ranked WHERE rn <= 5 ORDER BY probe_id, rn""")),


    // The same compressed-store search through a REAL store roundtrip:
    // codes are written to parquet (tinyint + double survive bit-exactly)
    // and searched from the re-read table via int8TopKStored — proving
    // the production shape (quantize once at write time, search codes)
    // returns the identical result. Oracle = the inline formulation.
    Q("ann_topk_int8_stored",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        // the store is staged ONCE per (JVM, sf dir) — re-quantizing on
        // every invocation would fold the write into the "search a
        // pre-quantized store" timing and leak a temp dir per run
        val store = Int8StoreCache.get(s, d, emb)
        Similarity.int8TopKStored(s.read.parquet(store),
            emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
          .orderBy("probe_id", "rn")
      },
      Some("""WITH v AS (SELECT vec_id,
                           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
                         FROM embeddings),
                   s AS (SELECT vec_id, vec,
                           greatest(list_max(list_transform(vec, x -> abs(x))), 1e-30) / 127.0 AS scale
                         FROM v),
                   q AS (SELECT vec_id,
                           list_transform(vec, x -> floor(x / scale + 0.5)) AS qv
                         FROM s),
                   pr AS (SELECT vec_id AS probe_id, qv AS pq FROM q WHERE vec_id < 10),
                   sim AS (SELECT pr.probe_id, c.vec_id AS cand_id,
                             list_sum(list_transform(list_zip(pr.pq, c.qv),
                               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
                             / (sqrt(list_sum(list_transform(pr.pq, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                                * sqrt(list_sum(list_transform(c.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS qsim
                           FROM pr, q c WHERE c.vec_id <> pr.probe_id),
                   ranked AS (SELECT probe_id, cand_id, qsim,
                                row_number() OVER (PARTITION BY probe_id ORDER BY qsim DESC, cand_id) AS rn
                              FROM sim)
              SELECT probe_id, cand_id, qsim, rn
              FROM ranked WHERE rn <= 5 ORDER BY probe_id, rn""")),


    Q("ann_topk_lsh",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
            k = 5, dim = 64)
          .select(col("probe_id"), col("cand_id"), col("sim"), col("rn"))
          .orderBy("probe_id", "rn")
      },
      // same fixed-seed hyperplanes as dd_embed_neardup: sign-bit bands,
      // shared-band candidates, exact-cosine re-rank — all replicated
      Some(s"""WITH planes(pi, pv) AS (VALUES $planeLiterals),
                   bits AS (SELECT v.vec_id, p.pi,
                              CASE WHEN list_sum(list_transform(list_zip(v.embedding, p.pv),
                                     z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) >= 0
                                   THEN 1 ELSE 0 END AS bit
                            FROM embeddings v CROSS JOIN planes p),
                   bands AS (SELECT vec_id, pi // 4 AS band, string_agg(bit, ',' ORDER BY pi) AS bkey
                             FROM bits GROUP BY 1, 2),
                   cand AS (SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS cand_id
                            FROM bands p JOIN bands c
                              ON p.band = c.band AND p.bkey = c.bkey
                            WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id),
                   cos AS (SELECT cd.probe_id, cd.cand_id,
                             list_sum(list_transform(list_zip(va.embedding, vb.embedding),
                               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
                             / (sqrt(list_sum(list_transform(va.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                                * sqrt(list_sum(list_transform(vb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
                           FROM cand cd
                           JOIN embeddings va ON va.vec_id = cd.probe_id
                           JOIN embeddings vb ON vb.vec_id = cd.cand_id),
                   ranked AS (SELECT probe_id, cand_id, sim,
                                row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, cand_id) AS rn
                              FROM cos)
              SELECT probe_id, cand_id, sim, rn
              FROM ranked WHERE rn <= 5 ORDER BY probe_id, rn""")),


    // NOTE there is deliberately NO declared query for the in-session-
    // trained ivfTopK (the r5 "ann_topk_ivf" rows-only row). An oracle
    // for it would need DuckDB to reproduce the Lloyd means bitwise, and
    // that was measured to be impossible: DuckDB's FLOAT→DECIMAL cast
    // routes through float32 arithmetic (garbage past ~7 digits) and its
    // wide-DECIMAL→DOUBLE conversion is double-rounded (~30% of values
    // off by 1 ulp vs the correctly-rounded result Spark's BigDecimal
    // path produces) — so no exact-arithmetic training formulation can
    // hash-match across engines, and centroid literals dumped from one
    // scale factor would be wrong at every other (the embeddings tables
    // are not prefix-equal across SFs). Coverage instead: ann_topk_ivf0
    // below oracle-checks the full in-session path at iters=0 (where
    // init centroids ARE derivable in SQL), ann_topk_ivf_trained
    // oracle-checks the Lloyd-trained search path with shared centroid
    // literals, and SimilaritySpec asserts ivfTopK's recall vs brute
    // force plus training determinism.

    // IVF search with the PRE-TRAINED quantizer (the production shape:
    // train offline once, ship centroids as constants, queries only
    // assign + probe + re-rank). Both engines see the identical centroid
    // literals, so the Lloyd-trained search path is fully oracle-checked.
    Q("ann_topk_ivf_trained",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        Similarity.ivfSearch(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
            k = 5, centroids = graft.operators.IvfQuantizer.centroids, nprobe = 4)
          .orderBy("probe_id", "rn")
      },
      Some(s"""WITH cents(cell, cv) AS (VALUES $centroidLiterals),
                   scored AS (SELECT v.vec_id, v.embedding, c.cell,
                                -(list_sum(list_transform(list_zip(v.embedding, c.cv),
                                    z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
                                  / (sqrt(list_sum(list_transform(v.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                                     * sqrt(list_sum(list_transform(c.cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) AS d
                              FROM embeddings v CROSS JOIN cents c),
                   cells AS (SELECT vec_id AS cand_id, embedding AS cand_vec, cell
                             FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
                                   FROM scored)
                             WHERE rn = 1),
                   pcells AS (SELECT vec_id AS probe_id, embedding AS probe_vec, cell
                              FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
                                    FROM scored WHERE vec_id < 10)
                              WHERE rn <= 4),
                   cand AS (SELECT p.probe_id, p.probe_vec, c.cand_id, c.cand_vec
                            FROM pcells p JOIN cells c ON c.cell = p.cell
                            WHERE c.cand_id <> p.probe_id),
                   sims AS (SELECT probe_id, cand_id,
                              list_sum(list_transform(list_zip(probe_vec, cand_vec),
                                z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
                              / (sqrt(list_sum(list_transform(probe_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                                 * sqrt(list_sum(list_transform(cand_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
                            FROM cand),
                   ranked AS (SELECT probe_id, cand_id, sim,
                                row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, cand_id) AS rn
                              FROM sims)
              SELECT probe_id, cand_id, sim, rn
              FROM ranked WHERE rn <= 5 ORDER BY probe_id, rn""")),


    // Product-quantization search with PRE-TRAINED codebooks (the
    // compression tier past int8: 8 nibble codes per 64-float vector,
    // 64x). Corpus vectors are replaced by their codeword
    // reconstructions (L2 assignment via |c|^2 - 2*sv.c — the |sv|^2
    // term drops out of the argmin), probes stay full-precision, exact
    // cosine ranks. Both engines see identical codebook literals, so
    // codes, reconstructions and scores are engine-exact.
    Q("ann_topk_pq",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        Similarity.pqSearch(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
            k = 5, codebooks = graft.operators.PqCodebooks.books)
          .orderBy("probe_id", "rn")
      },
      Some(s"""WITH cb(sub, code, cv) AS (VALUES $pqLiterals),
                   cbn AS (SELECT sub, code, cv,
                             list_sum(list_transform(cv, x -> x * x)) AS cv2
                           FROM cb),
                   sl AS (SELECT v.vec_id, s.sub,
                            list_transform(v.embedding[s.sub*8+1 : s.sub*8+8],
                              x -> CAST(x AS DOUBLE)) AS sv
                          FROM embeddings v, range(0, 8) s(sub)),
                   asg AS (SELECT vec_id, sub, code, cv FROM (
                             SELECT sl.vec_id, sl.sub, c.code, c.cv,
                                    row_number() OVER (PARTITION BY sl.vec_id, sl.sub
                                      ORDER BY c.cv2 - (2.0::DOUBLE) * list_sum(
                                          list_transform(list_zip(sl.sv, c.cv),
                                            z -> z[1] * z[2])),
                                        c.code) AS rn
                             FROM sl JOIN cbn c USING (sub))
                           WHERE rn = 1),
                   recon AS (SELECT vec_id, flatten(list(cv ORDER BY sub)) AS rv
                             FROM asg GROUP BY vec_id),
                   pr AS (SELECT vec_id AS probe_id,
                            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS pv
                          FROM embeddings WHERE vec_id < 10),
                   sims AS (SELECT p.probe_id, r.vec_id AS cand_id,
                              list_sum(list_transform(list_zip(p.pv, r.rv), z -> z[1] * z[2]))
                              / (sqrt(list_sum(list_transform(p.pv, x -> x * x)))
                                 * sqrt(list_sum(list_transform(r.rv, x -> x * x)))) AS sim
                            FROM pr p, recon r WHERE r.vec_id <> p.probe_id),
                   ranked AS (SELECT probe_id, cand_id, sim,
                                row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, cand_id) AS rn
                              FROM sims)
              SELECT probe_id, cand_id, sim, rn
              FROM ranked WHERE rn <= 5 ORDER BY probe_id, rn""")),


    // IVF-PQ: the composed production index — the pre-trained coarse
    // quantizer prunes to nprobe cells, PQ reconstructions stand in for
    // raw vectors in the re-rank (64x smaller store). Every stage
    // engine-exact from the two shared literal sets.
    Q("ann_topk_ivfpq",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        Similarity.ivfPqSearch(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
            k = 5, centroids = graft.operators.IvfQuantizer.centroids, nprobe = 4,
            codebooks = graft.operators.PqCodebooks.books)
          .orderBy("probe_id", "rn")
      },
      Some(ivfPqOracle)),

    // The same IVF-PQ search through a REAL store roundtrip: the
    // (id, cell, codes) index is written to parquet partitioned by cell
    // and searched from the re-read table via ivfPqSearchStored —
    // proving the production shape (encode once at write time, search
    // codes forever, probed cells prune at the file level) returns the
    // identical result. Oracle = the inline formulation.
    Q("ann_topk_ivfpq_stored",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        // staged ONCE per (JVM, sf dir) — same rationale as the int8 store
        val store = IvfPqStoreCache.get(s, d, emb)
        Similarity.ivfPqSearchStored(s.read.parquet(store),
            emb.filter(col("vec_id") < 10), "vec_id", "embedding",
            k = 5, centroids = graft.operators.IvfQuantizer.centroids, nprobe = 4,
            codebooks = graft.operators.PqCodebooks.books)
          .orderBy("probe_id", "rn")
      },
      Some(ivfPqOracle)),


    // IVF search path with iters=0: centroids are then exactly the first
    // nlist vectors by id, which DuckDB can derive too — oracle-checks
    // cell assignment (argmin cosine, cell tie-break), nprobe expansion
    // and the exact-cosine re-rank.
    Q("ann_topk_ivf0",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
            k = 5, nlist = 16, nprobe = 4, iters = 0)
          .orderBy("probe_id", "rn")
      },
      Some("""WITH cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                               embedding AS cv
                             FROM embeddings ORDER BY vec_id LIMIT 16),
                   scored AS (SELECT v.vec_id, v.embedding, c.cell,
                                -(list_sum(list_transform(list_zip(v.embedding, c.cv),
                                    z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
                                  / (sqrt(list_sum(list_transform(v.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                                     * sqrt(list_sum(list_transform(c.cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) AS d
                              FROM embeddings v CROSS JOIN cents c),
                   cells AS (SELECT vec_id AS cand_id, embedding AS cand_vec, cell
                             FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
                                   FROM scored)
                             WHERE rn = 1),
                   pcells AS (SELECT vec_id AS probe_id, embedding AS probe_vec, cell
                              FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
                                    FROM scored WHERE vec_id < 10)
                              WHERE rn <= 4),
                   cand AS (SELECT p.probe_id, p.probe_vec, c.cand_id, c.cand_vec
                            FROM pcells p JOIN cells c ON c.cell = p.cell
                            WHERE c.cand_id <> p.probe_id),
                   sims AS (SELECT probe_id, cand_id,
                              list_sum(list_transform(list_zip(probe_vec, cand_vec),
                                z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
                              / (sqrt(list_sum(list_transform(probe_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                                 * sqrt(list_sum(list_transform(cand_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
                            FROM cand),
                   ranked AS (SELECT probe_id, cand_id, sim,
                                row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, cand_id) AS rn
                              FROM sims)
              SELECT probe_id, cand_id, sim, rn
              FROM ranked WHERE rn <= 5 ORDER BY probe_id, rn""")),


    // Corpus diversity audit: per-cluster membership under the pre-trained
    // IVF quantizer (same argmin-cosine assignment the oracle replicates
    // for ann_topk_ivf_trained, aggregated instead of searched)
    Q("ann_cluster_profile",
      (s, d) => Similarity.clusterProfile(T(s, d, "embeddings"), "vec_id", "embedding",
          graft.operators.IvfQuantizer.centroids)
        .orderBy("cell"),
      Some(s"""WITH cents(cell, cv) AS (VALUES $centroidLiterals),
                   scored AS (SELECT v.vec_id, c.cell,
                                -(list_sum(list_transform(list_zip(v.embedding, c.cv),
                                    z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
                                  / (sqrt(list_sum(list_transform(v.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                                     * sqrt(list_sum(list_transform(c.cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) AS d
                              FROM embeddings v CROSS JOIN cents c),
                   cells AS (SELECT vec_id, cell
                             FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
                                   FROM scored)
                             WHERE rn = 1)
              SELECT cell, count(*) AS n_vecs, min(vec_id) AS min_id, max(vec_id) AS max_id
              FROM cells GROUP BY cell ORDER BY cell"""))
  )
}
