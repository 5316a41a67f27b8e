package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.{Dedup, Ewma, Similarity, TextAnalysis}
import QueryShared._

/** Embedding-space and span/incremental dedup queries split from
  * [[DedupQueries]] at the ~500-line registry guideline: hyperplane-
  * bucketed embedding near-dup, SemDeDup-shape semantic dedup and its
  * incremental/cell-index form, incremental exact dedup, and the
  * span/substring family. Entries moved verbatim.
  */
private[queries] object SemanticDedupQueries {

  /** One oracle for BOTH incremental-semantic registry forms — in-query
    * cell index (`dd_incremental_semantic`) and stored index
    * (`dd_incremental_semantic_stored`): the (id, cell, vec) index
    * round-trips parquet exactly (int cell, double vector), so probing
    * the store must reproduce the in-query result hash-for-hash. */
  private lazy val incSemanticOracle: String =
    s"""WITH cents(cell, cv) AS (VALUES $centroidLiterals),
                   corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 0),
                   batch AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0),
                   cscore AS (SELECT v.vec_id, c.cell,
                                -(list_sum(list_transform(list_zip(v.embedding, c.cv),
                                    z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
                                  / (sqrt(list_sum(list_transform(v.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                                     * sqrt(list_sum(list_transform(c.cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) AS d
                              FROM corpus v CROSS JOIN cents c),
                   cidx AS (SELECT vec_id, cell
                            FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
                                  FROM cscore)
                            WHERE rn = 1),
                   bscore AS (SELECT v.vec_id, c.cell,
                                -(list_sum(list_transform(list_zip(v.embedding, c.cv),
                                    z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
                                  / (sqrt(list_sum(list_transform(v.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                                     * sqrt(list_sum(list_transform(c.cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) AS d
                              FROM batch v CROSS JOIN cents c),
                   probes AS (SELECT vec_id, cell
                              FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
                                    FROM bscore)
                              WHERE rn <= 2),
                   cand AS (SELECT p.vec_id AS batch_id, ci.vec_id AS corpus_id
                            FROM probes p JOIN cidx ci ON ci.cell = p.cell),
                   cos AS (SELECT c.batch_id, c.corpus_id,
                             list_sum(list_transform(list_zip(vb.embedding, va.embedding),
                               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
                             / (sqrt(list_sum(list_transform(vb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                                * sqrt(list_sum(list_transform(va.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
                           FROM cand c
                           JOIN embeddings va ON va.vec_id = c.batch_id
                           JOIN embeddings vb ON vb.vec_id = c.corpus_id)
              SELECT batch_id, corpus_id, cosine
              FROM cos WHERE cosine >= 0.4::DOUBLE
              ORDER BY batch_id, corpus_id"""

  /** One oracle for BOTH incremental-substring registry forms — in-query
    * window index (`dd_incremental_substring`) and stored index
    * (`dd_incremental_substring_stored`): the distinct-wkey index is md5
    * strings, parquet-exact. */
  private val incSubstringOracle: String =
    """WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                         FROM documents),
                   w AS (SELECT doc_id, string_split(t, ' ') AS ws FROM d),
                   win AS (SELECT doc_id, unnest([{'wpos': i - 1,
                                                   'wkey': md5(array_to_string(ws[i:i+11], ' '))}
                                                  for i in range(1, len(ws) - 12 + 2)], recursive := true)
                           FROM w),
                   idx AS (SELECT DISTINCT wkey FROM win WHERE doc_id % 10 <> 7),
                   tok AS (SELECT doc_id, unnest([{'pos': i - 1, 'w': ws[i]}
                                                  for i in range(1, len(ws) + 1)], recursive := true)
                           FROM w WHERE doc_id % 10 = 7),
                   cov AS (SELECT DISTINCT b.doc_id, b.wpos + j AS cp
                           FROM win b, range(0, 12) r(j)
                           WHERE b.doc_id % 10 = 7
                             AND b.wkey IN (SELECT wkey FROM idx)),
                   kept AS (SELECT t.doc_id, t.pos, t.w, c.cp
                            FROM tok t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.cp = t.pos)
              SELECT doc_id AS id, count(*) AS n_tokens,
                     CAST(sum(CASE WHEN cp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                     coalesce(string_agg(CASE WHEN cp IS NULL THEN w END, ' ' ORDER BY pos), '') AS clean_text
              FROM kept GROUP BY doc_id ORDER BY id"""

  val all: Seq[Q] = Seq(

    Q("dd_embed_neardup",
      // synthetic embeddings top out at pairwise cosine ≈0.51; 0.4 keeps
      // the candidate-verify path non-trivially exercised
      (s, d) => Dedup.embeddingNearDupPairs(T(s, d, "embeddings"), "vec_id", "embedding",
          dim = 64, minCosine = 0.4,
          // explicit: bkey has only 2^bandBits values per band here, so at
          // any real scale buckets WOULD exceed DefaultMaxBucket — the
          // oracle is exact all-pairs and must stay pinned to it. The
          // guard trips when the fixture outgrows exact all-pairs
          // (expected around sf≈1 at 4 band bits — the fix then is more
          // planes/bits, not a bigger cap). dd_embed_neardup_scaled below
          // IS that fix, registered: it runs at every lake (Bench records
          // this query's refusal as -2/refused_by_guard, not an error)
          maxBucket = Int.MaxValue,
          bucketGuard = Some(Dedup.ExactPairsBucketGuard))
        .orderBy("id_a", "id_b"),
      // the fixed-seed hyperplanes are driver-side literals, so the oracle
      // embeds the same 16×64 constants and replicates sign-bit banding +
      // exact-cosine verification end-to-end
      Some(s"""WITH planes(pi, pv) AS (VALUES $planeLiterals),
                   bits AS (SELECT v.vec_id, p.pi,
                              CASE WHEN list_sum(list_transform(list_zip(v.embedding, p.pv),
                                     z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) >= 0
                                   THEN 1 ELSE 0 END AS bit
                            FROM embeddings v CROSS JOIN planes p),
                   bands AS (SELECT vec_id, pi // 4 AS band, string_agg(bit, ',' ORDER BY pi) AS bkey
                             FROM bits GROUP BY 1, 2),
                   cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
                            FROM bands a JOIN bands b
                              ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id),
                   cos AS (SELECT c.id_a, c.id_b,
                             list_sum(list_transform(list_zip(va.embedding, vb.embedding),
                               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
                             / (sqrt(list_sum(list_transform(va.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                                * sqrt(list_sum(list_transform(vb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
                           FROM cand c
                           JOIN embeddings va ON va.vec_id = c.id_a
                           JOIN embeddings vb ON vb.vec_id = c.id_b)
              SELECT id_a, id_b, cosine
              FROM cos WHERE cosine >= 0.4::DOUBLE
              ORDER BY id_a, id_b""")),


    // Scale-anchored sibling of dd_embed_neardup (r12 verdict): the
    // configuration you'd RUN at lake scale — 8-bit bands (256 bucket
    // values per band, vs the pinned query's 16) and the graceful
    // DefaultMaxBucket degrade instead of a guard refusal. Buckets past
    // the cap contribute their deterministic min-id rep-star pairs, and
    // the oracle reproduces BOTH branches, so the query is hash-exact at
    // the sf0.01 gate and still runs — linearly — at a 20× lake where
    // the pinned sibling's guard fires by design.
    Q("dd_embed_neardup_scaled",
      (s, d) => Dedup.embeddingNearDupPairs(T(s, d, "embeddings"), "vec_id", "embedding",
          dim = 64, minCosine = 0.4, numPlanes = 32, bandBits = 8,
          maxBucket = Dedup.DefaultMaxBucket)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH planes(pi, pv) AS (VALUES $planeLiterals32),
                   bits AS (SELECT v.vec_id, p.pi,
                              CASE WHEN list_sum(list_transform(list_zip(v.embedding, p.pv),
                                     z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) >= 0
                                   THEN 1 ELSE 0 END AS bit
                            FROM embeddings v CROSS JOIN planes p),
                   bands AS (SELECT vec_id, pi // 8 AS band, string_agg(bit, ',' ORDER BY pi) AS bkey
                             FROM bits GROUP BY 1, 2),
                   sized AS (SELECT vec_id, band, bkey,
                               count(*) OVER (PARTITION BY band, bkey) AS n,
                               min(vec_id) OVER (PARTITION BY band, bkey) AS rep
                             FROM bands),
                   cand AS (SELECT DISTINCT id_a, id_b FROM (
                              SELECT a.vec_id AS id_a, b.vec_id AS id_b
                              FROM sized a JOIN sized b
                                ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id
                              WHERE a.n <= ${Dedup.DefaultMaxBucket}
                              UNION
                              SELECT rep, vec_id FROM sized
                              WHERE n > ${Dedup.DefaultMaxBucket} AND vec_id <> rep)),
                   cos AS (SELECT c.id_a, c.id_b,
                             list_sum(list_transform(list_zip(va.embedding, vb.embedding),
                               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
                             / (sqrt(list_sum(list_transform(va.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                                * sqrt(list_sum(list_transform(vb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
                           FROM cand c
                           JOIN embeddings va ON va.vec_id = c.id_a
                           JOIN embeddings vb ON vb.vec_id = c.id_b)
              SELECT id_a, id_b, cosine
              FROM cos WHERE cosine >= 0.4::DOUBLE
              ORDER BY id_a, id_b""")),


    // Scale-anchored sibling of dd_semantic (r12 verdict): the 256-cell
    // DATA-INDEPENDENT quantizer — cells are the sign-bit codes of 8
    // fixed hyperplanes, so there is no training pass to drift and no
    // pinned-at-train-time cell count; occupancy shrinks geometrically
    // in the plane count, and cells that still outgrow DefaultMaxBucket
    // degrade to the deterministic min-id rep-star instead of tripping a
    // guard. Exact within-cell at every benched scale (sf0.01 ≈ 1/cell,
    // 20× lake ≈ 156/cell), hash-exact vs the two-branch oracle.
    Q("dd_semantic_scaled",
      (s, d) => Dedup.semanticDedupLsh(T(s, d, "embeddings"), "vec_id", "embedding",
          dim = 64, numPlanes = 8, seed = 7L, minCosine = 0.4,
          maxBucket = Dedup.DefaultMaxBucket)
        .orderBy("id"),
      Some(s"""WITH RECURSIVE planes(pi, pv) AS (VALUES $cellPlaneLiterals),
                   bits AS (SELECT v.vec_id, p.pi,
                              CASE WHEN list_sum(list_transform(list_zip(v.embedding, p.pv),
                                     z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) >= 0
                                   THEN (1 << p.pi) ELSE 0 END AS bitval
                            FROM embeddings v CROSS JOIN planes p),
                   cells AS (SELECT vec_id, CAST(sum(bitval) AS INTEGER) AS cell
                             FROM bits GROUP BY 1),
                   sized AS (SELECT vec_id, cell,
                               count(*) OVER (PARTITION BY cell) AS n,
                               min(vec_id) OVER (PARTITION BY cell) AS rep
                             FROM cells),
                   cand AS (SELECT DISTINCT id_a, id_b FROM (
                              SELECT a.vec_id AS id_a, b.vec_id AS id_b
                              FROM sized a JOIN sized b
                                ON a.cell = b.cell AND a.vec_id < b.vec_id
                              WHERE a.n <= ${Dedup.DefaultMaxBucket}
                              UNION
                              SELECT rep, vec_id FROM sized
                              WHERE n > ${Dedup.DefaultMaxBucket} AND vec_id <> rep)),
                   pairsq AS (SELECT c.id_a, c.id_b
                              FROM cand c
                              JOIN embeddings va ON va.vec_id = c.id_a
                              JOIN embeddings vb ON vb.vec_id = c.id_b
                              WHERE list_sum(list_transform(list_zip(va.embedding, vb.embedding),
                                      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
                                    / (sqrt(list_sum(list_transform(va.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                                       * sqrt(list_sum(list_transform(vb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
                                    >= 0.4::DOUBLE),
                   edges AS (SELECT id_a AS src, id_b AS dst FROM pairsq
                             UNION SELECT id_b, id_a FROM pairsq),
                   reach(src, dst) AS (
                     SELECT src, dst FROM edges
                     UNION
                     SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
                   comp AS (SELECT src AS vec_id, least(src, min(dst)) AS component
                            FROM reach GROUP BY src)
              SELECT c.vec_id AS id, c.cell,
                     coalesce(p.component, c.vec_id) AS component,
                     coalesce(p.component, c.vec_id) = c.vec_id AS keep
              FROM cells c LEFT JOIN comp p USING (vec_id)
              ORDER BY id""")),


    // SemDeDup: cluster-then-dedup in embedding space — the pre-trained
    // coarse quantizer bounds candidate pairs to within-cell equi-joins,
    // exact cosine verifies, connected groups keep their min-id rep.
    // Both quantizer and threshold are literals, so cell assignment,
    // pair verification, and the component labels all oracle-check.
    Q("dd_semantic",
      (s, d) => Dedup.semanticDedup(T(s, d, "embeddings"), "vec_id", "embedding",
          graft.operators.IvfQuantizer.centroids, minCosine = 0.4,
          // oracle is exact all-pairs-within-cell: pin it, guard loudly
          // (cells at the sf0.1 fixture hold ~125 vecs; the guard trips
          // when a cell outgrows exact pairing — the fix is more cells,
          // and dd_semantic_scaled above is that fix registered: 256
          // sign-bit cells, runs at every lake, 26× faster at 10×)
          maxBucket = Int.MaxValue,
          bucketGuard = Some(Dedup.ExactPairsBucketGuard))
        .orderBy("id"),
      Some(s"""WITH RECURSIVE cents(cell, cv) AS (VALUES $centroidLiterals),
                   scored AS (SELECT v.vec_id, c.cell,
                                -(list_sum(list_transform(list_zip(v.embedding, c.cv),
                                    z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
                                  / (sqrt(list_sum(list_transform(v.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                                     * sqrt(list_sum(list_transform(c.cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) AS d
                              FROM embeddings v CROSS JOIN cents c),
                   cells AS (SELECT vec_id, cell
                             FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
                                   FROM scored)
                             WHERE rn = 1),
                   cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                            FROM cells a JOIN cells b
                              ON a.cell = b.cell AND a.vec_id < b.vec_id),
                   pairsq AS (SELECT c.id_a, c.id_b
                              FROM cand c
                              JOIN embeddings va ON va.vec_id = c.id_a
                              JOIN embeddings vb ON vb.vec_id = c.id_b
                              WHERE list_sum(list_transform(list_zip(va.embedding, vb.embedding),
                                      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
                                    / (sqrt(list_sum(list_transform(va.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                                       * sqrt(list_sum(list_transform(vb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
                                    >= 0.4::DOUBLE),
                   edges AS (SELECT id_a AS src, id_b AS dst FROM pairsq
                             UNION SELECT id_b, id_a FROM pairsq),
                   reach(src, dst) AS (
                     SELECT src, dst FROM edges
                     UNION
                     SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
                   comp AS (SELECT src AS vec_id, least(src, min(dst)) AS component
                            FROM reach GROUP BY src)
              SELECT c.vec_id AS id, c.cell,
                     coalesce(p.component, c.vec_id) AS component,
                     coalesce(p.component, c.vec_id) = c.vec_id AS keep
              FROM cells c LEFT JOIN comp p USING (vec_id)
              ORDER BY id""")),


    // Incremental SemDeDup: arriving batch (vec_id % 10 = 0) probed
    // against the maintained cell index of the corpus (the rest). The
    // corpus index is scanned once and never shuffled — centroids and
    // the probed batch rows ride broadcasts; nprobe=2 multi-probe
    // catches near-dups across cell boundaries (Dedup.incrementalSemanticDedup).
    Q("dd_incremental_semantic",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        Dedup.incrementalSemanticDedup(
            emb.filter(pmod(col("vec_id"), lit(10)) === 0),
            Dedup.semanticIndex(
              emb.filter(pmod(col("vec_id"), lit(10)) =!= 0),
              "vec_id", "embedding", graft.operators.IvfQuantizer.centroids),
            "vec_id", "embedding", graft.operators.IvfQuantizer.centroids,
            minCosine = 0.4, nprobe = 2)
          .orderBy("batch_id", "corpus_id")
      },
      Some(incSemanticOracle)),


    // STORED-index form of dd_incremental_semantic — the 100 TB shape:
    // the corpus cell index (Dedup.semanticIndex) is MATERIALIZED to
    // parquet once, PARTITIONED BY cell (probed cells prune at the file
    // level — the ivfPqStore layout), and every arriving batch probes the
    // store: O(batch × nprobe) work per tick, never an O(corpus)
    // re-assignment. Cold bench rep pays the one-time build; warm reps
    // measure the probe alone. Same oracle as the in-query sibling.
    Q("dd_incremental_semantic_stored",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        val store = IndexStore.cached("semidx", d) { p =>
          Dedup.semanticIndex(
              emb.filter(pmod(col("vec_id"), lit(10)) =!= 0),
              "vec_id", "embedding", graft.operators.IvfQuantizer.centroids)
            // one task per cell → ONE file per cell dir: the probe's
            // warm cost is file listing + footer reads, and a task×cell
            // fragment layout made the stored probe pay more IO overhead
            // than the in-query re-assignment at small corpus sizes
            .repartition(16, col("cell"))
            .write.mode("overwrite").partitionBy("cell").parquet(p)
        }
        Dedup.incrementalSemanticDedup(
            emb.filter(pmod(col("vec_id"), lit(10)) === 0),
            // a SMALL stored index (fixture: 18 MB) coalesces into 1-2
            // scan tasks under files.maxPartitionBytes, which serializes
            // the verify fan-out (16.8M cosine pairs at the 20x lake ran
            // 3x slower than the in-query form purely from lost scan
            // parallelism — measured, round 14). Spreading the tiny
            // index read restores it; a production-sized index splits
            // naturally and the repartition cost stays O(index).
            s.read.parquet(store).repartition(s.sparkContext.defaultParallelism),
            "vec_id", "embedding", graft.operators.IvfQuantizer.centroids,
            minCosine = 0.4, nprobe = 2)
          .orderBy("batch_id", "corpus_id")
      },
      Some(incSemanticOracle)),


    // Incremental ingest-cycle dedup: new batch (doc_id % 10 = 0) vs the
    // accumulated corpus (the rest). The plan never shuffles the corpus —
    // batch fingerprints broadcast into the corpus scan, the hit-set
    // broadcasts back as an anti-join (see Dedup.incrementalDedup).
    Q("dd_incremental",
      (s, d) => {
        val docs = T(s, d, "documents")
        Dedup.incrementalDedup(
            docs.filter(pmod(col("doc_id"), lit(10)) === 0),
            docs.filter(pmod(col("doc_id"), lit(10)) =!= 0), "text")
          .select(col("doc_id"), col("fp"))
          .orderBy("doc_id")
      },
      // NOT EXISTS, not NOT IN: a null corpus fingerprint must not wipe
      // the result, and null-fp batch rows survive in both engines
      Some("""WITH fps AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
                           FROM documents),
                   batch AS (SELECT * FROM fps WHERE doc_id % 10 = 0),
                   corpus AS (SELECT fp FROM fps WHERE doc_id % 10 <> 0)
              SELECT b.doc_id, b.fp FROM batch b
              WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = b.fp)
              ORDER BY doc_id""")),


    // Sub-document span dedup: repeated 20-word blocks keep only their
    // first (doc, position) occurrence; docs reassemble from survivors —
    // exact string semantics end-to-end, no hashing
    Q("dd_span_dedup",
      (s, d) => Dedup.spanDedup(T(s, d, "documents"), "doc_id", "text", blockWords = 20)
        .orderBy("id"),
      Some("""WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                         FROM documents),
                   w AS (SELECT doc_id, string_split(t, ' ') AS ws FROM d),
                   b0 AS (SELECT doc_id,
                            [{'blk': i - 1,
                              'btext': array_to_string(ws[(i-1)*20+1 : (i-1)*20+20], ' ')}
                             for i in range(1, (len(ws) + 19) // 20 + 1)] AS bs
                          FROM w),
                   bl AS (SELECT doc_id, unnest(bs, recursive := true) FROM b0),
                   flag AS (SELECT doc_id, blk, btext,
                              row_number() OVER (PARTITION BY btext ORDER BY doc_id, blk) AS rn
                            FROM bl)
              SELECT doc_id AS id, count(*) AS n_blocks,
                     CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                     coalesce(string_agg(CASE WHEN rn = 1 THEN btext END, ' ' ORDER BY blk), '') AS clean_text
              FROM flag GROUP BY doc_id ORDER BY id""")),


    // Suffix-window exact substring dedup: stride-1 windows catch a
    // duplicated passage at ANY word offset (dd_span_dedup's fixed
    // 20-word blocks only catch block-aligned repeats). Both engines key
    // windows by md5 of the window text — equality structure, not the
    // rendered digests, is what the result depends on.
    Q("dd_substring_dedup",
      (s, d) => Dedup.substringDedup(T(s, d, "documents"), "doc_id", "text",
          windowWords = 12)
        .orderBy("id"),
      Some("""WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                         FROM documents),
                   w AS (SELECT doc_id, string_split(t, ' ') AS ws FROM d),
                   tok AS (SELECT doc_id, unnest([{'pos': i - 1, 'w': ws[i]}
                                                  for i in range(1, len(ws) + 1)], recursive := true)
                           FROM w),
                   win AS (SELECT doc_id, unnest([{'wpos': i - 1,
                                                   'wkey': md5(array_to_string(ws[i:i+11], ' '))}
                                                  for i in range(1, len(ws) - 12 + 2)], recursive := true)
                           FROM w),
                   flag AS (SELECT doc_id, wpos,
                              row_number() OVER (PARTITION BY wkey ORDER BY doc_id, wpos) AS rn
                            FROM win),
                   cov AS (SELECT DISTINCT doc_id, wpos + j AS cp
                           FROM flag, range(0, 12) r(j)
                           WHERE rn > 1),
                   kept AS (SELECT t.doc_id, t.pos, t.w, c.cp
                            FROM tok t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.cp = t.pos)
              SELECT doc_id AS id, count(*) AS n_tokens,
                     CAST(sum(CASE WHEN cp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                     coalesce(string_agg(CASE WHEN cp IS NULL THEN w END, ' ' ORDER BY pos), '') AS clean_text
              FROM kept GROUP BY doc_id ORDER BY id""")),


    // Incremental substring dedup: a 10%-of-corpus arriving batch
    // (modulo split — stays the small side at every SF) probes the
    // window-fingerprint index of the already-ingested 90%; any
    // >=12-word passage already indexed strips from the batch. Batch
    // keys broadcast into the index scan — the index is never shuffled.
    Q("dd_incremental_substring",
      (s, d) => {
        val docs = T(s, d, "documents")
        val idx = Dedup.windowFingerprints(
          docs.filter(col("doc_id") % 10 =!= 7), "doc_id", "text", windowWords = 12)
        Dedup.incrementalSubstringDedup(
            docs.filter(col("doc_id") % 10 === 7), idx, "doc_id", "text",
            windowWords = 12)
          .orderBy("id")
      },
      Some(incSubstringOracle)),


    // STORED-index form of dd_incremental_substring — the 100 TB shape:
    // the corpus window-fingerprint index (Dedup.windowFingerprints) is
    // MATERIALIZED to parquet once and every arriving batch probes the
    // store: batch keys broadcast into ONE index scan, no per-batch
    // re-windowing of the corpus. Cold bench rep pays the one-time
    // build; warm reps measure the probe alone. Same oracle — md5 keys
    // round-trip parquet exactly.
    Q("dd_incremental_substring_stored",
      (s, d) => {
        val docs = T(s, d, "documents")
        val store = IndexStore.cached("winfp", d) { p =>
          Dedup.windowFingerprints(
              docs.filter(col("doc_id") % 10 =!= 7), "doc_id", "text",
              windowWords = 12)
            .write.mode("overwrite").parquet(p)
        }
        Dedup.incrementalSubstringDedup(
            docs.filter(col("doc_id") % 10 === 7), s.read.parquet(store),
            "doc_id", "text", windowWords = 12)
          .orderBy("id")
      },
      Some(incSubstringOracle))
  )
}

