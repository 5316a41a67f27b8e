package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.{Dedup, Ewma, Similarity, TextAnalysis}
import QueryShared._

/** Deduplication family: exact / minhash-LSH / simhash / n-gram
  * Jaccard / span / substring / semantic, their incremental
  * batch-vs-corpus forms, decontamination, duplicate groups and
  * canonical representatives.
  * Entries split from the monolithic Registry verbatim. */
private[queries] object DedupQueries {

  val all: Seq[Q] = Seq(


    Q("dd_exact_groups",
      (s, d) => Dedup.exactGroups(T(s, d, "documents"), "doc_id", "text")
        .orderBy("content_hash"),
      Some("""SELECT md5(text) AS content_hash, count(*) AS n_docs, min(doc_id) AS keep_id
              FROM documents GROUP BY 1 ORDER BY content_hash""")),


    Q("dd_fingerprint",
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
              FROM documents ORDER BY doc_id""")),


    // Oracle-gated with the portable (md5-derived 60-bit) hash family so
    // DuckDB can replicate signatures bit-for-bit; the xxhash64 default
    // (faster, engine-specific) is exercised by DedupSpec. Band-bucketing
    // in Spark joins on murmur3(band values) while the oracle joins on the
    // values themselves — identical output unless a 32-bit hash collision
    // coincides with a ≥-threshold pair (vanishing, and deterministic per
    // dataset).
    Q("dd_minhash_neardup",
      (s, d) => Dedup.minhashNearDupPairs(T(s, d, "documents"), "doc_id", "text",
          shingleLen = 3, numHashes = 32, bands = 8, minJaccard = 0.5,
          hashFamily = Dedup.portableFamily,
          // explicit: the DuckDB oracle is exact all-pairs, so the query
          // must never silently switch to rep-star just because a fixture
          // bucket outgrows DefaultMaxBucket; the guard makes a fixture
          // that grows a degenerate band bucket fail loudly, not go O(n²)
          maxBucket = Int.MaxValue,
          bucketGuard = Some(Dedup.ExactPairsBucketGuard))
        .orderBy("id_a", "id_b"),
      Some("""WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                         FROM documents),
                   w AS (SELECT doc_id, string_split(t, ' ') AS w FROM d),
                   sh AS (SELECT doc_id,
                            CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                                 ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) END AS s
                          FROM w),
                   posts AS (SELECT doc_id, unnest(s) AS sg FROM sh),
                   sizes AS (SELECT doc_id, len(s) AS n FROM sh),
                   sigs AS (SELECT doc_id, r.i AS i,
                            min(('0x' || substr(md5(sg || '#' || CAST(r.i AS VARCHAR)), 18, 15))::BIGINT) AS mh
                            FROM posts CROSS JOIN range(32) r(i) GROUP BY 1, 2),
                   bands AS (SELECT doc_id, i // 4 AS band, string_agg(mh, ',' ORDER BY i) AS bkey
                             FROM sigs GROUP BY 1, 2),
                   cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                            FROM bands a JOIN bands b
                              ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
                   inter AS (SELECT c.id_a, c.id_b, count(*) AS i
                             FROM cand c
                             JOIN posts a ON a.doc_id = c.id_a
                             JOIN posts b ON b.doc_id = c.id_b AND a.sg = b.sg
                             GROUP BY 1, 2)
              SELECT i.id_a, i.id_b,
                     CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) AS jaccard
              FROM inter i
              JOIN sizes sa ON sa.doc_id = i.id_a
              JOIN sizes sb ON sb.doc_id = i.id_b
              WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= 0.5::DOUBLE
              ORDER BY id_a, id_b""")),


    // Minhash estimator audit: per LSH candidate, the signature-agreement
    // Jaccard estimate next to the exact value it estimates — the table
    // that calibrates a 100 TB verify-vs-trust threshold. No threshold
    // filter: a candidate pair sharing band VALUES but zero shingles
    // still appears (jaccard 0, LEFT JOIN in the oracle).
    Q("dd_minhash_estimate",
      (s, d) => Dedup.minhashEstimatePairs(T(s, d, "documents"), "doc_id", "text",
          shingleLen = 3, numHashes = 32, bands = 8,
          hashFamily = Dedup.portableFamily,
          maxBucket = Int.MaxValue,
          bucketGuard = Some(Dedup.ExactPairsBucketGuard))
        .orderBy("id_a", "id_b"),
      Some("""WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                         FROM documents),
                   w AS (SELECT doc_id, string_split(t, ' ') AS w FROM d),
                   sh AS (SELECT doc_id,
                            CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                                 ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) END AS s
                          FROM w),
                   posts AS (SELECT doc_id, unnest(s) AS sg FROM sh),
                   sizes AS (SELECT doc_id, len(s) AS n FROM sh),
                   sigs AS (SELECT doc_id, r.i AS i,
                            min(('0x' || substr(md5(sg || '#' || CAST(r.i AS VARCHAR)), 18, 15))::BIGINT) AS mh
                            FROM posts CROSS JOIN range(32) r(i) GROUP BY 1, 2),
                   bands AS (SELECT doc_id, i // 4 AS band, string_agg(mh, ',' ORDER BY i) AS bkey
                             FROM sigs GROUP BY 1, 2),
                   cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                            FROM bands a JOIN bands b
                              ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
                   agr AS (SELECT c.id_a, c.id_b,
                             CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
                           FROM cand c
                           JOIN sigs sa ON sa.doc_id = c.id_a
                           JOIN sigs sb ON sb.doc_id = c.id_b AND sb.i = sa.i
                           GROUP BY 1, 2),
                   inter AS (SELECT c.id_a, c.id_b, count(*) AS i
                             FROM cand c
                             JOIN posts a ON a.doc_id = c.id_a
                             JOIN posts b ON b.doc_id = c.id_b AND a.sg = b.sg
                             GROUP BY 1, 2)
              SELECT a.id_a, a.id_b, a.n_agree,
                     CAST(a.n_agree AS DOUBLE) / 32 AS est_jaccard,
                     CAST(coalesce(i.i, 0) AS DOUBLE) / (sa.n + sb.n - coalesce(i.i, 0)) AS jaccard
              FROM agr a
              LEFT JOIN inter i ON i.id_a = a.id_a AND i.id_b = a.id_b
              JOIN sizes sa ON sa.doc_id = a.id_a
              JOIN sizes sb ON sb.doc_id = a.id_b
              ORDER BY a.id_a, a.id_b""")),


    // Pairwise split-contamination matrix: distinct shared shingles
    // between every pair of hash-bucket splits (the same bucketing
    // ta_split ships) — the train/val/test leakage audit.
    Q("dd_overlap_matrix",
      (s, d) => Dedup.splitOverlapMatrix(T(s, d, "documents"), "doc_id", "text",
          buckets = 3, shingleLen = 3)
        .orderBy("split_a", "split_b"),
      Some("""WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                         FROM documents),
                   w AS (SELECT doc_id, string_split(t, ' ') AS w FROM d),
                   sh AS (SELECT doc_id,
                            CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                                 ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) END AS s
                          FROM w),
                   tagged AS (SELECT DISTINCT
                                ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 18, 15))::BIGINT % 3 AS split,
                                unnest(s) AS sg
                              FROM sh),
                   totals AS (SELECT split, count(*) AS n FROM tagged GROUP BY split),
                   shared AS (SELECT a.split AS split_a, b.split AS split_b, count(*) AS shared_shingles
                              FROM tagged a JOIN tagged b
                                ON a.sg = b.sg AND a.split < b.split
                              GROUP BY 1, 2)
              SELECT s.split_a, s.split_b, s.shared_shingles, ta.n AS n_a, tb.n AS n_b,
                     CAST(s.shared_shingles AS DOUBLE) / least(ta.n, tb.n) AS containment
              FROM shared s
              JOIN totals ta ON ta.split = s.split_a
              JOIN totals tb ON tb.split = s.split_b
              ORDER BY split_a, split_b""")),


    // Incremental near-dup: a 10%-of-corpus "arriving batch"
    // (doc_id ≡ 7 mod 10 — a MODULO split so the batch stays the small
    // side at every scale factor; a fixed id threshold inverted the
    // sides at sf0.1 and broadcast the big one) probes the signature
    // index of the already-ingested 90% — band-key collision candidates,
    // signature-agreement verify; the corpus-sized tables are scanned
    // once and never shuffled (both probe joins broadcast the batch
    // side). Portable hash family so DuckDB replicates signatures, band
    // keys and the agreement count bit-for-bit.
    Q("dd_incremental_neardup",
      (s, d) => {
        val docs = T(s, d, "documents")
        val corpusSig = Dedup.minhashSignature(docs.filter(col("doc_id") % 10 =!= 7),
          "doc_id", "text", shingleLen = 3, numHashes = 16,
          hashFamily = Dedup.portableFamily)
        Dedup.incrementalNearDup(docs.filter(col("doc_id") % 10 === 7), corpusSig,
            "doc_id", "text", shingleLen = 3, numHashes = 16, bands = 4,
            minAgree = 0.5, hashFamily = Dedup.portableFamily)
          .orderBy("batch_id", "corpus_id")
      },
      Some("""WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                         FROM documents),
                   w AS (SELECT doc_id, string_split(t, ' ') AS w FROM d),
                   sh AS (SELECT doc_id,
                            CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                                 ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) END AS s
                          FROM w),
                   posts AS (SELECT doc_id, unnest(s) AS sg FROM sh),
                   sigs AS (SELECT doc_id, r.i AS i,
                            min(('0x' || substr(md5(sg || '#' || CAST(r.i AS VARCHAR)), 18, 15))::BIGINT) AS mh
                            FROM posts CROSS JOIN range(16) r(i) GROUP BY 1, 2),
                   bands AS (SELECT doc_id, i // 4 AS band, string_agg(mh, ',' ORDER BY i) AS bkey
                             FROM sigs GROUP BY 1, 2),
                   cand AS (SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
                            FROM bands b JOIN bands c ON b.band = c.band AND b.bkey = c.bkey
                            WHERE b.doc_id % 10 = 7 AND c.doc_id % 10 <> 7),
                   agree AS (SELECT cd.batch_id, cd.corpus_id,
                               CAST(sum(CASE WHEN sb.mh = sc.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
                             FROM cand cd
                             JOIN sigs sb ON sb.doc_id = cd.batch_id
                             JOIN sigs sc ON sc.doc_id = cd.corpus_id AND sc.i = sb.i
                             GROUP BY 1, 2)
              SELECT batch_id, corpus_id, n_agree,
                     CAST(n_agree AS DOUBLE) / 16 AS est_jaccard
              FROM agree WHERE CAST(n_agree AS DOUBLE) / 16 >= 0.5::DOUBLE
              ORDER BY batch_id, corpus_id""")),


    Q("dd_simhash_neardup",
      (s, d) => Dedup.simhashNearDupPairs(T(s, d, "documents"), "doc_id", "text",
          maxHamming = 6, tokenHash = Dedup.portableHash60(_), bits = 60,
          maxBucket = Int.MaxValue, // exact all-pairs, matching the oracle
          bucketGuard = Some(Dedup.ExactPairsBucketGuard))
        .orderBy("id_a", "id_b"),
      // full simhash pipeline: token hash → per-bit ±1 sums → sign bits →
      // maxHamming+1 = 7 disjoint chunk keys (pigeonhole — recall is
      // EXACT for hamming ≤ 6) → verify hamming ≤ 6. Chunk layout
      // mirrors Dedup.simhashChunkLayout(60, 6): four 9-bit chunks at
      // offsets 0/9/18/27, three 8-bit chunks at 36/44/52.
      Some("""WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                         FROM documents),
                   toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM d),
                   h AS (SELECT doc_id, ('0x' || substr(md5(tok), 18, 15))::BIGINT AS h FROM toks),
                   bits AS (SELECT doc_id, r.i AS i,
                              sum(CASE WHEN (h >> r.i) & 1 = 1 THEN 1 ELSE -1 END) AS s
                            FROM h CROSS JOIN range(60) r(i) GROUP BY 1, 2),
                   sig AS (SELECT doc_id,
                             CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END) AS BIGINT) AS sh
                           FROM bits GROUP BY 1),
                   chunks(c, off, mask) AS (VALUES (0, 0, 511), (1, 9, 511), (2, 18, 511), (3, 27, 511),
                                                   (4, 36, 255), (5, 44, 255), (6, 52, 255)),
                   banded AS (SELECT doc_id, sh, c.c AS c, (sh >> c.off) & c.mask AS ckey
                              FROM sig CROSS JOIN chunks c),
                   pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                               CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
                             FROM banded a JOIN banded b
                               ON a.c = b.c AND a.ckey = b.ckey AND a.doc_id < b.doc_id)
              SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 6
              ORDER BY id_a, id_b""")),


    Q("dd_ngram_jaccard",
      (s, d) => Dedup.ngramJaccardPairs(T(s, d, "documents"), "doc_id", "text",
          shingleLen = 3, minJaccard = 0.5)
        .orderBy("id_a", "id_b"),
      // the full inverted-index pipeline (normalize → 3-gram shingles →
      // stop-shingle pruning → shared≥3 prefilter → exact jaccard) is
      // SQL-expressible, so this dedup variant is oracle-gated
      Some("""WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                         FROM documents),
                   w AS (SELECT doc_id, string_split(t, ' ') AS w FROM d),
                   sh AS (SELECT doc_id,
                            CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                                 ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) END AS s
                          FROM w),
                   posts AS (SELECT doc_id, unnest(s) AS sg FROM sh),
                   sizes AS (SELECT doc_id, len(s) AS n FROM sh),
                   rare AS (SELECT sg FROM posts GROUP BY sg HAVING count(*) <= 50),
                   pp AS (SELECT p.doc_id, p.sg FROM posts p JOIN rare USING (sg)),
                   cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                            FROM pp a JOIN pp b ON a.sg = b.sg AND a.doc_id < b.doc_id
                            GROUP BY 1, 2 HAVING count(*) >= 3),
                   inter AS (SELECT c.id_a, c.id_b, count(*) AS i
                             FROM cand c
                             JOIN posts a ON a.doc_id = c.id_a
                             JOIN posts b ON b.doc_id = c.id_b AND a.sg = b.sg
                             GROUP BY 1, 2)
              SELECT i.id_a, i.id_b,
                     CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) AS jaccard
              FROM inter i
              JOIN sizes sa ON sa.doc_id = i.id_a
              JOIN sizes sb ON sb.doc_id = i.id_b
              WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= 0.5::DOUBLE
              ORDER BY id_a, id_b""")),


    // benchmark decontamination: flag training docs sharing >= 3 rare
    // shingles with any doc of the (stand-in) eval set doc_id < 5
    Q("dd_decontaminate",
      (s, d) => {
        val docs = T(s, d, "documents")
        Dedup.contaminationFlags(docs, docs.filter(col("doc_id") < 5), "doc_id", "text",
            shingleLen = 3, maxDocFreq = 50, minShared = 3)
          .orderBy("id")
      },
      Some("""WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                         FROM documents),
                   w AS (SELECT doc_id, string_split(t, ' ') AS w FROM d),
                   sh AS (SELECT doc_id,
                            CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                                 ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) END AS s
                          FROM w),
                   posts AS (SELECT doc_id, unnest(s) AS sg FROM sh),
                   rare AS (SELECT sg FROM posts GROUP BY sg HAVING count(*) <= 50),
                   evs AS (SELECT DISTINCT sg FROM posts WHERE doc_id < 5),
                   shared AS (SELECT p.doc_id AS id, count(*) AS n_shared
                              FROM posts p
                              JOIN rare ON p.sg = rare.sg
                              JOIN evs ON p.sg = evs.sg
                              GROUP BY 1)
              SELECT d.doc_id AS id, coalesce(s.n_shared, 0) AS n_shared,
                     coalesce(s.n_shared, 0) >= 3 AS contaminated
              FROM d LEFT JOIN shared s ON s.id = d.doc_id
              ORDER BY id""")),


    // Same contamination semantics, 100 TB plan shape: Bloom-prefiltered
    // scan + broadcast verify, document frequency computed over candidate
    // postings only (exact — the Bloom never drops an eval-shingle
    // posting, see Dedup.bloomDecontaminate). The oracle computes df the
    // straightforward corpus-wide way; equality of the two formulations
    // is the point of the check.
    Q("dd_bloom_decontaminate",
      (s, d) => {
        val docs = T(s, d, "documents")
        Dedup.bloomDecontaminate(docs, docs.filter(col("doc_id") < 8), "doc_id", "text",
            shingleLen = 3, maxDocFreq = 50, minShared = 2)
          .orderBy("id")
      },
      Some("""WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                         FROM documents),
                   w AS (SELECT doc_id, string_split(t, ' ') AS w FROM d),
                   sh AS (SELECT doc_id,
                            CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                                 ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) END AS s
                          FROM w),
                   posts AS (SELECT doc_id, unnest(s) AS sg FROM sh),
                   rare AS (SELECT sg FROM posts GROUP BY sg HAVING count(*) <= 50),
                   evs AS (SELECT DISTINCT sg FROM posts WHERE doc_id < 8),
                   shared AS (SELECT p.doc_id AS id, count(*) AS n_shared
                              FROM posts p
                              JOIN rare ON p.sg = rare.sg
                              JOIN evs ON p.sg = evs.sg
                              GROUP BY 1)
              SELECT d.doc_id AS id, coalesce(s.n_shared, 0) AS n_shared,
                     coalesce(s.n_shared, 0) >= 2 AS contaminated
              FROM d LEFT JOIN shared s ON s.id = d.doc_id
              ORDER BY id""")),


    // pairs → duplicate GROUPS: min-label connected components over the
    // verified ngram-jaccard pairs; the oracle computes the same
    // components via recursive-CTE reachability on the replicated pairs
    Q("dd_dup_groups",
      (s, d) => Dedup.connectedComponents(
          Dedup.ngramJaccardPairs(T(s, d, "documents"), "doc_id", "text",
            shingleLen = 3, minJaccard = 0.5))
        .select(col("id").as("doc_id"), col("comp").as("component"))
        .orderBy("doc_id"),
      Some("""WITH RECURSIVE d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                         FROM documents),
                   w AS (SELECT doc_id, string_split(t, ' ') AS w FROM d),
                   sh AS (SELECT doc_id,
                            CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                                 ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) END AS s
                          FROM w),
                   posts AS (SELECT doc_id, unnest(s) AS sg FROM sh),
                   sizes AS (SELECT doc_id, len(s) AS n FROM sh),
                   rare AS (SELECT sg FROM posts GROUP BY sg HAVING count(*) <= 50),
                   pp AS (SELECT p.doc_id, p.sg FROM posts p JOIN rare USING (sg)),
                   cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                            FROM pp a JOIN pp b ON a.sg = b.sg AND a.doc_id < b.doc_id
                            GROUP BY 1, 2 HAVING count(*) >= 3),
                   inter AS (SELECT c.id_a, c.id_b, count(*) AS i
                             FROM cand c
                             JOIN posts a ON a.doc_id = c.id_a
                             JOIN posts b ON b.doc_id = c.id_b AND a.sg = b.sg
                             GROUP BY 1, 2),
                   pairsq AS (SELECT i.id_a, i.id_b
                              FROM inter i
                              JOIN sizes sa ON sa.doc_id = i.id_a
                              JOIN sizes sb ON sb.doc_id = i.id_b
                              WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= 0.5::DOUBLE),
                   edges AS (SELECT id_a AS src, id_b AS dst FROM pairsq
                             UNION SELECT id_b, id_a FROM pairsq),
                   reach(src, dst) AS (
                     SELECT src, dst FROM edges
                     UNION
                     SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
              SELECT src AS doc_id, least(src, min(dst)) AS component
              FROM reach GROUP BY src ORDER BY doc_id""")),


    // Canonical-representative selection: WHICH duplicate to keep — per
    // dup component, the member with the highest quality score wins
    // (ties → lowest id); losers keep their rank as the audit trail.
    // Composes dd_dup_groups' component labeling with ta_quality's
    // proven-green score; one shuffle on component for the ranking window
    Q("dd_canonical_rep",
      (s, d) => {
        val docs = T(s, d, "documents")
        val comps = Dedup.connectedComponents(
            Dedup.ngramJaccardPairs(docs, "doc_id", "text",
              shingleLen = 3, minJaccard = 0.5))
          .select(col("id").as("doc_id"), col("comp").as("component"))
        val scored = docs.select(col("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        Dedup.canonicalReps(comps, scored).orderBy("component", "doc_id")
      },
      Some("""WITH RECURSIVE d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                         FROM documents),
                   w AS (SELECT doc_id, string_split(t, ' ') AS w FROM d),
                   sh AS (SELECT doc_id,
                            CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                                 ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) END AS s
                          FROM w),
                   posts AS (SELECT doc_id, unnest(s) AS sg FROM sh),
                   sizes AS (SELECT doc_id, len(s) AS n FROM sh),
                   rare AS (SELECT sg FROM posts GROUP BY sg HAVING count(*) <= 50),
                   pp AS (SELECT p.doc_id, p.sg FROM posts p JOIN rare USING (sg)),
                   cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                            FROM pp a JOIN pp b ON a.sg = b.sg AND a.doc_id < b.doc_id
                            GROUP BY 1, 2 HAVING count(*) >= 3),
                   inter AS (SELECT c.id_a, c.id_b, count(*) AS i
                             FROM cand c
                             JOIN posts a ON a.doc_id = c.id_a
                             JOIN posts b ON b.doc_id = c.id_b AND a.sg = b.sg
                             GROUP BY 1, 2),
                   pairsq AS (SELECT i.id_a, i.id_b
                              FROM inter i
                              JOIN sizes sa ON sa.doc_id = i.id_a
                              JOIN sizes sb ON sb.doc_id = i.id_b
                              WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= 0.5::DOUBLE),
                   edges AS (SELECT id_a AS src, id_b AS dst FROM pairsq
                             UNION SELECT id_b, id_a FROM pairsq),
                   reach(src, dst) AS (
                     SELECT src, dst FROM edges
                     UNION
                     SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
                   comp AS (SELECT src AS doc_id, least(src, min(dst)) AS component
                            FROM reach GROUP BY src),
                   qual AS (SELECT doc_id,
                round((
                  least(CAST(length(text) AS DOUBLE) / 500.0::DOUBLE, 1.0::DOUBLE)
                  + (1.0::DOUBLE - least(
                      (CASE WHEN length(text) = 0 THEN 0.0::DOUBLE
                            ELSE CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                                 / CAST(length(text) AS DOUBLE) END) * 4.0::DOUBLE, 1.0::DOUBLE))
                  + (CASE WHEN (CASE WHEN (CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\s+')) END) = 0 THEN 0.0::DOUBLE
                       ELSE CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
                            / CAST((CASE WHEN length(trim(text)) = 0 THEN 0
                                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS DOUBLE) END)
                       BETWEEN 2.0::DOUBLE AND 12.0::DOUBLE THEN 1.0::DOUBLE ELSE 0.5::DOUBLE END)
                ) / 3.0::DOUBLE, 6) AS quality
                           FROM documents),
                   r AS (SELECT c.component, c.doc_id, q.quality,
                           row_number() OVER (PARTITION BY c.component
                                              ORDER BY q.quality DESC, c.doc_id) AS rn
                         FROM comp c JOIN qual q USING (doc_id))
              SELECT component, doc_id, quality, rn, rn = 1 AS canonical
              FROM r ORDER BY component, doc_id""")),


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
          // planes/bits, not a bigger cap)
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
          // when a cell outgrows exact pairing — the fix is more cells)
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
      Some(s"""WITH cents(cell, cv) AS (VALUES $centroidLiterals),
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
              ORDER BY batch_id, corpus_id""")),


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
      Some("""WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
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
              FROM kept GROUP BY doc_id ORDER BY id"""))
  )
}
