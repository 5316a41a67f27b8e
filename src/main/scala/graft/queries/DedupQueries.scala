package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.{Dedup, Ewma, Similarity, TextAnalysis}
import QueryShared._

/** Deduplication family, text-hash side: exact / minhash-LSH /
  * simhash / n-gram Jaccard, decontamination, duplicate groups and
  * canonical representatives. The embedding-space and span/incremental
  * entries live in [[SemanticDedupQueries]].
  * Entries split from the monolithic Registry verbatim. */
private[queries] object DedupQueries {

  /** One oracle for BOTH incremental near-dup registry forms — in-query
    * index (`dd_incremental_neardup`) and stored index
    * (`dd_incremental_neardup_stored`): the signature table round-trips
    * parquet bit-exactly (BIGINT minhashes), so probing the store must
    * reproduce the in-query result hash-for-hash. */
  private val incNearDupOracle: String =
    """WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
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
              ORDER BY batch_id, corpus_id"""

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
        // persisted (r21, measured): the signature table feeds the band
        // probe AND the agreement verify, and the 16-column md5-min
        // aggregation sits ABOVE the persisted postings' hash(id) layout
        // (partition-local agg, no exchange below it for ReuseExchange
        // to dedupe) — unpersisted it computed twice per run. The two
        // consumers are sequential (verify joins the probe's output), so
        // the lazy cache cannot race its own population. Doc-bounded:
        // one row × 16 longs. The _stored sibling reads the same table
        // from parquet instead — that store IS this memo, durable.
        val corpusSig = Dedup.minhashSignature(docs.filter(col("doc_id") % 10 =!= 7),
            "doc_id", "text", shingleLen = 3, numHashes = 16,
            hashFamily = Dedup.portableFamily)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        Dedup.incrementalNearDup(docs.filter(col("doc_id") % 10 === 7), corpusSig,
            "doc_id", "text", shingleLen = 3, numHashes = 16, bands = 4,
            minAgree = 0.5, hashFamily = Dedup.portableFamily)
          .orderBy("batch_id", "corpus_id")
      },
      Some(incNearDupOracle)),


    // STORED-index form of dd_incremental_neardup — the shape production
    // actually runs at 100 TB: the corpus signature index is MATERIALIZED
    // to parquet once (the ann_topk_*_stored pattern) and every arriving
    // batch probes the store, paying O(batch) work — never O(corpus)
    // re-shingling/re-hashing per batch. The in-query sibling above keeps
    // the self-contained oracle anchor; this one is the scale posture.
    // Cold bench rep pays the one-time index build; warm reps measure the
    // probe alone. Same oracle — the BIGINT signatures round-trip parquet
    // bit-exactly, so results must match hash-for-hash.
    Q("dd_incremental_neardup_stored",
      (s, d) => {
        val docs = T(s, d, "documents")
        val store = IndexStore.cached("mhsig", d) { p =>
          Dedup.minhashSignature(docs.filter(col("doc_id") % 10 =!= 7),
              "doc_id", "text", shingleLen = 3, numHashes = 16,
              hashFamily = Dedup.portableFamily)
            .write.mode("overwrite").parquet(p)
        }
        Dedup.incrementalNearDup(docs.filter(col("doc_id") % 10 === 7),
            s.read.parquet(store),
            "doc_id", "text", shingleLen = 3, numHashes = 16, bands = 4,
            minAgree = 0.5, hashFamily = Dedup.portableFamily)
          .orderBy("batch_id", "corpus_id")
      },
      Some(incNearDupOracle)),


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
              FROM r ORDER BY component, doc_id"""))
  )
}
