package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.{Dedup, Ewma, Similarity, TextAnalysis}
import QueryShared._

/** Text-analysis / corpus-pipeline family: tokenization, quality,
  * langid, PII scrub, sampling and mixes, tf-idf, packing, chunking.
  * Corpus-level REPORTS (profiles, pipeline, vocabulary, PMI, dataset
  * card) live in [[TextReportQueries]]; the mergeable-sketch and
  * tokenizer-training entries in [[SketchQueries]].
  * Entries split from the monolithic Registry verbatim. */
private[queries] object TextQueries {

  val all: Seq[Q] = Seq(



    Q("ta_tokens",
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"), length(col("text")).as("n_chars_m"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, length(text) AS n_chars_m,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
              FROM documents ORDER BY doc_id""")),



    Q("ta_tokens_bpe",
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens
              FROM documents ORDER BY doc_id""")),



    Q("ta_quality",
      (s, d) => {
        // stage the profile pass once (r15: inlined, its calls sit in
        // CASE branches where codegen subexpression elimination can't
        // reach — ~5 walks per row; see TextAnalysis.qualityInputs)
        val (prof, _) = TextAnalysis.qualityInputs(col("text"))
        T(s, d, "documents")
          .select(col("doc_id"), col("text").as("__t"), prof.as("__p"))
          .select(col("doc_id"),
            TextAnalysis.qualityScoreFrom(col("__t"), col("__p")).as("quality"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
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
              FROM documents ORDER BY doc_id""")),



    Q("ta_rolling_fingerprint",
      // native codegen'd Catalyst expression (RollingHash with doGenCode).
      // Oracle: DuckDB HUGEINT (128-bit) emulates the wrapping mod-2^64
      // recurrence exactly — accumulator stays in [0, 2^64) so the
      // h*1000003+b intermediate (< 2^84) never overflows 128 bits; the
      // final value converts to Java's signed long by subtracting 2^64
      // above 2^63. Bytes come from hex(encode(text)) two chars at a
      // time (UTF-8, same bytes the expression hashes). NULL text guards
      // to NULL (list_prepend would otherwise turn it into [0] → 0).
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        T(s, d, "documents").createOrReplaceTempView("fp_docs_v")
        s.sql("SELECT doc_id, rolling_hash(text) AS fp FROM fp_docs_v ORDER BY doc_id")
      },
      Some("""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
                   h AS (SELECT doc_id,
                           CASE WHEN hx IS NULL THEN NULL ELSE
                             list_reduce(
                               list_prepend(0::HUGEINT,
                                 [('0x' || substr(hx, 2*i-1, 2))::BIGINT::HUGEINT
                                  for i in range(1, length(hx)//2 + 1)]),
                               (acc, x) -> (acc * 1000003::HUGEINT + x)
                                             % 18446744073709551616::HUGEINT)
                           END AS hv
                         FROM b)
              SELECT doc_id,
                     CAST(CASE WHEN hv >= 9223372036854775808::HUGEINT
                               THEN hv - 18446744073709551616::HUGEINT ELSE hv END AS BIGINT) AS fp
              FROM h ORDER BY doc_id""")),



    Q("ta_langid",
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"), col("lang"), TextAnalysis.langGuess(col("text")).as("lang_guess"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang,
                CASE
                  WHEN en >= de AND en >= es AND en >= fr AND en > 0 THEN 'en'
                  WHEN de >= es AND de >= fr AND de > 0 THEN 'de'
                  WHEN es >= fr AND es > 0 THEN 'es'
                  WHEN fr > 0 THEN 'fr'
                  ELSE 'unk' END AS lang_guess
              FROM (
                SELECT doc_id, lang,
                  (CASE WHEN t LIKE '% the %' THEN 1 ELSE 0 END + CASE WHEN t LIKE '% and %' THEN 1 ELSE 0 END
                   + CASE WHEN t LIKE '% of %' THEN 1 ELSE 0 END + CASE WHEN t LIKE '% is %' THEN 1 ELSE 0 END) AS en,
                  (CASE WHEN t LIKE '% der %' THEN 1 ELSE 0 END + CASE WHEN t LIKE '% und %' THEN 1 ELSE 0 END
                   + CASE WHEN t LIKE '% die %' THEN 1 ELSE 0 END + CASE WHEN t LIKE '% ist %' THEN 1 ELSE 0 END) AS de,
                  (CASE WHEN t LIKE '% el %' THEN 1 ELSE 0 END + CASE WHEN t LIKE '% los %' THEN 1 ELSE 0 END
                   + CASE WHEN t LIKE '% que %' THEN 1 ELSE 0 END + CASE WHEN t LIKE '% es %' THEN 1 ELSE 0 END) AS es,
                  (CASE WHEN t LIKE '% le %' THEN 1 ELSE 0 END + CASE WHEN t LIKE '% les %' THEN 1 ELSE 0 END
                   + CASE WHEN t LIKE '% et %' THEN 1 ELSE 0 END + CASE WHEN t LIKE '% est %' THEN 1 ELSE 0 END) AS fr
                FROM (SELECT doc_id, lang, ' ' || lower(text) || ' ' AS t FROM documents) raw) scored
              ORDER BY doc_id""")),



    // PII scrubbing: email/URL redaction with audit counts (RE2-safe
    // patterns — identical semantics on both engines)
    Q("ta_scrub_pii",
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"),
          graft.operators.TextAnalysis.emailCount(col("text")).as("n_emails"),
          graft.operators.TextAnalysis.urlCount(col("text")).as("n_urls"),
          md5(graft.operators.TextAnalysis.scrubPii(col("text")).cast("binary")).as("scrubbed_digest"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS n_emails,
                     len(regexp_extract_all(text, 'https?://[^ \t\n\r]+')) AS n_urls,
                     md5(regexp_replace(
                           regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '[EMAIL]', 'g'),
                           'https?://[^ \t\n\r]+', '[URL]', 'g')) AS scrubbed_digest
              FROM documents ORDER BY doc_id""")),



    // Gopher-style repetition filter: fraction of the text covered by the
    // most frequent 2-gram — exact integer counts, bitwise-identical
    // per-row division on both engines
    Q("ta_repetition",
      (s, d) => graft.operators.TextAnalysis.repetitionProfile(
          T(s, d, "documents"), "doc_id", "text", n = 2)
        .orderBy("id"),
      Some("""WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                         FROM documents),
                   w AS (SELECT doc_id, string_split(t, ' ') AS w FROM d),
                   g AS (SELECT doc_id,
                           unnest(CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
                                  ELSE [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))] END) AS g
                         FROM w),
                   cnt AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
                   agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
                             CAST(max(c) AS BIGINT) AS top_gram_count
                           FROM cnt GROUP BY 1)
              SELECT doc_id AS id, n_grams, top_gram_count,
                     CAST(top_gram_count AS DOUBLE) / CAST(n_grams AS DOUBLE) AS top_gram_frac
              FROM agg ORDER BY id""")),



    // sequence packing: deterministic (shard, pack, offset) per doc from
    // exact integer token sums — concatenate-and-chunk without global sort
    Q("ta_pack",
      (s, d) => graft.operators.TextAnalysis.packAssignments(
          T(s, d, "documents"), "doc_id", "text", tokenBudget = 512, shards = 4)
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
                     CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 18, 15))::BIGINT AS h
                   FROM documents)
              SELECT doc_id, n_tokens, shard, offset_tokens,
                     CAST(offset_tokens // 512 AS BIGINT) AS pack_id
              FROM (SELECT doc_id, n_tokens, h % 4 AS shard,
                      CAST(coalesce(sum(n_tokens) OVER (PARTITION BY h % 4 ORDER BY h, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offset_tokens
                    FROM t)
              ORDER BY doc_id""")),



    // deterministic hash split: stable train/val/test sharding from the
    // id alone (portable hash → replicated in the oracle)
    Q("ta_split",
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"), Dedup.hashBucket(col("doc_id"), 10).as("bucket"))
        // null ids hash to a null bucket → explicit null split (a silent
        // route into 'test' would leak unidentified rows next to eval)
        .withColumn("split",
          when(col("bucket").isNull, lit(null))
            .when(col("bucket") < 8, "train").when(col("bucket") === 8, "val")
            .otherwise("test"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, b AS bucket,
                     CASE WHEN b IS NULL THEN NULL
                          WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split
              FROM (SELECT doc_id,
                      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 18, 15))::BIGINT % 10 AS b
                    FROM documents)
              ORDER BY doc_id""")),



    // Corpus mixing: sample each language at its own deterministic rate
    // to hit a target mixture (upsample-by-keeping-more of en/zh here).
    // Pure per-row hash-threshold predicate — no RNG, no shuffle, scan
    // speed at 100 TB — and salted so it never correlates with ta_split.
    Q("ta_stratified_sample",
      (s, d) => {
        val rate = when(col("lang") === "en", lit(0.5))
          .when(col("lang") === "zh", lit(0.35))
          .otherwise(lit(0.2))
        T(s, d, "documents")
          .filter(graft.operators.TextAnalysis.sampleKeep(col("doc_id"), rate))
          .select(col("doc_id"), col("lang"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang
              FROM (SELECT doc_id, lang,
                      ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#sample'), 18, 15))::BIGINT
                        % 1000000 AS h,
                      CASE WHEN lang = 'en' THEN 0.5::DOUBLE
                           WHEN lang = 'zh' THEN 0.35::DOUBLE
                           ELSE 0.2::DOUBLE END AS rate
                    FROM documents)
              WHERE h < rate * 1000000
              ORDER BY doc_id""")),



    // Exact-count stratified sample: exactly 30 docs per language by
    // salted-hash order — the fixed-size eval-set builder (vs the
    // rate-based ta_stratified_sample)
    Q("ta_exact_sample",
      (s, d) => graft.operators.TextAnalysis.sampleExact(
          T(s, d, "documents"), "doc_id", "lang", n = 30)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang FROM (
                SELECT doc_id, lang,
                       row_number() OVER (PARTITION BY lang
                         ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#exact'), 18, 15))::BIGINT,
                                  doc_id) AS rn
                FROM documents WHERE doc_id IS NOT NULL)
              WHERE rn <= 30 ORDER BY doc_id""")),



    // Temperature-flattened corpus mix at T=2: weights are floor(√n·10⁶)
    // integer micro-weights (IEEE sqrt is correctly rounded → engine-
    // exact; the normalizing sum and the per-stratum target are pure
    // integer arithmetic), selection by salted-hash order
    // Epoch-repetition mixing: per-source repeat factors ("2.5 epochs of
    // src0"), integer part replicated outright, fractional part a
    // deterministic salted-hash share — scan-speed expressions + a
    // bounded explode, zero shuffle; factor-0 strata drop out
    Q("ta_epoch_mix",
      (s, d) => TextAnalysis.epochMix(
          T(s, d, "documents"), "doc_id", "source",
          Map("src0" -> 2.5, "src1" -> 3.0, "src2" -> 0.5, "src3" -> 0.0),
          defaultEpochs = 1.0)
        .orderBy("doc_id", "epoch"),
      Some("""WITH f AS (SELECT doc_id, source AS stratum,
                           CASE WHEN source = 'src0' THEN 2.5E0
                                WHEN source = 'src1' THEN 3.0E0
                                WHEN source = 'src2' THEN 5.0E-1
                                WHEN source = 'src3' THEN 0.0E0
                                ELSE 1.0E0 END AS e,
                           ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#epoch'), 18, 15))::BIGINT
                             % 1000000 AS h
                         FROM documents WHERE doc_id IS NOT NULL),
                   n AS (SELECT doc_id, stratum,
                           CAST(floor(e) AS INTEGER)
                             + CASE WHEN h < (e - floor(e)) * 1000000 THEN 1 ELSE 0 END AS n_epochs
                         FROM f)
              SELECT doc_id, stratum, n_epochs, unnest(range(n_epochs)) AS epoch
              FROM n WHERE n_epochs > 0 ORDER BY doc_id, epoch""")),



    Q("ta_temperature_mix",
      (s, d) => TextAnalysis.temperatureMix(
          T(s, d, "documents"), "doc_id", "source", budget = 120L)
        .orderBy("id"),
      Some("""WITH sizes AS (SELECT source AS stratum, count(*) AS n_docs
                             FROM documents WHERE doc_id IS NOT NULL GROUP BY 1),
                   wq AS (SELECT stratum, n_docs,
                            CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0::DOUBLE) AS BIGINT) AS w_micro
                          FROM sizes),
                   tot AS (SELECT sum(w_micro) AS w_total FROM wq),
                   tgt AS (SELECT stratum, n_docs,
                            CAST((120 * w_micro) // w_total AS BIGINT) AS target
                           FROM wq CROSS JOIN tot),
                   ranked AS (SELECT d.doc_id AS id, d.source AS stratum, t.n_docs, t.target,
                                row_number() OVER (PARTITION BY d.source
                                  ORDER BY ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '#mix'), 18, 15))::BIGINT,
                                           d.doc_id) AS rn
                              FROM documents d JOIN tgt t ON t.stratum = d.source
                              WHERE d.doc_id IS NOT NULL)
              SELECT id, stratum, n_docs, target FROM ranked
              WHERE rn <= target ORDER BY id""")),



    // Snapshot drift report: rate comparison by exact integer cross-
    // multiplication (a·tb − b·ta) — no rate division, no float sum;
    // the report is bit-exact in any engine
    Q("ta_vocab_drift",
      (s, d) => {
        val docs = T(s, d, "documents")
        TextAnalysis.vocabularyDrift(
            docs.filter(col("doc_id") < 250), docs.filter(col("doc_id") >= 250),
            "doc_id", "text", k = 20)
          .orderBy("rnk")
      },
      Some("""WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                         FROM documents),
                   wd AS (SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM d),
                   ca AS (SELECT w, count(*) AS n_a FROM wd
                          WHERE doc_id < 250 AND w <> '' GROUP BY 1),
                   cb AS (SELECT w, count(*) AS n_b FROM wd
                          WHERE doc_id >= 250 AND w <> '' GROUP BY 1),
                   j AS (SELECT coalesce(ca.w, cb.w) AS w,
                           CAST(coalesce(n_a, 0) AS BIGINT) AS n_a,
                           CAST(coalesce(n_b, 0) AS BIGINT) AS n_b
                         FROM ca FULL OUTER JOIN cb ON ca.w = cb.w),
                   tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS total_a,
                                  CAST(sum(n_b) AS BIGINT) AS total_b FROM j),
                   x AS (SELECT w, n_a, n_b,
                           n_a * total_b - n_b * total_a AS cross_diff,
                           abs(n_a * total_b - n_b * total_a) AS drift
                         FROM j CROSS JOIN tot),
                   ranked AS (SELECT w AS token, n_a, n_b, cross_diff, drift,
                                row_number() OVER (ORDER BY drift DESC, w) AS rnk
                              FROM x)
              SELECT token, n_a, n_b, cross_diff, drift, rnk
              FROM ranked WHERE rnk <= 20 ORDER BY rnk""")),



    // Long-document chunking: 32-token windows advancing by 24 (8-token
    // overlap); chunk counts and boundaries are pure integer arithmetic,
    // chunk text is exact token-slice reassembly — no shuffle anywhere
    // (per-row expressions only)
    Q("ta_chunk_docs",
      (s, d) => TextAnalysis.chunkDocuments(
          T(s, d, "documents"), "doc_id", "text", chunkTokens = 32, overlap = 8)
        .orderBy("id", "chunk_id"),
      Some("""WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                         FROM documents
                         WHERE text IS NOT NULL AND length(trim(text)) > 0),
                   w AS (SELECT doc_id, string_split(t, ' ') AS w,
                                len(string_split(t, ' ')) AS n FROM d),
                   nc AS (SELECT doc_id, w, n,
                            (greatest(n - 32, 0) + 23) // 24 + 1 AS n_chunks FROM w),
                   ch AS (SELECT doc_id, n, n_chunks,
                            unnest(range(n_chunks)) AS chunk_id, w FROM nc)
              SELECT doc_id AS id, chunk_id, n_chunks,
                     least(32, n - chunk_id * 24) AS chunk_tokens,
                     array_to_string(w[chunk_id*24+1 : chunk_id*24+32], ' ') AS chunk_text
              FROM ch ORDER BY id, chunk_id""")),



    // Per-doc keyword extraction: top-3 terms by exact-integer tf-idf
    // ordering (raw-ratio idf — IEEE mul/div, no libm log; see
    // TextAnalysis.tfidfKeywords). maxDfFrac 0.9: the synthetic corpus
    // is template text over a ~30-word vocabulary with df ≈ 0.6–0.9·n,
    // so the operator-default 0.5 stopword prune would blank most docs
    Q("ta_tfidf_keywords",
      (s, d) => TextAnalysis.tfidfKeywords(
          T(s, d, "documents"), "doc_id", "text", k = 3, maxDfFrac = 0.9)
        .orderBy("id", "rn"),
      Some("""WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                         FROM documents),
                   wd AS (SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM d),
                   tf AS (SELECT doc_id, w, count(*) AS tf FROM wd WHERE w <> '' GROUP BY 1, 2),
                   dfq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
                   nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
                   scored AS (SELECT tf.doc_id, tf.w, tf.tf, dfq.df,
                                CAST(tf.tf AS DOUBLE) * nd.n_docs / dfq.df AS score
                              FROM tf JOIN dfq USING (w) CROSS JOIN nd
                              WHERE CAST(dfq.df AS DOUBLE) <= nd.n_docs * 0.9::DOUBLE),
                   ranked AS (SELECT doc_id AS id, w AS term, tf, df, score,
                                row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, w) AS rn
                              FROM scored)
              SELECT id, term, tf, df, score, rn FROM ranked
              WHERE rn <= 3 ORDER BY id, rn"""))
  )
}
