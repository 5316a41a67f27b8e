package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.{Dedup, Ewma, Similarity, TextAnalysis}
import QueryShared._

/** Corpus-level REPORT queries split from [[TextQueries]] at the ~500-
  * line registry guideline: domain/length/novelty/quality profiles, the
  * corpus pipeline and shuffle, vocabulary and PMI, filter agreement,
  * blocklist and the dataset card. Entries moved verbatim.
  */
private[queries] object TextReportQueries {

  val all: Seq[Q] = Seq(

    // Domain-level reference profile. The corpus text carries no URLs, so
    // the query plants deterministic ones derived from (source, doc_id) —
    // replicated verbatim in the oracle — and profiles those: the regex
    // extraction, host reduction and per-domain aggregate are what's
    // under test
    Q("ta_domain_profile",
      (s, d) => {
        // the %7/%11 plants are pathless sentence-final URLs — the shape
        // whose host keeps trailing punctuation without the operator's
        // trim ("(https://press…)" → "press.example.org)"), so the oracle
        // row would fragment if the trim ever regressed
        val planted = T(s, d, "documents").withColumn("text_u",
          concat_ws(" ", col("text"),
            concat(lit("http://"), col("source"), lit(".example.org/p/"), col("doc_id")),
            when(col("doc_id") % 10 === 0,
              concat(lit("https://cdn.example.org/a/"), col("doc_id"))),
            when(col("doc_id") % 7 === 3, lit("(https://press.example.org)")),
            when(col("doc_id") % 11 === 5, lit("read https://news.example.org.")),
            // port / userinfo plants: both must normalize to the SAME
            // bare domain ("mirror.example.org") or the profile fragments
            when(col("doc_id") % 13 === 2,
              concat(lit("http://mirror.example.org:8080/f/"), col("doc_id"))),
            when(col("doc_id") % 17 === 4, lit("https://anon@mirror.example.org/pub"))))
        TextAnalysis.domainProfile(planted, "doc_id", "text_u")
          .orderBy(col("n_refs").desc, col("domain"))
      },
      Some("""WITH p AS (SELECT doc_id,
                           concat_ws(' ', text,
                             'http://' || source || '.example.org/p/' || doc_id,
                             CASE WHEN doc_id % 10 = 0
                                  THEN 'https://cdn.example.org/a/' || doc_id END,
                             CASE WHEN doc_id % 7 = 3
                                  THEN '(https://press.example.org)' END,
                             CASE WHEN doc_id % 11 = 5
                                  THEN 'read https://news.example.org.' END,
                             CASE WHEN doc_id % 13 = 2
                                  THEN 'http://mirror.example.org:8080/f/' || doc_id END,
                             CASE WHEN doc_id % 17 = 4
                                  THEN 'https://anon@mirror.example.org/pub' END) AS text_u
                         FROM documents),
                   u AS (SELECT doc_id,
                           unnest(regexp_extract_all(text_u, 'https?://[^ \t\n\r]+')) AS url
                         FROM p),
                   h AS (SELECT doc_id,
                           regexp_replace(regexp_replace(
                             regexp_replace(
                               lower(regexp_extract(url, 'https?://([^/ \t\n\r]+)', 1)),
                               '[.,;:)\]]+$', ''),
                             '^[^@]*@', ''), ':[0-9]+$', '') AS domain
                         FROM u)
              SELECT domain, count(DISTINCT doc_id) AS n_docs, count(*) AS n_refs
              FROM h GROUP BY 1 ORDER BY n_refs DESC, domain""")),



    // The LLM-side flagship composition (sibling of nem_crunch_pipeline):
    // length gate → exact dedup → stratified sample → token budget →
    // deterministic shuffle → sequence packing, all one oracle-checked
    // chain. Every CTE below replicates the SQL already proven for the
    // individual operators (dd_exact_groups, ta_stratified_sample,
    // ta_token_budget, ta_corpus_shuffle, ta_pack).
    Q("ta_corpus_pipeline",
      (s, d) => graft.pipeline.CorpusAssembly.assemble(
          T(s, d, "documents"), "doc_id", "text",
          minTokens = 5,
          langRate = when(col("lang") === "en", lit(0.8))
            .when(col("lang") === "zh", lit(0.6)).otherwise(lit(0.5)),
          tokenBudget = 3000L, shuffleShards = 8,
          packBudget = 512, packShards = 4)
        .orderBy("doc_id"),
      Some("""WITH t0 AS (SELECT doc_id, text, lang, source, n_chars,
                      CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens
                    FROM documents),
                   t1 AS (SELECT * FROM t0 WHERE n_tokens >= 5),
                   t2 AS (SELECT * FROM (
                      SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                      FROM t1) WHERE rn = 1),
                   t3 AS (SELECT * FROM t2
                    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#sample'), 18, 15))::BIGINT
                            % 1000000
                          < (CASE WHEN lang = 'en' THEN 0.8::DOUBLE
                                  WHEN lang = 'zh' THEN 0.6::DOUBLE
                                  ELSE 0.5::DOUBLE END) * 1000000),
                   t4 AS (SELECT * FROM (
                      SELECT *, CAST(coalesce(sum(n_tokens) OVER (
                          PARTITION BY source
                          ORDER BY -n_chars ASC NULLS FIRST, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_tokens
                      FROM t3) WHERE cum_tokens < 3000),
                   sh AS (SELECT doc_id, lang, source, n_tokens,
                      ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#shuffle'), 18, 15))::BIGINT AS sh_h,
                      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 18, 15))::BIGINT AS pk_h
                    FROM t4),
                   t5 AS (SELECT *, row_number() OVER (ORDER BY sh_h % 8, sh_h, doc_id) - 1 AS shuffle_pos
                    FROM sh),
                   t6 AS (SELECT doc_id, lang, source, n_tokens, shuffle_pos,
                      pk_h % 4 AS pack_shard,
                      CAST(coalesce(sum(n_tokens) OVER (
                          PARTITION BY pk_h % 4 ORDER BY pk_h, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offset_tokens
                    FROM t5)
              SELECT doc_id, lang, source, n_tokens, shuffle_pos, pack_shard,
                     offset_tokens, CAST(offset_tokens // 512 AS BIGINT) AS pack_id
              FROM t6 ORDER BY doc_id""")),



    // Data selection under a token budget: per source, take docs in
    // priority order (longest first here) until the budget fills — the
    // corpus-selection step between filtering and packing. Exact integer
    // running sums, so fully oracle-checkable.
    Q("ta_token_budget",
      (s, d) => graft.operators.TextAnalysis.tokenBudgetSelect(
          T(s, d, "documents"), "doc_id", "text", "source",
          tokenBudget = 2000L, priority = -col("n_chars"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("cum_tokens"), col("selected"))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, source, n_chars,
                      CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
                    FROM documents),
                   c AS (SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
                      CAST(coalesce(sum(CAST(n_tokens AS BIGINT)) OVER (
                        PARTITION BY source
                        ORDER BY -n_chars ASC NULLS FIRST, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_tokens
                    FROM t)
              SELECT doc_id, source, n_tokens, cum_tokens,
                     cum_tokens < 2000 AS selected
              FROM c ORDER BY doc_id""")),



    // Deterministic global shuffle: every doc gets a unique position in a
    // stable pseudo-random training order. The Spark side composes
    // per-shard windows + a broadcast prefix-sum of shard counts (no
    // single-partition global sort); the oracle states the equivalent
    // global ordering directly.
    Q("ta_corpus_shuffle",
      (s, d) => graft.operators.TextAnalysis.shufflePositions(
          T(s, d, "documents").select("doc_id"), "doc_id", shards = 8)
        .select(col("doc_id"), col("shard"), col("shuffle_pos"))
        .orderBy("doc_id"),
      Some("""WITH b AS (SELECT doc_id,
                      ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#shuffle'), 18, 15))::BIGINT AS h
                    FROM documents)
              SELECT doc_id, h % 8 AS shard,
                     row_number() OVER (ORDER BY h % 8, h, doc_id) - 1 AS shuffle_pos
              FROM b ORDER BY doc_id""")),



    // Corpus length-distribution audit: per-language doc counts and exact
    // DISCRETE token-length quantiles — rank arithmetic is pure integer
    // (ceil(p·n) = (num·n+den−1) div den), so the picked values hash-match
    Q("ta_length_profile",
      (s, d) => graft.operators.TextAnalysis.lengthProfile(
          T(s, d, "documents"), "text", "lang")
        .orderBy(col("stratum").asc_nulls_first),
      Some("""WITH t AS (SELECT lang AS stratum,
                      CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens
                    FROM documents),
                   r AS (SELECT stratum, n_tokens,
                      row_number() OVER (PARTITION BY stratum ORDER BY n_tokens ASC NULLS FIRST) AS rn,
                      count(*) OVER (PARTITION BY stratum) AS n
                    FROM t)
              SELECT stratum, count(*) AS n_docs,
                     min(CASE WHEN rn = (n + 1) // 2 THEN n_tokens END) AS p50_tokens,
                     min(CASE WHEN rn = (n * 9 + 9) // 10 THEN n_tokens END) AS p90_tokens,
                     min(CASE WHEN rn = (n * 99 + 99) // 100 THEN n_tokens END) AS p99_tokens
              FROM r GROUP BY stratum ORDER BY stratum NULLS FIRST""")),



    // Per-doc n-gram novelty: sum/mean of corpus-wide shingle document
    // frequency — "repeats the corpus" (boilerplate), the complement of
    // ta_repetition's "repeats itself". Exact integer counts; the mean is
    // one int/int division (bitwise-identical, Registry header rule).
    Q("ta_novelty",
      (s, d) => graft.operators.TextAnalysis.noveltyProfile(
          T(s, d, "documents"), "doc_id", "text", n = 3)
        .orderBy("id"),
      Some("""WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                         FROM documents),
                   w AS (SELECT doc_id, string_split(t, ' ') AS w FROM d),
                   sh AS (SELECT doc_id,
                            CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                                 ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) END AS s
                          FROM w),
                   posts AS (SELECT doc_id, unnest(s) AS sg FROM sh),
                   dfreq AS (SELECT sg, count(*) AS df_s FROM posts GROUP BY sg)
              SELECT p.doc_id AS id, count(*) AS n_shingles,
                     CAST(sum(f.df_s) AS BIGINT) AS df_sum,
                     CAST(sum(f.df_s) AS DOUBLE) / count(*) AS mean_df
              FROM posts p JOIN dfreq f ON p.sg = f.sg
              GROUP BY 1 ORDER BY id""")),



    // The per-doc QUALITY REPORT CARD — third flagship composition next
    // to nem_crunch_pipeline and ta_corpus_pipeline: one wide feature
    // table (tokens, quality, language, PII counts, within-doc repetition,
    // cross-corpus novelty) plus the keep/drop decision a filtering
    // pipeline materializes before corpus assembly. Every column reuses an
    // individually-proven operator; null-text docs keep their row with
    // null features (keep = null, three-valued AND on both engines).
    Q("ta_quality_report",
      (s, d) => TextAnalysis.qualityReport(T(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH base AS (SELECT doc_id,
                      CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
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
                      ) / 3.0::DOUBLE, 6) AS quality,
                      CASE
                        WHEN en >= de AND en >= es AND en >= fr AND en > 0 THEN 'en'
                        WHEN de >= es AND de >= fr AND de > 0 THEN 'de'
                        WHEN es >= fr AND es > 0 THEN 'es'
                        WHEN fr > 0 THEN 'fr'
                        ELSE 'unk' END AS lang_guess,
                      len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS n_emails,
                      len(regexp_extract_all(text, 'https?://[^ \t\n\r]+')) AS n_urls
                    FROM (SELECT doc_id, text,
                            (CASE WHEN t LIKE '% the %' THEN 1 ELSE 0 END + CASE WHEN t LIKE '% and %' THEN 1 ELSE 0 END
                             + CASE WHEN t LIKE '% of %' THEN 1 ELSE 0 END + CASE WHEN t LIKE '% is %' THEN 1 ELSE 0 END) AS en,
                            (CASE WHEN t LIKE '% der %' THEN 1 ELSE 0 END + CASE WHEN t LIKE '% und %' THEN 1 ELSE 0 END
                             + CASE WHEN t LIKE '% die %' THEN 1 ELSE 0 END + CASE WHEN t LIKE '% ist %' THEN 1 ELSE 0 END) AS de,
                            (CASE WHEN t LIKE '% el %' THEN 1 ELSE 0 END + CASE WHEN t LIKE '% los %' THEN 1 ELSE 0 END
                             + CASE WHEN t LIKE '% que %' THEN 1 ELSE 0 END + CASE WHEN t LIKE '% es %' THEN 1 ELSE 0 END) AS es,
                            (CASE WHEN t LIKE '% le %' THEN 1 ELSE 0 END + CASE WHEN t LIKE '% les %' THEN 1 ELSE 0 END
                             + CASE WHEN t LIKE '% et %' THEN 1 ELSE 0 END + CASE WHEN t LIKE '% est %' THEN 1 ELSE 0 END) AS fr
                          FROM (SELECT doc_id, text, ' ' || lower(text) || ' ' AS t FROM documents) raw) scored),
                   nd AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t FROM documents),
                   w2 AS (SELECT doc_id, string_split(t, ' ') AS w FROM nd),
                   g2 AS (SELECT doc_id,
                           unnest(CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
                                  ELSE [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))] END) AS g
                         FROM w2),
                   cnt2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
                   rep AS (SELECT doc_id,
                             CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_gram_frac
                           FROM cnt2 GROUP BY 1),
                   sh3 AS (SELECT doc_id,
                            CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                                 ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) END AS s
                          FROM w2),
                   posts3 AS (SELECT doc_id, unnest(s) AS sg FROM sh3),
                   dfq3 AS (SELECT sg, count(*) AS df_s FROM posts3 GROUP BY sg),
                   nov AS (SELECT p.doc_id, CAST(sum(f.df_s) AS DOUBLE) / count(*) AS mean_df
                           FROM posts3 p JOIN dfq3 f ON p.sg = f.sg GROUP BY 1)
              SELECT b.doc_id, b.n_tokens, b.quality, b.lang_guess, b.n_emails, b.n_urls,
                     rep.top_gram_frac, nov.mean_df,
                     (b.n_tokens >= 5 AND b.quality >= 0.5::DOUBLE
                      AND rep.top_gram_frac <= 0.5::DOUBLE AND b.n_emails = 0) AS keep
              FROM base b
              LEFT JOIN rep ON rep.doc_id = b.doc_id
              LEFT JOIN nov ON nov.doc_id = b.doc_id
              ORDER BY b.doc_id""")),



    // Vocabulary induction: top-50 tokens by document frequency — the
    // seed list for tokenizer training / stopword + maxDocFreq pruning
    Q("ta_vocab",
      (s, d) => graft.operators.TextAnalysis.vocabulary(
          T(s, d, "documents"), "doc_id", "text", k = 50)
        .orderBy("rnk"),
      Some("""WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                         FROM documents),
                   tk AS (SELECT DISTINCT doc_id, unnest(string_split(t, ' ')) AS tok FROM d),
                   dfq AS (SELECT tok, count(*) AS doc_freq FROM tk GROUP BY tok),
                   ranked AS (SELECT tok, doc_freq,
                                row_number() OVER (ORDER BY doc_freq DESC, tok) AS rnk
                              FROM dfq)
              SELECT tok, doc_freq, rnk FROM ranked WHERE rnk <= 50 ORDER BY rnk""")),



    // PMI collocations: top-20 bigrams by lift (the monotone exponential
    // of PMI — log is libm-dependent, the ratio is one IEEE division, so
    // both the ranking and the score hash-match).
    Q("ta_pmi_bigrams",
      (s, d) => graft.operators.TextAnalysis.pmiBigrams(
        T(s, d, "documents"), "doc_id", "text", topK = 20, minCount = 5L),
      Some("""WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t FROM documents),
                   w AS (SELECT doc_id, string_split(t, ' ') AS ws FROM d),
                   posts AS (SELECT doc_id, unnest([{'pos': i - 1, 'w': ws[i]}
                                                    for i in range(1, len(ws) + 1)], recursive := true)
                             FROM w),
                   bi AS (SELECT w AS w1, lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM posts),
                   bi2 AS (SELECT w1, w2 FROM bi WHERE w2 IS NOT NULL),
                   uni AS (SELECT w, count(*) AS c FROM posts GROUP BY w),
                   n1 AS (SELECT count(*) AS n_uni FROM posts),
                   n2 AS (SELECT count(*) AS n_bi FROM bi2),
                   bg AS (SELECT w1, w2, count(*) AS c_xy FROM bi2 GROUP BY w1, w2 HAVING count(*) >= 5),
                   sc AS (SELECT b.w1, b.w2, b.c_xy, ux.c AS c_x, uy.c AS c_y,
                            CAST(b.c_xy AS DOUBLE) * n1.n_uni * n1.n_uni
                              / (CAST(n2.n_bi AS DOUBLE) * ux.c * uy.c) AS lift
                          FROM bg b
                          JOIN uni ux ON ux.w = b.w1
                          JOIN uni uy ON uy.w = b.w2
                          CROSS JOIN n1 CROSS JOIN n2)
              SELECT w1, w2, c_xy, c_x, c_y, lift
              FROM sc ORDER BY lift DESC, w1, w2 LIMIT 20""")),



    // Model-based quality filtering: a FROZEN linear classifier (the
    // CCNet/DataComp stage that replaces hand heuristics) scored at scan
    // speed — literal weights, per-row features, zero shuffle. Output is
    // the logit (sigmoid is libm, not engine-exact); keep = logit > 0 is
    // the same decision boundary
    Q("ta_quality_logit",
      (s, d) => TextAnalysis.qualityLogit(T(s, d, "documents"), "doc_id", "text")
        .orderBy("id"),
      Some(qualityLogitOracle)),



    // Filter-ensembling audit: the 2×2 agreement matrix between the
    // heuristic gate (quality >= 0.5) and the model gate (logit > 0) —
    // the calibration table a filter migration reads before swapping.
    // One scan, both predicates as expressions (qualityLogitExpr), a
    // 4-key aggregate; the oracle joins its two proven formulations
    Q("ta_filter_agreement",
      (s, d) => {
        // both gates read the same profile pass + padded lowercase:
        // stage them once (see TextAnalysis.qualityInputs)
        val (prof, marked) = TextAnalysis.qualityInputs(col("text"))
        T(s, d, "documents")
          .select(col("text").as("__t"), prof.as("__p"), marked.as("__m"))
          .select(
            (TextAnalysis.qualityScoreFrom(col("__t"), col("__p")) >= 0.5).as("heuristic_keep"),
            (TextAnalysis.qualityLogitExprFrom(col("__t"), col("__p"), col("__m")) > 0).as("model_keep"))
          .groupBy("heuristic_keep", "model_keep")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("heuristic_keep", "model_keep")
      },
      Some(s"""WITH ql AS ($qualityLogitOracle),
                    hq AS (SELECT doc_id,
                round((
                  least(CAST(length(text) AS DOUBLE) / 500.0::DOUBLE, 1.0::DOUBLE)
                  + (1.0::DOUBLE - least(
                      (CASE WHEN length(text) = 0 THEN 0.0::DOUBLE
                            ELSE CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                                 / CAST(length(text) AS DOUBLE) END) * 4.0::DOUBLE, 1.0::DOUBLE))
                  + (CASE WHEN (CASE WHEN (CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) = 0 THEN 0.0::DOUBLE
                       ELSE CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
                            / CAST((CASE WHEN length(trim(text)) = 0 THEN 0
                                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS DOUBLE) END)
                       BETWEEN 2.0::DOUBLE AND 12.0::DOUBLE THEN 1.0::DOUBLE ELSE 0.5::DOUBLE END)
                ) / 3.0::DOUBLE, 6) >= 0.5E0 AS heuristic_keep
                           FROM documents)
               SELECT hq.heuristic_keep, ql.keep AS model_keep,
                      count(*) AS n_docs
               FROM ql JOIN hq ON ql.id = hq.doc_id
               GROUP BY 1, 2 ORDER BY 1, 2""")),



    // Dataset card: the one-row corpus summary published alongside a
    // training set — exact-integer volumes, dup pressure (exact distinct
    // fingerprints), heuristic-keep count, sorted lang distribution.
    // Two aggregations off one scan; see TextAnalysis.datasetCard for
    // the 100 TB notes (swap countDistinct for HLL when estimating is ok)
    Q("ta_dataset_card",
      (s, d) => TextAnalysis.datasetCard(
        T(s, d, "documents"), "doc_id", "text", "lang"),
      Some("""WITH q AS (SELECT doc_id, text, coalesce(lang, 'unk') AS l,
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
                ) / 3.0::DOUBLE, 6) AS qual
                         FROM documents),
                   base AS (SELECT count(*) AS n_docs,
                              CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
                              CAST(sum(CASE WHEN text IS NULL THEN 0
                                       ELSE (CASE WHEN length(trim(text)) = 0 THEN 0
                                             ELSE len(regexp_split_to_array(trim(text), '\s+')) END) END) AS BIGINT) AS n_tokens,
                              CAST(sum(coalesce(length(text), 0)) AS BIGINT) AS n_chars,
                              count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n_distinct_texts,
                              CAST(sum(CASE WHEN text IS NOT NULL AND qual >= 0.5E0 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_keep
                            FROM q),
                   lg AS (SELECT string_agg(lc, ' ' ORDER BY lc) AS langs
                          FROM (SELECT l || ':' || CAST(count(*) AS VARCHAR) AS lc
                                FROM q GROUP BY l))
              SELECT * FROM base CROSS JOIN lg""")),



    // C4-style blocklist gate: whole-token matching (substring matching
    // is the classic "class"/"ass" false-positive trap) as higher-order
    // array expressions — the blocklist is a constant inside the
    // codegen'd expression, zero shuffle, zero joins. Oracle nit: DuckDB's
    // sort/join chain yields NULL for an empty list where Spark's
    // array_join yields '' — coalesced in the SQL. (No `--` comments in
    // oracle SQL: the dump flattens newlines.)
    Q("ta_blocklist",
      (s, d) => TextAnalysis.blocklistFilter(
          T(s, d, "documents"), "doc_id", "text", Seq("slow", "scan", "spill"))
        .orderBy("id"),
      Some("""WITH d AS (SELECT doc_id, text IS NULL AS tnull,
                           string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
                         FROM documents),
                   m AS (SELECT doc_id, tnull,
                           list_filter(toks, x -> list_contains(['slow', 'scan', 'spill'], x)) AS bad
                         FROM d)
              SELECT doc_id AS id,
                     CASE WHEN tnull THEN NULL ELSE len(bad) END AS n_hits,
                     CASE WHEN tnull THEN NULL
                          ELSE coalesce(array_to_string(list_sort(list_distinct(bad)), ' '), '') END AS hit_terms,
                     CASE WHEN tnull THEN NULL ELSE len(bad) = 0 END AS keep
              FROM m ORDER BY id"""))
  )
}

