package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** End-to-end training-corpus assembly — the LLM-side flagship
  * composition, sibling of the reference-side crunch pipeline
  * ([[Crunch]]): every step is an already-proven operator, chained the
  * way a production corpus job runs them.
  *
  *  1. length gate        — drop docs under `minTokens` whitespace tokens
  *  2. exact dedup        — keep-first per content hash ([[Dedup.exactDedup]])
  *  3. stratified sample  — per-language keep rates ([[TextAnalysis.sampleKeep]])
  *  4. token budget       — per-source priority fill ([[TextAnalysis.tokenBudgetSelect]])
  *  5. global shuffle     — deterministic training order ([[TextAnalysis.shufflePositions]])
  *  6. sequence packing   — (shard, pack, offset) grid ([[TextAnalysis.packAssignments]])
  *
  * Everything is deterministic (salted portable hashes, no RNG), so the
  * whole chain is reproducible across runs, engines and cluster sizes —
  * and oracle-checkable end-to-end (query `ta_corpus_pipeline`).
  *
  * Scale posture: steps 1–4 are scan-speed predicates or per-stratum
  * windows; steps 5–6 are the bounded two-level window shapes documented
  * on their operators. No global sort, no cartesian, one broadcast of
  * `shuffleShards` count rows.
  */
object CorpusAssembly {

  /** Returns one row per surviving doc:
    * (doc_id, lang, source, n_tokens, shuffle_pos, pack_shard,
    * offset_tokens, pack_id).
    *
    * Input contract: besides `idCol`/`textCol`, `docs` MUST carry the
    * literal columns `lang` (read by `langRate` and the output), `source`
    * (the token-budget stratum) and `n_chars` (the budget fill order —
    * "longest-first" here means most CHARACTERS first, a deliberate
    * proxy: it is already materialized on the documents table, while a
    * token-count priority would force tokenization before the budget
    * window). A frame without them fails analysis up front. The
    * pipeline also writes `n_tokens` (recomputing it from the text) —
    * a caller column of that name is REJECTED here, before the first
    * withColumn could silently overwrite it. */
  def assemble(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int, langRate: Column, tokenBudget: Long,
      shuffleShards: Int, packBudget: Int, packShards: Int): DataFrame = {
    graft.operators.Guards.requireFreshColumns(docs,
      "CorpusAssembly.assemble", Seq("n_tokens"))
    // tokenize ONCE — the gate, the budget and the packing all reuse the
    // same count instead of re-splitting the full text three times
    val counted = docs
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast("long"))
    // 1. length gate (pure predicate — pushes below everything else)
    val gated = counted.filter(col("n_tokens") >= minTokens)
    // 2. exact dedup, keep lowest id per content hash
    val deduped = Dedup.exactDedup(gated, idCol, textCol)
    // 3. per-language sampling
    val sampled = deduped.filter(TextAnalysis.sampleKeep(col(idCol), langRate))
    // 4. per-source token budget, longest-first priority. The surviving
    // frame drops the text and persists: it is the narrow hub feeding
    // shuffle, packing and the final projection (three branches — without
    // the cache the whole upstream chain would run three times), and at
    // corpus scale it is id+metadata only, never document bodies.
    val selected = TextAnalysis.tokenBudgetSelect(sampled, idCol, textCol,
        "source", tokenBudget, priority = -col("n_chars"),
        precomputedTokens = Some("n_tokens"))
      .filter(col("selected"))
      .select(col(idCol), col("lang"), col("source"), col("n_tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 5. deterministic shuffle — a narrow (id, shard, pos) mapping
    val positions = TextAnalysis.shufflePositions(selected, idCol, shuffleShards)
    // 6. pack the survivors from the already-computed counts
    val packed = TextAnalysis.packAssignmentsFromCounts(selected, idCol,
      "n_tokens", packBudget, packShards)
    selected.select(col(idCol), col("lang"), col("source"))
      .join(positions.select(col(idCol), col("shuffle_pos")), Seq(idCol))
      .join(packed.select(col(idCol), col("n_tokens"),
        col("shard").as("pack_shard"), col("offset_tokens"), col("pack_id")), Seq(idCol))
  }
}
