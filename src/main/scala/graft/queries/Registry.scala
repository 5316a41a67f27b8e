package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.{Dedup, Ewma, Similarity, TextAnalysis}

/** One named query per implemented operator of SURVEY.md §2 (plus the
  * LLM-pipeline operators), each with ANSI/DuckDB oracle SQL where the
  * semantics are SQL-expressible. The entries live in per-layer files
  * ([[RelationalQueries]] §2 relational + SQL panels, [[DedupQueries]] +
  * [[SemanticDedupQueries]], [[AnnQueries]], [[TextQueries]] +
  * [[TextReportQueries]], [[SketchQueries]], [[NemQueries]] reference
  * pipeline + multimodal) and re-merge here; [[QueryShared]] carries the shared
  * scaffolding and the oracle-match rules all entries observe:
  *  - identical lowercase column aliases on both sides;
  *  - a total ORDER BY with a unique tie-break wherever LIMIT appears;
  *  - money/value sums are computed as exact BIGINT cent-sums
  *    (`CAST(round(x*100) AS BIGINT)`) — float-summation order differs
  *    between engines, integer sums cannot;
  *  - `events.ts` normalizes to µs TIMESTAMP whatever the parquet
  *    physical encoding (via [[graft.Tables]]), so every oracle
  *    reference uses `CAST(ts AS TIMESTAMP)` to match.
  */
object Registry {

  type Q = QueryShared.Q
  val Q = QueryShared.Q

  val relational: Seq[Q] =
    RelationalQueries.relational ++ WindowSetQueries.windowsAndSets
  val sqlSurface: Seq[Q] = WindowSetQueries.sqlSurface
  val llm: Seq[Q] =
    DedupQueries.all ++ SemanticDedupQueries.all ++ AnnQueries.all ++
      TextQueries.all ++ TextReportQueries.all ++
      SketchQueries.all ++ NemQueries.all ++ MultimodalQueries.all

  val all: Seq[Q] = relational ++ sqlSurface ++ llm

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.collect { case Q(n, _, Some(sql)) => n -> sql.linesIterator.map(_.trim).mkString(" ") }.toMap
}
