package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The mergeable-sketch trio over text corpora — count-min (frequency),
  * HyperLogLog (cardinality), power-of-two histogram (length quantiles)
  * — plus their shard-merge folds. Split from [[TextAnalysis]] at the
  * registry-hygiene threshold; zero behavior change. Each sketch is a
  * fixed-grid aggregation whose partial aggregation IS the merge, the
  * property that makes them 100 TB citizens (per-shard summaries roll
  * up without touching row data).
  */
object TextSketches {

  /** Count-min sketch over whitespace tokens — the mergeable
    * fixed-memory frequency summary a 100 TB corpus uses where an exact
    * token groupBy would carry the full vocabulary through a shuffle:
    * `depth` hash rows × `width` counters (`depth·width` cells total,
    * KBs not TBs), each token occurrence incrementing one cell per row.
    * Point estimates ([[cmEstimate]]) take the min over rows — always
    * ≥ the true count, within `e·N / width` with probability
    * `1 − (1/2)^depth`. Returns the sketch as (row, col, cnt).
    *
    * Scale shape: one scan, one groupBy on (row, col) whose key space is
    * the FIXED `depth·width` grid — the aggregation is map-side-combined
    * into at most `depth·width` rows per partition regardless of corpus
    * size, and two sketches merge by adding cells (the partial
    * aggregation IS the merge). The portable md5 hash keeps every cell
    * cross-engine reproducible. */
  def countMinSketch(df: org.apache.spark.sql.DataFrame, textCol: String,
      depth: Int = 4, width: Int = 512): org.apache.spark.sql.DataFrame = {
    require(depth >= 1 && width >= 2, s"depth=$depth width=$width")
    // The whole normalize/explode/md5 pipeline runs IN the scan stage
    // (no exchange before the fixed-grid agg), so an under-parallel scan
    // serializes it (r20, measured: 1.1 s cpu on one task at sf0.1).
    // The spread decision belongs to the CALLER (GraftSession.spread on
    // the doc frame): whether it pays depends on per-call volume — it
    // won for the whole-corpus heavy-hitters pass and LOST for the
    // 3-way sharded merge (per-shard compute under the dispatch cost;
    // probe pair in OPTIMIZATION_r20.md) — and only the caller can
    // share one spread across branches.
    df.select(explode(split(TextAnalysis.normalize(col(textCol)), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(explode(array((0 until depth).map { r =>
        struct(lit(r).as("row"),
          pmod(Dedup.portableHash60(concat(col("tok"), lit(s"#cm$r"))),
            lit(width.toLong)).as("col"))
      }: _*)).as("rc"))
      .groupBy(col("rc.row").as("row"), col("rc.col").as("col"))
      .agg(count(lit(1)).as("cnt"))
  }


  /** Merge count-min sketches by ADDING cells — the property that makes
    * the sketch a 100 TB citizen: per-shard sketches roll up to the
    * whole-corpus sketch without touching row data (the merged table is
    * bit-identical to sketching the union, which `ta_cm_merge` proves
    * against an oracle that sketches the union directly). The groupBy
    * key space stays the fixed `depth·width` grid. */
  def cmMerge(sketches: Seq[org.apache.spark.sql.DataFrame]): org.apache.spark.sql.DataFrame = {
    require(sketches.nonEmpty, "no sketches to merge")
    sketches.reduce(_ unionByName _)
      .groupBy("row", "col").agg(sum(col("cnt")).as("cnt"))
  }

  /** Merge HyperLogLog register tables by per-bucket MAX (max is
    * associative + idempotent, so shard registers roll up to exactly the
    * whole-corpus registers — `ta_hll_merge` proves it cross-engine).
    * Inputs must share the same `p`. */
  def hllMerge(regTables: Seq[org.apache.spark.sql.DataFrame]): org.apache.spark.sql.DataFrame = {
    require(regTables.nonEmpty, "no register tables to merge")
    regTables.reduce(_ unionByName _)
      .groupBy("bucket").agg(max(col("rho")).as("rho"))
  }

  /** Point-estimate token frequencies from a [[countMinSketch]]: min
    * over the `depth` cells each token hashes to (0 when a cell is
    * absent — the token was never counted). The sketch broadcasts (its
    * size is the fixed grid, corpus-independent); `depth`/`width` must
    * match the sketch's. Returns (tok, cm_est). */
  def cmEstimate(sketch: org.apache.spark.sql.DataFrame,
      tokens: org.apache.spark.sql.DataFrame, tokCol: String,
      depth: Int, width: Int): org.apache.spark.sql.DataFrame =
    tokens.select(col(tokCol).as("tok")).distinct()
      .select(col("tok"), explode(array((0 until depth).map { r =>
        struct(lit(r).as("row"),
          pmod(Dedup.portableHash60(concat(col("tok"), lit(s"#cm$r"))),
            lit(width.toLong)).as("col"))
      }: _*)).as("rc"))
      .select(col("tok"), col("rc.row").as("row"), col("rc.col").as("col"))
      .join(broadcast(sketch), Seq("row", "col"), "left")
      .groupBy("tok")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))

  /** HyperLogLog register table over an arbitrary key expression — the
    * mergeable cardinality sketch ("how many distinct shingles /
    * fingerprints / urls") that replaces a corpus-wide DISTINCT shuffle
    * with `m = 2^p` one-byte registers. The portable 60-bit hash splits
    * into a `p`-bit bucket and a `60−p`-bit remainder; the register
    * holds the max rank `rho` (leading zeros + 1, via the minimal-width
    * `bin()` string both engines share) seen in its bucket. Returns all
    * `m` rows as (bucket, rho), empty registers as rho = 0.
    *
    * Scale shape: one scan, one groupBy over at most `m` keys
    * (map-side-combined max — each partition emits ≤ m rows), spine
    * join to densify. Two sketches merge by per-bucket max — the
    * partial aggregation IS the merge, so per-shard register tables
    * roll up without touching row data. Duplicate keys are free (max is
    * idempotent), so feed the raw stream — no upstream DISTINCT needed.
    * Null keys carry no identity and are skipped.
    *
    * `withCount = true` adds a `cnt` column (input rows landing in each
    * bucket, 0 for empty registers) in the SAME per-bucket aggregation —
    * so a caller that also needs an exact total (feed distinct keys, sum
    * `cnt`) gets it without a second pass over the input or a second
    * branch whose exchange the planner may fail to reuse
    * (`ta_hll_distinct`, round 15: the two-branch self-join form ran the
    * distinct shuffle twice at the lakes). */
  def hllRegisters(df: org.apache.spark.sql.DataFrame, key: Column,
      p: Int = 8, withCount: Boolean = false): org.apache.spark.sql.DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p out of [4,16]")
    val m = 1 << p
    val wBits = 60 - p
    val spark = df.sparkSession
    val aggs = max(col("rho")).as("rho") +:
      (if (withCount) Seq(count(lit(1)).as("cnt")) else Nil)
    val regs = df.select(Dedup.portableHash60(key).as("h"))
      .filter(col("h").isNotNull)
      .select(shiftright(col("h"), wBits).as("bucket"),
        (col("h") % lit(1L << wBits)).as("rem"))
      .withColumn("rho", when(col("rem") === 0L, lit(wBits + 1))
        .otherwise(lit(wBits + 1) - length(bin(col("rem")))))
      .groupBy("bucket").agg(aggs.head, aggs.tail: _*)
    val outCols = Seq(col("bucket"), coalesce(col("rho"), lit(0)).as("rho")) ++
      (if (withCount) Seq(coalesce(col("cnt"), lit(0L)).as("cnt")) else Nil)
    spark.range(m).toDF("bucket")
      .join(regs, Seq("bucket"), "left")
      .select(outCols: _*)
  }

  /** Merge token-length histograms ([[tokenHistogram]] output) by ADDING
    * bucket counts — completing the merge trio (count-min: add, HLL:
    * max, histogram: add). `cum` is a DERIVED column and is recomputed
    * over the merged ≤64-row result — never add cumulative columns.
    * `ta_hist_merge` proves the fold against an oracle that histograms
    * the whole corpus directly. */
  def histogramMerge(hists: Seq[org.apache.spark.sql.DataFrame]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(hists.nonEmpty, "no histograms to merge")
    hists.map(_.drop("cum")).reduce(_ unionByName _)
      .groupBy("bucket", "lo", "hi").agg(sum(col("cnt")).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("bucket"), col("lo"), col("hi"), col("cnt"), col("cum"))
  }

  /** Power-of-two token-length histogram — the mergeable quantile
    * sketch completing the trio (count-min: frequency, HLL:
    * cardinality, this: distribution): docs bucket by
    * `floor(log2(n_tokens)) + 1` (= the minimal-width `bin()` length,
    * pure integer — no libm log), counts accumulate per bucket, and any
    * quantile reads off the cumulative column to within a 2× bracket.
    * Returns one row per non-empty bucket:
    * (bucket, lo, hi, cnt, cum), `lo..hi` the inclusive length range.
    *
    * Scale shape: the groupBy key space is ≤ 64 buckets, so the
    * aggregation collapses map-side regardless of corpus rows and
    * per-shard histograms merge by adding counts. The cum window runs
    * over the ≤ 64-row RESULT, not the corpus (the one "no partition"
    * window in the family that is genuinely bounded). */
  def tokenHistogram(df: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(TextAnalysis.tokenCount(col(textCol)).as("n")).filter(col("n").isNotNull)
      .withColumn("bucket",
        when(col("n") === 0, lit(0)).otherwise(length(bin(col("n").cast("long")))))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .withColumn("lo", when(col("bucket") === 0, lit(0L))
        .otherwise(expr("shiftleft(CAST(1 AS BIGINT), bucket - 1)")))
      .withColumn("hi", when(col("bucket") === 0, lit(0L))
        .otherwise(expr("shiftleft(CAST(1 AS BIGINT), bucket) - 1")))
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("bucket"), col("lo"), col("hi"), col("cnt"), col("cum"))
  }

}
