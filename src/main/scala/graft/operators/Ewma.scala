package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Exponentially-weighted moving average per group — the reference's one
  * truly sequential operator (`/root/reference/src/bin/crunch.rs:220-294`,
  * spec `calcs.md:52-63`).
  *
  * Semantics reproduced exactly:
  *  - state starts at 0.0 per group and resets when the group changes;
  *  - `ewma_t = (1-α)·state + α·value_t`, state advances to `ewma_t`;
  *  - a null value emits null and does NOT advance the state
  *    (`crunch.rs:251-267`).
  *
  * Scale design: `repartition(groupKey)` + `sortWithinPartitions` +
  * `mapPartitions` — one shuffle, then a single sequential pass per
  * partition with O(1) state. No driver collect, no window materialization.
  * Skewed/huge groups stay within one task by construction (a group must be
  * scanned in order); with few giant groups a chunked prefix-scan
  * formulation would apply, not needed at current group cardinalities.
  */
object Ewma {

  /** Append column `outCol` with the per-group EWMA of `valueCol`.
    * Output row order is not defined (as with any shuffle); order with
    * a downstream sort if needed.
    */
  def withEwma(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[String],
      valueCol: String,
      alpha: Double,
      outCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, DoubleType, nullable = true))
    val enc = Encoders.row(outSchema)
    val sortCols: Seq[Column] = (groupCol +: orderCols).map(col)
    val gIdx = df.schema.fieldIndex(groupCol)
    val vIdx = df.schema.fieldIndex(valueCol)
    df.repartition(col(groupCol))
      .sortWithinPartitions(sortCols: _*)
      .mapPartitions { it =>
        var curKey: Any = null
        var started = false
        var state = 0.0
        it.map { r =>
          val k = r.get(gIdx)
          if (!started || k != curKey) { curKey = k; state = 0.0; started = true }
          val out: Any =
            if (r.isNullAt(vIdx)) null
            else {
              val v = r.getDouble(vIdx)
              state = (1.0 - alpha) * state + alpha * v
              state
            }
          Row.fromSeq(r.toSeq :+ out)
        }
      }(enc)
  }

  /** Segment-composed two-phase EWMA — the skew escape hatch for
    * [[withEwma]]'s one-task-per-group constraint (SURVEY §7.4: 5 NEM
    * regions ⇒ 5 tasks max, regardless of cluster size).
    *
    * `chunkCol` splits each group's timeline into segments; it MUST be
    * numeric and monotone non-decreasing w.r.t. `orderCols` within every
    * group (e.g. `unix_micros(ts) div <span>` — a time bucket). Then:
    *
    *  1. PARALLEL phase: every (group, chunk) folds independently from
    *     state 0, one task each — parallelism is groups × chunks. Each
    *     row r keeps its local prefix `b_r` AND the running decay
    *     product `a_r` (`a *= (1-α)` per non-null row — an explicit
    *     product chain, NOT `pow`, so the op sequence is reproducible on
    *     any IEEE engine with no libm dependence).
    *  2. SHORT prefix pass: per group, the per-chunk end summaries
    *     (A_c, B_c) fold to chunk ENTRY states S_1 = 0,
    *     S_{c+1} = A_c·S_c + B_c — chunk-count-bounded work, done with
    *     one `aggregate` higher-order expression per group.
    *  3. Final value: `ewma_r = a_r·S_c + b_r` (null values stay null
    *     and never advance state — [[withEwma]]'s contract).
    *
    * Exactness: the composition is algebraically exact; in IEEE terms
    * the result is bitwise-identical to [[withEwma]] whenever the
    * arithmetic is exact (dyadic α and values — spec-asserted), for
    * every first-chunk row (S = 0 short-circuits to the local fold) and
    * single-chunk group, and within ulps of the sequential fold
    * elsewhere (the composed op order differs from the sequential one —
    * EwmaSpec pins ≤ 1e-12 relative). The oracle-green path
    * (`w01c_ewma_segmented`) mirrors THIS op order in SQL, so the
    * cross-engine comparison is still bit-exact.
    *
    * `broadcastEntries`: the entry-state table is groups × chunks rows —
    * broadcast by default; pass false if that product outgrows an
    * executor and the join degrades to a shuffle on (group, chunk). */
  def withEwmaSegmented(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[String],
      valueCol: String,
      alpha: Double,
      outCol: String,
      chunkCol: Column,
      broadcastEntries: Boolean = true): DataFrame = {
    val withChunk = df.withColumn("__chunk", chunkCol.cast("long"))
    val p1Schema = StructType(withChunk.schema.fields ++ Seq(
      StructField("__a", DoubleType, nullable = false),
      StructField("__b", DoubleType, nullable = false)))
    val enc = Encoders.row(p1Schema)
    val gIdx = withChunk.schema.fieldIndex(groupCol)
    val cIdx = withChunk.schema.fieldIndex("__chunk")
    val vIdx = withChunk.schema.fieldIndex(valueCol)
    val sortCols: Seq[Column] = (col(groupCol) +: col("__chunk") +: orderCols.map(col))
    // phase 1: independent (group, chunk) folds from state 0. Persisted:
    // the fold feeds BOTH the chunk summaries and the final join — an
    // unpersisted plan re-scans and re-shuffles the whole input for each
    // (the r11 plan audit showed two full parquet passes). Lazy
    // plan-keyed persist, populated on the query's first action;
    // released by the caller's cache hygiene / ContextCleaner.
    val local = withChunk
      .repartition(col(groupCol), col("__chunk"))
      .sortWithinPartitions(sortCols: _*)
      .mapPartitions { it =>
        var curKey: (Any, Any) = null
        var started = false
        var a = 1.0
        var b = 0.0
        it.map { r =>
          val k = (r.get(gIdx), r.get(cIdx))
          if (!started || k != curKey) { curKey = k; a = 1.0; b = 0.0; started = true }
          if (!r.isNullAt(vIdx)) {
            b = (1.0 - alpha) * b + alpha * r.getDouble(vIdx)
            a = (1.0 - alpha) * a
          }
          Row.fromSeq(r.toSeq ++ Seq(a, b))
        }
      }(enc)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // phase 2: per-chunk end summary (the LAST row's (a, b)) → per-group
    // entry-state prefix via one aggregate() expression over the sorted,
    // chunk-count-bounded summary list
    val orderStruct = struct(orderCols.map(col): _*)
    val summaries = local.groupBy(col(groupCol), col("__chunk"))
      .agg(max_by(struct(col("__a"), col("__b")), orderStruct).as("__s"))
      .select(col(groupCol), col("__chunk"),
        col("__s.__a").as("__A"), col("__s.__b").as("__B"))
    val entries = summaries
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(col("__chunk"), col("__A"), col("__B")))).as("__cs"))
      .select(col(groupCol), explode(aggregate(
        col("__cs"),
        struct(lit(0.0).as("state"),
          array().cast("array<struct<__chunk:bigint,__entry:double>>").as("out")),
        (acc, ch) => struct(
          // same op order the oracle mirrors: A·S + B, one rounding each
          (ch.getField("__A") * acc.getField("state") + ch.getField("__B")).as("state"),
          concat(acc.getField("out"),
            array(struct(ch.getField("__chunk").as("__chunk"),
              acc.getField("state").as("__entry")))).as("out")),
        acc => acc.getField("out"))).as("__e"))
      .select(col(groupCol), col("__e.__chunk").as("__chunk"),
        col("__e.__entry").as("__entry"))
    // phase 3: compose — a_r·S + b_r; null values stay null
    val joined = local.join(
      if (broadcastEntries) broadcast(entries) else entries.hint("shuffle_hash"),
      Seq(groupCol, "__chunk"))
    joined
      .withColumn(outCol,
        when(col(valueCol).isNull, lit(null).cast(DoubleType))
          .otherwise(col("__a") * col("__entry") + col("__b")))
      .drop("__chunk", "__a", "__b", "__entry")
  }
}
