package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering for
  * parquet row-group pruning. A table sorted on ONE column prunes scans
  * filtered on that column only; sorting on the bit-interleaved Z-value
  * of two columns bounds EVERY row group in BOTH dimensions, so
  * dashboard filters on either (or both) skip most of a 100 TB table's
  * row groups from footer stats alone. Same idea as Delta/Iceberg
  * Z-ordering, expressed as a pure Spark write pattern:
  * `repartitionByRange(zValue2(...))` + `sortWithinPartitions` — one
  * range shuffle, then linear writes; nothing here is driver-side.
  *
  * The Z-value itself is a fixed chain of shift/mask/or expressions —
  * codegen'd, scan-speed, and exact integer arithmetic any engine
  * reproduces bit-for-bit (oracle-checked as `p20_zorder_key`). */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integer columns:
    * bit `i` of `x` lands at position `2i`, of `y` at `2i+1`. Caller
    * buckets raw values into [0, 2^bits) first (`pmod`, range-rank, or
    * epoch division — see [[zOrderedWriter]]); 2·bits must stay ≤ 62. */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"need 1 <= bits <= 31, got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Range-partition `df` by the Z-value of two bucketed dimensions and
    * sort each partition by it — the layout-producing write shape. Each
    * output file then covers a compact Z-range, i.e. a bounded rectangle
    * in (xBucket, yBucket) space, which is what makes footer-stats
    * pruning work on both columns. `files` ≈ target file count (range
    * partitions). */
  def zOrdered(df: DataFrame, xBucket: Column, yBucket: Column,
      files: Int, bits: Int = 16): DataFrame = {
    graft.operators.Guards.requireFreshColumns(df, "ZOrder.zOrdered", Seq("_zv"))
    val zv = zValue2(xBucket, yBucket, bits)
    df.withColumn("_zv", zv)
      .repartitionByRange(files, col("_zv"))
      .sortWithinPartitions("_zv")
      .drop("_zv")
  }
}
