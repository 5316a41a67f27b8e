package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables for shuffle-free co-located joins — the 100 TB path
  * for repeated fact-fact joins on a stable key (e.g. orderkey): both
  * sides pre-hashed into the same bucket layout at write time, so the
  * join compiles to a zipped scan with NO Exchange.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String] = Seq.empty): Unit = {
    var w = df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.format("parquet").saveAsTable(table)
  }

  /** Join two identically-bucketed tables on the bucket key. With equal
    * bucket counts Spark plans a shuffle-free sort-merge join. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      on: Seq[String], how: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), on, how)
}
