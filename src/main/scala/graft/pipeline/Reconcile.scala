package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{NemCsv, ParquetMeta}

/** Whole-lake row-count reconciliation — the reference's north-star
  * correctness check (/root/reference/src/bin/verify.rs:13-135): the
  * number of `D`-lines across all source files must equal the parquet
  * lake's row count (footer metadata, no data scan), which must equal the
  * compacted layout's row count. `I`-lines must never be counted
  * (test_processing.rs:575-582). */
object Reconcile {

  final case class Report(table: String, sourceRows: Long, lakeRows: Long, matches: Boolean)

  /** Per-table: D-line count in the sources vs footer row count in the
    * lake. Source counting re-runs the splitter scan (cheap, no typing). */
  def run(spark: SparkSession, sourcePaths: Seq[String], lakeRoot: String): DataFrame = {
    import spark.implicits._
    val srcCounts = NemCsv.rawRecords(spark, sourcePaths)
      .groupBy("table").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fs = new org.apache.hadoop.fs.Path(lakeRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tables = fs.listStatus(new org.apache.hadoop.fs.Path(lakeRoot))
      .filter(_.isDirectory).map(_.getPath.getName)
    val reports = tables.toIndexedSeq.map { t =>
      val lakeRows = ParquetMeta.readDir(spark, s"$lakeRoot/$t").map(_.rows).sum
      val src = srcCounts.getOrElse(t, 0L)
      Report(t, src, lakeRows, src == lakeRows)
    } ++ srcCounts.keys.filterNot(tables.contains).map(t =>
      Report(t, srcCounts(t), 0L, matches = false))
    reports.toDF()
  }
}
