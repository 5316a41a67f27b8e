package graft.plans

import graft.SparkSpec
import graft.sources.HistoryTable
import java.nio.file.{Files, Paths}

class CompactorSpec extends SparkSpec {

  test("compactPartition: many files → one compacted.parquet, widened, rows preserved") {
    import spark.implicits._
    val lake = tmpDir("lake")
    val part = s"$lake/FPP---UNIT_MW---1/date=2025-06-07"
    Seq(("1.0", "a")).toDF("mw", "id").coalesce(1).write.mode("append").parquet(part)
    Seq((2.0, "b", 9.0)).toDF("mw", "id", "extra").coalesce(1).write.mode("append").parquet(part)
    // pre-state: at least 2 part files
    val before = Files.list(Paths.get(part)).filter(_.toString.endsWith(".parquet")).count()
    assert(before >= 2)
    val stat = Compactor.compactPartition(spark, lake, "FPP---UNIT_MW---1", "date=2025-06-07").get
    assert(stat.rows === 2)
    val files = Files.list(Paths.get(part)).filter(_.toString.endsWith(".parquet"))
      .toArray.map(_.toString)
    assert(files.length === 1 && files.head.endsWith("compacted.parquet"))
    val back = spark.read.parquet(s"$lake/FPP---UNIT_MW---1")
    assert(back.count() === 2)
    assert(back.schema("mw").dataType.typeName === "double") // widened from string
  }

  test("runOnce: anti-join bookkeeping makes the sweep idempotent; recompaction folds in new files") {
    import spark.implicits._
    val lake = tmpDir("lake2")
    val hist = HistoryTable.compacted(spark, tmpDir("hist"))
    val part = s"$lake/T---X---1/date=2025-06-07"
    Seq((1.0, "a")).toDF("v", "id").coalesce(1).write.mode("append").parquet(part)
    val first = Compactor.runOnce(spark, lake, hist)
    assert(first.map(_.rows).sum === 1)
    // second sweep: nothing new → no work
    assert(Compactor.runOnce(spark, lake, hist).isEmpty)
    // new arrival → recompacted including previous compacted.parquet
    Seq((2.0, "b")).toDF("v", "id").coalesce(1).write.mode("append").parquet(part)
    val third = Compactor.runOnce(spark, lake, hist)
    assert(third.map(_.rows).sum === 2)
    assert(spark.read.parquet(s"$lake/T---X---1").count() === 2)
  }
}
