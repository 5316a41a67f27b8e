package graft.sources

import graft.SparkSpec

/** Mirrors the reference's only unit test, `add_get_vacuum_and_scan_again`
  * (/root/reference/src/history/table_history.rs:188-275). */
class HistoryTableSpec extends SparkSpec {

  test("add → keys → vacuum → reopen: keys survive consolidation") {
    import spark.implicits._
    val root = tmpDir("hist")
    val h = HistoryTable.downloaded(spark, root)
    h.add(Seq(("f1.zip", 100L)).toDF("filename", "size_bytes"))
    h.add(Seq(("f2.zip", 200L)).toDF("filename", "size_bytes"))
    h.add(Seq(("f3.zip", 300L)).toDF("filename", "size_bytes"))
    assert(h.keys().get.count() === 3)
    h.vacuum()
    // consolidated into one file
    val files = new java.io.File(s"$root/downloaded").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length === 1 && files.head.getName.startsWith("consolidated-"))
    // re-open (new instance) still sees all keys — durability semantics
    val h2 = HistoryTable.downloaded(spark, root)
    assert(h2.keys().get.as[String].collect().sorted === Array("f1.zip", "f2.zip", "f3.zip"))
    // vacuum again is a no-op (single file)
    h2.vacuum()
    assert(h2.keys().get.count() === 3)
  }

  test("filterNew: left_anti against seen keys; empty history passes all") {
    import spark.implicits._
    val h = HistoryTable.processed(spark, tmpDir("hist2"))
    val cands = Seq("a.zip", "b.zip", "c.zip").toDF("f")
    assert(h.filterNew(cands, "f").count() === 3)
    h.add(Seq(("b.zip", 1L)).toDF("filename", "rows"))
    val fresh = h.filterNew(cands, "f").as[String].collect().sorted
    assert(fresh === Array("a.zip", "c.zip"))
  }
}
