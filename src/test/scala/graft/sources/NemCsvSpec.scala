package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, StringType, TimestampType}
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Fixture per FIXTURES.md §1 — asserts the reference's invariants
  * (test_processing.rs:544-727, verify.rs:113-134). */
class NemCsvSpec extends SparkSpec {

  val fixture: String =
    """C,NEMP.WORLD,FPP,AEMO,PUBLIC,2025/06/07,23:15:04,0000000466731056,,0000000466731056
      |I,FPP,UNIT_MW,1,MEASUREMENT_DATETIME,FPP_UNITID,PARTICIPANTID,MEASURED_MW,SCHEDULED_MW,DEVIATION_MW,MW_QUALITY_FLAG,INTERVAL_DATETIME,VERSIONNO
      |D,FPP,UNIT_MW,1,"2025/06/07 23:10:04",ARWF1,PART1,45.2,44.0,1.2,1,"2025/06/07 23:15:00",1
      |D,FPP,UNIT_MW,1,"2025/06/07 23:10:08",ARWF1,PART1,45.9,44.0,1.9,1,"2025/06/07 23:15:00",1
      |D,FPP,UNIT_MW,1,"2025/06/07 23:10:12",BARCSF1,PART2,,44.0,,1,"2025/06/07 23:15:00",1
      |I,FPP,REGION_FREQ_MEASURE,1,MEASUREMENT_DATETIME,REGIONID,FREQ_DEVIATION_HZ,FREQ_MEASURE_HZ,HZ_QUALITY_FLAG,INTERVAL_DATETIME,VERSIONNO
      |D,FPP,REGION_FREQ_MEASURE,1,"2025/06/07 23:10:04",NSW1,-0.012,0.003,1,"2025/06/07 23:15:00",1
      |D,FPP,REGION_FREQ_MEASURE,1,"2025/06/07 23:10:08",NSW1,0.004,-0.001,1,"2025/06/07 23:15:00",1
      |C,"END OF REPORT",123
      |D,FPP,REGION_FREQ_MEASURE,1,"2025/06/07 23:10:12",NSW1,9.9,9.9,1,"2025/06/07 23:15:00",1
      |""".stripMargin

  def writeFixture(dir: String, name: String, body: String = fixture): String = {
    val p = Paths.get(dir, name)
    Files.write(p, body.getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  test("scanLines: row count == D-lines before footer; I/C never counted") {
    val recs = NemCsv.scanLines("PUBLIC_FPP_20250607.csv",
      fixture.linesIterator).toVector
    assert(recs.size === 5) // 3 + 2; the D after the C footer is ignored
    assert(recs.map(_.table).distinct ===
      Vector("FPP---UNIT_MW---1", "FPP---REGION_FREQ_MEASURE---1"))
  }

  test("scanLines: D before any I is dropped; missing top C tolerated") {
    val noHeader = "D,FPP,X,1,a,b\nI,FPP,X,1,COL1,COL2\nD,FPP,X,1,v1,v2\n"
    val recs = NemCsv.scanLines("f_20250607.csv", noHeader.linesIterator).toVector
    assert(recs.size === 1)
    assert(recs.head.values === Seq("v1", "v2"))
  }

  test("table name = cols 1-3 joined ---; first 4 cols dropped; quotes/space cleaned") {
    val recs = NemCsv.scanLines("PUBLIC_FPP_20250607.csv", fixture.linesIterator).toVector
    val r = recs.head
    assert(r.table === "FPP---UNIT_MW---1")
    assert(r.header === Seq("MEASUREMENT_DATETIME", "FPP_UNITID", "PARTICIPANTID",
      "MEASURED_MW", "SCHEDULED_MW", "DEVIATION_MW", "MW_QUALITY_FLAG",
      "INTERVAL_DATETIME", "VERSIONNO"))
    assert(r.values.head === "2025/06/07 23:10:04") // quotes stripped
  }

  test("filename date extraction: compact, separated, unknown, year guard") {
    assert(NemCsv.dateFromFilename("PUBLIC_FPP_RUN_202506072315_046.zip") === "2025-06-07")
    assert(NemCsv.dateFromFilename("x_2025-06-07_y.csv") === "2025-06-07")
    assert(NemCsv.dateFromFilename("x_2025_06_07_y.csv") === "2025-06-07")
    assert(NemCsv.dateFromFilename("nodatehere.csv") === "unknown-date")
    assert(NemCsv.dateFromFilename("x_19990607_.csv") === "unknown-date") // year < 2000
  }

  test("3-type inference: timestamp(+10:00), double, string; empty → null") {
    val dir = tmpDir("nemcsv")
    writeFixture(dir, "PUBLIC_FPP_20250607.csv")
    val raw = NemCsv.rawRecords(spark, Seq(s"$dir/PUBLIC_FPP_20250607.csv"))
    val df = NemCsv.tableFrame(raw, "FPP---UNIT_MW---1")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("MEASUREMENT_DATETIME") === TimestampType)
    assert(types("INTERVAL_DATETIME") === TimestampType)
    assert(types("MEASURED_MW") === DoubleType)
    assert(types("VERSIONNO") === DoubleType)
    assert(types("FPP_UNITID") === StringType)
    val rows = df.orderBy("MEASUREMENT_DATETIME").collect()
    assert(rows.length === 3)
    // 2025/06/07 23:10:04 +10:00 == 2025-06-07 13:10:04 UTC
    assert(rows(0).getTimestamp(0).toInstant.toString === "2025-06-07T13:10:04Z")
    assert(rows(2).isNullAt(df.schema.fieldIndex("MEASURED_MW"))) // empty → null
    assert(rows(0).getDouble(df.schema.fieldIndex("MEASURED_MW")) === 45.2)
  }

  test("splitToLake: hive layout, partition date from filename, row invariant") {
    val dir = tmpDir("nemlake_in")
    val lake = tmpDir("nemlake_out")
    writeFixture(dir, "PUBLIC_FPP_20250607.csv")
    val summary = NemCsv.splitToLake(spark, Seq(s"$dir/PUBLIC_FPP_20250607.csv"), lake)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary === Map("FPP---UNIT_MW---1" -> 3L, "FPP---REGION_FREQ_MEASURE---1" -> 2L))
    assert(Files.exists(Paths.get(lake, "FPP---UNIT_MW---1", "date=2025-06-07")))
    val back = spark.read.parquet(s"$lake/FPP---UNIT_MW---1")
    assert(back.count() === 3)
    assert(back.schema.fieldNames.contains("date")) // partition col discovered
  }

  test("zip source: multiple csv entries scanned in-stream, boundaries intact") {
    val dir = tmpDir("nemzip")
    val zipPath = Paths.get(dir, "PUBLIC_FPP_20250607.zip")
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(zipPath))
    zos.putNextEntry(new java.util.zip.ZipEntry("PUBLIC_FPP_20250607.CSV"))
    zos.write(fixture.getBytes(StandardCharsets.UTF_8))
    zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("README.txt")) // non-csv: skipped
    zos.write("not a csv".getBytes(StandardCharsets.UTF_8))
    zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("SECOND_20250607.csv"))
    zos.write("C,hdr\nI,FPP,X,1,COL1\nD,FPP,X,1,v\n".getBytes(StandardCharsets.UTF_8))
    zos.closeEntry(); zos.close()
    val raw = NemCsv.rawRecords(spark, Seq(zipPath.toString))
    assert(raw.count() === 6) // 5 from entry 1 + 1 from entry 3
    assert(raw.filter(col("table") === "FPP---X---1").count() === 1)
    assert(raw.select("date").distinct().collect().map(_.getString(0)) === Array("2025-06-07"))
  }

  test("ragged D rows are padded/truncated to the header width (ANSI-safe)") {
    val body = "C,hdr\nI,FPP,X,1,C1,C2,C3\nD,FPP,X,1,a\nD,FPP,X,1,a,b,c,EXTRA\nD,FPP,X,1,a,b,c\n"
    val dir = tmpDir("ragged")
    writeFixture(dir, "ragged_20250607.csv", body)
    val raw = NemCsv.rawRecords(spark, Seq(s"$dir/ragged_20250607.csv"))
    val df = NemCsv.tableFrame(raw, "FPP---X---1")
    val rows = df.orderBy("C1", "C2").collect()
    assert(rows.length === 3)
    assert(df.columns.toSeq === Seq("C1", "C2", "C3", "date"))
    // short row: missing cols are null; long row: extras dropped
    assert(rows.exists(r => r.getString(0) == "a" && r.isNullAt(1) && r.isNullAt(2)))
    assert(rows.count(r => r.getString(0) == "a" && r.getString(1) == "b") === 2)
  }

  test("mixed-type value in an inferred column nulls out, never fails (ANSI)") {
    // first value of C1 looks numeric → double; a later non-numeric value
    // must yield null (reference convert_numeric_column, chunk.rs:211-227),
    // not an ANSI cast failure. Same for a malformed timestamp in C2.
    val body = "C,hdr\nI,FPP,X,1,C1,C2\n" +
      "D,FPP,X,1,1.5,\"2025/06/07 23:10:04\"\n" +
      "D,FPP,X,1,notanumber,\"2025/13/99 99:99:99\"\n" +
      "D,FPP,X,1,2.5,\"2025/06/07 23:10:08\"\n"
    val dir = tmpDir("mixed")
    writeFixture(dir, "mixed_20250607.csv", body)
    val raw = NemCsv.rawRecords(spark, Seq(s"$dir/mixed_20250607.csv"))
    val df = NemCsv.tableFrame(raw, "FPP---X---1")
    assert(df.schema("C1").dataType === DoubleType)
    assert(df.schema("C2").dataType === TimestampType)
    val rows = df.orderBy(col("C1").asc_nulls_last).collect()
    assert(rows.length === 3)
    assert(rows(0).getDouble(0) === 1.5)
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1)) // both nulled, job alive
  }

  test("splitToLake inference sample is capped at SampleRows per file") {
    // 1,200 numeric rows then a string-only tail: type still double (the
    // reference sniffs 1,000 rows, chunk.rs:324) and the engine must not
    // fail on the out-of-sample strings — they null out via try_cast
    val sb = new StringBuilder("C,hdr\nI,FPP,Y,1,V\n")
    (1 to 1100).foreach(i => sb.append(s"D,FPP,Y,1,$i.0\n"))
    sb.append("D,FPP,Y,1,tail_string\n")
    val dir = tmpDir("capped")
    writeFixture(dir, "capped_20250607.csv", sb.toString)
    val raw = NemCsv.rawRecords(spark, Seq(s"$dir/capped_20250607.csv"))
    val df = NemCsv.tableFrame(raw, "FPP---Y---1")
    assert(df.schema("V").dataType === DoubleType)
    assert(df.count() === 1101)
    assert(df.filter(col("V").isNull).count() === 1) // the tail string
  }

  test("inference sample cap is per TABLE, not per file position") {
    // table A fills >SampleRows records first; table B starts after it and
    // must still get a full sample window (numeric type inferred), because
    // seq counts within each table, not across the file
    val sb = new StringBuilder("C,hdr\nI,FPP,A,1,VA\n")
    (1 to 1100).foreach(i => sb.append(s"D,FPP,A,1,$i.0\n"))
    sb.append("I,FPP,B,1,VB\n")
    (1 to 5).foreach(i => sb.append(s"D,FPP,B,1,$i.5\n"))
    val dir = tmpDir("pertable")
    writeFixture(dir, "pertable_20250607.csv", sb.toString)
    val raw = NemCsv.rawRecords(spark, Seq(s"$dir/pertable_20250607.csv"))
    val b = NemCsv.tableFrame(raw, "FPP---B---1")
    assert(b.schema("VB").dataType === DoubleType)
    assert(b.count() === 5)
    val lake = tmpDir("pertable_lake")
    val summary = NemCsv.splitToLake(spark, Seq(s"$dir/pertable_20250607.csv"), lake)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary === Map("FPP---A---1" -> 1100L, "FPP---B---1" -> 5L))
    assert(spark.read.parquet(s"$lake/FPP---B---1").schema("VB").dataType === DoubleType)
  }

  test("csv line split: embedded commas and escaped quotes") {
    assert(NemCsv.splitCsvLine("""a,"b,c",d""").toSeq === Seq("a", "b,c", "d"))
    assert(NemCsv.splitCsvLine("a,\"he said \"\"hi\"\"\",c").toSeq === Seq("a", "he said \"hi\"", "c"))
    assert(NemCsv.splitCsvLine("a,,c").toSeq === Seq("a", "", "c"))
  }
}
