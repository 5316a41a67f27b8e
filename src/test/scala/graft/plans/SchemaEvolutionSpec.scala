package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

class SchemaEvolutionSpec extends SparkSpec {

  test("widenTypes: Utf8→Double, Utf8→Timestamp, numeric ladder, conflicts→string") {
    assert(SchemaEvolution.widenTypes(StringType, DoubleType) === DoubleType)
    assert(SchemaEvolution.widenTypes(StringType, TimestampType) === TimestampType)
    assert(SchemaEvolution.widenTypes(IntegerType, LongType) === LongType)
    assert(SchemaEvolution.widenTypes(LongType, DoubleType) === DoubleType)
    assert(SchemaEvolution.widenTypes(DoubleType, TimestampType) === StringType)
    assert(SchemaEvolution.widenTypes(StringType, StringType) === StringType)
  }

  test("widen: union of fields, alphabetical order, all nullable") {
    val s1 = StructType(Seq(StructField("b", StringType), StructField("a", StringType)))
    val s2 = StructType(Seq(StructField("b", DoubleType), StructField("c", TimestampType)))
    val w = SchemaEvolution.widen(Seq(s1, s2))
    assert(w.fieldNames.toSeq === Seq("a", "b", "c")) // alphabetical (compactor.rs:401-405)
    assert(w("b").dataType === DoubleType)
    assert(w("c").dataType === TimestampType)
    assert(w.fields.forall(_.nullable))
  }

  test("conform + readWidened: string file and typed file merge with casts and null-fill") {
    import spark.implicits._
    val dir = tmpDir("evolve")
    // file A: everything string (early ingest), NEM-format timestamp, empty string
    Seq(("1.5", "2025/06/07 23:10:04", "x"), ("", "2025/06/07 23:10:08", "y"))
      .toDF("mw", "ts", "id").write.parquet(s"$dir/a.parquet")
    // file B: evolved types, extra column
    val rows = java.util.Arrays.asList(
      Row(2.5, java.sql.Timestamp.from(java.time.Instant.parse("2025-06-07T13:10:12Z")), "z", 7.0))
    val schemaB = StructType(Seq(StructField("mw", DoubleType), StructField("ts", TimestampType),
      StructField("id", StringType), StructField("extra", DoubleType)))
    spark.createDataFrame(rows, schemaB).write.parquet(s"$dir/b.parquet")

    val merged = SchemaEvolution.readWidened(spark, Seq(s"$dir/a.parquet", s"$dir/b.parquet"))
    assert(merged.schema.fieldNames.toSeq === Seq("extra", "id", "mw", "ts"))
    assert(merged.schema("mw").dataType === DoubleType)
    assert(merged.schema("ts").dataType === TimestampType)
    val out = merged.orderBy("id").collect()
    assert(out.length === 3)
    assert(out(0).getDouble(2) === 1.5)        // "1.5" cast
    assert(out(1).isNullAt(2))                 // "" → null
    assert(out(0).isNullAt(0))                 // missing col null-filled
    // NEM wall time 23:10:04 +10:00 == 13:10:04 UTC
    assert(out(0).getTimestamp(3).toInstant.toString === "2025-06-07T13:10:04Z")
    assert(out(2).getTimestamp(3).toInstant.toString === "2025-06-07T13:10:12Z")
  }
}
