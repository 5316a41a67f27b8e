package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Contract: [[Tables]] yields `ts: TimestampType` with the same instants
  * for EVERY parquet physical encoding a generator might pick — the
  * round-9 testdata regeneration silently flipped TIMESTAMP(NANOS) to
  * µs-no-UTC and red-lined a third of the time-series surface; this spec
  * pins the chokepoint so the next flip cannot.
  */
class TablesSpec extends SparkSpec {

  // one instant, expressed in each encoding; sub-µs nanos must truncate
  private val micros = Seq(1704067200000000L, 1704067201500000L, 1704067202999999L)

  private def readBack(dir: String): DataFrame =
    Tables.normalizeEventTs(spark, spark.read.parquet(dir))

  private def assertNormalized(df: DataFrame): Unit = {
    assert(df.schema("ts").dataType === TimestampType,
      s"expected TimestampType, got ${df.schema("ts").dataType}")
    val got = df.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === micros, s"instants drifted: ${got.toSeq}")
  }

  test("nanos-as-int64 encoding → TimestampType, floor-truncated to µs") {
    import spark.implicits._
    val dir = tmpDir("enc_nanos") + "/events"
    micros.map(u => Tuple1(u * 1000L + 789L)).toDF("ts").write.parquet(dir)
    val raw = spark.read.parquet(dir)
    assert(raw.schema("ts").dataType === LongType) // plain int64, no annotation
    assertNormalized(readBack(dir))
  }

  /** A µs-no-UTC file as a FOREIGN generator writes it (the driver uses
    * pyarrow): plain parquet annotation, no Spark schema in the footer —
    * a Spark-written timestamp_ntz file would carry its own schema
    * metadata and bypass type inference entirely. */
  private def writeForeignMicrosNoUtc(dir: String): Unit = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.hadoop.fs.Path
    val schema = Types.buildMessage()
      .addField(Types.optional(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(/*isAdjustedToUTC=*/ false, TimeUnit.MICROS))
        .named("ts"))
      .named("events")
    val w = ExampleParquetWriter.builder(new Path(dir + "/part-0.parquet"))
      .withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    try micros.foreach(u => w.write(gf.newGroup().append("ts", u)))
    finally w.close()
  }

  test("µs-no-UTC encoding, engine session (inferTimestampNTZ off) → TimestampType at the scan, no cast") {
    val dir = tmpDir("enc_ntz") + "/events"
    writeForeignMicrosNoUtc(dir)
    // engine sessions read no-UTC µs as instants directly — the scan
    // itself is TimestampType, so predicates stay pushable
    val raw = spark.read.parquet(dir)
    assert(raw.schema("ts").dataType === TimestampType)
    assertNormalized(readBack(dir))
    val plan = readBack(dir).filter(col("ts") >= timestamp_micros(lit(micros(1))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      s"ts range predicate not pushed to the parquet scan:\n$plan")
  }

  test("µs-no-UTC encoding, foreign session (inferTimestampNTZ on) → cast-normalized to TimestampType") {
    val dir = tmpDir("enc_ntz_foreign") + "/events"
    writeForeignMicrosNoUtc(dir)
    val key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    spark.conf.set(key, "true")
    try {
      val raw = spark.read.parquet(dir)
      assert(raw.schema("ts").dataType === TimestampNTZType) // what a foreign session sees
      assertNormalized(Tables.normalizeEventTs(spark, raw))
      // the cast would block pushdown; NtzCastPushdown rederives the
      // range bound on the raw NTZ attribute so the scan still prunes
      val plan = Tables.normalizeEventTs(spark, spark.read.parquet(dir))
        .filter(col("ts") >= timestamp_micros(lit(micros(1))))
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
        s"cast-normalized ts predicate not pushed to the scan:\n$plan")
    } finally spark.conf.set(key, "false")
  }

  test("NtzCastPushdown: no derivation under OR; derived bound appears once (convergence)") {
    val dir = tmpDir("enc_ntz_or") + "/events"
    writeForeignMicrosNoUtc(dir)
    val key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    spark.conf.set(key, "true")
    try {
      def normalized = Tables.normalizeEventTs(spark, spark.read.parquet(dir))
      val bound = timestamp_micros(lit(micros(1)))
      // under OR the conjunct is not an implication of the whole condition
      val orPlan = normalized
        .filter(col("ts") >= bound || col("ts").isNull)
        .queryExecution.executedPlan.toString
      assert(!orPlan.contains("PushedFilters: [GreaterThanOrEqual"),
        s"derived bound leaked under OR:\n$orPlan")
      // convergence: the derived bound is added once, not once per
      // optimizer iteration (same guard as NanosRangePushdownSpec)
      val eqPlan = normalized.filter(col("ts") === bound)
        .queryExecution.executedPlan.toString
      val occurrences = "EqualTo\\(ts,".r.findAllIn(eqPlan).length
      assert(occurrences <= 3, s"derived bound duplicated $occurrences times:\n$eqPlan")
    } finally spark.conf.set(key, "false")
  }

  test("µs-UTC encoding → pass-through") {
    import spark.implicits._
    val dir = tmpDir("enc_ltz") + "/events"
    val outKey = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(outKey)
    spark.conf.set(outKey, "TIMESTAMP_MICROS")
    try micros.map(u => Tuple1(u)).toDF("us")
      .select(timestamp_micros(col("us")).as("ts")).write.parquet(dir)
    finally spark.conf.set(outKey, prev)
    assertNormalized(readBack(dir))
  }

  test("current driver testdata: events.ts surfaces as TimestampType") {
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.limit(1).count() === 1)
  }
}
