package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A REAL `--conf spark.sql.extensions=graft.GraftExtensions` session —
  * not the builder-introspection check in AsOfPushdownSpec: this spec
  * builds a second SparkSession on the shared context with the
  * extensions class applied, and proves both timestamp-encoding
  * pushdown rules prune the parquet scan WITHOUT any `Tables` /
  * `register` call — the deployment mode where a foreign team's
  * spark-submit never touches engine entry points. */
class GraftExtensionsSessionSpec extends AnyFunSuite {

  private val micros = Seq(1704067200000000L, 1704067201500000L, 1704067202999999L)

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** µs-no-UTC file exactly as a foreign generator (pyarrow) writes it:
    * plain parquet annotation, no Spark footer schema (same writer shape
    * as TablesSpec — a Spark-written file would bypass inference). */
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

  test("extensions session: PushedFilters prune on nanos-int64 AND NTZ encodings, no engine calls") {
    // the engine session must exist first (shared SparkContext)
    val engine = GraftSession.local(4)
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // a fresh session with the extensions class applied. In a real
    // spark-submit, `--conf spark.sql.extensions=graft.GraftExtensions`
    // rides the SparkContext conf and Builder.applyExtensions
    // instantiates the class; this shared test JVM's context predates
    // the conf (the builder reads extensions from the CONTEXT conf, not
    // its own options, when a context already exists), so the spec
    // calls the same class through withExtensions — identical code path
    // from GraftExtensions.apply onward. Never stopped (that would kill
    // the shared context), just dereferenced afterwards.
    val ext = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      .getOrCreate()
    try {
      assert(ext ne engine, "builder returned the cached engine session — extensions never applied")
      import ext.implicits._

      // --- nanos-int64 encoding → NanosRangePushdown (injected) -----
      val nanosDir = tmpDir("ext_nanos") + "/events"
      micros.map(u => Tuple1(u * 1000L + 789L)).toDF("ts").write.parquet(nanosDir)
      val nanos = ext.read.parquet(nanosDir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .filter(col("ts") >= timestamp_micros(lit(micros(1))))
      val nanosPlan = nanos.queryExecution.executedPlan.toString
      assert(nanosPlan.contains(s"GreaterThanOrEqual(ts,${micros(1) * 1000L})"),
        s"nanos bound not pushed in an extensions session:\n$nanosPlan")
      assert(nanos.count() === 2)

      // --- NTZ encoding (foreign inferTimestampNTZ=on) → NtzCastPushdown
      val ntzDir = tmpDir("ext_ntz") + "/events"
      writeForeignMicrosNoUtc(ntzDir)
      val raw = ext.read.parquet(ntzDir)
      assert(raw.schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampNTZType)
      val ntz = raw
        .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        .filter(col("ts") >= timestamp_micros(lit(micros(1))))
      val ntzPlan = ntz.queryExecution.executedPlan.toString
      assert(ntzPlan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
        s"NTZ cast bound not pushed in an extensions session:\n$ntzPlan")
      assert(ntz.count() === 2)

      // --- DeferExpensiveSortProject (injected): an expensive
      // projection not referenced by the sort keys moves ABOVE the
      // global sort, so the range-bounds sampling pass doesn't execute
      // it twice — proven on the extensions registration path, which
      // bypasses GraftSession.attach entirely. The r21 small-sort
      // collapse (also injected, and running first by its ordering
      // contract) would collapse this tiny sort before the defer
      // pattern can match — pin the LARGE-sort regime the defer rule
      // guards by disabling the collapse for this probe (which also
      // proves the extensions path carries the disable knob).
      ext.conf.set("spark.graft.smallsort.maxBytes", "0")
      val deferDir = tmpDir("ext_defer") + "/t"
      Seq((2L, """{"x":2}"""), (1L, """{"x":1}"""))
        .toDF("k", "js").write.parquet(deferDir)
      val deferQ = ext.read.parquet(deferDir)
        .select(col("k"), get_json_object(col("js"), "$.x").as("x"))
        .orderBy("k")
      import org.apache.spark.sql.catalyst.expressions.GetJsonObject
      import org.apache.spark.sql.catalyst.plans.logical.{Project => LProject, Sort => LSort}
      val opt = deferQ.queryExecution.optimizedPlan
      val deferredAboveSort = opt match {
        case LProject(pl, s: LSort) =>
          pl.exists(_.exists(_.isInstanceOf[GetJsonObject])) &&
            !s.exists(_.expressions.exists(_.exists(_.isInstanceOf[GetJsonObject])))
        case _ => false
      }
      assert(deferredAboveSort,
        s"DeferExpensiveSortProject did not fire in the extensions session:\n$opt")
      assert(deferQ.collect().map(_.getString(1)).toSeq === Seq("1", "2"))
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
