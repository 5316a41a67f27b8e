package graft.functions

import graft.SparkSpec
import graft.operators.Ewma
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class GraftFunctionsSpec extends SparkSpec {

  test("ewma window function matches the mapPartitions operator bitwise") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    GraftFunctions.register(spark)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val viaWindow = ev
      .withColumn("ewma", call_function("ewma", col("value"), lit(0.05)).over(w))
      .select("event_id", "ewma")
    val viaMapPartitions = Ewma.withEwma(ev, "user_id", Seq("ts", "event_id"),
        "value", 0.05, "ewma")
      .select(col("event_id"), col("ewma").as("ewma_mp"))
    val joined = viaWindow.join(viaMapPartitions, "event_id")
      .filter(col("ewma") =!= col("ewma_mp") ||
        (col("ewma").isNull !== col("ewma_mp").isNull))
    assert(joined.count() === 0) // identical on every row, bit for bit
  }

  test("ewma window: null input emits null without advancing state (SQL)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(("k", 1, Some(10.0)), ("k", 2, None: Option[Double]), ("k", 3, Some(20.0)),
      ("j", 1, Some(4.0)))
      .toDF("k", "seq", "v").createOrReplaceTempView("ewma_in")
    val out = spark.sql(
      "SELECT k, seq, ewma(v, 0.5) OVER (PARTITION BY k ORDER BY seq) AS e FROM ewma_in")
      .orderBy("k", "seq").collect()
    assert(out(0).getDouble(2) === 2.0)   // j: fresh state
    assert(out(1).getDouble(2) === 5.0)   // k1: 0.5*10
    assert(out(2).isNullAt(2))            // k2: null passes
    assert(out(3).getDouble(2) === 12.5)  // k3: 0.5*5 + 0.5*20 — state carried
  }

  test("vector_cosine: codegen vs interpreted vs scala reference; null/len edge cases") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    def ref(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val rows = df.selectExpr("a", "b", "vector_cosine(a, b) AS c").collect()
    rows.foreach { r =>
      assert(r.getDouble(2) === ref(r.getSeq[Float](0).toArray, r.getSeq[Float](1).toArray))
    }
    // zero vector and length mismatch → null
    val edge = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    assert(edge.selectExpr("vector_cosine(a, b)").head().isNullAt(0))
    val lens = spark.sql("SELECT vector_cosine(array(1.0D), array(1.0D, 2.0D))")
    assert(lens.head().isNullAt(0))
  }

  test("rolling_hash: codegen matches interpreted eval and scala reference") {
    import spark.implicits._
    GraftFunctions.register(spark)
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 1000003L + (b & 0xffL))
    val df = Seq("", "a", "abc", "the quick brown fox", "ünïcodé ✓").toDF("t")
    val got = df.selectExpr("t", "rolling_hash(t) AS h").collect()
    got.foreach { r => assert(r.getLong(1) === ref(r.getString(0))) }
    // whole-stage codegen actually engaged (local Seqs collapse to
    // LocalTableScan, so assert over a parquet-backed scan)
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    // the "*(n)" prefix marks WholeStageCodegen in the plan rendering
    val plan = docs.selectExpr("rolling_hash(text)").queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [rolling_hash"), plan)
    val fromParquet = docs.limit(3).selectExpr("text", "rolling_hash(text) AS h").collect()
    fromParquet.foreach { r => assert(r.getLong(1) === ref(r.getString(0))) }
  }
}
