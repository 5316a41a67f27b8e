package graft.plans

import graft.SparkSpec
import graft.operators.Salt
import org.apache.spark.sql.functions._

class BucketingSaltSpec extends SparkSpec {

  test("bucketed join plans without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val o = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
      val l = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
      Bucketing.writeBucketed(o, "orders_b", 4, Seq("o_orderkey"), Seq("o_orderkey"))
      Bucketing.writeBucketed(l.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", 4, Seq("o_orderkey"), Seq("o_orderkey"))
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "lineitem_b", Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan) // bucket co-location
      assert(joined.count() === 6000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "32m")
    }
  }

  test("salted two-phase aggregation equals the direct groupBy exactly") {
    val l = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val cents = round(col("l_extendedprice") * 100, 0).cast("long")
    val direct = l.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(cents).as("sum_cents"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = graft.operators.Salt.saltedSumCount(l, Seq("l_returnflag"), cents, 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted === direct)
  }

  test("salted join returns exactly the unsalted result") {
    val l = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val o = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .select("l_orderkey", "o_totalprice")
    val plain = l.join(o, Seq("l_orderkey")).agg(
      count(lit(1)), sum(round(col("o_totalprice") * col("l_quantity"), 2))).head()
    val salted = Salt.saltedJoin(l, o, Seq("l_orderkey"), factor = 8).agg(
      count(lit(1)), sum(round(col("o_totalprice") * col("l_quantity"), 2))).head()
    assert(plain.getLong(0) === salted.getLong(0))
    assert(math.abs(plain.getDouble(1) - salted.getDouble(1)) < 1e-6)
  }
}
