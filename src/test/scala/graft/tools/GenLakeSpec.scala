package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GenLake's replication invariants at multiplier 2 over the smallest
  * fixture — the properties the round-12 lake bench's validity rests
  * on: exact m× fact counts, single-copy dimensions, and referential
  * integrity WITHIN every copy (shifted foreign keys must keep
  * resolving, or the scaled joins would silently measure smaller
  * outputs than the fixture shape implies). */
class GenLakeSpec extends SparkSpec {

  test("2x lake: counts scale, dims stay, keys resolve, join fan-out doubles exactly") {
    val out = tmpDir("genlake2")
    GenLakeSpecHelper.run(out, m = 2, nDocs = 500, nVecs = 200,
      srcDir = "/root/testdata/sf0.001")
    def t(n: String) = spark.read.parquet(s"$out/$n.parquet")
    def src(n: String) = graft.Tables(spark, "/root/testdata/sf0.001", n)

    // fact tables exactly m×, dimensions exactly 1×
    for (n <- Seq("customer", "supplier", "part", "orders", "lineitem", "events"))
      assert(t(n).count() === 2 * src(n).count(), n)
    for (n <- Seq("region", "nation"))
      assert(t(n).count() === src(n).count(), n)
    assert(t("documents").count() === 500)
    assert(t("embeddings").count() === 200)

    // key uniqueness survives the shift (no copy collides with another)
    assert(t("orders").select("o_orderkey").distinct().count() === t("orders").count())
    assert(t("customer").select("c_custkey").distinct().count() === t("customer").count())

    // referential integrity within every copy: no dangling foreign keys
    val dangling = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(dangling === 0L, "lineitem.l_orderkey must resolve in scaled orders")
    val danglingCust = t("orders")
      .join(t("customer"), col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(danglingCust === 0L, "orders.o_custkey must resolve in scaled customer")

    // join fan-out scales exactly m×: per-key multiplicity is preserved,
    // so the orders⋈lineitem row count is exactly twice the fixture's
    val scaledJoin = t("lineitem").join(t("orders"),
      col("l_orderkey") === col("o_orderkey")).count()
    val srcJoin = src("lineitem").join(src("orders"),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(scaledJoin === 2 * srcJoin)
  }

  test("replicate refuses multipliers whose shifted keys overflow a narrow column") {
    import spark.implicits._
    // int key column with max near the top of the int range: multiplier 2
    // would need keys > Int.MaxValue — must refuse, not wrap
    val near = Seq(Int.MaxValue - 10, 5).toDF("k")
    val e = intercept[IllegalArgumentException] {
      GenLake.replicate(near, 2, Seq("k" -> (Int.MaxValue - 9).toLong)).count()
    }
    assert(e.getMessage.contains("overflows"), e.getMessage)
    // the check measures max(key) from the DATA: a small stride with a
    // huge actual key must also refuse (stride-derived max alone would
    // pass — (m-1)*100 + (stride-1) is tiny; the true max wraps)
    val e2 = intercept[IllegalArgumentException] {
      GenLake.replicate(near, 2, Seq("k" -> 100L)).count()
    }
    assert(e2.getMessage.contains("overflows"), e2.getMessage)
    // and exactly-fits is allowed: max shifted key == Int.MaxValue
    assert(GenLake.replicate(near, 2, Seq("k" -> 10L))
      .select("k").distinct().count() === 4)
    // a long key column with the same values is fine
    val wide = Seq((Int.MaxValue - 10).toLong, 5L).toDF("k")
    val r = GenLake.replicate(wide, 2, Seq("k" -> (Int.MaxValue - 9).toLong))
    assert(r.select("k").distinct().count() === 4)
  }
}

/** Drives GenLake's generation logic against an existing session (the
  * main() builds its own; specs must not). Mirrors GenLake.main's body
  * — kept tiny and in the same package so the spec exercises the REAL
  * writers. */
private object GenLakeSpecHelper {
  def run(outDir: String, m: Int, nDocs: Long, nVecs: Long, srcDir: String): Unit = {
    val spark = graft.GraftSession.local(4)
    GenLake.writeLake(spark, outDir, m, nDocs, nVecs, srcDir)
  }
}
