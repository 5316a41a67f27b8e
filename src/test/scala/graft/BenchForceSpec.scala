package graft

import org.apache.spark.sql.functions._

/** Pins the round-14 bench-forcing fix (PLANS.md): timing a query by
  * `.count()` lets Catalyst prune every node whose output nobody reads —
  * ColumnPruning drops output-less Windows, Generates and final-Project
  * expressions; EliminateSorts drops the deterministic orderBy — so a
  * count-forced bench times a DIFFERENT, smaller plan than the query
  * declares (tools/ForceAudit measured the registry: 20 queries lost
  * their Window entirely, the sketch family lost its shingle Generates).
  * `Bench.force` (noop-sink write) must demand every column of every
  * row. The proof is observational, not plan-shaped: an accumulator
  * bumped inside a UDF over a window-derived column stays at 0 under
  * count() (the whole Window subtree is pruned) and reaches the row
  * count under force — if a Spark upgrade ever makes the noop path
  * prunable the same way, this fails instead of the bench silently
  * under-measuring again. (A ScalaUDF directly in the final select is
  * NOT pruned under count — Catalyst keeps it conservatively — which is
  * why the probe hangs the UDF off the window output: the pruning
  * target is the Window node, and the UDF is just the observer.) */
class BenchForceSpec extends SparkSpec {

  test("Bench.force executes every declared column (the fix)") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("probe_force")
    val bump = udf { (x: Long) => acc.add(1L); x * 2 }
    Bench.force((1L to 100L).toDF("id")
      .select(col("id"), bump(col("id")).as("doubled"))
      .orderBy(col("id")))
    assert(acc.value == 100L,
      s"noop force evaluated ${acc.value} of 100 projection rows")
  }

  test("count() skips an output-less Window; Bench.force executes it") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("probe_window")
    val bump = udf { (x: Long) => acc.add(1L); x }
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("id"), lit(4))).orderBy(col("id"))
    val df = (1L to 100L).toDF("id")
      .withColumn("rn", row_number().over(win))
      .select(col("id"), bump(col("rn")).as("rn2"))
    df.count()
    assert(acc.value == 0L,
      "count() unexpectedly ran the window projection — Catalyst behavior " +
        "changed; re-audit whether the noop force is still needed")
    Bench.force(df)
    assert(acc.value == 100L,
      s"noop force evaluated ${acc.value} of 100 window rows")
  }
}
