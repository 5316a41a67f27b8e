package graft.queries

import graft.SparkSpec

/** `j02b_inner_bucketed`'s reason to exist is the PLAN: on a bucketed
  * table, both the group-by on the bucket key and the fact-to-aggregate
  * join must compile with zero hash-shuffle exchanges (the only
  * exchange left is the final presentation orderBy's range exchange).
  * Forced to SortMergeJoin (broadcast off) so the assertion holds at
  * any scale, not just while the aggregate side fits the broadcast
  * threshold. j02 under the same conf is the contrast case — it MUST
  * shuffle, or the bucketed demo demonstrates nothing. */
class BucketedJoinPlanSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String = {
    val df = Registry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("bucketed j02b: zero hash exchanges under forced SMJ; j02 shuffles") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bucketed = executedPlan("j02b_inner_bucketed")
      assert(bucketed.contains("SortMergeJoin"),
        s"j02b did not plan a sort-merge join:\n$bucketed")
      assert(!bucketed.contains("Exchange hashpartitioning"),
        s"j02b plans a hash shuffle despite bucketing:\n$bucketed")
      val plain = executedPlan("j02_inner_composite")
      assert(plain.contains("Exchange hashpartitioning"),
        "contrast case broken: unbucketed j02 no longer shuffles — " +
          "the bucketed variant may be demonstrating nothing")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed j02b reproduces j02 as a multiset") {
    // sorted-multiset compare: (l_orderkey, l_linenumber) is not unique
    // in the synthetic fixture, so the presentation ORDER BY is not
    // total and tie order may differ between the two physical plans —
    // the driver's oracle compare is likewise order-insensitive
    val a = Registry.queries("j02_inner_composite")(spark, sf)
      .collect().map(_.toString).toSeq.sorted
    val b = Registry.queries("j02b_inner_bucketed")(spark, sf)
      .collect().map(_.toString).toSeq.sorted
    assert(a.nonEmpty && a == b,
      s"bucketed layout changed results: ${a.size} vs ${b.size} rows")
  }
}
