package graft.queries

import graft.SparkSpec

/** Registry-wide integrity: every declared query must analyze (catches
  * schema/alias drift) and, for the cheap ones, execute at sf0.001.
  * Every oracle key must reference a declared query. */
class QueriesSmokeSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("every query analyzes against sf0.001") {
    Registry.all.foreach { q =>
      val df = q.fn(spark, sf)
      assert(df.schema.fields.nonEmpty, s"${q.name}: empty schema")
      assert(df.schema.fieldNames.forall(n => n == n.toLowerCase || !q.oracle.isDefined),
        s"${q.name}: oracle-compared columns must be lowercase, got ${df.schema.fieldNames.toSeq}")
    }
  }

  test("no unintended cartesian products anywhere in the corpus") {
    // j04 is the deliberate cross join (small dims); everything else must
    // pair via equi-joins or broadcast range joins. Fixture queries that
    // do their work eagerly and return a local frame are skipped — their
    // returned plan is a LocalTableScan, so the assert would be vacuous
    // while re-paying the side effects.
    val allowed = Set("j04_cross_join", "w06_spine_densify",
      "nem_split_roundtrip", "nem_compact_roundtrip", "nem_compression_study",
      // iterative CC runs eagerly and returns a checkpoint scan — the
      // plan assert would be vacuous while re-paying the whole loop
      "dd_dup_groups")
    Registry.all.foreach { q =>
      if (!allowed(q.name)) {
        val plan = q.fn(spark, sf).queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"), s"${q.name} plans a cartesian:\n$plan")
      }
    }
  }

  test("plan quality lock-in: filters push to the scan, projections prune columns") {
    // representative scans — a regression that stops pushdown/pruning
    // (e.g. a stray non-deterministic expression before the filter) is a
    // silent 100 TB scan-cost multiplier, so lock the plan shape in
    val p04 = Registry.queries("p04_filter_eq")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p04.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,"),
      s"p04 filter did not reach the parquet scan:\n$p04")
    val p01 = Registry.queries("p01_select_alias")(spark, sf)
      .queryExecution.executedPlan.toString
    // narrow projection must not read the table's full schema
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p01).map(_.group(1)).getOrElse("")
    assert(read.nonEmpty && read.count(_ == ',') <= 3,
      s"p01 scan reads more than the projected columns: $read\n$p01")
    // broadcast, not shuffle, for the small dim side of j01
    val j01 = Registry.queries("j01_left_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(j01.contains("BroadcastHashJoin"), s"j01 small-dim join is not broadcast:\n$j01")
  }

  test("driver contract: entry returns rows on sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("oracle map is consistent with the query map") {
    val qNames = Registry.queries.keySet
    Registry.oracleSql.keys.foreach(k => assert(qNames.contains(k), s"orphan oracle $k"))
    assert(Registry.queries.size === Registry.all.size) // no duplicate names
  }

  test("relational + sql-surface queries execute non-empty at sf0.001") {
    val mayBeEmpty = Set("a08_antijoin_dedup") // every part is ordered at tiny SF
    (Registry.relational ++ Registry.sqlSurface).foreach { q =>
      val n = q.fn(spark, sf).count()
      assert(n > 0 || mayBeEmpty(q.name), s"${q.name}: empty result at sf0.001")
    }
  }
}
