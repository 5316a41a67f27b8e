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
      "nem_split_roundtrip", "nem_compact_roundtrip", "nem_compression_study")
    Registry.all.foreach { q =>
      if (!allowed(q.name)) {
        val plan = q.fn(spark, sf).queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"), s"${q.name} plans a cartesian:\n$plan")
      }
    }
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
