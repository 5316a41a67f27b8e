package graft.queries

import graft.SparkSpec

/** The `dd_incremental_*_stored` registry forms: probing a MATERIALIZED
  * corpus index must (a) reproduce the in-query sibling's result
  * row-for-row, and (b) actually read the store — the corpus side of the
  * stored plan is the parquet index, not a re-derivation from the source
  * table. (The O(batch)-vs-O(corpus) cost claim itself is measured, not
  * asserted: the lake bench compares warm times of the two forms.) */
class StoredIndexQueriesSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[String] =
    Registry.queries(name)(spark, sf).collect().map(_.toString).toSeq

  /** Executed-plan text (collect() first — a fresh count() builds a
    * separate QueryExecution and the plan would read as unexecuted). */
  private def plan(name: String): String = {
    val df = Registry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("stored forms reproduce their in-query siblings row-for-row") {
    Seq(
      "dd_incremental_neardup" -> "dd_incremental_neardup_stored",
      "dd_incremental_semantic" -> "dd_incremental_semantic_stored",
      "dd_incremental_substring" -> "dd_incremental_substring_stored"
    ).foreach { case (inQuery, stored) =>
      val a = rows(inQuery)
      val b = rows(stored)
      assert(a == b, s"$stored diverges from $inQuery:\n in-query: $a\n stored:   $b")
      assert(a.nonEmpty, s"$inQuery returned no rows at sf0.001 — vacuous compare")
    }
  }

  test("stored plans read the materialized index; in-query plans derive it") {
    Seq(
      ("dd_incremental_neardup", "dd_incremental_neardup_stored", "graft_mhsig_store"),
      ("dd_incremental_semantic", "dd_incremental_semantic_stored", "graft_semidx_store"),
      ("dd_incremental_substring", "dd_incremental_substring_stored", "graft_winfp_store")
    ).foreach { case (inQuery, stored, storeTag) =>
      assert(plan(stored).contains(storeTag),
        s"$stored plan does not scan its $storeTag parquet store")
      assert(!plan(inQuery).contains(storeTag),
        s"$inQuery unexpectedly reads a store — sibling split lost its point")
    }
  }

  test("semantic store is hive-partitioned by cell (file-level pruning layout)") {
    val store = QueryShared.IndexStore.cached("semidx", sf)(_ => fail("store not built"))
    val cells = new java.io.File(store).listFiles().filter(_.getName.startsWith("cell="))
    assert(cells.nonEmpty, s"semantic store at $store is not partitioned by cell")
  }
}
