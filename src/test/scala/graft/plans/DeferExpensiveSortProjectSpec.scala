package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The sort-sampling deferral (PLANS.md round 14): a global Sort plans
  * as a range exchange whose bounds come from a full sampling pass over
  * the child, so expensive projections below the sort execute twice.
  * The rule moves them above the sort. Asserts the rewrite fires where
  * it should, stays away where it must (limits, sort-key refs,
  * nondeterminism), and never changes results or row order. */
class DeferExpensiveSortProjectSpec extends SparkSpec {

  private def withRule[A](f: => A): A = {
    DeferExpensiveSortProject.register(spark)
    // this suite tests the DEFER rule in isolation: the r21 small-sort
    // collapse (registered by GraftSession.attach, and running first by
    // its ordering contract) would collapse these tiny test sorts before
    // the defer pattern can match — disable it for the duration
    spark.conf.set("spark.graft.smallsort.maxBytes", "0")
    try f
    finally {
      spark.conf.unset("spark.graft.smallsort.maxBytes")
      spark.experimental.synchronized {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations
            .filterNot(_.isInstanceOf[DeferExpensiveSortProject.type])
      }
    }
  }

  // parquet-backed (not a LocalRelation — ConvertToLocalRelation would
  // evaluate the projection at optimization time and leave no Project
  // node to defer)
  private lazy val docs: DataFrame = {
    import spark.implicits._
    val dir = tmpDir("defer_docs")
    (1 to 200).map(i => (i.toLong, s"""{"k":$i,"pad":"x$i"}"""))
      .toDF("id", "js").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  /** Top-level Project directly above the (outermost) Sort? */
  private def deferredShape(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan match {
      case Project(_, _: Sort) => true
      case _ => false
    }

  test("expensive projection moves above a global sort; results and order unchanged") {
    // a Dataset memoizes its QueryExecution, so the query must be BUILT
    // after registration for the rule to apply — build it twice
    def q = docs.select(col("id"),
      get_json_object(col("js"), "$.k").cast("long").as("k"))
      .orderBy(col("id").desc)
    val baseline = q.collect()
    val (shape, plan, rows) = withRule {
      val r = q
      (deferredShape(r), r.queryExecution.optimizedPlan, r.collect())
    }
    assert(shape, s"expected Project above Sort, got:\n$plan")
    assert(rows.toSeq == baseline.toSeq, "rewrite changed results or row order")
  }

  test("a cheap projection does not move") {
    withRule {
      val q = docs.select(col("id"), (col("id") * 2).as("k")).orderBy("id")
      assert(!deferredShape(q), "cheap arithmetic must stay below the sort")
    }
  }

  test("a sort directly under limit is left for TakeOrderedAndProject") {
    withRule {
      val q = docs.select(col("id"),
        get_json_object(col("js"), "$.k").cast("long").as("k"))
        .orderBy("id").limit(5)
      val phys = q.queryExecution.executedPlan.toString
      assert(phys.contains("TakeOrderedAndProject"),
        s"limit+sort must keep the TakeOrdered pattern:\n$phys")
    }
  }

  test("an expensive alias the sort keys reference is not deferred") {
    withRule {
      val q = docs.select(col("id"),
        get_json_object(col("js"), "$.k").cast("long").as("k"))
        .orderBy("k")
      assert(!deferredShape(q), "sort-key expression must stay below the sort")
    }
  }

  test("a nondeterministic expensive expression is not deferred") {
    withRule {
      // rand() inside a lambda-bearing expr: nondeterministic ⇒ moving it
      // across the sort would reassign values to different rows
      val q = docs.select(col("id"),
        transform(array(col("id")), x => x + (rand() * 0).cast("long")).as("a"))
        .orderBy("id")
      assert(!deferredShape(q), "nondeterministic expression must not move")
    }
  }

  test("deferred and undeferred plans agree on a multi-expensive-column query") {
    def q = docs.select(col("id"),
      get_json_object(col("js"), "$.k").cast("long").as("k"),
      regexp_replace(col("js"), "[0-9]", "").as("stripped"),
      (col("id") + 1).as("next"))
      .orderBy(col("id"))
    val baseline = q.collect()
    val (shape, rows) = withRule { val r = q; (deferredShape(r), r.collect()) }
    assert(shape)
    assert(rows.toSeq == baseline.toSeq)
  }
}
