package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window, Sort, Generate, Project}

/** Audits the bench harness for the lazy-evaluation hole FallbackScale
  * exposed (PLANS.md round 14): forcing a query with `.count()` lets
  * Catalyst prune output-less Window nodes (ColumnPruning removes a
  * row-count-preserving Window whose expressions nobody reads), eliminate
  * final Sorts (EliminateSorts), and strip every expression out of the
  * final Project — so a bench that forces with count() under-measures any
  * query whose cost lives in those nodes.
  *
  * For each registry query this compares the optimized plan of the full
  * query (all columns demanded, the shape `Verify` executes when writing
  * parquet) against the optimized plan of `df.groupBy().count()` (the
  * shape `Bench` was timing), and reports the Window/Sort/Generate node
  * counts plus the final-Project expression count under each. A query
  * where the counts diverge was being under-measured.
  *
  * Plan-only — nothing executes — so the audit runs in seconds over the
  * whole surface.
  */
object ForceAudit {
  private def stats(p: LogicalPlan): (Int, Int, Int, Int) = {
    val windows = p.collect { case w: Window => w }.size
    val sorts = p.collect { case s: Sort => s }.size
    val gens = p.collect { case g: Generate => g }.size
    // expressions surviving in the top Project (0 when the Project itself
    // was pruned away): a proxy for per-row scalar work in the final select
    val topProjExprs = p.collectFirst { case pr: Project => pr.projectList.size }.getOrElse(0)
    (windows, sorts, gens, topProjExprs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.attach(spark)

    var pruned = List.empty[String]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val full = df.queryExecution.optimizedPlan
        val counted = df.groupBy().count().queryExecution.optimizedPlan
        val (wF, sF, gF, pF) = stats(full)
        val (wC, sC, gC, pC) = stats(counted)
        val lost =
          (if (wC < wF) s"window:$wF->$wC " else "") +
          (if (sC < sF) s"sort:$sF->$sC " else "") +
          (if (gC < gF) s"generate:$gF->$gC " else "") +
          (if (pC < pF) s"projExprs:$pF->$pC" else "")
        if (lost.nonEmpty) {
          pruned ::= name
          println(f"PRUNED  $name%-32s $lost")
        } else {
          println(f"ok      $name%-32s w=$wF s=$sF g=$gF proj=$pF")
        }
      } catch {
        case e: Throwable =>
          println(f"ERROR   $name%-32s ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(100)}")
      }
    }
    println(s"\n=== ${pruned.size} queries under-measured by count() forcing ===")
    pruned.sorted.foreach(n => println(s"  $n"))
    spark.stop()
  }
}
